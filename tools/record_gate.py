"""Multi-seed record gate (VERDICT r4 item 7, made structural).

Reruns a RECORDS-table config over N seeds SERIALLY on the one chip
(via the graceful runner — see CLAUDE.md: never two TPU processes) and
prints the seed band, so a high-variance family can never headline a
lucky draw again.  The RECORDS table quotes band-first rows produced by
exactly this procedure (r5 wave 1 ran it by hand; this tool is that
procedure as code).

Usage:
    python tools/record_gate.py --config sprites_hensman --seeds 3
    python tools/record_gate.py --config mnist_hensman --seeds 2 --dry_run

Configs mirror the RECORDS rows (RESULTS.md):
  sprites_hensman  Hensman+GECO 360 ep, r5 defaults (frp + s2d64)
  sprites_titsias  Titsias(entropy) 360 ep, the stable family
  mnist_hensman    Hensman+GECO kappa^2=0.016, 32k ep, --epoch_chunk 50
  mnist_titsias    Titsias(entropy) 32k ep, --epoch_chunk 50
  mnist36          multi-digit (13679) Hensman+GECO, dense evals
  casale           3-way VAE-100 GP-100 joint-1400

Logs: /tmp/record_gate_logs/<config>_s<seed>.log
Output: per-seed best cgen + a band summary and a ready-to-paste
RECORDS markdown row.  One chip, serial — budget ~7-25 min per seed
depending on config (see the Wall column in RESULTS.md RECORDS).
"""

from __future__ import annotations

import argparse
import os
import re
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import tpu_round3  # noqa: E402  (graceful SIGINT runner)
from tpu_round5 import sprites_job, sprites_titsias_job, casale_job  # noqa: E402

tpu_round3.LOGDIR = "/tmp/record_gate_logs"
PY = sys.executable
MNIST = "/tmp/mnist_data/"


def mnist36_record_job(expid, extra, epochs=200, timeout=2400):
    """The multi-digit record config (r4 wave 9 dense-eval arms): best
    cgen peaks at epoch ~24-34, so the gate keeps the per-5-epoch
    evals."""
    cmd = [PY, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
           "SVGPVAE_Hensman", "--GECO", "--PCA", "--ip_joint",
           "--GP_joint", "--ov_joint", "--clip_qs",
           "--dataset", "13679", "--synthetic_digits",
           "--mnist_data_path", "/tmp/mnist36_data/",
           "--kappa_squared", "0.016", "--epoch_chunk", "5",
           "--opt_regime", f"joint-{epochs}", "--eval_every", "5",
           "--base_dir", "/tmp/mnist_tpu", "--expid", expid, *extra]
    return (expid, cmd, timeout)


def mnist_record_job(expid, extra, titsias=False, epochs=32000,
                     timeout=9000):
    """The wave-29 MNIST record config (RESULTS.md RECORDS row 1)."""
    cmd = [PY, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
           "SVGPVAE_Titsias" if titsias else "SVGPVAE_Hensman",
           "--PCA", "--ip_joint", "--GP_joint", "--ov_joint",
           "--clip_qs", "--mnist_data_path", MNIST,
           "--kappa_squared", "0.016", "--epoch_chunk", "50",
           "--opt_regime", f"joint-{epochs}", "--eval_every", "800",
           "--base_dir", "/tmp/mnist_tpu", "--expid", expid, *extra]
    if not titsias:
        cmd.insert(5, "--GECO")
    return (expid, cmd, timeout)


CONFIGS = {
    "sprites_hensman": lambda expid, seed: sprites_job(
        expid, ["--seed", str(seed)], epochs=360, timeout=7200),
    "sprites_titsias": lambda expid, seed: sprites_titsias_job(
        expid, ["--seed", str(seed)], epochs=360, timeout=7200),
    "mnist_hensman": lambda expid, seed: mnist_record_job(
        expid, ["--seed", str(seed)]),
    "mnist_titsias": lambda expid, seed: mnist_record_job(
        expid, ["--seed", str(seed)], titsias=True),
    "mnist36": lambda expid, seed: mnist36_record_job(
        expid, ["--seed", str(seed)]),
    "casale": lambda expid, seed: casale_job(
        expid, ["--seed", str(seed)]),
}

BEST_RE = re.compile(r"best cgen MSE ([0-9.]+) at epoch (\d+)")


def parse_best(log_path):
    try:
        with open(log_path) as f:
            hits = BEST_RE.findall(f.read())
    except OSError:
        return None
    return (float(hits[-1][0]), int(hits[-1][1])) if hits else None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True, choices=sorted(CONFIGS))
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--start_seed", type=int, default=0)
    p.add_argument("--dry_run", action="store_true",
                   help="print the commands without touching the chip")
    args = p.parse_args()

    results = {}
    for seed in range(args.start_seed, args.start_seed + args.seeds):
        expid = f"{args.config}_s{seed}"
        name, cmd, timeout = CONFIGS[args.config](expid, seed)
        if args.dry_run:
            print(f":: [{name}] {' '.join(cmd)} (timeout {timeout}s)")
            continue
        tpu_round3.run(name, cmd, timeout)
        # the graceful runner writes <name>_retry.log when it retried a
        # transient tunnel failure; prefer that result when present
        best = (parse_best(os.path.join(tpu_round3.LOGDIR,
                                        f"{name}_retry.log"))
                or parse_best(os.path.join(tpu_round3.LOGDIR,
                                           f"{name}.log")))
        results[seed] = best
        print(f":: [{name}] best cgen = {best}", flush=True)
    if args.dry_run:
        return

    vals = [v[0] for v in results.values() if v]
    print("\n== record gate summary ==")
    for seed, best in sorted(results.items()):
        print(f"  seed {seed}: " +
              (f"best cgen {best[0]:.5f} @ep {best[1]}" if best
               else "FAILED (no best-cgen line in log)"))
    if len(vals) >= 2:
        lo, hi = min(vals), max(vals)
        spread = (hi - lo) / lo * 100
        print(f"  band: {lo:.5f}-{hi:.5f} ({len(vals)} seeds, "
              f"~{spread:.0f}%), median {statistics.median(vals):.5f}")
        print("  RECORDS row: | ... | "
              f"**{lo:.5f}-{hi:.5f}** ({len(vals)} seeds, ~{spread:.0f}%) "
              f"| {args.config} | best seed {lo:.5f} | ... |")
    elif len(vals) == 1:
        print(f"  single seed {vals[0]:.5f} — need >=2 for a band")
    else:
        print("  no successful runs")


if __name__ == "__main__":
    main()
