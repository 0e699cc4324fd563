"""Round-5 one-process TPU work queue (one chip, one process at a time;
the tunnel wedges if two processes claim it or one is hard-killed —
see CLAUDE.md).  Reuses the graceful runner from tools/tpu_round3.py.

Wave 1 — validate the r5 default flip on-chip + the multi-seed record
  band (VERDICT r4 item 7): bench.py refresh (the new sprites_train /
  sprites_train_s2d / sprites_train_ref lines), then three 360-epoch
  SPRITES Hensman record-config runs (seeds 0/1/2) under the NEW
  defaults (fused_rejitter_pallas + s2d64) so the RECORDS row quotes a
  >=3-seed band under one binary.

Wave 2 — Casale probes (VERDICT items 5/6): --casale_taylor_every
  cadence sweep K in {4, 16, len(epoch)} vs the K=1 reference-parity
  record config, and the predictive-side alpha arm (cgen-time smoother
  noise pinned, training untouched).

Wave 3 — Casale terms-binary confirmation + Titsias stable-family
  refresh under the r5 binary (the planned basin-rescue gate was moot:
  wave 1 drew 3/3 good basins; the detector ships with a forced-trigger
  e2e test instead).  Results: RESULTS.md r5 wave 3.

Multi-seed record bands are produced by tools/record_gate.py (the
wave-1 by-hand procedure as code).

Usage: python tools/tpu_round5.py --wave N [--only NAME,..] [--skip ..]
Logs: /tmp/r05_logs/<name>.log
Stop file: /tmp/r05_stop (finishes the current job, skips the rest).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_round3 import run  # noqa: E402  (graceful SIGINT runner)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MNIST = "/tmp/mnist_data/"
SPRITES_FULL = "/tmp/sprites_full/"

import tpu_round3  # noqa: E402
tpu_round3.LOGDIR = "/tmp/r05_logs"
STOPFILE = "/tmp/r05_stop"


def sprites_job(expid, extra, epochs=30, timeout=2400):
    py = sys.executable
    cmd = [py, "-m", "svgpvae_tpu.cli.sprites", "--elbo",
           "SVGPVAE_Hensman", "--GECO", "--clip_qs", "--synthetic",
           "--synthetic_chars", "1000", "--sprites_data_path",
           SPRITES_FULL, "--ip_joint", "--GPLVM_joint", "--PCA",
           "--object_kernel_normalize", "--clip_grad",
           "--opt_regime", f"joint-{epochs}", "--eval_every", "5",
           "--nr_epochs_repr_nn", "40", "--base_dir", "/tmp/sprites_tpu",
           "--expid", expid, *extra]
    return (expid, cmd, timeout)


def sprites_titsias_job(expid, extra, epochs=30, timeout=2400):
    """Same record config as sprites_job but the Titsias bound (no GECO —
    the bound is maximized directly, matching the wave-22 record runs)."""
    expid_, cmd, t = sprites_job(expid, extra, epochs=epochs,
                                 timeout=timeout)
    cmd = [a for a in cmd if a != "--GECO"]
    i = cmd.index("SVGPVAE_Hensman")
    cmd[i] = "SVGPVAE_Titsias"
    return (expid_, cmd, t)


def casale_job(expid, extra, regime=("VAE-100", "GP-100", "joint-1400"),
               timeout=5400):
    py = sys.executable
    cmd = [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo", "GPVAE_Casale",
           "--GP_joint", "--ov_joint", "--clip_qs", "--PCA",
           "--mnist_data_path", MNIST, "--opt_regime", *regime,
           "--base_dir", "/tmp/mnist_tpu", "--expid", expid, *extra]
    return (expid, cmd, timeout)


def wave1():
    py = sys.executable
    return [
        # on-chip bench refresh under the flipped defaults: sprites_train
        # now runs fused_rejitter_pallas, sprites_train_s2d the full
        # driver default, sprites_train_ref the two-pass anchor
        ("bench_r5_flip", [py, os.path.join(ROOT, "bench.py")], 3000),
        # >=3-seed record band under ONE binary + the new defaults
        # (item 7; seeds 0/1 also re-validate the flip on the driver
        # path at the converged horizon)
        sprites_job("sp_rec5_s0", [], epochs=360, timeout=7200),
        sprites_job("sp_rec5_s1", ["--seed", "1"], epochs=360,
                    timeout=7200),
        sprites_job("sp_rec5_s2", ["--seed", "2"], epochs=360,
                    timeout=7200),
    ]


def wave2():
    py = sys.executable
    return [
        # (a) factored-taylor bench confirm: the r5 taylor_coeffs rewrite
        # (gp/casale.py — Woodbury applied, (N,N) inverse never formed)
        # must show in the FLOP count AND the step time; the wave-1 bench
        # may have imported pre-rewrite code (same-process import race)
        ("bench_casale", [py, os.path.join(ROOT, "bench.py")], 1500,
         {"BENCH_ONLY": "casale_train"}),
        # (b) K=1 parity rerun at the record budget: the factored form is
        # exact (naive-f64 pinned), so this must land on the 0.03642
        # +/- ~0.7% record trajectory while measuring the new step time
        casale_job("cas_fact_1400", []),
        # (c) Taylor/encode refresh cadence (item 5): K>1 holds the
        # full-train Z for K steps (V + coeffs still recomputed per step
        # with exact GP grads).  15 steps/epoch -> K=16 ~ once/epoch.
        casale_job("cas_tay16", ["--casale_taylor_every", "16"]),
        casale_job("cas_tay4", ["--casale_taylor_every", "4"]),
        casale_job("cas_tay64", ["--casale_taylor_every", "64"]),
        # (d) predictive-side alpha probe (item 6): pin the cgen
        # smoother's noise at predict time only — if the scale ridge
        # hurts only the smoother, this recovers quality without
        # touching training semantics
        casale_job("cas_pred_a03", ["--casale_predict_alpha", "0.3"]),
        casale_job("cas_pred_a01", ["--casale_predict_alpha", "0.1"]),
        casale_job("cas_pred_a1", ["--casale_predict_alpha", "1.0"]),
    ]


def wave3():
    # NOTE: the planned sp_basin gate is moot under the current binary —
    # wave 1 showed 3/3 seeds in the good basin (no plateau instance to
    # rescue); the detector ships with a forced-trigger e2e test instead
    # (tests/test_e2e_sprites.py::test_basin_retry_restarts_main_loop).
    py = sys.executable
    return [
        # terms-binary confirmation (the wave-2 Casale arms ran from the
        # live tree while the taylor_terms/gathered-B commit landed):
        # re-bench + a K=1 record-config rerun under the settled binary
        ("bench_casale_terms", [py, os.path.join(ROOT, "bench.py")], 1500,
         {"BENCH_ONLY": "casale_train"}),
        casale_job("cas_terms_1400", []),
        # Titsias stable-family refresh under the CURRENT binary + the
        # flipped defaults (s2d64; gp impl stays 'fused' per the
        # dispatch table — frp is Hensman-only): the 0.01368/0.01398
        # record rows date from the wave-22 binary at the 9.6-10 ms
        # two-pass step; these re-certify the stable family at the new
        # step speed, 2 seeds, one binary
        sprites_titsias_job("sp_tit5_s0", [], epochs=360, timeout=7200),
        sprites_titsias_job("sp_tit5_s1", ["--seed", "1"], epochs=360,
                            timeout=7200),
    ]


def wave4():
    """Re-measure the sprites-Titsias Pallas carve-out under the r5
    binary.  The dispatch cell keeps the Pallas inverse off
    sprites+Titsias on an r3 measurement (p_m corrupted to ~1.7e-2)
    that predates the current ridge policies — while Hensman's
    fused_rejitter_pallas now runs the SAME Pallas inverse on the SAME
    rank-deficient kernel in-band.  A CPU f32 probe on the
    rank-deficient fixture shows pallas==chol at f32 noise (6.4e-6 vs
    4.3e-6 normalized).  Gate: 30-ep A/B (step p50 + cgen), then a
    360-ep converged arm if clean."""
    return [
        sprites_titsias_job("sp_titfp_30",
                            ["--gp_block_impl", "fused_pallas"],
                            epochs=30, timeout=2400),
        sprites_titsias_job("sp_titab_30", [], epochs=30, timeout=2400),
        sprites_titsias_job("sp_titfp_360",
                            ["--gp_block_impl", "fused_pallas"],
                            epochs=360, timeout=7200),
    ]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wave", type=int, required=True)
    p.add_argument("--only", type=str, default=None)
    p.add_argument("--skip", type=str, default="")
    args = p.parse_args()

    jobs = {1: wave1, 2: wave2, 3: wave3, 4: wave4}[args.wave]()
    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()
    for job in jobs:
        name, cmd, timeout = job[:3]
        extra_env = job[3] if len(job) > 3 else None
        if (only and name not in only) or name in skip:
            continue
        if os.path.exists(STOPFILE):
            print(f":: stop file present; skipping {name} and the rest",
                  flush=True)
            break
        run(name, cmd, timeout, extra_env)


if __name__ == "__main__":
    main()
