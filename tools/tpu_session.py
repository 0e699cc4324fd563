"""One-process TPU work queue (the tunnel wedges easily; batch all chip
work into a single launch).

Runs, in order:
  1. bench (global highest matmul precision — the shipped default);
  2. the same bench with the relaxed global precision (GP ops keep their
     scoped @precise), plus a 100-epoch real-data NaN check to validate
     relaxing the global default;
  3. a full 1000-epoch north-star training run with eval/cgen.

Usage: python tools/tpu_session.py [--skip_long]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run(cmd, env=None, timeout=3600):
    print(f":: {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    e["PYTHONUNBUFFERED"] = "1"
    r = subprocess.run(cmd, env=e, timeout=timeout)
    print(f":: exit {r.returncode}", flush=True)
    time.sleep(30)  # let the remote session tear down before the next claim
    return r.returncode


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip_long", action="store_true")
    p.add_argument("--mnist_data_path", default="/tmp/mnist_data/")
    args = p.parse_args()

    py = sys.executable

    # 1) bench, shipped default (highest precision)
    run([py, os.path.join(ROOT, "bench.py")])

    # 2) bench with relaxed global precision (scoped @precise still guards
    #    the GP math)
    run([py, os.path.join(ROOT, "bench.py")],
        env={"SVGPVAE_MATMUL_PRECISION": "default"})

    # 2b) 100-epoch real-data stability check under relaxed precision
    run([py, "-m", "svgpvae_tpu.cli.mnist", "--elbo", "SVGPVAE_Hensman",
         "--ip_joint", "--GP_joint", "--ov_joint", "--clip_qs", "--GECO",
         "--PCA", "--opt_regime", "joint-100", "--eval_every", "50",
         "--mnist_data_path", args.mnist_data_path,
         "--base_dir", "/tmp/mnist_tpu", "--expid", "relaxed_check"],
        env={"SVGPVAE_MATMUL_PRECISION": "default"}, timeout=2400)

    if args.skip_long:
        return

    # 3) full 1000-epoch north-star run
    run([py, "-m", "svgpvae_tpu.cli.mnist", "--elbo", "SVGPVAE_Hensman",
         "--ip_joint", "--GP_joint", "--ov_joint", "--clip_qs", "--GECO",
         "--PCA", "--opt_regime", "joint-1000", "--eval_every", "50",
         "--save", "--mnist_data_path", args.mnist_data_path,
         "--base_dir", "/tmp/mnist_tpu", "--expid", "northstar1k"],
        timeout=5400)


if __name__ == "__main__":
    main()
