"""Round-2 one-process TPU work queue (the tunnel wedges easily; batch all
chip work into a single launch; NEVER run two TPU processes at once).

Runs, in order (VERDICT r1 items 1, 3, 4, 6, 10):
  1. bench.py --scaling      -> BENCH suite + batch-scaling probe
  2. tools/profile_step.py   -> PROFILE_r02.json (step breakdown + Pallas
                                at training shapes)
  3. SVGPVAE_Titsias  1000 epochs (reference default epoch count)
  4. deep SVIGP       2000 epochs (reference README.md:47 canonical)
  5. Casale GPVAE     VAE-100 GP-100 (reference canonical regime)
  6. CVAE             1000 epochs
  7. Hensman north-star, seed 1 (second-seed reproducibility)
  8. Hensman north-star f32, 300 epochs, eval_every 25 (the f32 side of
     the f64-parity table; the f64 side runs on CPU concurrently)

Logs land in /tmp/r02_logs/<name>.log; summary lines print here.

Usage: python tools/tpu_round2.py [--only NAME[,NAME..]] [--skip NAME,..]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGDIR = "/tmp/r02_logs"
MNIST = "/tmp/mnist_data/"


def run(name, cmd, timeout):
    os.makedirs(LOGDIR, exist_ok=True)
    log = os.path.join(LOGDIR, f"{name}.log")
    print(f":: [{name}] {' '.join(cmd)} (timeout {timeout}s)", flush=True)
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    t0 = time.time()
    with open(log, "w") as f:
        # graceful on timeout: SIGINT -> grace -> SIGKILL.  Hard-killing a
        # job mid-device-call wedges the tunnel's remote grant (CLAUDE.md),
        # which would silently corrupt every later job in the queue; the
        # interrupt gives jax a chance to tear the session down, and the
        # longer post-kill sleep lets a wedged grant expire.
        p = subprocess.Popen(cmd, env=env, stdout=f,
                             stderr=subprocess.STDOUT)
        killed = False
        try:
            code = p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            import signal as _signal
            p.send_signal(_signal.SIGINT)
            try:
                code = p.wait(timeout=60)
            except subprocess.TimeoutExpired:
                p.kill()
                code = p.wait()
                killed = True
    dt = time.time() - t0
    if killed:
        print(f":: [{name}] hard-killed after timeout; sleeping 300s for "
              "the device grant to clear", flush=True)
        time.sleep(300)
    tail = ""
    try:
        with open(log) as f:
            lines = [ln.rstrip() for ln in f.readlines() if ln.strip()]
        tail = " | ".join(lines[-3:])
    except OSError:
        pass
    print(f":: [{name}] exit {code} in {dt:.0f}s :: {tail}", flush=True)
    time.sleep(30)  # let the remote grant tear down before the next claim
    return code


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", type=str, default=None)
    p.add_argument("--skip", type=str, default="")
    args = p.parse_args()

    py = sys.executable
    ns = ["--GECO", "--PCA", "--ip_joint", "--GP_joint", "--ov_joint",
          "--clip_qs", "--mnist_data_path", MNIST]

    jobs = [
        ("bench", [py, os.path.join(ROOT, "bench.py"), "--scaling"], 2400),
        ("profile", [py, os.path.join(ROOT, "tools", "profile_step.py")],
         1200),
        ("titsias1k", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                       "SVGPVAE_Titsias", "--PCA", "--ip_joint",
                       "--GP_joint", "--ov_joint", "--clip_qs",
                       "--opt_regime", "joint-1000", "--eval_every", "50",
                       "--mnist_data_path", MNIST,
                       "--base_dir", "/tmp/mnist_tpu",
                       "--expid", "titsias1k"], 3600),
        ("svigp2k", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                     "SVIGP_Hensman", "--PCA", "--ip_joint", "--GP_joint",
                     "--ov_joint", "--clip_qs", "--nr_epochs", "2000",
                     "--eval_every", "100", "--mnist_data_path", MNIST,
                     "--base_dir", "/tmp/mnist_tpu", "--expid", "svigp2k"],
         4500),
        ("casale100", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                       "GPVAE_Casale", "--GP_joint", "--ov_joint",
                       "--clip_qs", "--PCA", "--opt_regime", "VAE-100",
                       "GP-100", "--mnist_data_path", MNIST,
                       "--base_dir", "/tmp/mnist_tpu",
                       "--expid", "casale100"], 4500),
        ("cvae1k", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo", "CVAE",
                    "--clip_qs", "--nr_epochs", "1000", "--eval_every",
                    "50", "--mnist_data_path", MNIST,
                    "--base_dir", "/tmp/mnist_tpu", "--expid", "cvae1k"],
         3600),
        ("hensman_seed1", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                           "SVGPVAE_Hensman", *ns, "--seed", "1",
                           "--opt_regime", "joint-1000", "--eval_every",
                           "50", "--base_dir", "/tmp/mnist_tpu",
                           "--expid", "hensman_seed1"], 3600),
        ("hensman_f32_300", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                             "SVGPVAE_Hensman", *ns, "--opt_regime",
                             "joint-300", "--eval_every", "25",
                             "--base_dir", "/tmp/mnist_tpu",
                             "--expid", "f32_300ep"], 2400),
    ]

    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()
    for name, cmd, timeout in jobs:
        if (only and name not in only) or name in skip:
            continue
        run(name, cmd, timeout)


if __name__ == "__main__":
    main()
