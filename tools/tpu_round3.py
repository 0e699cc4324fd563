"""Round-3 one-process TPU work queue (one chip, one process at a time;
the tunnel wedges if two processes claim it or one is hard-killed —
see CLAUDE.md).

Wave 1 (VERDICT r2 item 1 — close the Hensman-vs-SVIGP cgen gap):
  sweep GECO kappa^2 around the reference default 0.020, extend epochs
  to 2000 (SVIGP's canonical count, reference README.md:47), probe the
  GECO lambda cap and a lower lr at 2000 epochs.  Each 1000-epoch
  north-star run is ~274 s wall (RESULTS.md), so the whole wave is ~1 h.

Wave 2 (item 2 — SPRITES step profile + bf16): run after the sprites
  CLI grows --bf16 and profile_step grows a sprites mode.

Usage: python tools/tpu_round3.py --wave 1 [--only NAME,..] [--skip NAME,..]
Logs: /tmp/r03_logs/<name>.log
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGDIR = "/tmp/r03_logs"
MNIST = "/tmp/mnist_data/"
SPRITES = "/tmp/sprites_data/"


# Tunnel/backend failures that are worth ONE retry when the job itself
# did not time out: transient memory pressure from the previous grant's
# teardown and dropped remote-compile responses (both observed in
# /tmp/r04_chain.out: sp_diag_a, sp_frp_360 — identical re-runs passed).
_TRANSIENT = ("RESOURCE_EXHAUSTED", "remote_compile", "read body",
              "DEADLINE_EXCEEDED", "UNAVAILABLE")


def run(name, cmd, timeout, extra_env=None):
    code, tail, killed = _run_once(name, cmd, timeout, extra_env)
    if code != 0 and not killed and any(t in tail for t in _TRANSIENT):
        print(f":: [{name}] transient backend failure; sleeping 120s and "
              "retrying once", flush=True)
        time.sleep(120)
        code, tail, killed = _run_once(f"{name}_retry", cmd, timeout,
                                       extra_env)
    return code


def _run_once(name, cmd, timeout, extra_env=None):
    os.makedirs(LOGDIR, exist_ok=True)
    log = os.path.join(LOGDIR, f"{name}.log")
    print(f":: [{name}] {' '.join(cmd)} (timeout {timeout}s)", flush=True)
    env = dict(os.environ, PYTHONUNBUFFERED="1", **(extra_env or {}))
    t0 = time.time()
    with open(log, "w") as f:
        # graceful on timeout: SIGINT -> grace -> SIGKILL.  A hard kill
        # mid-device-call wedges the tunnel's remote grant for ~15-30 min.
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
    return code, tail, killed


def mnist_job(expid, extra, epochs=1000, timeout=1500, eval_every=50):
    """North-star Hensman config with overrides (reference README.md:33)."""
    py = sys.executable
    cmd = [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo", "SVGPVAE_Hensman",
           "--GECO", "--PCA", "--ip_joint", "--GP_joint", "--ov_joint",
           "--clip_qs", "--mnist_data_path", MNIST,
           "--opt_regime", f"joint-{epochs}", "--eval_every",
           str(eval_every), "--base_dir", "/tmp/mnist_tpu",
           "--expid", expid, *extra]
    return (expid, cmd, timeout)


def wave1():
    return [
        # Longer training first: round-2 best cgen was still improving at
        # epoch 999 while SVIGP's 0.0264 had 2000 epochs.
        mnist_job("hensman_2k", [], epochs=2000, timeout=2400),
        # kappa^2 sweep around the reference default 0.020
        # (MNIST_experiment.py:1150); smaller kappa = tighter recon
        # constraint = GECO spends longer reconstruction-dominated.
        mnist_job("kappa014", ["--kappa_squared", "0.014"]),
        mnist_job("kappa016", ["--kappa_squared", "0.016"]),
        mnist_job("kappa018", ["--kappa_squared", "0.018"]),
        mnist_job("kappa023", ["--kappa_squared", "0.023"]),
        # lambda-cap sensitivity (PARITY divergence #1)
        mnist_job("lmax1e6", ["--geco_lambda_max", "1e6"]),
        # lower lr with the 2x epoch budget
        mnist_job("lr5e4_2k", ["--lr", "0.0005"], epochs=2000,
                  timeout=2400),
    ]


def wave2():
    py = sys.executable
    sp = [py, "-m", "svgpvae_tpu.cli.sprites", "--elbo", "SVGPVAE_Hensman",
          "--GECO", "--clip_qs", "--synthetic", "--sprites_data_path",
          SPRITES, "--ip_joint", "--GPLVM_joint", "--PCA",
          "--object_kernel_normalize", "--clip_grad",
          "--opt_regime", "joint-30", "--eval_every", "5",
          "--nr_epochs_repr_nn", "40", "--base_dir", "/tmp/sprites_tpu"]
    return [
        # --- VERDICT item 2: SPRITES step profile + bf16 head-to-head ---
        ("sprites_profile",
         [py, os.path.join(ROOT, "tools", "profile_step.py"),
          "--workload", "sprites"], 1800),
        ("sprites_f32", [*sp, "--expid", "r3_f32"], 2400),
        ("sprites_bf16", [*sp, "--bf16", "--expid", "r3_bf16"], 2400),
        # --- item 1 follow-ups: epochs are the lever (2000ep -> 0.03019
        # vs 1000ep 0.0332; kappa/lr/lambda-cap all flat-or-worse) ---
        mnist_job("hensman_3k", [], epochs=3000, timeout=3300),
        mnist_job("hensman_4k", [], epochs=4000, timeout=4200),
        mnist_job("hensman_2k_seed1", ["--seed", "1"], epochs=2000,
                  timeout=2400),
        mnist_job("hensman_2k_reshuf", ["--reshuffle"], epochs=2000,
                  timeout=2400),
        mnist_job("kappa016_2k", ["--kappa_squared", "0.016"], epochs=2000,
                  timeout=2400),
        # --- item 4 evidence: multi-digit 13679 at reference scale ---
        (lambda j: (j[0], j[1] + ["--dataset", "13679",
                                  "--synthetic_digits"], j[2]))(
            mnist_job("mnist_13679", [], epochs=200, timeout=2400)),
    ]


def wave3():
    """GP-block impl head-to-head (VERDICT item 3 measurement) + fused /
    eval-bundle quality validation runs."""
    py = sys.executable
    bench = [py, os.path.join(ROOT, "bench.py")]
    bo = {"BENCH_ONLY": "mnist_train,sprites_train"}
    return [
        ("sprites_profile2",  # re-run with the filters=128 MXU-width probe
         [py, os.path.join(ROOT, "tools", "profile_step.py"),
          "--workload", "sprites"], 1800, {}),
        ("bench_gp_ref", bench, 1200, bo),
        ("bench_gp_fused", bench, 1200,
         {**bo, "BENCH_GP_IMPL": "fused"}),
        ("bench_gp_pallas", bench, 1200,
         {**bo, "BENCH_GP_IMPL": "fused_pallas"}),
        # quality: 300 epochs, eval every 25 — compare to the round-2
        # baseline trajectory (f32 300ep best cgen 0.0389, RESULTS.md)
        mnist_job("fused_300", ["--gp_block_impl", "fused"], epochs=300,
                  timeout=1500, eval_every=25) + ({},),
        mnist_job("pallas_300", ["--gp_block_impl", "fused_pallas"],
                  epochs=300, timeout=1500, eval_every=25) + ({},),
        # wall-clock of the bundled eval group (VERDICT weak #4)
        mnist_job("evalbundle_1k", ["--eval_bundle"], epochs=1000,
                  timeout=1800) + ({},),
        # best-config long run: kappa^2=0.016 beat 0.020 at 2000 ep
        # (0.02980 vs 0.03019) and 4000 ep was still improving at 0.020
        # (0.02856) — combine both
        mnist_job("kappa016_4k", ["--kappa_squared", "0.016"],
                  epochs=4000, timeout=4200) + ({},),
        # SPRITES f32 vs bf16 at FULL reference scale (the wave-2 pair
        # accidentally ran on a 600-frame leftover corpus; the 50k-frame
        # round-2 corpus lives at /tmp/sprites_full)
        ("sprites_full_f32", _sprites_full_cmd("r3full_f32", []), 2400,
         {}),
        ("sprites_full_bf16", _sprites_full_cmd("r3full_bf16", ["--bf16"]),
         2400, {}),
    ]


def _sprites_full_cmd(expid, extra):
    py = sys.executable
    return [py, "-m", "svgpvae_tpu.cli.sprites", "--elbo",
            "SVGPVAE_Hensman", "--GECO", "--clip_qs", "--synthetic",
            "--synthetic_chars", "1000",  # full reference scale: N_train=50k
            "--sprites_data_path", "/tmp/sprites_full/", "--ip_joint",
            "--GPLVM_joint", "--PCA", "--object_kernel_normalize",
            "--clip_grad", "--opt_regime", "joint-30", "--eval_every", "5",
            "--nr_epochs_repr_nn", "40", "--base_dir", "/tmp/sprites_tpu",
            "--expid", expid, *extra]


def wave4():
    """Retry the Pallas GP bench with the fixed (no-dynamic_slice) kernel
    + long-horizon fused-impl quality for the default-flip decision."""
    py = sys.executable
    bench = [py, os.path.join(ROOT, "bench.py")]
    bo = {"BENCH_ONLY": "mnist_train,sprites_train"}
    micro = ("pallas_micro", [py, "-c", (
        "import numpy as np, jax.numpy as jnp\n"
        "from svgpvae_tpu.ops.chol_inverse import chol_inverse_pallas,"
        " chol_inverse_ref\n"
        "R = np.random.RandomState(0)\n"
        "A = R.randn(17, 32, 32); M = jnp.asarray(A @ A.transpose(0, 2, 1)"
        " + 32 * np.eye(32), jnp.float32)\n"
        "inv, ld = chol_inverse_pallas(M)\n"
        "inv_r, ld_r = chol_inverse_ref(M)\n"
        "print('maxdiff inv', float(jnp.abs(inv - inv_r).max()),"
        " 'ld', float(jnp.abs(ld - ld_r).max()))\n")], 900, {})
    return [
        micro,
        ("bench_gp_pallas2", bench, 1500,
         {**bo, "BENCH_GP_IMPL": "fused_pallas"}),
        mnist_job("pallas_300_b", ["--gp_block_impl", "fused_pallas"],
                  epochs=300, timeout=1500, eval_every=25) + ({},),
        mnist_job("fused_2k", ["--gp_block_impl", "fused"], epochs=2000,
                  timeout=2400) + ({},),
        # wall-clock of multi-epoch chunking: 1000 epochs in 20 programs
        mnist_job("chunk50_1k", ["--epoch_chunk", "50"], epochs=1000,
                  timeout=1800) + ({},),
        # chunking + fused GP + bundled eval: the full latency-lever stack
        mnist_job("allfast_1k", ["--epoch_chunk", "50", "--gp_block_impl",
                                 "fused", "--eval_bundle"], epochs=1000,
                  timeout=1800) + ({},),
        # full suite incl. the new eval lines (validates the end-of-round
        # bench wall against its watchdog)
        ("bench_full", [sys.executable, os.path.join(ROOT, "bench.py")],
         2400, {}),
    ]


def wave5():
    """Resume of wave 4 after the session cut out mid-fused_2k, plus a
    pallas_2k long-horizon run for the default-impl decision."""
    return [
        mnist_job("fused_2k", ["--gp_block_impl", "fused"], epochs=2000,
                  timeout=2400) + ({},),
        mnist_job("pallas_2k", ["--gp_block_impl", "fused_pallas"],
                  epochs=2000, timeout=2400) + ({},),
        # wall-clock of multi-epoch chunking: 1000 epochs in 20 programs
        mnist_job("chunk50_1k", ["--epoch_chunk", "50"], epochs=1000,
                  timeout=1800) + ({},),
        # chunking + fastest GP impl + bundled eval: the full stack
        mnist_job("allfast_1k", ["--epoch_chunk", "50", "--gp_block_impl",
                                 "fused_pallas", "--eval_bundle"],
                  epochs=1000, timeout=1800) + ({},),
        # on-chip MNIST component profile incl. the fused/fused_pallas
        # full-step rows (replaces the CPU-measured PROFILE_r03_mnist.json)
        ("profile_mnist", [sys.executable,
                           os.path.join(ROOT, "tools", "profile_step.py"),
                           "--workload", "mnist"], 1800, {}),
        ("bench_full", [sys.executable, os.path.join(ROOT, "bench.py")],
         2400, {}),
    ]


def ball_job(expid, extra, steps=25000, timeout=1800):
    py = sys.executable
    cmd = [py, "-m", "svgpvae_tpu.cli.ball", "--elbo", "SVGPVAE_Hensman",
           "--clip_qs", "--steps", str(steps), "--eval_every", "5000",
           "--base_dir", "/tmp/ball_tpu", "--expid", expid, *extra]
    return (expid, cmd, timeout, {})


def wave6():
    """Post-default-flip round-out: ball fused head-to-head (speed +
    quality), SPRITES quality under the new fused_pallas default, and the
    long-horizon quality-record run with the full latency stack."""
    py = sys.executable
    bench = [py, os.path.join(ROOT, "bench.py")]
    bo = {"BENCH_ONLY": "ball_train"}
    return [
        # ball GP-block head-to-head on-chip (same bench workload)
        ("bench_ball_ref", bench, 1200, {**bo, "BENCH_GP_IMPL": "reference"}),
        ("bench_ball_fused", bench, 1200, {**bo, "BENCH_GP_IMPL": "fused"}),
        ("bench_ball_pallas", bench, 1200,
         {**bo, "BENCH_GP_IMPL": "fused_pallas"}),
        # ball quality head-to-head at 25k steps, identical seed/flags:
        # trajectory MSE (utils.mse_rotation) reference vs fused_pallas
        ball_job("ball_ref_25k", ["--gp_block_impl", "reference"]),
        ball_job("ball_pallas_25k", ["--gp_block_impl", "fused_pallas"]),
        # SPRITES full-scale quality under the new default (auto ->
        # fused_pallas): wave-3 f32 reference-impl baseline was 0.01640
        ("sprites_full_pallas",
         _sprites_full_cmd("r3full_pallas", []), 2400, {}),
        # quality-record run: kappa^2=0.016 (best at 2k) x 8000 epochs
        # (4000 was still improving) with the cheap-wall lever stack
        mnist_job("kappa016x8k", ["--kappa_squared", "0.016",
                                  "--epoch_chunk", "50"],
                  epochs=8000, timeout=5400, eval_every=200) + ({},),
    ]


def wave7():
    """Persistent-compilation-cache measurement through the tunnel: the
    same chunked 1000-epoch north-star run cold (populating the cache)
    then warm (hitting it) — the wall delta is the compile cost the cache
    removes on repeat configs/sweeps."""
    py = sys.executable
    bench = [py, os.path.join(ROOT, "bench.py")]
    cache = {"SVGPVAE_COMPILATION_CACHE": "/tmp/xla_cache_r3"}
    return [
        mnist_job("cache_cold", ["--epoch_chunk", "50"], epochs=1000,
                  timeout=1800) + (cache,),
        mnist_job("cache_warm", ["--epoch_chunk", "50"], epochs=1000,
                  timeout=1800) + (cache,),
        # SPRITES speed with the full stack: fused_pallas default + bf16
        ("bench_sprites_bf16_pallas", bench, 1500,
         {"BENCH_ONLY": "sprites_train", "BENCH_BF16": "1"}),
        # Casale on TPU at 4x the round-2 CPU epoch budget (3-way regime)
        ("casale_tpu", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                        "GPVAE_Casale", "--GP_joint", "--ov_joint",
                        "--clip_qs", "--PCA", "--mnist_data_path", MNIST,
                        "--opt_regime", "VAE-100", "GP-100", "joint-200",
                        "--eval_every", "50", "--base_dir", "/tmp/mnist_tpu",
                        "--expid", "casale_tpu"], 3600, {}),
    ]


def wave8():
    """Quality-record extensions after the SPRITES default fix: longer
    SPRITES horizon under the (quality-correct) two-pass default, longer
    Casale 3-way joint phase (0.0412 at 400 ep was still improving), and
    a second seed of the kappa^2=0.016 x 8000 MNIST record."""
    py = sys.executable
    return [
        # SPRITES 90 epochs at full scale (30-ep run was still descending
        # fast: train MSE 0.00924 and ELBO dropping ~10/epoch at ep 29)
        # (the trailing --opt_regime overrides the base command's joint-30)
        ("sprites_full_90ep",
         _sprites_full_cmd("r3full_90ep", ["--opt_regime", "joint-90"]),
         3000, {}),
        ("casale_tpu_800", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                            "GPVAE_Casale", "--GP_joint", "--ov_joint",
                            "--clip_qs", "--PCA", "--mnist_data_path", MNIST,
                            "--opt_regime", "VAE-100", "GP-100", "joint-600",
                            "--eval_every", "50", "--base_dir",
                            "/tmp/mnist_tpu", "--expid", "casale_tpu_800"],
         5400, {}),
        mnist_job("kappa016x8k_s1", ["--kappa_squared", "0.016",
                                     "--epoch_chunk", "50", "--seed", "1"],
                  epochs=8000, timeout=5400, eval_every=200) + ({},),
    ]


def wave9():
    """fused_rejitter SPRITES gate (the null-space-safe fused KL: one-pass
    dedup + the exact two-pass A_hat-rejittered KL) + a bf16 long-horizon
    record attempt.  Gate bar: the 30-epoch canonical run must land on the
    two-pass trajectory (cgen ~0.0164, NOT the 0.0204 identity-KL
    plateau)."""
    py = sys.executable
    bench = [py, os.path.join(ROOT, "bench.py")]
    return [
        ("sprites_full_rejitter",
         _sprites_full_cmd("r3full_rejitter",
                           ["--gp_block_impl", "fused_rejitter"]),
         2400, {}),
        ("bench_sprites_rejitter", bench, 1500,
         {"BENCH_ONLY": "sprites_train",
          "BENCH_GP_IMPL": "fused_rejitter"}),
        # bf16 at the 90-epoch horizon: at 30 ep bf16 trailed f32 by ~6%
        # relative but was still improving; the f32 90-ep run hit 0.01537
        ("sprites_full_90ep_bf16",
         _sprites_full_cmd("r3full_90ep_bf16",
                           ["--bf16", "--opt_regime", "joint-90"]),
         3000, {}),
    ]


def wave10():
    """Fused Titsias GP block head-to-head (quality + chunked step time
    at 1000 epochs, the canonical Titsias budget) and a full bench
    refresh under the shipped defaults (updates BENCH_LAST_GOOD)."""
    py = sys.executable

    def titsias_job(expid, impl):
        return (expid,
                [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                 "SVGPVAE_Titsias", "--PCA", "--ip_joint", "--GP_joint",
                 "--ov_joint", "--clip_qs", "--mnist_data_path", MNIST,
                 "--opt_regime", "joint-1000", "--eval_every", "200",
                 "--epoch_chunk", "50", "--base_dir", "/tmp/mnist_tpu",
                 "--expid", expid, "--gp_block_impl", impl],
                1800, {})

    return [
        titsias_job("titsias_ref_1k", "reference"),
        titsias_job("titsias_fused_1k", "fused"),
        titsias_job("titsias_fusedpallas_1k", "fused_pallas"),
        ("bench_full", [py, os.path.join(ROOT, "bench.py")], 2400, {}),
    ]


def wave11():
    """Ball Titsias fused head-to-head: 25k-step quality + step time per
    impl (mirrors the round-3 Hensman ball table in RESULTS.md)."""
    py = sys.executable

    def ball_job(expid, impl):
        return (expid,
                [py, "-m", "svgpvae_tpu.cli.ball", "--elbo",
                 "SVGPVAE_Titsias", "--clip_qs", "--steps", "25000",
                 "--eval_every", "5000", "--base_dir", "/tmp/ball_tpu",
                 "--expid", expid, "--gp_block_impl", impl],
                1500, {})

    return [
        ball_job("ball_tit_ref", "reference"),
        ball_job("ball_tit_fused", "fused"),
        ball_job("ball_tit_pallas", "fused_pallas"),
    ]


def wave12():
    """Clean-host Titsias timings after the determinant-lemma rewrite
    (the wave-10 rerun timings were inflated by a concurrent CPU pytest
    suite): bench the new mnist_titsias_train line per impl, and a
    4000-epoch Titsias record run now that the bound is f32-stable."""
    py = sys.executable
    bench = [py, os.path.join(ROOT, "bench.py")]
    bo = {"BENCH_ONLY": "mnist_train,mnist_titsias_train"}
    return [
        ("bench_titsias_auto", bench, 1500, bo),
        ("bench_titsias_fused", bench, 1500,
         {**bo, "BENCH_GP_IMPL": "fused"}),
        (lambda j: (j[0],
                    [a for a in j[1] if a != "--GECO"], j[2]))(
            mnist_job("titsias_4k", ["--elbo", "SVGPVAE_Titsias",
                                     "--epoch_chunk", "50"],
                      epochs=4000, timeout=4200, eval_every=200)) + ({},),
    ]


def wave13():
    """SPRITES Titsias gates (full 50k-frame corpus, 30 epochs): does the
    two-pass dense bound survive f32 on the rank-deficient kernel, and
    does the fused determinant-lemma bound match it?  Plus the Titsias
    8000-epoch MNIST record (4000 was still improving) and a final full
    bench refresh under shipped defaults (updates BENCH_LAST_GOOD and
    picks up the new mnist_titsias_train line)."""
    py = sys.executable

    def sprites_tit(expid, impl):
        cmd = _sprites_full_cmd(expid, ["--elbo", "SVGPVAE_Titsias",
                                        "--gp_block_impl", impl])
        cmd = [a for a in cmd if a != "--GECO"]
        return (expid, cmd, 2400, {})

    return [
        sprites_tit("sprites_tit_ref", "reference"),
        sprites_tit("sprites_tit_fused", "fused"),
        (lambda j: (j[0], [a for a in j[1] if a != "--GECO"], j[2]))(
            mnist_job("titsias_8k", ["--elbo", "SVGPVAE_Titsias",
                                     "--epoch_chunk", "50"],
                      epochs=8000, timeout=5400, eval_every=200)) + ({},),
        ("bench_full", [py, os.path.join(ROOT, "bench.py")], 2400, {}),
    ]


def wave14():
    """SPRITES Titsias extensions after the gate: the 90-epoch horizon
    (mirrors the Hensman record) and the bf16 combo (bf16 is a measured
    1.36x on the conv-dominated SPRITES step)."""
    def sprites_tit(expid, extra):
        cmd = _sprites_full_cmd(expid, ["--elbo", "SVGPVAE_Titsias",
                                        *extra])
        cmd = [a for a in cmd if a != "--GECO"]
        return (expid, cmd, 3000, {})

    return [
        sprites_tit("sprites_tit_90ep", ["--opt_regime", "joint-90"]),
        sprites_tit("sprites_tit_bf16", ["--bf16"]),
    ]


def wave15():
    """Validate the PARITY #13 entropy-form Titsias objective end to end:
    repeated full-scale SPRITES stability gates (the reference-CE form
    explodes on a compilation-noise coin flip — ~50% of identical
    reruns), a 30-epoch SPRITES quality run, the MNIST 1000-epoch
    quality run, and the ball 25k-step quality run."""
    py = sys.executable

    def sprites_tit(expid, regime):
        cmd = _sprites_full_cmd(expid, ["--elbo", "SVGPVAE_Titsias",
                                        "--opt_regime", regime])
        cmd = [a for a in cmd if a != "--GECO"]
        return (expid, cmd, 2400, {})

    return [
        sprites_tit("tit_e1", "joint-2"),
        sprites_tit("tit_e2", "joint-2"),
        sprites_tit("tit_e3", "joint-2"),
        sprites_tit("tit_30ep", "joint-30"),
        (lambda j: (j[0], [a for a in j[1] if a != "--GECO"], j[2]))(
            mnist_job("tit_entropy_1k", ["--elbo", "SVGPVAE_Titsias",
                                         "--epoch_chunk", "50"],
                      epochs=1000, timeout=1800, eval_every=200)) + ({},),
        ("ball_tit_entropy",
         [py, "-m", "svgpvae_tpu.cli.ball", "--elbo", "SVGPVAE_Titsias",
          "--clip_qs", "--steps", "25000", "--eval_every", "5000",
          "--base_dir", "/tmp/ball_tpu", "--expid", "ball_tit_entropy"],
         1500, {}),
    ]


def wave16():
    """Record runs under the entropy-form Titsias objective (PARITY #13)
    + the final full bench refresh under shipped defaults."""
    py = sys.executable

    def tit(expid, epochs, timeout):
        j = mnist_job(expid, ["--elbo", "SVGPVAE_Titsias",
                              "--epoch_chunk", "50"],
                      epochs=epochs, timeout=timeout, eval_every=200)
        return (j[0], [a for a in j[1] if a != "--GECO"], j[2], {})

    def sprites_tit(expid, regime, extra=()):
        cmd = _sprites_full_cmd(expid, ["--elbo", "SVGPVAE_Titsias",
                                        "--opt_regime", regime, *extra])
        cmd = [a for a in cmd if a != "--GECO"]
        return (expid, cmd, 3000, {})

    return [
        tit("tit_entropy_4k", 4000, 4200),
        tit("tit_entropy_8k", 8000, 5400),
        sprites_tit("tit_90ep_entropy", "joint-90"),
        sprites_tit("tit_90ep_entropy_bf16", "joint-90", ("--bf16",)),
        ("bench_full", [py, os.path.join(ROOT, "bench.py")], 2400, {}),
    ]


def wave17():
    """Second seeds for the entropy-objective records (MNIST Titsias 8k
    cgen 0.02693, SPRITES Titsias 90ep 0.01536)."""
    def tit(expid, epochs, timeout):
        j = mnist_job(expid, ["--elbo", "SVGPVAE_Titsias",
                              "--epoch_chunk", "50", "--seed", "1"],
                      epochs=epochs, timeout=timeout, eval_every=200)
        return (j[0], [a for a in j[1] if a != "--GECO"], j[2], {})

    cmd = _sprites_full_cmd("tit_90ep_entropy_s1",
                            ["--elbo", "SVGPVAE_Titsias",
                             "--opt_regime", "joint-90", "--seed", "1"])
    cmd = [a for a in cmd if a != "--GECO"]
    return [
        tit("tit_entropy_8k_s1", 8000, 5400),
        ("tit_90ep_entropy_s1", cmd, 3000, {}),
    ]


def wave18():
    """Baseline-family record extensions: deep SVIGP at 2x its canonical
    budget (is 0.0264 converged?) and Casale 3-way with a 1400-epoch
    joint phase (0.03872 at joint-600 was still improving)."""
    py = sys.executable
    return [
        ("svigp_4k", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                      "SVIGP_Hensman", "--ip_joint", "--GP_joint",
                      "--ov_joint", "--clip_qs", "--PCA",
                      "--mnist_data_path", MNIST, "--nr_epochs", "4000",
                      "--eval_every", "200", "--base_dir", "/tmp/mnist_tpu",
                      "--expid", "svigp_4k"], 3600, {}),
        ("casale_1600", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                         "GPVAE_Casale", "--GP_joint", "--ov_joint",
                         "--clip_qs", "--PCA", "--mnist_data_path", MNIST,
                         "--opt_regime", "VAE-100", "GP-100", "joint-1400",
                         "--eval_every", "100", "--base_dir",
                         "/tmp/mnist_tpu", "--expid", "casale_1600"],
         10800, {}),
    ]


def wave19():
    """Controlled experiment: does the exact-entropy CE term (the
    Titsias stability fix, PARITY #13) also help the HENSMAN family?
    Baselines: MNIST 2000 ep canonical = 0.03019; SPRITES 30 ep
    canonical = 0.01640."""
    def sprites_hens(expid, extra):
        return (expid, _sprites_full_cmd(expid, list(extra)), 2400, {})

    return [
        mnist_job("hens_entropy_2k", ["--entropy_ce"], epochs=2000,
                  timeout=2400) + ({},),
        sprites_hens("sprites_hens_entropy", ("--entropy_ce",)),
    ]


def wave20():
    """Horizon extensions for the entropy-objective records: MNIST
    Titsias 16k (8k = 0.02693, still the best epoch at the horizon) and
    SPRITES Titsias 180 ep (90-ep bests landed at epochs 84/89)."""
    def tit(expid, epochs, timeout):
        j = mnist_job(expid, ["--elbo", "SVGPVAE_Titsias",
                              "--epoch_chunk", "50"],
                      epochs=epochs, timeout=timeout, eval_every=400)
        return (j[0], [a for a in j[1] if a != "--GECO"], j[2], {})

    cmd = _sprites_full_cmd("tit_180ep_entropy",
                            ["--elbo", "SVGPVAE_Titsias",
                             "--opt_regime", "joint-180"])
    cmd = [a for a in cmd if a != "--GECO"]
    return [
        tit("tit_entropy_16k", 16000, 7200),
        ("tit_180ep_entropy", cmd, 3600, {}),
    ]


def wave21():
    """Final horizon pair: MNIST Titsias 32k (16k = 0.02576, still
    improving) and SPRITES Hensman 180 ep (fair head-to-head against
    the Titsias-entropy 180-ep record 0.01457)."""
    def tit(expid, epochs, timeout):
        j = mnist_job(expid, ["--elbo", "SVGPVAE_Titsias",
                              "--epoch_chunk", "50"],
                      epochs=epochs, timeout=timeout, eval_every=800)
        return (j[0], [a for a in j[1] if a != "--GECO"], j[2], {})

    return [
        tit("tit_entropy_32k", 32000, 9000),
        ("hens_180ep",
         _sprites_full_cmd("hens_180ep", ["--opt_regime", "joint-180"]),
         3600, {}),
    ]


def wave22():
    """Close out the record story: (a) deep-SVIGP ceiling — 4000 ep
    reached 0.02496 still improving, double to 8000; (b) second seed for
    the MNIST Titsias 32k record (0.02551); (c) SPRITES Titsias 360 ep
    (is the 180-ep 0.01457 record converged? best was at epoch 144) and
    a second seed at 180 ep."""
    py = sys.executable

    def tit(expid, epochs, timeout, extra=()):
        j = mnist_job(expid, ["--elbo", "SVGPVAE_Titsias",
                              "--epoch_chunk", "50", *extra],
                      epochs=epochs, timeout=timeout, eval_every=800)
        return (j[0], [a for a in j[1] if a != "--GECO"], j[2], {})

    def sprites_tit(expid, regime, extra=()):
        cmd = _sprites_full_cmd(expid, ["--elbo", "SVGPVAE_Titsias",
                                        "--opt_regime", regime, *extra])
        return (expid, [a for a in cmd if a != "--GECO"], 3600, {})

    return [
        ("svigp_8k", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                      "SVIGP_Hensman", "--ip_joint", "--GP_joint",
                      "--ov_joint", "--clip_qs", "--PCA",
                      "--mnist_data_path", MNIST, "--nr_epochs", "8000",
                      "--eval_every", "400", "--base_dir", "/tmp/mnist_tpu",
                      "--expid", "svigp_8k"], 3600, {}),
        tit("tit_entropy_32k_s1", 32000, 9000, ("--seed", "1")),
        sprites_tit("tit_360ep_entropy", "joint-360"),
        sprites_tit("tit_180ep_entropy_s1", "joint-180", ("--seed", "1")),
    ]


def wave23():
    """The decoder-only ceiling is still dropping (0.02496 @4k ->
    0.02280 @8k, best at the horizon both times): double once more."""
    py = sys.executable
    return [
        ("svigp_16k", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                       "SVIGP_Hensman", "--ip_joint", "--GP_joint",
                       "--ov_joint", "--clip_qs", "--PCA",
                       "--mnist_data_path", MNIST, "--nr_epochs", "16000",
                       "--eval_every", "800", "--base_dir",
                       "/tmp/mnist_tpu", "--expid", "svigp_16k"],
         5400, {}),
    ]


def wave24():
    """SPRITES record hygiene at the converged 360-epoch horizon:
    (a) second seed for the 0.01368 Titsias record; (b) a bf16 arm —
    bf16 was quality-matched at 90/180 ep and 1.36x faster, validate it
    at the record horizon."""
    def sprites_tit(expid, extra=()):
        cmd = _sprites_full_cmd(expid, ["--elbo", "SVGPVAE_Titsias",
                                        "--opt_regime", "joint-360",
                                        *extra])
        return (expid, [a for a in cmd if a != "--GECO"], 3600, {})

    return [
        sprites_tit("tit_360ep_entropy_s1", ("--seed", "1")),
        sprites_tit("tit_360ep_entropy_bf16", ("--bf16",)),
    ]


def wave25():
    """Exploit the new --lr_decay lever on the three standing records:
    MNIST Titsias 32k (0.02527), SPRITES Titsias 360ep (0.01368), and
    the deep-SVIGP ceiling (0.02280 @8k).  All three plateaued under
    constant lr; cosine decay is the standard way to buy the last bit
    of convergence."""
    def tit(expid, epochs, timeout, extra=()):
        j = mnist_job(expid, ["--elbo", "SVGPVAE_Titsias",
                              "--epoch_chunk", "50", *extra],
                      epochs=epochs, timeout=timeout, eval_every=800)
        return (j[0], [a for a in j[1] if a != "--GECO"], j[2], {})

    def sprites_tit(expid, extra=()):
        cmd = _sprites_full_cmd(expid, ["--elbo", "SVGPVAE_Titsias",
                                        "--opt_regime", "joint-360",
                                        *extra])
        return (expid, [a for a in cmd if a != "--GECO"], 3600, {})

    py = sys.executable
    return [
        tit("tit_32k_lrd01", 32000, 9000, ("--lr_decay", "0.1")),
        tit("tit_32k_lrd001", 32000, 9000, ("--lr_decay", "0.01")),
        sprites_tit("tit_360_lrd01", ("--lr_decay", "0.1")),
        ("svigp_8k_lrd01", [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                            "SVIGP_Hensman", "--ip_joint", "--GP_joint",
                            "--ov_joint", "--clip_qs", "--PCA",
                            "--mnist_data_path", MNIST, "--nr_epochs",
                            "8000", "--eval_every", "400", "--lr_decay",
                            "0.1", "--base_dir", "/tmp/mnist_tpu",
                            "--expid", "svigp_8k_lrd01"], 3600, {}),
        ("ball_tit_lrd01",
         [py, "-m", "svgpvae_tpu.cli.ball", "--elbo", "SVGPVAE_Titsias",
          "--clip_qs", "--steps", "25000", "--eval_every", "5000",
          "--lr_decay", "0.1", "--base_dir", "/tmp/ball_tpu",
          "--expid", "ball_tit_lrd01"], 1500, {}),
    ]


def wave26():
    """The SVIGP runner gained --epoch_chunk (commit bc21bf2).  Wave-23's
    16k-epoch run spent 1951 s at a driver-apparent 3.9 ms/step — almost
    all per-epoch tunnel readback (15-batch epochs).  (1) re-run 16k
    chunked for the wall + quality-equivalence comparison; (2) extend the
    decoder-only ceiling line to 32k epochs now that it is affordable."""
    py = sys.executable

    def svigp(expid, epochs, timeout):
        return (expid,
                [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
                 "SVIGP_Hensman", "--ip_joint", "--GP_joint", "--ov_joint",
                 "--clip_qs", "--PCA", "--mnist_data_path", MNIST,
                 "--nr_epochs", str(epochs), "--eval_every", "800",
                 "--epoch_chunk", "50", "--base_dir", "/tmp/mnist_tpu",
                 "--expid", expid], timeout, {})

    return [
        svigp("svigp_16k_chunk50", 16000, 2400),
        svigp("svigp_32k_chunk50", 32000, 4200),
    ]


def wave27():
    """Converged-horizon completeness: (1) SPRITES Hensman+GECO at the
    360-epoch horizon where Titsias converged (0.01368/0.01398) — two
    seeds, since the Hensman family showed ~35% run spread at 180 ep —
    so the SPRITES family ordering is converged-vs-converged; (2) ball
    horizon extension to 100k steps (4x canonical) for both bounds under
    their record configs (~25 s train each at ~4600 steps/s)."""
    py = sys.executable

    def ball(expid, elbo, extra=()):
        return (expid,
                [py, "-m", "svgpvae_tpu.cli.ball", "--elbo", elbo,
                 "--clip_qs", "--steps", "100000", "--eval_every",
                 "10000", "--base_dir", "/tmp/ball_tpu",
                 "--expid", expid, *extra], 900, {})

    return [
        ("hens_360",
         _sprites_full_cmd("hens_360", ["--opt_regime", "joint-360"]),
         3600, {}),
        ("hens_360_s1",
         _sprites_full_cmd("hens_360_s1", ["--opt_regime", "joint-360",
                                           "--seed", "1"]),
         3600, {}),
        ball("ball_hens_entropy_100k", "SVGPVAE_Hensman",
             ("--entropy_ce",)),
        ball("ball_tit_100k", "SVGPVAE_Titsias"),
    ]


def wave28():
    """Wave-27 found every arm still improving at its horizon: SPRITES
    Hensman 360ep peaked at epochs 359/349 (0.01383/0.01185 — the latter
    a new overall record) and ball 100k beat 25k by ~5% (6.376/6.380).
    Extend: SPRITES 540ep (both Hensman seeds + a Titsias fairness arm),
    ball 250k steps, then a full bench.py refresh on the quiet chip so
    BENCH_LAST_GOOD includes the new svigp_train line."""
    py = sys.executable

    def ball(expid, elbo, extra=()):
        return (expid,
                [py, "-m", "svgpvae_tpu.cli.ball", "--elbo", elbo,
                 "--clip_qs", "--steps", "250000", "--eval_every",
                 "25000", "--base_dir", "/tmp/ball_tpu",
                 "--expid", expid, *extra], 1200, {})

    def sprites(expid, extra=()):
        return (expid,
                _sprites_full_cmd(expid, ["--opt_regime", "joint-540",
                                          *extra]), 5400, {})

    def sprites_tit(expid, extra=()):
        cmd = _sprites_full_cmd(expid, ["--elbo", "SVGPVAE_Titsias",
                                        "--opt_regime", "joint-540",
                                        *extra])
        return (expid, [a for a in cmd if a != "--GECO"], 5400, {})

    return [
        sprites("hens_540"),
        sprites("hens_540_s1", ("--seed", "1")),
        sprites_tit("tit_540"),
        ball("ball_hens_entropy_250k", "SVGPVAE_Hensman",
             ("--entropy_ce",)),
        ball("ball_tit_250k", "SVGPVAE_Titsias"),
        ("bench_refresh", [py, os.path.join(ROOT, "bench.py")], 3000, {}),
    ]


def wave29():
    """MNIST converged-vs-converged follow-up to the wave-27 SPRITES
    finding (Hensman matches/beats Titsias once given the budget it
    needs): (1) Hensman+GECO at 32k epochs — its 8k 'plateau' (0.02806,
    flat 4k->8k at kappa^2 0.020/0.016) may be another horizon artifact;
    run both kappa^2 values.  (2) Titsias + GECO under the entropy
    objective — the records (0.02527) train unconstrained; GECO's recon
    constraint is what pushed Hensman from 0.033 to 0.028."""
    def mn(expid, extra=()):
        j = mnist_job(expid, ["--epoch_chunk", "50", *extra],
                      epochs=32000, timeout=9000, eval_every=800)
        return j + ({},)

    def tit(expid, extra=()):
        j = mnist_job(expid, ["--elbo", "SVGPVAE_Titsias",
                              "--epoch_chunk", "50", *extra],
                      epochs=32000, timeout=9000, eval_every=800)
        return j + ({},)  # keeps --GECO (unlike the record runs)

    return [
        mn("hens_32k"),
        mn("hens_32k_k016", ("--kappa_squared", "0.016")),
        tit("tit_32k_geco"),
    ]


def wave30():
    """Follow-ups to the wave-29 record (Hensman kappa^2 0.016 x 32k =
    0.02512, new best amortized MNIST): (1) seed-1 confirm (the MNIST
    Hensman seed band is ~2-3%); (2) kappa^2 0.012 — does tightening
    keep paying at the converged horizon (0.020 -> 0.016 bought 5.5%)?
    (3) transfer to SPRITES: its kappa^2 default is 0.0075; run a
    tightened 0.006 arm x2 seeds at the converged 360-epoch horizon
    (the family's run spread there is ~15%, so one seed is
    uninterpretable)."""
    def mn(expid, extra=()):
        j = mnist_job(expid, ["--epoch_chunk", "50", *extra],
                      epochs=32000, timeout=9000, eval_every=800)
        return j + ({},)

    def sp(expid, extra=()):
        return (expid,
                _sprites_full_cmd(expid, ["--opt_regime", "joint-360",
                                          *extra]), 5400, {})

    return [
        mn("hens_32k_k016_s1", ("--kappa_squared", "0.016",
                                "--seed", "1")),
        mn("hens_32k_k012", ("--kappa_squared", "0.012")),
        sp("sp_360_k006", ("--kappa_squared", "0.006")),
        sp("sp_360_k006_s1", ("--kappa_squared", "0.006",
                              "--seed", "1")),
    ]


def wave31():
    """Statistical close-out of the standing records (both are best-of-2
    with measured ~4%/15% seed bands): (1) SPRITES Hensman 360ep seeds
    2+3 — the 0.01185 record is a single-seed draw; (2) MNIST Hensman
    kappa^2 0.016 x 32k seed 2 — third seed for the headline; (3) the
    one missing bf16 arm: Hensman+GECO `--bf16` at the SPRITES converged
    horizon (Titsias bf16 plateaued ~8% above f32 there; does the same
    noise floor bind for Hensman?)."""
    def mn(expid, extra=()):
        j = mnist_job(expid, ["--epoch_chunk", "50", *extra],
                      epochs=32000, timeout=9000, eval_every=800)
        return j + ({},)

    def sp(expid, extra=()):
        return (expid,
                _sprites_full_cmd(expid, ["--opt_regime", "joint-360",
                                          *extra]), 5400, {})

    return [
        sp("hens_360_s2", ("--seed", "2")),
        sp("hens_360_s3", ("--seed", "3")),
        mn("hens_32k_k016_s2", ("--kappa_squared", "0.016",
                                "--seed", "2")),
        sp("hens_360_bf16", ("--bf16",)),
    ]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wave", type=int, required=True)
    p.add_argument("--only", type=str, default=None)
    p.add_argument("--skip", type=str, default="")
    args = p.parse_args()

    jobs = {1: wave1, 2: wave2, 3: wave3, 4: wave4, 5: wave5,
            6: wave6, 7: wave7, 8: wave8, 9: wave9,
            10: wave10, 11: wave11, 12: wave12, 13: wave13,
            14: wave14, 15: wave15, 16: wave16, 17: wave17,
            18: wave18, 19: wave19, 20: wave20,
            21: wave21, 22: wave22, 23: wave23, 24: wave24,
            25: wave25, 26: wave26, 27: wave27,
            28: wave28, 29: wave29, 30: wave30, 31: wave31}[args.wave]()
    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()
    for job in jobs:
        name, cmd, timeout = job[:3]
        extra_env = job[3] if len(job) > 3 else None
        if (only and name not in only) or name in skip:
            continue
        run(name, cmd, timeout, extra_env)


if __name__ == "__main__":
    main()
