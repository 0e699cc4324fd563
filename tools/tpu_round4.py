"""Round-4 one-process TPU work queue (one chip, one process at a time;
the tunnel wedges if two processes claim it or one is hard-killed —
see CLAUDE.md).  Reuses the graceful runner from tools/tpu_round3.py.

Wave 1 — Pearce inversion evidence (VERDICT r4... r3 item 2) + the
  SPRITES backward profile (item 3): the CPU diagnostic showed Pearce's
  trajectory MSE still falling steeply at 3k steps (1074 -> 143), so the
  25k-step budget is the prime suspect; arms probe budget, seed,
  --entropy_ce on the Pearce CE slot, and --GP_joint (per-channel
  trainable length scales, new this round).

Wave 2 — Casale converged-gap levers (item 4): alpha/noise trajectory
  logging rides the driver's per-5-epoch GP-params print; arms probe the
  softplus alpha reparameterization, GP-phase lr, and joint lr.

Wave 3 — SPRITES quality gates for whichever backward lever won
  (bf16_hybrid and/or remat), at the 30-epoch gate first, then 360.

Usage: python tools/tpu_round4.py --wave N [--only NAME,..] [--skip ..]
Logs: /tmp/r04_logs/<name>.log
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

# round-4 log dir (tpu_round3.run writes to its LOGDIR; repoint it)
import tpu_round3  # noqa: E402
tpu_round3.LOGDIR = "/tmp/r04_logs"


def ball_job(expid, extra, elbo="GPVAE_Pearce", steps=25000, timeout=1800):
    py = sys.executable
    cmd = [py, "-m", "svgpvae_tpu.cli.ball", "--elbo", elbo,
           "--steps", str(steps), "--eval_every", "5000",
           "--base_dir", "/tmp/ball_tpu", "--expid", expid, *extra]
    return (expid, cmd, timeout)


def casale_job(expid, extra, regime=("VAE-100", "GP-100", "joint-600"),
               timeout=3600):
    py = sys.executable
    cmd = [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo", "GPVAE_Casale",
           "--GP_joint", "--ov_joint", "--clip_qs", "--PCA",
           "--mnist_data_path", MNIST, "--opt_regime", *regime,
           "--base_dir", "/tmp/mnist_tpu", "--expid", expid, *extra]
    return (expid, cmd, timeout)


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


def wave1():
    py = sys.executable
    return [
        # SPRITES backward decomposition + levers (bf16_hybrid, remat,
        # conv-transpose probe, per-resolution conv table)
        ("sprites_profile",
         [py, os.path.join(ROOT, "tools", "profile_step.py"),
          "--workload", "sprites"], 2400),
        # Pearce arms.  Baseline reproduce (round-1 record: 26.7 @25k)
        ball_job("pearce_25k", []),
        # budget hypothesis: CPU diagnostic still falling steeply at 3k
        ball_job("pearce_100k", [], steps=100000, timeout=3000),
        ball_job("pearce_250k", [], steps=250000, timeout=4200),
        # entropy CE on the Pearce CE slot (VERDICT suggestion)
        ball_job("pearce_ent_25k", ["--entropy_ce"]),
        ball_job("pearce_ent_100k", ["--entropy_ce"], steps=100000,
                 timeout=3000),
        # per-channel trainable length scales (reference GP_joint path)
        ball_job("pearce_gpj_25k", ["--GP_joint"]),
        # seed sensitivity
        ball_job("pearce_s1_25k", ["--seed", "1"]),
    ]


def wave2():
    py = sys.executable
    return [
        # fused upsample+conv decoder probe (added after wave 1): exact
        # rewrite, measured head-to-head in the same profile run
        ("sprites_profile_fusedup",
         [py, os.path.join(ROOT, "tools", "profile_step.py"),
          "--workload", "sprites"], 2400),
        # alpha/noise trajectory at the best known Casale budget
        # (wave-18 record 0.03642 at VAE-100 GP-100 joint-1400); the
        # driver prints alpha_raw + effective noise every 5 epochs
        casale_job("cas_clamp_1400", [],
                   regime=("VAE-100", "GP-100", "joint-1400"),
                   timeout=5400),
        casale_job("cas_softplus_1400", ["--casale_alpha_softplus"],
                   regime=("VAE-100", "GP-100", "joint-1400"),
                   timeout=5400),
        # GP-phase lr sweep at the shorter 800-epoch budget
        casale_job("cas_gplr003", ["--lr_gp", "0.003"]),
        casale_job("cas_gplr03", ["--lr_gp", "0.03"]),
        # joint-phase lr
        casale_job("cas_lrj0003", ["--lr_joint", "0.003"]),
        # denser regime interleave: alternate GP/joint after the warm-up
        casale_job("cas_interleave",
                   [], regime=("VAE-100", "GP-100", "joint-100", "GP-50",
                               "joint-100", "GP-50", "joint-300")),
    ]


def wave4():
    return [
        # alpha ceiling arms at the record Casale budget (wave-18 record
        # 0.03642 at VAE-100 GP-100 joint-1400): wave-2 trajectory logging
        # showed the free noise drifting 0.1 -> 17+ with GP SNR pinned
        # ~0.2 while cgen stalls at ~0.039 — cap the ridge and measure
        casale_job("cas_amax1", ["--casale_alpha_max", "1.0"],
                   regime=("VAE-100", "GP-100", "joint-1400"),
                   timeout=5400),
        casale_job("cas_amax03", ["--casale_alpha_max", "0.3"],
                   regime=("VAE-100", "GP-100", "joint-1400"),
                   timeout=5400),
        casale_job("cas_amax3", ["--casale_alpha_max", "3.0"],
                   regime=("VAE-100", "GP-100", "joint-1400"),
                   timeout=5400),
    ]


def wave5():
    py = sys.executable

    def mnist36_job(expid, extra, epochs=2000, timeout=3600):
        cmd = [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
               "SVGPVAE_Hensman", "--GECO", "--PCA", "--ip_joint",
               "--GP_joint", "--ov_joint", "--clip_qs",
               "--dataset", "13679", "--mnist_data_path",
               "/tmp/mnist36_data/", "--kappa_squared", "0.016",
               "--epoch_chunk", "50", "--opt_regime", f"joint-{epochs}",
               "--eval_every", "50", "--base_dir", "/tmp/mnist_tpu",
               "--expid", expid, *extra]
        return (expid, cmd, timeout)

    return [
        # refreshed component profiles: NCHW layout probes on SPRITES
        # (VERDICT r3 item 3's one unmeasured lever) + the MNIST profile
        # for PROFILE_r04 symmetry with round 3
        ("mnist_profile",
         [py, os.path.join(ROOT, "tools", "profile_step.py"),
          "--workload", "mnist"], 2400),
        ("sprites_profile_nchw",
         [py, os.path.join(ROOT, "tools", "profile_step.py"),
          "--workload", "sprites"], 2400),
        # Hensman family-instability diagnosis: identical 360-epoch
        # full-scale f32 runs (the wave-24/27 band shows same-seed
        # bimodality: 0.01185/0.01383 vs plateau draws at 0.02035).
        # Run dirs stream per-epoch ELBO components + lagrange_mult +
        # GP params; a plateau draw vs a record draw pins WHERE the
        # trajectories fork.
        sprites_job("sp_diag_a", [], epochs=360, timeout=2400),
        sprites_job("sp_diag_b", [], epochs=360, timeout=2400),
        sprites_job("sp_diag_c", ["--seed", "2"], epochs=360,
                    timeout=2400),
        # multi-digit converged-horizon records (current RECORDS row is
        # a single 200-epoch run): best single-digit config transferred
        mnist36_job("mnist36_k016_2k", []),
        mnist36_job("mnist36_k016_2k_s1", ["--seed", "1"]),
    ]


def wave6():
    return [
        # fused_rejitter_pallas on SPRITES: the rejittered (null-space-
        # safe) KL evaluated from the Pallas inverse stack.  wave-9 (r3)
        # showed fused_pallas at 8.38 ms vs 9.96 two-pass but with the
        # diverging identity KL; rejitter-chol was quality-correct but
        # speed-neutral (9.62).  This pairing is the remaining cell of
        # that matrix: quality gate at 30 ep + step timing, then the
        # converged 360-ep horizon.
        sprites_job("sp_frp_30", ["--gp_block_impl",
                                  "fused_rejitter_pallas"],
                    epochs=30, timeout=2400),
        sprites_job("sp_frp_360", ["--gp_block_impl",
                                   "fused_rejitter_pallas"],
                    epochs=360, timeout=7200),
    ]


def mnist36_job_w7(expid, extra, epochs=2000, timeout=3600):
    py = sys.executable
    cmd = [py, "-m", "svgpvae_tpu.cli.mnist", "--elbo",
           "SVGPVAE_Hensman", "--GECO", "--PCA", "--ip_joint",
           "--GP_joint", "--ov_joint", "--clip_qs",
           "--dataset", "13679", "--synthetic_digits",
           "--mnist_data_path", "/tmp/mnist36_data/",
           "--kappa_squared", "0.016", "--epoch_chunk", "50",
           "--opt_regime", f"joint-{epochs}", "--eval_every", "50",
           "--base_dir", "/tmp/mnist_tpu", "--expid", expid, *extra]
    return (expid, cmd, timeout)


def wave7():
    py = sys.executable
    return [
        # step-level gp_stats dispatch A/B (SVGPVAE_GP_STATS forced
        # modes inside the profile): the wave-5 standalone probe
        # contradicted the round-2 threshold measurement at n=256
        ("mnist_profile_ab",
         [py, os.path.join(ROOT, "tools", "profile_step.py"),
          "--workload", "mnist"], 2400),
        # multi-digit converged-horizon records, re-queued from wave 5
        # with the offline glyph source (--synthetic_digits; the shipped
        # eval pickle only covers digit 3)
        mnist36_job_w7("mnist36_k016_2k", []),
        mnist36_job_w7("mnist36_k016_2k_s1", ["--seed", "1"]),
    ]


def wave8():
    # Hensman f32 plateau root-cause arms.  Wave-5 diag: runs are
    # DETERMINISTIC per (code, config, seed) on the chip (diag_a/b
    # bit-identical) and the basin is decided BEFORE the main loop --
    # the f32 repr-net pretrain (40 epochs, canonical queue config)
    # lands in a worse optimum (loss 5.07 / test-acc 0.035) than the
    # bf16 one (4.49 / 0.081), and the f32 run starts at cgen 0.0206
    # and never descends (plateau attractor 0.02035) while the bf16
    # run descends from 0.0191 immediately.
    return [
        # (a) reference-scale pretrain (driver default 400 epochs):
        # does a properly-pretrained repr net put f32 seed-0 in the
        # good basin at the converged horizon?
        sprites_job("sp_pre400_s0",
                    ["--save", "--nr_epochs_repr_nn", "400"],
                    epochs=360, timeout=3600),
        # (b) plateau draw WITH CSVs (GECO/GP streams for the writeup)
        sprites_job("sp_save_s0", ["--save"], epochs=180, timeout=2400),
        # (c) does the wave-27 seed-1 record (0.01185) reproduce under
        # current code with the canonical 40-epoch pretrain?
        sprites_job("sp_s1_repro", ["--seed", "1"], epochs=360,
                    timeout=3600),
    ]


def wave9():
    # (a) fused_rejitter_pallas converged gate, re-queued after the
    # wave-6 transient remote_compile tunnel crash (30-ep gate passed:
    # 8.16 ms/step, cgen 0.01645 — RESULTS.md r4).
    # (b) multi-digit dense-eval horizon: wave 7 found best cgen at the
    # FIRST eval (ep 49 of 2000, both seeds) — resolve the true minimum
    # with per-5-epoch evals on a short budget, plus a default-kappa arm
    # (is the early overfit a GECO-target artifact of kappa^2=0.016,
    # tuned on single-digit N=4050, at N=20250?).
    return [
        sprites_job("sp_frp_360_r", ["--gp_block_impl",
                                     "fused_rejitter_pallas"],
                    epochs=360, timeout=7200),
        mnist36_job_w7("mnist36_dense", ["--eval_every", "5",
                                         "--epoch_chunk", "5"],
                       epochs=200, timeout=2400),
        mnist36_job_w7("mnist36_dense_s1", ["--eval_every", "5",
                                            "--epoch_chunk", "5",
                                            "--seed", "1"],
                       epochs=200, timeout=2400),
        mnist36_job_w7("mnist36_dense_kdef", ["--eval_every", "5",
                                              "--epoch_chunk", "5",
                                              "--kappa_squared", "0.020"],
                       epochs=200, timeout=2400),
    ]


def wave10():
    # SPRITES Hensman basin assignment: decisive arms under ONE code
    # version.  Background (RESULTS.md r4): sp_diag_b (seed 0, joint-360,
    # no --save) plateaued at 0.02035 while sp_save_s0 (seed 0,
    # joint-180, --save) descended to 0.01546 — but the two ran waves
    # apart.  The eval/save path never mutates TrainState (cli/sprites.py
    # main loop) so under one binary the first 180 epochs must match;
    # these arms separate (code drift) x (regime length) x (--save) x
    # (sampling stream vs inits) in one back-to-back sweep.
    # Ordered by decisiveness (the end-of-round stop file may cut the
    # tail): the control replication first, then the inits-vs-noise arm,
    # then the --save and regime-length confound arms.
    return [
        # plateau replication under current code (control)
        sprites_job("sp_w10_s0_360", [], epochs=360, timeout=3600),
        # inits-vs-noise: same inits + pretrain (seed 0), different
        # main-loop sampling stream (--main_seed, commit 640475f)
        sprites_job("sp_w10_s0_ms7", ["--main_seed", "7"], epochs=360,
                    timeout=3600),
        # does --save alone flip it?
        sprites_job("sp_w10_s0_360_sv", ["--save"], epochs=360,
                    timeout=3600),
        # does regime length alone flip the basin?  (same code as control)
        sprites_job("sp_w10_s0_180", [], epochs=180, timeout=2400),
        sprites_job("sp_w10_s0_ms11", ["--main_seed", "11"], epochs=360,
                    timeout=3600),
    ]


def wave11():
    # space-to-depth 64x64 conv rewrite (nn.S2DConv3x3, --s2d64): the
    # round-4 backward profile put ~3.6 ms of the 10.3 ms SPRITES step
    # in the three 64x64 16-channel convs (16/128 MXU lanes over the
    # largest pixel count); s2d computes them at 32x32 with 4x channels.
    # Exact rewrite, same parameter tree (tests/test_nn.py parity).
    # (a) on-chip component + full-step probes (profile_step s2d section),
    # (b) 30-epoch driver gates: s2d alone, s2d+bf16 compose.
    py = sys.executable
    return [
        ("sprites_profile_s2d",
         [py, os.path.join(ROOT, "tools", "profile_step.py"),
          "--workload", "sprites"], 3000),
        sprites_job("sp_s2d_30", ["--s2d64"]),
        sprites_job("sp_s2d_bf16_30", ["--s2d64", "--bf16"]),
    ]


def wave12():
    # Compose the two validated SPRITES speed levers and gather the
    # multi-seed evidence the r4 RESULTS flagged for the round-5 default
    # flip.  Background: --gp_block_impl fused_rejitter_pallas is a
    # 1.15-1.17x step win with converged quality in-band (waves 6/9,
    # seed 0 only); --s2d64 is the one exact-f32 1.09x step win (wave
    # 11).  They attack disjoint components (GP block vs the 64x64
    # decoder/encoder convs), so they should compose to ~1.25x.
    # Ordered by decisiveness for an end-of-session cut:
    return [
        # (a) combined 30-ep gate: step p50 + quality in-band
        sprites_job("sp_frps2d_30", ["--gp_block_impl",
                                     "fused_rejitter_pallas", "--s2d64"]),
        # (b) frp default-flip evidence: converged 360-ep on a 2nd seed
        sprites_job("sp_frp_360_s1", ["--gp_block_impl",
                                      "fused_rejitter_pallas",
                                      "--seed", "1"],
                    epochs=360, timeout=7200),
        # (c) combined converged 360-ep (record-wall attempt, seed 1 —
        # the wave-27 record seed)
        sprites_job("sp_frps2d_360_s1", ["--gp_block_impl",
                                         "fused_rejitter_pallas",
                                         "--s2d64", "--seed", "1"],
                    epochs=360, timeout=7200),
    ]


def wave3():
    return [
        # bf16_hybrid quality gates at full reference scale
        sprites_job("sp_hybrid_30", ["--bf16_hybrid"]),
        sprites_job("sp_hybrid_360", ["--bf16_hybrid"], epochs=360,
                    timeout=7200),
        sprites_job("sp_bf16_360_ctl", ["--bf16"], epochs=360,
                    timeout=7200),
    ]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wave", type=int, required=True)
    p.add_argument("--only", type=str, default=None)
    p.add_argument("--skip", type=str, default="")
    args = p.parse_args()

    jobs = {1: wave1, 2: wave2, 3: wave3, 4: wave4, 5: wave5, 6: wave6,
            7: wave7, 8: wave8, 9: wave9, 10: wave10,
            11: wave11, 12: wave12}[args.wave]()
    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()
    for job in jobs:
        name, cmd, timeout = job[:3]
        extra_env = job[3] if len(job) > 3 else None
        if (only and name not in only) or name in skip:
            continue
        # end-of-round cut: touch /tmp/r04_stop to finish the current job
        # and skip the rest (jobs never see a signal mid-device-call)
        if os.path.exists("/tmp/r04_stop"):
            print(f":: stop file present; skipping {name} and the rest",
                  flush=True)
            break
        run(name, cmd, timeout, extra_env)


if __name__ == "__main__":
    main()
