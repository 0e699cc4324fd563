"""Moving-ball experiment driver.

CLI-compatible rebuild of the reference driver (BALL_experiment.py:21-334):
ELBO families GPVAE_Pearce | VAE | NP | SVGPVAE_Hensman | SVGPVAE_Titsias,
batch 35 videos of tmax frames, step-based Adam loop with fresh on-device
video batches every step, eval every 1000 steps on fixed pickled test
batches (test ELBO terms + MSE via affine alignment), latent plots every
10000, checkpoint + preds every 50000, restore-on-start.

Run:  python -m svgpvae_tpu.cli.ball --elbo VAE            (smoke test)
      python -m svgpvae_tpu.cli.ball --elbo SVGPVAE_Hensman --clip_qs
"""

from __future__ import annotations

import argparse
import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from svgpvae_tpu import data, models, train, utils
from svgpvae_tpu import nn as nets
from svgpvae_tpu.gp.svgp import SVGPConfig, init_ball_svgp
from svgpvae_tpu.utils import plots


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Moving ball experiment")
    p.add_argument("--steps", type=int, default=25000)
    p.add_argument("--lr_decay", type=float, default=None,
                   help="cosine-decay the lr to lr*LR_DECAY over --steps. "
                        "Off (constant lr, reference semantics) when "
                        "unset.")
    p.add_argument("--beta0", type=float, default=1.0)
    p.add_argument("--elbo", type=str, default="GPVAE_Pearce",
                   choices=["GPVAE_Pearce", "VAE", "NP", "SVGPVAE_Hensman",
                            "SVGPVAE_Titsias"])
    p.add_argument("--modellt", type=float, default=2.0)
    p.add_argument("--base_dir", type=str, default=os.getcwd())
    p.add_argument("--expid", type=str, default="debug")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--tmax", type=int, default=30)
    p.add_argument("--m", type=int, default=15)
    p.add_argument("--GP_joint", action="store_true")
    p.add_argument("--ip_joint", action="store_true")
    p.add_argument("--clip_qs", action="store_true")
    p.add_argument("--show_pics", action="store_true")
    p.add_argument("--save", action="store_true")
    p.add_argument("--squares_circles", action="store_true")
    p.add_argument("--ip_min", type=float, default=1.0)
    p.add_argument("--ip_max", type=float, default=30.0)
    p.add_argument("--jitter", type=float, default=1e-9)
    p.add_argument("--gp_block_impl", type=str, default="auto",
                   choices=["reference", "fused", "fused_pallas", "auto"],
                   help="Hensman GP block: two-pass reference path, fused "
                        "one-pass (gp/fused.py ball_gp_block), fused + "
                        "Pallas inverse megakernel, or auto (fused_pallas "
                        "on TPU, reference elsewhere)")
    p.add_argument("--titsias_reference_ce", action="store_true",
                   help="restore the reference's encoder cross-entropy CE term for\n                   Titsias configs (PARITY.md #13: it rewards encoder-posterior\n                   divergence and measurably diverges; default uses the exact\n                   sampling-distribution entropy)")
    p.add_argument("--entropy_ce", action="store_true",
                   help="exact sampling-distribution entropy CE term for ANY family\n                   (Titsias default; opt-in experiment for Hensman, PARITY.md #13)")
    p.add_argument("--clip_grad", action="store_true")
    p.add_argument("--vidlt", type=float, default=2.0)
    p.add_argument("--GP_init", type=float, default=2.0)
    p.add_argument("--full_cholesky", action="store_true",
                   help="encoder emits per-frame full-Cholesky rows "
                        "(reference: VAE_utils.py:39-47); the ELBOs consume "
                        "the implied marginal variances")
    # runtime extensions (not in the reference)
    p.add_argument("--eval_every", type=int, default=1000)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of one post-warmup "
                        "training chunk to this directory")
    p.add_argument("--plot_every", type=int, default=10000)
    p.add_argument("--ckpt_every", type=int, default=50000)
    p.add_argument("--resume_dir", type=str, default=None,
                   help="existing run dir to resume into (restores the full "
                        "TrainState from its ckpt/ and keeps appending)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="train data-parallel over this many devices "
                        "(-1 = all): parameters replicated, the on-device-"
                        "generated video batch sharded over the mesh data "
                        "axis inside the sample->train chunk program.  "
                        "Requires 35 %% devices == 0 (batch is the "
                        "reference's fixed 35) — 5 or 7.  0 disables.")
    return p


def run_experiment(args) -> dict:
    args.gp_block_impl = models.resolve_gp_block_impl(
        args.gp_block_impl, workload="ball",
        titsias=args.elbo == "SVGPVAE_Titsias",
        data_parallel=bool(getattr(args, "data_parallel", 0)))
    batch, px, py, r = 35, 32, 32, 3.0
    tmax = args.tmax
    model_lt = 0.001 if args.elbo == "VAE" else args.modellt
    assert (model_lt == args.vidlt or args.GP_joint or args.elbo == "VAE"), \
        "model/data GP length scales must match unless jointly optimized"

    run_dir = None
    if args.resume_dir:
        run_dir = args.resume_dir
        print(f"resuming into: {run_dir}")
    elif args.save:
        run_dir = utils.make_checkpoint_folder(
            args.base_dir, args.expid, f"{args.elbo}_{args.beta0}")
        utils.dump_args(run_dir, args)
        print(f"checkpoint dir: {run_dir}")

    # fixed reproducible test batches, cached next to the experiment
    cache = os.path.join(args.base_dir,
                         f"Test_Batches_{args.vidlt}_{tmax}.pkl")
    if os.path.isfile(cache):
        with open(cache, "rb") as f:
            test_batches = pickle.load(f)
    else:
        test_batches = data.make_test_batches(10, tmax=tmax, px=px, py=py,
                                              lt=args.vidlt, batch=batch,
                                              r=r)
        os.makedirs(args.base_dir, exist_ok=True)
        with open(cache, "wb") as f:
            pickle.dump(test_batches, f)

    key = jax.random.PRNGKey(0 if args.seed is None else args.seed)
    key, init_key = jax.random.split(key)

    encoder = nets.BallEncoder(full_cholesky=args.full_cholesky)
    decoder = nets.BallDecoder(px=px, py=py)
    dummy_vids = jnp.zeros((batch, tmax, px, py))
    enc_params = encoder.init(init_key, dummy_vids)
    dec_params = decoder.init(init_key, jnp.zeros((batch, tmax, 2)))
    params = {"enc": enc_params, "dec": dec_params}

    is_svgpvae = "SVGPVAE" in args.elbo
    if is_svgpvae:
        cfg = SVGPConfig(titsias="Titsias" in args.elbo, jitter=args.jitter)
        gp = init_ball_svgp(
            args.m,
            tmin=args.ip_min if args.ip_joint else 1.0,
            tmax=args.ip_max if args.ip_joint else float(tmax),
            length_scale_init=args.GP_init if args.GP_joint else args.vidlt)
        gp = gp.replace(config=cfg)
        params["gp"] = gp
    elif args.GP_joint and args.elbo != "VAE":
        # Pearce/NP exact-GP length scales, one trainable per latent
        # channel (reference: GPVAE_Pearce_model.py:36-42 creates an
        # l_GP variable per build_1d_gp call, init GP_init)
        params["gp"] = {
            "length_scale_x": jnp.asarray(args.GP_init, jnp.float32),
            "length_scale_y": jnp.asarray(args.GP_init, jnp.float32)}

    def trainable(path, leaf):
        name = jax.tree_util.keystr(path)
        if "inducing_points" in name:
            return args.ip_joint
        if "length_scale" in name:
            return args.GP_joint
        return True

    mask = train.trainable_mask(params, trainable)
    print(f"trainable parameters: {utils.count_params(params)}")
    tx = train.make_optimizer(
        train.lr_schedule(1e-3, args.lr_decay, args.steps),
        mask=mask if is_svgpvae else None,
        clip_grad_value=1e5 if args.clip_grad else None)

    def outputs_fn(params, vids, key, beta):
        if is_svgpvae:
            return models.ball_svgpvae_elbo(
                encoder, params["enc"], decoder, params["dec"],
                params["gp"], vids, beta, key, clip_qs=args.clip_qs,
                gp_block_impl=args.gp_block_impl,
                titsias_reference_ce=args.titsias_reference_ce,
                entropy_ce=args.entropy_ce)
        ls = ((params["gp"]["length_scale_x"],
               params["gp"]["length_scale_y"])
              if "gp" in params else model_lt)
        return models.pearce_elbo(
            encoder, params["enc"], decoder, params["dec"], vids, beta, key,
            ls, elbo_type=args.elbo, context_length_scale=model_lt,
            entropy_ce=args.entropy_ce)

    def loss_fn(params, vids, key, geco, step):
        out = outputs_fn(params, vids, key, args.beta0)
        metrics = {"elbo": jnp.mean(out.elbo), "recon": jnp.mean(out.recon),
                   "prior_kl": jnp.mean(out.prior_kl)}
        return -jnp.mean(out.elbo), (geco, metrics)

    state = train.TrainState.create(params, tx, key)
    ckpt_dir = os.path.join(run_dir, "ckpt") if run_dir else None
    if ckpt_dir and utils.latest_step(ckpt_dir) is not None:
        state = utils.restore_checkpoint(ckpt_dir, state)
        print(f"restored checkpoint at step {int(state.step)}")

    video_fn = data.make_video_batch_fn(tmax=tmax, px=px, py=py,
                                        lt=args.vidlt, batch=batch, r=r)

    # --data_parallel: state replicated; the generated batch is pinned to
    # the mesh's data axis with a sharding constraint INSIDE the chunk
    # program, so every scanned train step runs SPMD (videos are
    # device-generated — there is no host batch to shard)
    from svgpvae_tpu import parallel
    mesh = parallel.resolve_data_parallel(args.data_parallel, batch)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        print(f"data-parallel training over {mesh.devices.size} devices")
        state = parallel.replicate(mesh, state)
        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
        base_video_fn = video_fn

        def video_fn(key):  # noqa: F811 — sharded wrapper
            return jax.lax.with_sharding_constraint(base_video_fn(key),
                                                    batch_sharding)

    # run sample->train chunks as single XLA programs (per-step dispatch
    # through the device link costs ~3 round-trips/step otherwise)
    import math
    cadence_gcd = math.gcd(args.eval_every,
                           math.gcd(args.plot_every, args.ckpt_every))
    chunk = max(d for d in range(1, min(cadence_gcd, 500) + 1)
                if cadence_gcd % d == 0)
    chunk_fn = train.make_generative_chunk_fn(loss_fn, tx, video_fn, chunk,
                                              donate=False)

    @jax.jit
    def eval_fn(params, vids, key):
        return outputs_fn(params, vids, key, 1.0)

    saver = None
    gp_saver = None
    if run_dir:
        cols = ["step", "loss", "elbo", "recon", "prior_kl", "min_qv",
                "max_qv", "min_pv", "max_pv", "inside_elbo", "ce_term",
                "MSE", "beta", "time"]
        saver = utils.ResultSaver(os.path.join(run_dir, "res",
                                               "ELBO_results.csv"), cols)
        if is_svgpvae:
            # GP hyperparameter stream (the reference exposes these via
            # SVGP.variable_summary, SVGPVAE_model.py:372-379; the ball
            # arrays are small enough to inline per row)
            gp_saver = utils.ResultSaver(
                os.path.join(run_dir, "res", "GP_params.csv"),
                ["step", "length_scale", "ip_norm", "inducing_points"])

    data_key = jax.random.PRNGKey(1234 if args.seed is None else args.seed + 1)
    eval_key = jax.random.PRNGKey(99)
    tt0, td0 = test_batches[0]
    td0 = jnp.asarray(td0, jnp.float32)
    last_mse = float("nan")
    t_start = time.time()

    start = int(state.step)
    g_s = start
    # chunk-level wall timing (materializes one scalar per chunk — ~0.1%
    # of a 100-step chunk; the first, compiling chunk is excluded)
    timer = utils.StepTimer(steps_per_block=chunk)
    chunks_done = 0
    while g_s < args.steps:
        n = min(chunk, args.steps - g_s)
        if n == chunk:
            trace = utils.trace_if(args.profile_dir or "",
                                   enabled=bool(args.profile_dir)
                                   and chunks_done == 1)
            if chunks_done == 0:
                state, data_key, metrics = chunk_fn(state, data_key)
                # materialize so the warmup chunk's execution doesn't
                # bleed into the first timed/traced chunk
                float(metrics["loss"][-1])
            else:
                with trace, timer:
                    state, data_key, metrics = chunk_fn(state, data_key)
                    float(metrics["loss"][-1])
            chunks_done += 1
        else:  # tail smaller than a chunk: one-off jit at length n
            tail_fn = train.make_generative_chunk_fn(loss_fn, tx, video_fn,
                                                     n, donate=False)
            state, data_key, metrics = tail_fn(state, data_key)
        g_s += n

        if g_s % args.eval_every == 0:
            out = eval_fn(state.params, td0, eval_key)
            utils.check_finite([float(jnp.mean(out.elbo))], g_s, state,
                               run_dir)
            _, _, mse, _ = utils.mse_rotation(np.asarray(out.p_m), tt0,
                                              np.asarray(out.p_v))
            last_mse = mse
            print(f"{g_s}: elbo {float(jnp.mean(out.elbo)):.3f} "
                  f"recon {float(jnp.mean(out.recon)):.3f} "
                  f"priorKL {float(jnp.mean(out.prior_kl)):.3f} MSE {mse:.4f}")
            if is_svgpvae:
                print(f"   inside-ELBO {float(jnp.mean(out.inside_elbo)):.3f}"
                      f" CE {float(jnp.mean(out.ce_term)):.3f}")
            if saver:
                saver([g_s, -float(jnp.mean(out.elbo)),
                       float(jnp.mean(out.elbo)), float(jnp.mean(out.recon)),
                       float(jnp.mean(out.prior_kl)),
                       float(out.qnet_var.min()), float(out.qnet_var.max()),
                       float(out.p_v.min()), float(out.p_v.max()),
                       float(jnp.mean(out.inside_elbo)),
                       float(jnp.mean(out.ce_term)),
                       mse, args.beta0, time.time()])
            if gp_saver:
                gp = state.params["gp"]
                gp_saver([g_s, np.asarray(gp.length_scale),
                          float(jnp.linalg.norm(gp.inducing_points)),
                          np.asarray(gp.inducing_points)])

        if run_dir and g_s % args.plot_every == 0:
            out = eval_fn(state.params, td0, eval_key)
            rp, W, mse, rv = utils.mse_rotation(np.asarray(out.p_m), tt0,
                                                np.asarray(out.p_v))
            plots.plot_latents(np.asarray(td0), tt0,
                               np.asarray(out.pred_vid), rp, rv,
                               save_path=os.path.join(
                                   run_dir, "pics", f"{g_s:06d}.png"))
            if args.squares_circles:
                for kind, maker in (("circles", data.make_circles),
                                    ("squares", data.make_squares)):
                    traj, vid_probe = maker(tmax=tmax)
                    probe_batch = jnp.asarray(
                        np.tile(vid_probe, (batch, 1, 1, 1)), jnp.float32)
                    probe_out = eval_fn(state.params, probe_batch, eval_key)
                    qm = np.asarray(probe_out.qnet_mu[0])
                    qm_aligned = np.hstack([qm, np.ones((tmax, 1))]) @ W
                    plots.plot_geometry_probe(
                        traj, qm_aligned, vid_probe, kind,
                        save_path=os.path.join(run_dir, "pics",
                                               f"{g_s:06d}_{kind}.png"))

        if run_dir and g_s % args.ckpt_every == 0:
            utils.save_checkpoint(ckpt_dir, state, g_s)
            out = eval_fn(state.params, td0, eval_key)
            rp, _, _, rv = utils.mse_rotation(np.asarray(out.p_m), tt0,
                                              np.asarray(out.p_v))
            preds = (np.asarray(td0), tt0, np.asarray(out.pred_vid), rp, rv)
            with open(os.path.join(run_dir, "preds",
                                   f"preds_{g_s}.p"), "wb") as f:
                pickle.dump(preds, f)
            print(f"model saved: {run_dir}")

    elapsed = time.time() - t_start
    steps_done = args.steps - start
    print(f"trained {steps_done} steps in {elapsed:.1f}s "
          f"({steps_done / max(elapsed, 1e-9):.2f} steps/s); "
          f"final MSE {last_mse:.4f}")
    print(f"train-step timing (excl. compile/eval): {timer.summary()}")
    if saver:
        saver.flush()
    if gp_saver:
        gp_saver.flush()
    if run_dir:
        utils.save_checkpoint(ckpt_dir, state, int(state.step))
    return {"mse": last_mse, "steps_per_sec": steps_done / max(elapsed, 1e-9),
            "state": state}


if __name__ == "__main__":
    run_experiment(build_parser().parse_args())
