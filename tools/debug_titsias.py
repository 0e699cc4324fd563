"""Localize the first NaN in the long-horizon Titsias MNIST run on TPU.

Replays the wave-10 failing config (`--elbo SVGPVAE_Titsias --PCA
--ip_joint --GP_joint --ov_joint --clip_qs --opt_regime joint-1000
--epoch_chunk 50`, seed 0) chunk by chunk with host snapshots of the
pre-chunk TrainState.  When a chunk's metrics go non-finite, restarts
from the last good state and replays per-step; at the first bad step it
recomputes the forward eagerly at the PRE-step params and prints the
per-channel spectrum of the Titsias covariance Q + diag(noise_l) in
float32 and float64, the encoder-variance range, kernel-parameter
magnitudes, and per-leaf gradient NaN counts — to identify whether the
f32 roundoff floor eps*lambda_max(cov) has crossed the absolute jitter
+ q-variance clip floor (the same mechanism as the round-2 Hensman
Sigma tail-batch NaN, RESULTS.md).  Diagnostic tool only.

POSTSCRIPT (the investigation's conclusion): the spectrum-collapse this
tool localizes turned out to be the SYMPTOM.  The root cause is an
objective-level degeneracy of the reference ELBO composition — its CE
term adds +KL(posterior || encoder) to the maximized objective, which
the collapsed Titsias bound cannot cancel (the Hensman bound does,
exactly).  See PARITY.md #13, RESULTS.md round 3, and
tests/test_fused_gp.py::test_titsias_objective_runaway_channel.  This
tool remains useful for localizing WHERE a trajectory leaves the good
basin.
"""

from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from svgpvae_tpu import data, linalg, models, train  # noqa: E402
from svgpvae_tpu import gp as gpm  # noqa: E402
from svgpvae_tpu import nn as nets  # noqa: E402
from svgpvae_tpu.cli import mnist as cli  # noqa: E402
from svgpvae_tpu.gp.svgp import SVGPConfig  # noqa: E402

CHUNK = 50
EPOCHS = 1000
IMPL = os.environ.get("DBG_GP_IMPL", "reference")


def host_snapshot(state):
    return jax.device_get(state)


def restore(snap):
    return jax.tree_util.tree_map(jnp.asarray, snap)


def cov_spectrum_report(gp, aux, noise, tag):
    """Per-channel Titsias covariance spectrum at the given params."""
    z = gp.inducing_points
    Kmm = gp.kmat(z, z)
    Kmm_chol = linalg.safe_cholesky(Kmm, gp.config.jitter)
    Knm = gp.kmat(aux, z, x_inducing=False)
    W = linalg.cho_solve(Kmm_chol, Knm.T)
    Q = np.asarray(Knm @ W, np.float64)
    noise_np = np.asarray(noise, np.float64)
    eps32 = np.finfo(np.float32).eps
    worst = []
    for ell in range(noise_np.shape[1]):
        cov = Q + np.diag(noise_np[:, ell])
        w = np.linalg.eigvalsh(cov)
        # would the f32 Cholesky of cov + jitter succeed?
        cov32 = (cov + gp.config.jitter * np.eye(cov.shape[0])).astype(
            np.float32)
        try:
            np.linalg.cholesky(cov32)
            ok32 = True
        except np.linalg.LinAlgError:
            ok32 = False
        worst.append((w[0], w[-1], eps32 * w[-1], ok32))
    worst_l = int(np.argmin([x[0] for x in worst]))
    lmin, lmax, floor, ok = worst[worst_l]
    print(f"  [{tag}] worst channel {worst_l}: lambda_min {lmin:.4e}, "
          f"lambda_max {lmax:.4e}, f32 floor eps*lmax {floor:.4e}, "
          f"jitter {gp.config.jitter:.1e}, np-f32 chol "
          f"{'ok' if ok else 'FAILS'}")
    n_fail = sum(1 for x in worst if not x[3])
    print(f"  [{tag}] channels whose f32 numpy Cholesky fails: "
          f"{n_fail}/{len(worst)}; "
          f"min over channels lambda_min {min(x[0] for x in worst):.4e}")
    return worst


def main():
    argv = ["--elbo", "SVGPVAE_Titsias", "--PCA", "--ip_joint", "--GP_joint",
            "--ov_joint", "--clip_qs", "--mnist_data_path", "/tmp/mnist_data/",
            "--opt_regime", "joint-1000", "--gp_block_impl", IMPL]
    args = cli.build_parser().parse_args(argv)
    args.opt_regime = ["joint-1000"]
    N_train = len(args.dataset) * 4050

    cli.ensure_dataset(args)
    train_d, _, _ = data.load_rotated_mnist(
        args.mnist_data_path, digits=args.dataset, M=args.M)

    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    vae = nets.MnistVAE(L=args.L)
    vae_params = vae.init(init_key, jnp.zeros((2, 28, 28, 1)))
    ip_init = data.generate_init_inducing_points(
        train_d, n=args.nr_inducing_points, use_pca=args.PCA, M=args.M,
        seed=args.seed)
    cfg = SVGPConfig(titsias=True, jitter=args.jitter, N_train=N_train)
    params = {"vae": vae_params,
              "gp": gpm.init_mnist_svgp(ip_init,
                                        cli.object_vectors_init(args),
                                        config=cfg)}
    kappa = float(np.sqrt(args.kappa_squared))

    def loss_svgpvae(params, batch, key, geco, step):
        out = models.forward_pass_svgpvae(
            vae, params["vae"], params["gp"], batch, key, beta=args.beta,
            C_ma=geco.C_ma, lagrange_mult=geco.lagrange_mult, alpha=args.alpha,
            kappa=kappa, clip_qs=True, geco=False,
            gp_block_impl=args.gp_block_impl)
        return -out.elbo, (geco, {"elbo": out.elbo, "recon": out.recon_loss})

    tx = train.make_optimizer(args.lr)
    state = train.TrainState.create(params, tx, key)
    multi = train.make_multi_epoch_fn(loss_svgpvae, tx, donate=False)
    step_fn = train.make_train_step(loss_svgpvae, tx, donate=False)

    full_batches = train.stack_batches(train_d, args.batch_size)
    n_full = full_batches[0].shape[0]
    tail_n = len(train_d["images"]) - n_full * args.batch_size
    tail_batch = None
    if tail_n:
        tail_batch = (jnp.asarray(train_d["images"][-tail_n:], jnp.float32),
                      jnp.asarray(train_d["aux_data"][-tail_n:], jnp.float32))

    print(f"impl={args.gp_block_impl}; chunked replay "
          f"({EPOCHS} epochs, chunk {CHUNK})", flush=True)
    snap = host_snapshot(state)
    bad_chunk = None
    for c in range(EPOCHS // CHUNK):
        new_state, ms = multi(state, full_batches, tail_batch, CHUNK)
        el = np.asarray(ms["elbo"])
        gp_p = new_state.params["gp"]
        print(f"chunk {c} (epochs {c*CHUNK}..{(c+1)*CHUNK-1}): "
              f"elbo[last] {el[-1].mean():.2f}, nonfinite "
              f"{int((~np.isfinite(el)).sum())}/{el.size}, "
              f"amp {float(gp_p.amplitude):.4f} "
              f"ls {float(gp_p.length_scale):.4f} "
              f"|ov| {float(jnp.linalg.norm(gp_p.object_vectors)):.3f} "
              f"|ip| {float(jnp.abs(gp_p.inducing_points).max()):.3f}",
              flush=True)
        if not np.isfinite(el).all():
            bad_chunk = c
            break
        state = new_state
        snap = host_snapshot(state)

    if bad_chunk is None:
        print("replay clean for the full horizon — knife-edge "
              "(compilation-dependent trajectory).  Dumping final "
              "spectrum anyway:")
        bi = 0
        batch = (full_batches[0][bi], full_batches[1][bi])
        qm, qv = vae.apply(state.params["vae"], batch[0],
                           method=vae.encode)
        qv = jnp.clip(qv, *models.svgpvae.QVAR_CLIP)
        cov_spectrum_report(state.params["gp"], batch[1], qv, "final")
        return

    print(f"\nper-step replay of chunk {bad_chunk} from its pre-chunk "
          f"state...", flush=True)
    state = restore(snap)
    for estep in range(CHUNK * (n_full + (1 if tail_batch else 0))):
        prev = host_snapshot(state)
        bi = estep % (n_full + (1 if tail_batch else 0))
        batch = ((full_batches[0][bi], full_batches[1][bi])
                 if bi < n_full else tail_batch)
        state, m = step_fn(state, batch)
        loss = float(m["loss"])
        if estep % 100 == 0:
            print(f"  step {estep}: loss {loss:.4f}", flush=True)
        if not np.isfinite(loss):
            print(f"\n!!! first non-finite loss at replay step {estep} "
                  f"(batch {bi})", flush=True)
            pstate = restore(prev)
            qm, qv = vae.apply(pstate.params["vae"], batch[0],
                               method=vae.encode)
            qv_clipped = jnp.clip(qv, *models.svgpvae.QVAR_CLIP)
            print(f"  qnet_var raw range [{float(qv.min()):.3e}, "
                  f"{float(qv.max()):.3e}]; clipped "
                  f"[{float(qv_clipped.min()):.3e}, "
                  f"{float(qv_clipped.max()):.3e}]")
            gp_p = pstate.params["gp"]
            print(f"  pre-step gp: amp {float(gp_p.amplitude):.5f} "
                  f"ls {float(gp_p.length_scale):.5f} "
                  f"|ov| {float(jnp.linalg.norm(gp_p.object_vectors)):.3f} "
                  f"|ip|max {float(jnp.abs(gp_p.inducing_points).max()):.3f}")
            cov_spectrum_report(gp_p, batch[1], qv_clipped, "pre-step")
            (loss2, _), grads = jax.value_and_grad(
                loss_svgpvae, has_aux=True)(
                    pstate.params, batch,
                    jax.random.split(pstate.key)[1], pstate.geco,
                    pstate.step)
            print(f"  recomputed loss at pre-step params: {float(loss2):.6f}")
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                    grads["gp"])[0]:
                arr = np.asarray(leaf)
                print(f"   grad gp{jax.tree_util.keystr(path)}: nan "
                      f"{int(np.isnan(arr).sum())}/{arr.size}, max|finite| "
                      f"{np.nanmax(np.abs(arr)):.4e}")
            return
    print("per-step replay of the bad chunk stayed finite — knife-edge "
          "(scan-vs-step rounding).")


if __name__ == "__main__":
    main()
