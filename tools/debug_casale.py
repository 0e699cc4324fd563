"""Localize the first NaN in the Casale GP-only phase on TPU.

Replays the canonical `--opt_regime VAE-100 GP-100` run (same seeds and
data as cli.mnist run_casale), then steps the GP phase one optimizer step
at a time.  At the first step whose post-step params contain NaN, recompute
the loss and gradients at the PRE-step params and print every intermediate
(V spectrum, inner-matrix conditioning, Cholesky diagonals, Taylor
coefficient magnitudes, per-leaf gradient norms) to identify the producing
op.  Diagnostic tool only — not part of the framework.
"""

from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from svgpvae_tpu import data, models, train  # noqa: E402
from svgpvae_tpu import gp as gpm  # noqa: E402
from svgpvae_tpu import nn as nets  # noqa: E402
from svgpvae_tpu.cli import mnist as cli  # noqa: E402


def tree_nan_report(tree, name):
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        n = int(np.isnan(arr).sum())
        mx = float(np.nanmax(np.abs(arr))) if arr.size else 0.0
        if n or not np.isfinite(mx):
            bad.append((jax.tree_util.keystr(path), n, arr.size, mx))
    print(f"-- {name}: {'CLEAN' if not bad else ''}")
    for k, n, size, mx in bad:
        print(f"   NaN {k}: {n}/{size}, max|finite| {mx:.3e}")
    return bool(bad)


def main():
    argv = ["--elbo", "GPVAE_Casale", "--GP_joint", "--ov_joint",
            "--clip_qs", "--PCA", "--opt_regime", "VAE-100 GP-100",
            "--mnist_data_path", "/tmp/mnist_data/"]
    args = cli.build_parser().parse_args(argv)
    args.opt_regime = ["VAE-100", "GP-100"]
    n = len(args.dataset)
    N_train = n * 4050

    cli.ensure_dataset(args)
    train_d, _, test_d = data.load_rotated_mnist(
        args.mnist_data_path, digits=args.dataset, M=args.M)
    train_d = cli.sort_train_data(train_d)
    mask = cli.train_angles_mask(train_d["aux_data"])
    unique_angles = np.sort(np.unique(train_d["aux_data"][:, 2]))
    object_ids = np.sort(np.unique(train_d["aux_data"][:, 1])).astype(int)

    key = jax.random.PRNGKey(args.seed)
    vae = nets.MnistVAE(L=args.L)
    vae_params = vae.init(key, jnp.zeros((2, 28, 28, 1)))
    ov_init = cli.load_ov_init(args)
    gp = gpm.init_casale_gp(ov_init, object_kernel_normalize=False,
                            ov_joint=True, jitter=args.jitter)
    params = {"vae": vae_params, "gp": gp}

    full_images = jnp.asarray(train_d["images"], jnp.float32)
    mask_j = jnp.asarray(gpm.mask_to_indices(mask))
    angles_j = jnp.asarray(unique_angles, jnp.float32)
    oid_j = jnp.asarray(object_ids)

    def gp_quantities(params, key):
        Z = models.encode_full_casale(vae, params["vae"], full_images, key,
                                      clip_qs=args.clip_qs)
        V = gpm.v_matrix(params["gp"], angles_j, oid_j, mask_j)
        a, B, c = gpm.taylor_coeffs(params["gp"], Z, V)
        return Z, V, a, B, c

    def loss_casale(params, batch, key, geco, step):
        k1, k2 = jax.random.split(key)
        _, V, a, B, c = gp_quantities(params, k1)
        out = models.forward_pass_casale(vae, params["vae"], params["gp"],
                                         batch, k2, a, B, c, V, args.beta,
                                         clip_qs=args.clip_qs)
        return out.elbo, (geco, {"elbo": out.elbo, "recon": out.recon_loss})

    def loss_vae(params, batch, key, geco, step):
        images, aux = batch
        out = models.forward_pass_vae(vae, params["vae"],
                                      (images, aux[:, 1:]), key)
        return -out.elbo, (geco, {"elbo": out.elbo,
                                  "recon": out.recon_loss})

    gp_mask = train.trainable_mask(
        params, lambda p, l: jax.tree_util.keystr(p).startswith("['gp']"))
    vae_mask = train.trainable_mask(
        params, lambda p, l: jax.tree_util.keystr(p).startswith("['vae']"))
    txs = {"GP": train.make_optimizer(0.01, mask=gp_mask),
           "VAE": train.make_optimizer(0.001, mask=vae_mask)}
    epochs = {"GP": train.make_epoch_fn(loss_casale, txs["GP"],
                                        donate=False),
              "VAE": train.make_epoch_fn(loss_vae, txs["VAE"],
                                         donate=False)}
    step_gp = train.make_train_step(loss_casale, txs["GP"], donate=False)

    full_batches = train.stack_batches(train_d, args.batch_size)
    states = {r: train.TrainState.create(params, txs[r],
                                         jax.random.fold_in(key, i))
              for i, r in enumerate(("joint", "GP", "VAE")) if r != "joint"}

    print("VAE phase (100 epochs)...", flush=True)
    current = params
    st = states["VAE"]
    for epoch in range(100):
        st = st.replace(params=current)
        st, _ = epochs["VAE"](st, full_batches)
        current = st.params
    print("VAE phase done", flush=True)

    st = states["GP"].replace(params=current)
    for gstep in range(100 * full_batches[0].shape[0]):
        prev_params = jax.tree_util.tree_map(lambda x: x, st.params)
        prev_key, prev_geco, prev_step = st.key, st.geco, st.step
        bi = gstep % full_batches[0].shape[0]
        batch = (full_batches[0][bi], full_batches[1][bi])
        st, m = step_gp(st, batch)
        gp_p = st.params["gp"]
        snap = np.asarray(jnp.stack([
            gp_p.length_scale, gp_p.amplitude, gp_p.alpha,
            jnp.linalg.norm(gp_p.object_vectors)]))
        if gstep % 15 == 0:
            print(f"GP step {gstep}: loss {float(m['loss']):.4f} "
                  f"l={snap[0]:.4f} amp={snap[1]:.4f} alpha={snap[2]:.5f} "
                  f"|ov|={snap[3]:.3f}", flush=True)
        if np.isnan(snap).any() or not np.isfinite(float(m["loss"])):
            print(f"\n!!! first NaN after GP step {gstep}", flush=True)
            # recompute everything at the PRE-step params, eagerly
            k1, _ = jax.random.split(jax.random.split(prev_key)[1])
            Z, V, a, B, c = gp_quantities(prev_params, k1)
            for nm, t in (("Z", Z), ("V", V), ("a", a), ("B", B), ("c", c)):
                tree_nan_report(t, nm)
                arr = np.asarray(t)
                print(f"   {nm}: max|.| {np.nanmax(np.abs(arr)):.4e}")
            gp_prev = prev_params["gp"]
            print(f"pre-step params: l={float(gp_prev.length_scale):.6f} "
                  f"amp={float(gp_prev.amplitude):.6f} "
                  f"alpha={float(gp_prev.alpha):.6f}")
            # inner-matrix conditioning
            VtV = np.asarray(V.T @ V)
            w = np.linalg.eigvalsh(VtV)
            print(f"V^T V eig range [{w.min():.4e}, {w.max():.4e}], "
                  f"alpha {float(gp_prev.alpha):.4e}")
            import svgpvae_tpu.kernels as kk
            K_w = kk.exp_sin_squared_matrix(
                angles_j[:, None], angles_j[:, None], gp_prev.amplitude,
                gp_prev.length_scale, 2.0 * jnp.pi)
            wk = np.linalg.eigvalsh(np.asarray(K_w))
            print(f"K_w eig range [{wk.min():.4e}, {wk.max():.4e}] "
                  f"(jitter {args.jitter})")
            # per-leaf gradient norms at pre-step params
            (loss, _), grads = jax.value_and_grad(
                loss_casale, has_aux=True)(prev_params, batch,
                                           jax.random.split(prev_key)[1],
                                           prev_geco, prev_step)
            print(f"recomputed loss: {float(loss):.6f}")
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                    grads["gp"])[0]:
                arr = np.asarray(leaf)
                print(f"   grad gp{jax.tree_util.keystr(path)}: "
                      f"nan {int(np.isnan(arr).sum())}/{arr.size}, "
                      f"max|finite| {np.nanmax(np.abs(arr)):.4e}")
            return
    print("no NaN in 100 GP epochs")


if __name__ == "__main__":
    main()
