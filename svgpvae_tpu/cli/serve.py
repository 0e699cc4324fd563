"""Serving entry point: restore a trained run and serve conditional
generation from precomputed GP posterior terms.

The reference has no serving surface — conditional generation only exists
inside its training drivers, re-conditioning on the full train set every
eval (MNIST_experiment.py:457-510, SPRITES_experiment.py:499-569).  This
entry point separates deployment from training:

    # one-off: fold the O(N) train-set conditioning into (L, m) terms
    python -m svgpvae_tpu.cli.serve --run_dir <run dir with ckpt/> \
        --out preds.npz [--mean] [--limit 64]

Flow: `args.json` -> rebuild the exact TrainState structure the driver
trained (same trainability masks, so the orbax restore sees the same
optimizer pytree — PARITY.md divergence #8) -> restore the checkpoint ->
encode the train split once -> `serving.fit` -> jitted `predict` over
query auxiliary data.  Supports the two batch-level SVGP families with a
cgen pipeline: rotated-MNIST SVGPVAE (Hensman/Titsias) and SPRITES
SVGPVAE.  Library API: `load_predictor(run_dir)`.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from svgpvae_tpu import data, models, serving, train, utils
from svgpvae_tpu import gp as gpm
from svgpvae_tpu import nn as nets
from svgpvae_tpu.gp.svgp import SVGPConfig

N_ACTIONS = 72


def _load_args(run_dir: str) -> argparse.Namespace:
    with open(os.path.join(run_dir, "args.json")) as f:
        return argparse.Namespace(**json.load(f))


def _encode_chunked(vae, vae_params, images, clip_qs: bool,
                    chunk: int = 512):
    """Full-split encode in fixed-size chunks (one jit program reused)."""
    enc = jax.jit(lambda p, im: models.batching_encode_svgpvae(
        vae, p, im, clip_qs=clip_qs))
    mus, vs = [], []
    n = images.shape[0]
    for lo in range(0, n, chunk):
        mu, v = enc(vae_params, images[lo:lo + chunk])
        mus.append(mu)
        vs.append(v)
    return jnp.concatenate(mus), jnp.concatenate(vs)


def _mesh_if_divisible(mesh, n_rows: int):
    """The N-sharded fit contraction needs N %% devices == 0 (the psum
    shards the train axis evenly); fall back to unsharded otherwise
    (e.g. N_train=4050 does not tile 8 devices)."""
    if mesh is not None and n_rows % mesh.devices.size:
        print(f"warning: N={n_rows} does not tile {mesh.devices.size} "
              "devices; running the fit unsharded")
        return None
    return mesh


def _restore_state(run_dir: str, params, tx):
    state = train.TrainState.create(params, tx, jax.random.PRNGKey(0))
    ckpt = os.path.join(run_dir, "ckpt")
    step = utils.latest_step(ckpt)
    if step is None:
        raise SystemExit(f"no checkpoint under {ckpt}; train with "
                         "--save --save_model_weights first")
    state = utils.restore_checkpoint(ckpt, state)
    print(f"restored {ckpt} at step {int(state.step)}")
    return state


def load_mnist_predictor(run_dir: str, mesh=None) -> dict:
    """Rebuild + restore a cli.mnist SVGPVAE run and fit the predictor.

    Returns {'predictor', 'vae', 'vae_params', 'state', 'test', 'args'}.
    The TrainState structure mirrors run_svgpvae exactly (same nets, GP
    init shapes, and trainability mask) so the orbax restore is
    structural-exact.
    """
    from svgpvae_tpu.cli import mnist as mnist_cli

    args = _load_args(run_dir)
    assert "SVGPVAE" in args.elbo, \
        f"serving supports the SVGPVAE families, got --elbo {args.elbo}"
    n = len(str(args.dataset))
    N_train = n * 4050

    mnist_cli.ensure_dataset(args)
    train_d, _, test_d = data.load_rotated_mnist(
        args.mnist_data_path, digits=str(args.dataset), M=args.M,
        N_t=args.N_t)

    key = jax.random.PRNGKey(args.seed)
    vae = nets.MnistVAE(L=args.L)
    vae_params = vae.init(key, jnp.zeros((2, 28, 28, 1)))
    ip_init = data.generate_init_inducing_points(
        train_d, n=args.nr_inducing_points, use_pca=args.PCA, M=args.M,
        seed=args.seed)
    cfg = SVGPConfig(titsias="Titsias" in args.elbo, jitter=args.jitter,
                     N_train=N_train,
                     K_obj_normalize=args.object_kernel_normalize)
    params = {"vae": vae_params,
              "gp": gpm.init_mnist_svgp(
                  ip_init, mnist_cli.object_vectors_init(args), config=cfg)}

    def trainable(path, leaf):
        name = jax.tree_util.keystr(path)
        if "inducing_points" in name:
            return args.ip_joint
        if "length_scale" in name or "amplitude" in name:
            return args.GP_joint
        if "object_vectors" in name:
            return args.ov_joint
        return True

    tx = train.make_optimizer(args.lr,
                              mask=train.trainable_mask(params, trainable))
    state = _restore_state(run_dir, params, tx)

    images = jnp.asarray(train_d["images"], jnp.float32)
    aux = jnp.asarray(train_d["aux_data"], jnp.float32)
    means, variances = _encode_chunked(vae, state.params["vae"], images,
                                       args.clip_qs)
    mesh = _mesh_if_divisible(mesh, images.shape[0])
    predictor = serving.fit(state.params["gp"], means, variances, aux,
                            mesh=mesh)
    return {"predictor": predictor, "vae": vae,
            "vae_params": state.params["vae"], "state": state,
            "test": test_d, "args": args}


def load_sprites_predictor(run_dir: str, mesh=None) -> dict:
    """Rebuild + restore a cli.sprites SVGPVAE run and fit the predictor.

    Returns {'predictor', 'vae', 'vae_params', 'repr_net', 'repr_params',
    'state', 'test_character', 'args'}.  Queries for unseen characters are
    built with `sprites_query_aux` from context frames.
    """
    from svgpvae_tpu.cli import sprites as sprites_cli

    args = _load_args(run_dir)
    assert "SVGPVAE" in args.elbo, \
        f"serving supports the SVGPVAE families, got --elbo {args.elbo}"

    sprites_cli.ensure_dataset(args)
    splits = data.load_sprites(args.sprites_data_path)
    train_d = splits["train"]
    N_train = len(train_d["frames"])

    key = jax.random.PRNGKey(args.seed)
    vae = nets.SpritesVAE(L=args.L)
    vae_params = vae.init(key, jnp.zeros((2, 64, 64, 3)))
    repr_net = nets.SpritesReprNet(L=args.L_character)
    params = {"vae": vae_params,
              "repr": repr_net.init(key, jnp.zeros((2, 64, 64, 3)))}
    if args.PCA:
        import pickle
        with open(os.path.join(args.sprites_data_path,
                               "sprites_train_dict.p"), "rb") as f:
            train_dict = pickle.load(f)
        gplvm_init, ip_init = data.sprites_pca_init(
            train_dict, m=args.m, L_action=args.L_action,
            L_character=args.L_character)
    else:
        rng = np.random.RandomState(args.seed)
        gplvm_init = rng.normal(0, 1.5, (N_ACTIONS, args.L_action))
        ip_init = rng.normal(0, 1.5, (N_ACTIONS * args.m,
                                      args.L_action + args.L_character))
    cfg = SVGPConfig(titsias="Titsias" in args.elbo, jitter=args.jitter,
                     N_train=N_train,
                     K_obj_normalize=args.object_kernel_normalize)
    params["gp"] = gpm.init_sprites_svgp(
        ip_init, gplvm_init, L_action=args.L_action,
        use_se_kernel=args.K_SE, config=cfg)

    def trainable(path, leaf):
        name = jax.tree_util.keystr(path)
        if name.startswith("['repr']"):
            return args.repr_nn_pretrain != "yes_fixed"
        if "inducing_points" in name:
            return args.ip_joint
        if "gplvm_action" in name:
            return args.GPLVM_joint
        if ("l_action" in name or "sigma_action" in name
                or "l_character" in name or "sigma_character" in name):
            return args.GP_joint and args.K_SE
        return True

    tx = train.make_optimizer(
        args.lr, mask=train.trainable_mask(params, trainable),
        clip_grad_value=args.clip_grad_thres if args.clip_grad else None)
    state = _restore_state(run_dir, params, tx)

    frames = jnp.asarray(train_d["frames"], jnp.float32)
    action_ids = jnp.asarray(train_d["aux_data"][:, 1], jnp.float32)
    means, variances = _encode_chunked(vae, state.params["vae"], frames,
                                       args.clip_qs)
    aux = models.sprites_aux_data(repr_net.apply, state.params["repr"],
                                  frames, action_ids, 50)
    mesh = _mesh_if_divisible(mesh, frames.shape[0])
    predictor = serving.fit(state.params["gp"], means, variances, aux,
                            mesh=mesh)
    return {"predictor": predictor, "vae": vae,
            "vae_params": state.params["vae"], "repr_net": repr_net,
            "repr_params": state.params["repr"], "state": state,
            "test_character": splits["test_character"], "args": args}


def sprites_query_aux(repr_net, repr_params, context_frames,
                      target_action_ids) -> jnp.ndarray:
    """Aux-data queries for ONE unseen character: embed its context frames,
    mean-pool to the character vector, pair with the requested action ids.
    Reference semantics: predict_SVGPVAE_sprites_test_character
    (SVGPVAE_model.py:1118-1195) context half."""
    emb = repr_net.apply(repr_params, context_frames)  # (n_ctx, d)
    char_vec = emb.mean(axis=0, keepdims=True)
    tgt = jnp.asarray(target_action_ids, emb.dtype)[:, None]
    char_vecs = jnp.broadcast_to(char_vec, (tgt.shape[0], emb.shape[1]))
    return jnp.concatenate([tgt, char_vecs], axis=1).astype(jnp.float32)


def load_predictor(run_dir: str, mesh=None) -> dict:
    """Dispatch on the run's args.json (sprites vs mnist driver flags)."""
    args = _load_args(run_dir)
    if hasattr(args, "sprites_data_path"):
        return load_sprites_predictor(run_dir, mesh=mesh)
    return load_mnist_predictor(run_dir, mesh=mesh)


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description="Serve a trained SVGPVAE run")
    p.add_argument("--run_dir", type=str, required=True,
                   help="run directory with ckpt/ and args.json "
                        "(train with --save --save_model_weights)")
    p.add_argument("--out", type=str, default="preds.npz",
                   help="output npz: images, p_m, p_v, aux_query")
    p.add_argument("--mean", action="store_true",
                   help="decode the posterior mean instead of sampling")
    p.add_argument("--limit", type=int, default=64,
                   help="serve at most this many queries from the test "
                        "split (demo mode when no --queries)")
    p.add_argument("--queries", type=str, default=None,
                   help=".npy of (x, D) auxiliary-data query rows; "
                        "default: the run's test split")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard the O(N) train-set conditioning (fit) "
                        "over this many devices (-1 = all); the "
                        "per-query predict stays replicated (m-sized)")
    args = p.parse_args(argv)

    mesh = None
    if args.data_parallel:
        from svgpvae_tpu import parallel
        n = args.data_parallel
        mesh = parallel.make_mesh(None if n < 0 else n)
        print(f"sharding fit over {mesh.devices.size} devices")

    loaded = load_predictor(args.run_dir, mesh=mesh)
    predict = serving.make_predict_fn(loaded["predictor"], loaded["vae"],
                                      loaded["vae_params"],
                                      sample=not args.mean)
    key = jax.random.PRNGKey(args.seed)

    truth = None
    if args.queries:
        aux_q = jnp.asarray(np.load(args.queries), jnp.float32)
    elif "test" in loaded:  # mnist demo: held-out-angle aux rows
        aux_q = jnp.asarray(
            loaded["test"]["aux_data"][:args.limit], jnp.float32)
        truth = loaded["test"]["images"][:args.limit]
    else:  # sprites demo: first unseen character, context -> all actions
        tc = loaded["test_character"]
        frames = jnp.asarray(tc["frames"][:N_ACTIONS], jnp.float32)
        aids = tc["aux_data"][:N_ACTIONS, 1]
        n_ctx = getattr(loaded["args"], "N_context", 36)
        aux_q = sprites_query_aux(loaded["repr_net"],
                                  loaded["repr_params"],
                                  frames[:n_ctx], aids[n_ctx:])
        truth = np.asarray(frames[n_ctx:])

    images, p_m, p_v = predict(aux_q, key)
    out = {"images": np.asarray(images), "p_m": np.asarray(p_m),
           "p_v": np.asarray(p_v), "aux_query": np.asarray(aux_q)}
    result = {"n_queries": int(aux_q.shape[0])}
    if truth is not None:
        K = truth.shape[1] * truth.shape[2]
        mse = float(np.sum((truth - out["images"].reshape(truth.shape)) ** 2)
                    / (K * len(truth)))
        print(f"cgen MSE over {len(truth)} queries: {mse:.5f}")
        result["cgen_mse"] = mse
    np.savez(args.out, **out)
    print(f"served {aux_q.shape[0]} queries -> {args.out}")
    return result


if __name__ == "__main__":
    main()
