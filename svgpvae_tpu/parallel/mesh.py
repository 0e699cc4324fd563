"""Device-mesh data parallelism (SURVEY.md §2.9, §5.8).

The reference is a single-process, single-device program; the TPU-native
equivalents here are:

  * a 1-D `jax.sharding.Mesh` over a "data" axis;
  * data-parallel training: the batch is sharded over the data axis and
    parameters are replicated — `jit`'s SPMD partitioner then inserts the
    gradient `psum` over ICI automatically (the idiomatic XLA-collectives
    route; no NCCL/MPI analogue is needed);
  * the full-train-set test-time reductions (conditional-generation
    pipelines, SVGPVAE_model.py:989-1023) sharded over the N axis with an
    explicit `shard_map` + `psum`, since N is the only axis large enough to
    be worth distributing (SURVEY.md §5.7).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svgpvae_tpu import linalg


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS,
              model: int = 1,
              model_axis_name: str = MODEL_AXIS) -> Mesh:
    """Device mesh over the data axis, with an optional model axis.

    `model > 1` lays the devices out as a 2-D (data, model) mesh so tensor-
    parallel shardings can target the model axis (SURVEY.md §2.9: the mesh
    abstraction keeps a model axis available even though the SVGP-VAE
    models are small enough to replicate).  With `model == 1` (default) the
    mesh is the 1-D data mesh, and all parameters are replicated.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if model == 1:
        return Mesh(np.asarray(devices), (axis_name,))
    assert len(devices) % model == 0, \
        f"{len(devices)} devices do not tile a model axis of {model}"
    grid = np.asarray(devices).reshape(-1, model)
    return Mesh(grid, (axis_name, model_axis_name))


def resolve_data_parallel(n: int, batch_size: int) -> Optional[Mesh]:
    """CLI-facing mesh resolution for `--data_parallel N`.

    N = 0 disables (returns None); N = -1 uses every visible device;
    N > 0 uses the first N.  The batch size must tile the data axis —
    each scanned train step shards its batch over the mesh
    (`shard_stacked_batches`), so a non-divisible batch would need
    padding that changes the GP minibatch semantics (the (N/b) bias
    correction, SVGPVAE_model.py:328-334); refuse loudly instead.
    """
    if not n:
        return None
    ndev = len(jax.devices()) if n < 0 else n
    avail = len(jax.devices())
    if ndev > avail:
        raise SystemExit(f"--data_parallel {n}: only {avail} devices "
                         "visible")
    if batch_size % ndev:
        raise SystemExit(f"--data_parallel {ndev}: batch_size "
                         f"{batch_size} does not tile the data axis; "
                         "pick a batch size divisible by the device "
                         "count")
    return make_mesh(ndev)


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place a batch pytree with its leading axis sharded over the mesh."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (parameters/state) across the mesh.

    Copies before placing: device_put may alias the source buffer on the
    first device, and the data-parallel step donates its state — without
    the copy, donation would invalidate the caller's original arrays.
    """
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.array(x, copy=True), sharding), tree)


def shard_stacked_batches(mesh: Mesh, batches, axis_name: str = DATA_AXIS):
    """Place a pre-batched dataset pytree (leaves stacked as
    (n_batches, b, ...)) with the PER-BATCH axis sharded over the mesh —
    the input layout of `train.make_epoch_fn` under data parallelism.
    The scan axis (n_batches) stays unsharded; each scanned step then
    runs SPMD over the batch axis exactly like the per-step path."""
    def put(x):
        spec = P(None, axis_name, *([None] * (x.ndim - 2)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batches)


def data_parallel_jit(step_fn, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Wrap a (state, batch) -> (state, metrics) step for data parallelism.

    Parameters/state replicated, batch sharded on its leading axis; XLA's
    SPMD partitioner reduces gradients with psum over ICI.  Callers place
    inputs with `shard_batch` / `replicate`; jit then propagates those
    shardings through the computation.
    """
    del mesh, axis_name  # sharding flows from the placed inputs
    return jax.jit(step_fn, donate_argnums=(0,))


def _psum_gp_stats(gp_params, z, means, variances, aux_data, mesh: Mesh,
                   axis_name: str = DATA_AXIS):
    """Shared N-sharded sufficient statistics of the SVGP posterior:
    Sigma contribution sum_n K_mn diag(prec_l) K_nm (L, m, m) and the
    projected mean r_l = K_mn (prec_l * y_l) (L, m), psum'd over the data
    axis.  gp_params (incl. GPLVM tables) are closed over -> replicated."""

    def partials(means_s, vars_s, aux_s):
        Knm = gp_params.kmat(aux_s, z, x_inducing=False)  # (N/d, m)
        prec = linalg.reciprocal_no_nan(vars_s)  # (N/d, L)
        scaled = prec.T[:, :, None] * Knm[None]  # (L, N/d, m)
        sigma_part = jnp.einsum("nm,lnp->lmp", Knm, scaled)
        r_part = jnp.einsum("nm,nl->lm", Knm, prec * means_s)
        sigma = jax.lax.psum(sigma_part, axis_name)
        r = jax.lax.psum(r_part, axis_name)
        return sigma, r

    sharded = jax.shard_map(
        partials, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name, None)),
        out_specs=(P(), P()),
    )
    return sharded(means, variances, aux_data)


def sharded_posterior_params(gp_params, aux_test, aux_train, y, noise,
                             mesh: Mesh, axis_name: str = DATA_AXIS):
    """GP posterior at `aux_test` conditioned on the FULL train set,
    sharded over the N axis.

    Distributed version of gp.posterior_params for the MNIST conditional-
    generation conditioning pass (reference:
    bacthing_predict_SVGPVAE_rotated_mnist, SVGPVAE_model.py:1026-1083,
    which feeds the whole train set through approximate_posterior_params,
    :303-343): the N-sized sufficient statistics are psum'd over ICI, then
    the m- and x-sized tail runs replicated.  Matches the single-device
    gp.posterior_params output bit-for-bit up to reduction order.

    aux_test: (x, D); aux_train: (N, D); y/noise: (N, L).  N must divide
    the data-axis size.  Returns (p_m (x, L), p_v (x, L), mu_hat (L, m),
    A_hat (L, m, m)).
    """
    from svgpvae_tpu.gp.svgp import _sigma_cholesky

    with jax.default_matmul_precision("highest"):
        cfg = gp_params.config
        b = y.shape[0]
        scale = (cfg.N_train / b) if cfg.N_train else 1.0
        z = gp_params.inducing_points
        Kmm = gp_params.kmat(z, z)
        Kmm_chol = linalg.safe_cholesky(Kmm, cfg.jitter)
        Kxm = gp_params.kmat(aux_test, z, x_inducing=False)  # (x, m)
        Kxx_diag = gp_params.kdiag(aux_test, aux_test, x_inducing=False,
                                   y_inducing=False)  # (x,)

        sigma_contrib, r = _psum_gp_stats(gp_params, z, y, noise, aux_train,
                                          mesh, axis_name)
        Sigma = Kmm[None] + scale * sigma_contrib  # (L, m, m)
        Sigma_chol = _sigma_cholesky(Sigma, cfg)
        sir = linalg.cho_solve(Sigma_chol, r[..., None])[..., 0]  # (L, m)

        p_m = scale * jnp.einsum("xm,lm->xl", Kxm, sir)
        KmmInv_Kmx = linalg.cho_solve(Kmm_chol, Kxm.T)  # (m, x)
        nystrom = jnp.sum(Kxm * KmmInv_Kmx.T, axis=-1)  # (x,)
        Kmx_b = jnp.broadcast_to(Kxm.T, (Sigma.shape[0],) + Kxm.T.shape)
        SigInv_Kmx = linalg.cho_solve(Sigma_chol, Kmx_b)  # (L, m, x)
        sig_quad = jnp.einsum("xm,lmx->xl", Kxm, SigInv_Kmx)
        p_v = (Kxx_diag - nystrom)[:, None] + sig_quad

        mu_hat = scale * (Kmm @ sir[..., None])[..., 0]
        A_hat = Kmm[None] @ linalg.cho_solve(
            Sigma_chol, jnp.broadcast_to(Kmm, Sigma.shape))
        return p_m, p_v, mu_hat, A_hat


def sharded_precompute_gp_params(gp_params, means, variances, aux_data,
                                 mesh: Mesh, axis_name: str = DATA_AXIS):
    """Full-train-set GP posterior precompute, sharded over the N axis.

    Distributed version of gp.precompute_test_posterior_terms (reference:
    precompute_GP_params_SVGPVAE, SVGPVAE_model.py:989-1023): each device
    computes its shard's contribution to Sigma_l = K_mm + K_mn Lambda_l K_nm
    and to the projected mean r_l = K_mn (Lambda_l y_l); one psum over ICI
    combines the (L, m, m)/(L, m) partials, then the m-sized solves run
    replicated (m is tiny).

    means/variances: (N, L); aux_data: (N, D).  N must divide the mesh size.
    Returns (mean_terms (L, m), Sigma_inv (L, m, m), Kmm_inv (m, m)).
    """
    cfg = gp_params.config
    z = gp_params.inducing_points
    Kmm = gp_params.kmat(z, z)
    sigma_sum, r = _psum_gp_stats(gp_params, z, means, variances, aux_data,
                                  mesh, axis_name)

    Sigma = Kmm[None] + sigma_sum  # (L, m, m)
    from svgpvae_tpu.gp.svgp import _sigma_cholesky
    Sigma_chol = _sigma_cholesky(Sigma, cfg)
    eye = jnp.broadcast_to(jnp.eye(Kmm.shape[0], dtype=Kmm.dtype),
                           Sigma.shape)
    Sigma_inv = linalg.cho_solve(Sigma_chol, eye)
    mean_terms = linalg.cho_solve(Sigma_chol, r[..., None])[..., 0]
    Kmm_inv = linalg.psd_inverse(Kmm, cfg.jitter)
    return mean_terms, Sigma_inv, Kmm_inv
