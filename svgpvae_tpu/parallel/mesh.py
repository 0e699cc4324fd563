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


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over the data axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place a batch pytree with its leading axis sharded over the mesh."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (parameters/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def data_parallel_jit(step_fn, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Wrap a (state, batch) -> (state, metrics) step for data parallelism.

    Parameters/state replicated, batch sharded on its leading axis; XLA's
    SPMD partitioner reduces gradients with psum over ICI.  Callers place
    inputs with `shard_batch` / `replicate`; jit then propagates those
    shardings through the computation.
    """
    del mesh, axis_name  # sharding flows from the placed inputs
    return jax.jit(step_fn, donate_argnums=(0,))


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
    shard_map = jax.shard_map
    cfg = gp_params.config
    z = gp_params.inducing_points
    Kmm = gp_params.kmat(z, z)

    def partials(means_s, vars_s, aux_s):
        Knm = gp_params.kmat(aux_s, z, x_inducing=False)  # (N/d, m)
        prec = linalg.reciprocal_no_nan(vars_s)  # (N/d, L)
        scaled = prec.T[:, :, None] * Knm[None]  # (L, N/d, m)
        sigma_part = jnp.einsum("nm,lnp->lmp", Knm, scaled)
        r_part = jnp.einsum("nm,nl->lm", Knm, prec * means_s)
        sigma = jax.lax.psum(sigma_part, axis_name)
        r = jax.lax.psum(r_part, axis_name)
        return sigma, r

    sharded = shard_map(
        partials, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name, None)),
        out_specs=(P(), P()),
    )
    sigma_sum, r = sharded(means, variances, aux_data)

    Sigma = Kmm[None] + sigma_sum  # (L, m, m)
    from svgpvae_tpu.gp.svgp import _sigma_cholesky
    Sigma_chol = _sigma_cholesky(Sigma, cfg)
    eye = jnp.broadcast_to(jnp.eye(Kmm.shape[0], dtype=Kmm.dtype),
                           Sigma.shape)
    Sigma_inv = linalg.cho_solve(Sigma_chol, eye)
    mean_terms = linalg.cho_solve(Sigma_chol, r[..., None])[..., 0]
    Kmm_inv = linalg.psd_inverse(Kmm, cfg.jitter)
    return mean_terms, Sigma_inv, Kmm_inv
