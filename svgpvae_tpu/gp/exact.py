"""Exact (dense) 1-D GP regression for the Pearce GPVAE / NP baselines.

Reference: build_1d_gp (GPVAE_Pearce_model.py:8-86).  Batched over the
leading axis with plain broadcasting — no vmap needed — and solved with
Cholesky throughout (the reference already uses cholesky_solve here).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import Array

from svgpvae_tpu import linalg


class GP1DPosterior(NamedTuple):
    mean: Array          # (batch, ns)
    var: Array           # (batch, ns) or (batch, ns, ns) if full_variance
    log_marginal: Array  # (batch,)


def _batch_diag(v: Array) -> Array:
    """(batch, n) -> (batch, n, n) diagonal matrices."""
    n = v.shape[-1]
    return v[..., None] * jnp.eye(n, dtype=v.dtype)


@linalg.precise
def gp_regression_1d(x: Array, y: Array, var_y: Array, x_test: Array,
                     length_scale, full_variance: bool = False,
                     jitter: float = 0.0) -> GP1DPosterior:
    """Exact GP regression with a unit-amplitude RBF kernel over 1-D inputs.

    x: (batch, n) inputs, y: (batch, n) targets, var_y: (batch, n)
    heteroscedastic observation noise, x_test: (batch, ns) query points.

    Returns posterior mean/variance at x_test and the per-batch marginal
    log-likelihood log p(y | x) (reference: GPVAE_Pearce_model.py:44-86).
    With `full_variance` the full (ns, ns) posterior covariance is returned,
    valid (like the reference) only when x_test == x.
    """
    n = x.shape[-1]
    dtype = y.dtype
    ilt = -0.5 / (length_scale * length_scale)

    # K + diag(var_y), batched (batch, n, n)
    d = x[:, :, None] - x[:, None, :]
    K = jnp.exp(d * d * ilt)
    K_noise = K + _batch_diag(var_y) + jnp.eye(n, dtype=dtype)[None] * jitter
    chol = jnp.linalg.cholesky(K_noise)

    # marginal log-likelihood
    logdet = linalg.logdet_from_chol(chol)  # (batch,)
    iKy = jsl.cho_solve((chol, True), y[..., None])  # (batch, n, 1)
    quad = jnp.sum(y * iKy[..., 0], axis=-1)  # (batch,)
    log2pi = jnp.asarray(linalg.LOG_2PI, dtype)
    log_marginal = -0.5 * (n * log2pi + quad + logdet)

    # cross kernel (batch, n, ns)
    ds = x[:, :, None] - x_test[:, None, :]
    Ks = jnp.exp(ds * ds * ilt)

    mean = jnp.einsum("bns,bn->bs", Ks, iKy[..., 0])

    if full_variance:
        # full posterior covariance; like the reference, only for x_test == x
        iK_Ks = jsl.cho_solve((chol, True), Ks)  # (batch, n, ns)
        var = K - Ks.transpose(0, 2, 1) @ iK_Ks  # (batch, ns, ns)
    else:
        iK_Ks = jsl.cho_solve((chol, True), Ks)
        var = 1.0 - jnp.sum(Ks * iK_Ks, axis=1)  # (batch, ns)

    return GP1DPosterior(mean=mean, var=var, log_marginal=log_marginal)
