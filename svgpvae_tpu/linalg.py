"""Numerically-robust linear-algebra substrate for GP math.

The reference computes `tf.linalg.inv(jittered(M))` everywhere (e.g.
SVGPVAE_model.py:239, 319, 331) and uses Cholesky only for log-determinants.
Explicit inverses are both slower and less stable than triangular solves, and
float64 — which the reference leans on for conditioning — is emulated (slow)
on TPU.  This module therefore standardizes on jittered Cholesky
factorizations + `cho_solve` for all PSD systems, which keeps the math
identical (to solver tolerance) while staying fast in float32 on the MXU.

Also hosts the small closed forms shared by every ELBO:
  * `gauss_cross_entropy`         (reference: utils.py:483-504)
  * `kl_diag_standard_normal`     (reference: VAE_utils.py:261-272)
  * `mvn_kl_against_prior_chol`   KL(N(mu, S) || N(0, K)) given chol(K)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import Array

LOG_2PI = math.log(2.0 * math.pi)


def precise(fn):
    """Force full-precision matmuls inside `fn`.

    TPU lowers float32 matmuls to bfloat16 passes by default, which breaks
    the PSD-ness of the cancellation-heavy GP matrices (Cholesky NaNs after
    a few hundred steps).  Decorating the GP-math entry points keeps them
    correct even when the global default (svgpvae_tpu/__init__.py) is
    relaxed for the conv nets via SVGPVAE_MATMUL_PRECISION=default.
    """
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


def add_jitter(mat: Array, jitter) -> Array:
    """M + jitter * I on the last two dims (reference: SVGPVAE_model.py:13-14)."""
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    return mat + jitter * eye


def safe_cholesky(mat: Array, jitter) -> Array:
    """Cholesky of the jittered matrix (lower triangular)."""
    return jnp.linalg.cholesky(add_jitter(mat, jitter))


def cho_solve(chol: Array, b: Array) -> Array:
    """Solve (L L^T) x = b given lower-triangular L.  Batched over leading dims."""
    return jsl.cho_solve((chol, True), b)


def psd_solve(mat: Array, b: Array, jitter) -> Array:
    """Solve M x = b for PSD M with diagonal jitter."""
    return cho_solve(safe_cholesky(mat, jitter), b)


def psd_inverse(mat: Array, jitter) -> Array:
    """Explicit inverse of a PSD matrix via Cholesky.

    Prefer `cho_solve`; use this only when the inverse matrix itself is the
    quantity consumed many times downstream (e.g. the precomputed
    Sigma_l^{-1} of the SPRITES test pipeline, SVGPVAE_model.py:989-1023).
    """
    chol = safe_cholesky(mat, jitter)
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    eye = jnp.broadcast_to(eye, mat.shape)
    return cho_solve(chol, eye)


def logdet_from_chol(chol: Array) -> Array:
    """log det(L L^T) = 2 * sum(log diag L); batched over leading dims."""
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def reciprocal_no_nan(x: Array) -> Array:
    """1/x with 0 -> 0, matching tf.math.reciprocal_no_nan
    (reference: SVGPVAE_model.py:78, 282)."""
    return jnp.where(x == 0, jnp.zeros_like(x), 1.0 / jnp.where(x == 0, 1.0, x))


def gauss_cross_entropy(mu1: Array, var1: Array, mu2: Array, var2: Array) -> Array:
    """Elementwise E_{N(z; mu1, var1)}[log N(z; mu2, var2)].

    Reference: utils.py:483-504.  Shapes broadcast; returns the elementwise
    cross-entropy (negated entropy-like quantity), NOT summed.
    """
    term1 = jnp.log(var2)
    term2 = (var1 + mu1 * mu1 - 2.0 * mu1 * mu2 + mu2 * mu2) / var2
    return -0.5 * (LOG_2PI + term1 + term2)


def kl_diag_standard_normal(mean: Array, var: Array) -> Array:
    """KL(N(mean, diag(var)) || N(0, I)) summed over ALL elements.

    Reference: VAE_utils.py:261-272 (summed over batch and latent dims).
    """
    n = jnp.asarray(mean.size, dtype=mean.dtype)
    return 0.5 * (-n - jnp.sum(jnp.log(var)) + jnp.sum(var)
                  + jnp.sum(mean * mean))


def mvn_kl_against_prior(mu: Array, S: Array, K_chol: Array, jitter) -> Array:
    """KL( N(mu, S) || N(0, K) ) with K given by its (jittered) Cholesky.

    = 0.5 * ( logdet K - logdet S - m + tr(K^{-1} S) + mu^T K^{-1} mu )

    This is the Hensman inside-ELBO KL term (reference:
    SVGPVAE_model.py:269-279).  `S` is jittered before factorization, matching
    the reference's `_add_diagonal_jitter(A_hat, jitter)`.
    """
    m = jnp.asarray(mu.shape[-1], dtype=mu.dtype)
    S_chol = safe_cholesky(S, jitter)
    logdet_K = logdet_from_chol(K_chol)
    logdet_S = logdet_from_chol(S_chol)
    Kinv_S = cho_solve(K_chol, S)
    trace = jnp.trace(Kinv_S)
    quad = jnp.sum(mu * cho_solve(K_chol, mu[..., None])[..., 0], axis=-1)
    return 0.5 * (logdet_K - logdet_S - m + trace + quad)


def solve_lower_triangular(chol: Array, b: Array) -> Array:
    """L^{-1} b for lower-triangular L (whitening solve)."""
    return jsl.solve_triangular(chol, b, lower=True)


def stable_sqrt(x: Array, eps: float = 0.0) -> Array:
    """sqrt with non-negative clamp; keeps reparameterized samples NaN-free."""
    return jnp.sqrt(jnp.maximum(x, eps))


def clip(x: Array, lo: float, hi: float) -> Array:
    return jnp.clip(x, lo, hi)


def tree_value_clip(tree, limit: float):
    """Value-clip every leaf of a gradient pytree (reference:
    BALL_experiment.py:127-131 clips to +/-1e5)."""
    return jax.tree_util.tree_map(lambda g: jnp.clip(g, -limit, limit), tree)
