"""Pure-function GP kernels.

Functional re-design of the kernel zoo the reference builds from
`tfp.math.psd_kernels` (reference: SVGPVAE_model.py:416-417, 530-548,
GPVAE_Casale_model.py:246-247, SVIGP_Hensman_model.py:56-57):

  * `rbf`              — ExponentiatedQuadratic, k = a^2 exp(-||x-y||^2 / (2 l^2))
  * `exp_sin_squared`  — periodic kernel, k = a^2 exp(-2 sin^2(pi |x-y| / p) / l^2)
  * `linear`           — dot-product kernel, k = <x, y>
  * `cosine_normalize` — divide a linear-kernel matrix by the outer product of
                         row norms (reference: SVGPVAE_model.py:465-474)

Every kernel comes as a pairwise `*_matrix` (n,d)x(m,d) -> (n,m) form and an
elementwise `*_diag` (n,d)x(n,d) -> (n,) form (the reference's
`diag_only=True` path).  All functions are shape-polymorphic, dtype-preserving
and differentiable; they contain no Python branching on traced values so they
compile cleanly under `jit`/`vmap`/`pjit`.

Matrix forms are arranged as single large contractions (matmuls / broadcasted
reductions) so XLA can tile them onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


# ---------------------------------------------------------------------------
# squared-exponential (RBF / ExponentiatedQuadratic)
# ---------------------------------------------------------------------------


def sq_dists(x: Array, y: Array) -> Array:
    """Pairwise squared euclidean distances.

    x: (n, d), y: (m, d) -> (n, m).  Uses the ||x||^2 - 2<x,y> + ||y||^2
    expansion so the cross term is a single MXU matmul.
    """
    x = jnp.atleast_2d(x)
    y = jnp.atleast_2d(y)
    x_sq = jnp.sum(x * x, axis=-1)[:, None]  # (n, 1)
    y_sq = jnp.sum(y * y, axis=-1)[None, :]  # (1, m)
    cross = x @ y.T  # (n, m) — MXU
    d2 = x_sq - 2.0 * cross + y_sq
    return jnp.maximum(d2, 0.0)  # clamp fp cancellation error


def rbf_matrix(x: Array, y: Array, length_scale, amplitude=None) -> Array:
    """k(x,y) = amplitude^2 * exp(-0.5 * ||x-y||^2 / length_scale^2)."""
    d2 = sq_dists(x, y)
    k = jnp.exp(-0.5 * d2 / (length_scale * length_scale))
    if amplitude is not None:
        k = (amplitude * amplitude) * k
    return k


def rbf_diag(x: Array, y: Array, length_scale, amplitude=None) -> Array:
    x = jnp.atleast_2d(x)
    y = jnp.atleast_2d(y)
    d2 = jnp.sum((x - y) ** 2, axis=-1)
    k = jnp.exp(-0.5 * d2 / (length_scale * length_scale))
    if amplitude is not None:
        k = (amplitude * amplitude) * k
    return k


# ---------------------------------------------------------------------------
# periodic (ExpSinSquared)
# ---------------------------------------------------------------------------


def exp_sin_squared_matrix(x: Array, y: Array, amplitude, length_scale,
                           period) -> Array:
    """k(x,y) = amplitude^2 * exp(-2 sin^2(pi * sum_i |x_i-y_i| / period) / length_scale^2).

    Matches tfp.math.psd_kernels.ExpSinSquared (L1 distance inside the sine),
    used with period=2*pi over rotation angles (reference:
    SVGPVAE_model.py:416).
    """
    x = jnp.atleast_2d(x)
    y = jnp.atleast_2d(y)
    # L1 distance; for the 1-D angle feature this is |x - y|.
    l1 = jnp.sum(jnp.abs(x[:, None, :] - y[None, :, :]), axis=-1)  # (n, m)
    s = jnp.sin(jnp.pi * l1 / period)
    log_k = -2.0 * (s * s) / (length_scale * length_scale)
    return (amplitude * amplitude) * jnp.exp(log_k)


def exp_sin_squared_diag(x: Array, y: Array, amplitude, length_scale,
                         period) -> Array:
    x = jnp.atleast_2d(x)
    y = jnp.atleast_2d(y)
    l1 = jnp.sum(jnp.abs(x - y), axis=-1)  # (n,)
    s = jnp.sin(jnp.pi * l1 / period)
    log_k = -2.0 * (s * s) / (length_scale * length_scale)
    return (amplitude * amplitude) * jnp.exp(log_k)


# ---------------------------------------------------------------------------
# linear (dot product)
# ---------------------------------------------------------------------------


def linear_matrix(x: Array, y: Array) -> Array:
    """k(x,y) = <x, y> — tfp Linear() with unset bias/slope/shift."""
    return jnp.atleast_2d(x) @ jnp.atleast_2d(y).T


def linear_diag(x: Array, y: Array) -> Array:
    return jnp.sum(jnp.atleast_2d(x) * jnp.atleast_2d(y), axis=-1)


def cosine_normalize_matrix(k: Array, x: Array, y: Array) -> Array:
    """Normalize a linear-kernel matrix into [-1, 1] (cosine similarity).

    Reference semantics (SVGPVAE_model.py:470-474): divide by the outer
    product of euclidean row norms.
    """
    nx = jnp.linalg.norm(jnp.atleast_2d(x), axis=-1)  # (n,)
    ny = jnp.linalg.norm(jnp.atleast_2d(y), axis=-1)  # (m,)
    return k / (nx[:, None] * ny[None, :])


def cosine_normalize_diag(k: Array, x: Array, y: Array) -> Array:
    nx = jnp.linalg.norm(jnp.atleast_2d(x), axis=-1)
    ny = jnp.linalg.norm(jnp.atleast_2d(y), axis=-1)
    return k / (nx * ny)
