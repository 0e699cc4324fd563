"""Pallas TPU kernel: fused GP sufficient-statistics accumulation.

The hot op of every SVGPVAE training step and of the full-train-set
test-time precompute (reference math: SVGPVAE_model.py:328-334, 1013-1016)
is, for all L latent channels at once,

    Sigma_l = sum_n prec[n, l] * K_nm[n, :]^T K_nm[n, :]      (L, m, m)
    r_l     = sum_n (prec * y)[n, l] * K_nm[n, :]             (L, m)

A naive XLA lowering materializes the (L, n, m) channel-scaled tensor
(~1 GB at SPRITES precompute scale: n=50k, m=72, L=64).  This kernel
streams K_nm tiles HBM -> VMEM once and accumulates all channels' (m, m)
outer-product sums in VMEM, so HBM traffic is O(n*m + n*L) reads +
O(L*m^2) writes and every FLOP lands on the MXU as a (m, tile_n) x
(tile_n, m) matmul.

The grid iterates over n tiles sequentially (TPU grid semantics), with the
(L, m, m) accumulator held in the output VMEM block across iterations.
`m` is padded to the 128-lane width at the call site; padding columns of
K_nm are zero so they contribute zeros to Sigma and r and are sliced away
afterwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svgpvae_tpu.linalg import precise as _precise


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _stats_kernel(knm_ref, prec_ref, py_ref, sigma_ref, r_ref, *, L: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sigma_ref[...] = jnp.zeros_like(sigma_ref)
        r_ref[...] = jnp.zeros_like(r_ref)

    k = knm_ref[...]  # (tile_n, m_pad)

    # r += py^T K : one (L, tile_n) x (tile_n, m) MXU matmul
    r_ref[...] += jnp.dot(py_ref[...].T, k,
                          preferred_element_type=jnp.float32)

    # Sigma_l += (prec_l * K)^T K, one MXU matmul per channel (static loop)
    for l in range(L):
        scaled = k * prec_ref[:, l][:, None]
        sigma_ref[l, :, :] += jnp.dot(scaled.T, k,
                                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def gp_sufficient_stats(Knm: Array, prec: Array, py: Array,
                        tile_n: int = 512, interpret: bool = False):
    """Fused (Sigma (L, m, m), r (L, m)) from K_nm (n, m), prec (n, L),
    py = prec * y (n, L).  n is zero-padded to a tile multiple (zero rows
    of prec/py contribute nothing); m is zero-padded to 128 lanes."""
    n, m = Knm.shape
    L = prec.shape[1]
    dtype = jnp.float32

    m_pad = _round_up(m, 128)
    n_pad = _round_up(n, tile_n)
    if m_pad != m or n_pad != n:
        Knm = jnp.pad(Knm.astype(dtype), ((0, n_pad - n), (0, m_pad - m)))
        prec = jnp.pad(prec.astype(dtype), ((0, n_pad - n), (0, 0)))
        py = jnp.pad(py.astype(dtype), ((0, n_pad - n), (0, 0)))
    else:
        Knm, prec, py = (x.astype(dtype) for x in (Knm, prec, py))

    grid = (n_pad // tile_n,)
    sigma, r = pl.pallas_call(
        functools.partial(_stats_kernel, L=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, m_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, m_pad, m_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, m_pad, m_pad), dtype),
            jax.ShapeDtypeStruct((L, m_pad), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * m_pad * L + 2 * n_pad * m_pad * L,
            bytes_accessed=4 * (n_pad * m_pad + 2 * n_pad * L
                                + L * m_pad * m_pad + L * m_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(Knm, prec, py)

    return sigma[:, :m, :m], r[:, :m]


@_precise
def gp_sufficient_stats_reference(Knm: Array, prec: Array, py: Array):
    """Plain-XLA reference of the same contraction (used by tests and as
    the fallback on non-TPU backends)."""
    scaled = prec.T[:, :, None] * Knm[None]  # (L, n, m)
    sigma = jnp.einsum("nm,lnp->lmp", Knm, scaled)
    r = jnp.einsum("nm,nl->lm", Knm, py)
    return sigma, r


# ---------------------------------------------------------------------------
# differentiable dispatcher
# ---------------------------------------------------------------------------

# Pallas pads m to the 128-lane width; below these sizes the padding FLOPs
# and fixed launch overhead outweigh the fusion win, so plain XLA is used.
_MIN_N, _MIN_M = 4096, 64


@jax.custom_vjp
def gp_stats(Knm: Array, prec: Array, py: Array):
    """(Sigma (L, m, m), r (L, m)) with a fused Pallas forward on TPU for
    large shapes and an einsum backward everywhere.

    Differentiable in all three arguments (the SVGPVAE training path
    differentiates Sigma/r w.r.t. kernel hyperparameters through K_nm and
    w.r.t. encoder outputs through prec/py).
    """
    return _gp_stats_fwd_impl(Knm, prec, py)


def _use_pallas(n: int, m: int) -> bool:
    # SVGPVAE_GP_STATS={pallas,xla} overrides the shape heuristic (A/B
    # measurement hook, mirroring SVGPVAE_CHOL_INVERSE; off-TPU the
    # forced Pallas path runs in interpret mode)
    import os
    forced = os.environ.get("SVGPVAE_GP_STATS")
    if forced == "pallas":
        return True
    if forced == "xla":
        return False
    return (jax.default_backend() == "tpu"
            and n >= _MIN_N and m >= _MIN_M)


def _gp_stats_fwd_impl(Knm, prec, py):
    n, m = Knm.shape
    if _use_pallas(n, m):
        return gp_sufficient_stats(
            Knm, prec, py, interpret=jax.default_backend() != "tpu")
    return gp_sufficient_stats_reference(Knm, prec, py)


def _gp_stats_fwd(Knm, prec, py):
    out = _gp_stats_fwd_impl(Knm, prec, py)
    return out, (Knm, prec, py)


@_precise
def _gp_stats_bwd(residuals, cotangents):
    Knm, prec, py = residuals
    d_sigma, d_r = cotangents
    # Sigma_l = K^T diag(prec_l) K  =>
    #   dK    += sum_l prec[:, l] * (K @ (dSigma_l + dSigma_l^T))
    #   dprec[n, l] = K[n] dSigma_l K[n]^T
    sym = d_sigma + jnp.swapaxes(d_sigma, -1, -2)  # (L, m, m)
    k_sym = jnp.einsum("nm,lmp->lnp", Knm, sym)  # (L, n, m)
    dK = jnp.einsum("nl,lnp->np", prec, k_sym)
    dprec = 0.5 * jnp.einsum("nm,lnm->nl", Knm, k_sym)
    # r_l = K^T py_l  =>  dK += py @ d_r ; dpy = K @ d_r^T
    dK = dK + py @ d_r
    dpy = Knm @ d_r.T
    return dK, dprec, dpy


gp_stats.defvjp(_gp_stats_fwd, _gp_stats_bwd)
