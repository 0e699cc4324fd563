"""Pallas TPU kernel: batched PSD inverse + logdet in one program.

The round-2 profile (PROFILE_r02.json) showed the SVGPVAE training step's
GP block — two batched Cholesky factorizations plus ~8 triangular-solve
chains on (L+1, m, m) matrices with m=32..72 — costs 0.321 ms of a
0.346 ms forward as ~40 separate small XLA kernels, each paying fixed
launch latency and HBM round-trips far exceeding its FLOPs.  This kernel
computes, for a stack of jittered PD matrices M (B, m, m),

    Minv   = M^{-1}          (B, m, m)
    logdet = log det M       (B,)

in ONE kernel: the whole augmented stack [M | I] lives in VMEM and a
Gauss-Jordan elimination without pivoting (valid for PD matrices — the
pivots are the positive Schur-complement diagonals, whose product is
det M) runs as a fori_loop of row-broadcast updates.  Downstream
consumers (gp/fused.py) then need only MXU einsums against Minv.

The custom VJP is two batched matmuls — no refactorization, no autodiff
through Cholesky (whose XLA gradient is itself a chain of solves):

    d(M^{-1}) = -M^{-1} dM M^{-1}   =>  Mbar  = -Minv^T gInv Minv^T
    d(logdet) = tr(M^{-1} dM)       =>  Mbar += gLogdet * Minv^T

Numerics: GJ without pivoting on a PD matrix is backward-stable in the
same kappa*eps regime as Cholesky-based inversion (the growth factor is
bounded for PD); callers must jitter M first exactly as for
linalg.safe_cholesky.  tests/test_ops.py pins values and gradients
against float64.

This is the "GP-block megakernel" probe of VERDICT r2 item 3; the
round-2 sufficient-stats lesson (pad-to-128 waste at m=32 made Pallas
LOSE at training shapes) applies here too, so gp/fused.py keeps it
behind `inverse_impl="pallas"` until the head-to-head on-chip bench
justifies a default.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svgpvae_tpu import linalg
from svgpvae_tpu.linalg import precise as _precise


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _gj_blocked_kernel(aug_ref, inv_ref, ld_ref, *, m: int, nb: int,
                       update: str):
    """Blocked Gauss-Jordan on the augmented stack (r5 wave 4).

    The scalar kernel below runs m sequential iterations, each making
    ~5 full-(B, m, W) masked VPU passes (row/pivot/column extraction +
    update + select) — ~1.7 GB of VMEM traffic at SPRITES scale, 0.55 ms
    per launch (tools/probe_titsias_pallas2.py).  This kernel eliminates
    nb=8 pivots per macro-step: the scalar recurrence runs only on the
    (B, nb, W) panel (32x less data), and the full-stack work collapses
    to one rank-nb update per block —
        X <- X - C @ P,  C = X[:, :, block cols] (panel rows zeroed)
    evaluated either as one batched MXU dot_general (update="dot") or as
    nb unrolled VPU broadcast accumulations (update="bcast", fallback if
    Mosaic rejects the batched dot).  Full-stack passes drop from ~5m to
    ~4(m/nb); pivots and logdet are bit-identical to the scalar kernel's
    (the panel recurrence is the same masked form).  Requires m % nb == 0
    (the caller pads m to a multiple of nb with identity rows/cols, which
    leave logdet and the leading (m, m) inverse block unchanged).
    """
    B, rows, W = aug_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    sub_nb = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    sub_m = jax.lax.broadcasted_iota(jnp.int32, (1, rows, 1), 1)
    ld = jnp.zeros((B,), aug_ref.dtype)

    # work in inv_ref: the per-block ref stores are memory barriers, so
    # the compiler reuses the full-stack temporaries across blocks —
    # a pure-SSA unroll keeps every block's buffers live and blows the
    # 16 MB scoped-vmem stack at SPRITES scale (93 MB, r5 wave 4)
    inv_ref[...] = aug_ref[...]

    for kb in range(m // nb):
        lo = kb * nb
        panel_mask = (sub_m >= lo) & (sub_m < lo + nb)
        P = inv_ref[:, lo:lo + nb, :]                      # (B, nb, W)
        # scalar GJ restricted to the panel: reduce its diagonal block
        # to I (row ops within the panel only)
        for j in range(nb):
            c = lo + j
            is_c = lane == c                               # constant mask
            row_j = jnp.sum(jnp.where(sub_nb == j, P, 0.0), axis=1,
                            keepdims=True)                 # (B, 1, W)
            p = jnp.sum(jnp.where(is_c, row_j, 0.0), axis=2,
                        keepdims=True)                     # (B, 1, 1)
            row_j = row_j / p
            col_j = jnp.sum(jnp.where(is_c, P, 0.0), axis=2,
                            keepdims=True)                 # (B, nb, 1)
            P = jnp.where(sub_nb == j, row_j, P - col_j * row_j)
            ld = ld + jnp.log(p[:, 0, 0])
        inv_ref[:, lo:lo + nb, :] = P                      # aligned store
        # one rank-nb full-stack update: X -= C @ P, panel rows excluded
        # (C is zeroed there, so U's panel rows are zero).  Chunked over
        # the batch to bound the accumulation chain's live buffers (the
        # kernel raises the default 16 MB scoped-vmem limit, but an
        # unchunked whole-stack chain still stacks ~6 full-size
        # temporaries = 33 MB at SPRITES scale, r5 wave 4).
        bc = max(8, _round_up((1 << 20) // (rows * W * 4), 8))
        for b0 in range(0, B, bc):
            b1 = min(b0 + bc, B)
            Xc = inv_ref[b0:b1]
            C = jax.lax.slice(Xc, (0, 0, lo),
                              (b1 - b0, rows, lo + nb))    # (bc, m, nb)
            C = jnp.where(panel_mask, 0.0, C)
            Pc = jax.lax.slice(P, (b0, 0, 0), (b1, nb, W))
            if update == "dot":
                # HIGHEST: the MXU's default f32 path multiplies in
                # bf16, and the GJ recurrence amplifies that to O(1)
                # inverse error + NaN logdets on chip (r5 wave 4)
                U = jax.lax.dot_general(
                    C, Pc, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=Xc.dtype,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                U = C[:, :, 0:1] * Pc[:, 0:1, :]
                for j in range(1, nb):
                    U = U + C[:, :, j:j + 1] * Pc[:, j:j + 1, :]
            inv_ref[b0:b1] = Xc - U

    ld_ref[...] = jnp.broadcast_to(ld[:, None], ld_ref.shape)


def _gj_kernel(aug_ref, inv_ref, ld_ref, *, m: int):
    """Gauss-Jordan on the augmented stack; aug (B, m, W), W >= 2m padded
    to lanes.  Writes the full reduced stack to inv_ref (caller slices
    columns m:2m) and per-batch logdet broadcast across ld_ref lanes."""
    X = aug_ref[...]
    B, rows, W = X.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, rows, 1), 1)

    def body(k, carry):
        X, ld = carry
        # row k via a masked sublane reduction: Mosaic has no dynamic_slice
        # with a traced index (NotImplementedError on TPU lowering; the
        # interpret path accepts it, so don't reintroduce it)
        row_k = jnp.sum(jnp.where(sub == k, X, 0.0), axis=1,
                        keepdims=True)                          # (B, 1, W)
        is_k_lane = lane == k
        p = jnp.sum(jnp.where(is_k_lane, row_k, 0.0), axis=2,
                    keepdims=True)                              # (B, 1, 1)
        row_k = row_k / p
        col_k = jnp.sum(jnp.where(is_k_lane, X, 0.0), axis=2,
                        keepdims=True)                          # (B, m, 1)
        col_k = jnp.where(sub == k, 0.0, col_k)
        X = X - col_k * row_k
        X = jnp.where(sub == k, row_k, X)
        ld = ld + jnp.log(p[:, 0, 0])
        return X, ld

    X, ld = jax.lax.fori_loop(0, m, body, (X, jnp.zeros((B,), X.dtype)))
    inv_ref[...] = X
    ld_ref[...] = jnp.broadcast_to(ld[:, None], ld_ref.shape)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "block", "update"))
def chol_inverse_pallas(M: Array, interpret: bool = False,
                        block: int = 8, update: str = "dot"):
    """Pallas path: M (B, m, m) jittered PD -> (Minv (B, m, m), logdet (B,)).

    block > 1 selects the blocked Gauss-Jordan kernel (the default;
    `update` picks its full-stack update strategy, "dot" = batched MXU
    dot_general, "bcast" = unrolled VPU broadcasts); block=1 keeps the
    original scalar kernel.  m is padded to a multiple of `block` with
    identity rows/cols (logdet- and inverse-neutral).

    The whole augmented stack must fit VMEM (B * m * pad(2m) * 4 bytes;
    north-star: 17*32*256*4 = 557 kB)."""
    B, m, _ = M.shape
    m_pad = _round_up(m, block) if block > 1 else m
    W = _round_up(2 * m_pad, 128)
    B_pad = _round_up(B, 8)

    eye = jnp.broadcast_to(jnp.eye(m_pad, dtype=M.dtype), (B, m_pad, m_pad))
    M_ext = jnp.pad(M, ((0, 0), (0, m_pad - m), (0, m_pad - m)))
    if m_pad != m:
        # identity-extend the padded rows/cols: pivots there are 1
        # (logdet += 0) and the leading (m, m) inverse block is exact
        M_ext = M_ext + jnp.diag(jnp.pad(
            jnp.zeros((m,), M.dtype), (0, m_pad - m),
            constant_values=1))[None]
    aug = jnp.concatenate([M_ext, eye], axis=-1)        # (B, m_pad, 2m_pad)
    aug = jnp.pad(aug, ((0, B_pad - B), (0, 0), (0, W - 2 * m_pad)))
    if B_pad != B:
        # padded batches run GJ on [0 | I]-ish junk; make them identity
        # stacks so no log(<=0) NaNs leak out of the kernel
        pad_eye = jnp.pad(jnp.eye(m_pad, dtype=M.dtype),
                          ((0, 0), (0, W - m_pad)))
        aug = aug.at[B:].set(pad_eye[None])

    if block > 1:
        kernel = functools.partial(_gj_blocked_kernel, m=m_pad, nb=block,
                                   update=update)
    else:
        kernel = functools.partial(_gj_kernel, m=m_pad)
    kwargs = {}
    if block > 1 and not interpret:
        # the blocked kernel's unrolled macro-steps stack more scoped-
        # vmem temporaries than the 16 MB default allows at SPRITES
        # scale (the data itself is ~5 MB; v5e has 128 MB VMEM)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    out, ld = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B_pad, m_pad, W), M.dtype),
                   jax.ShapeDtypeStruct((B_pad, 128), M.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
        **kwargs,
    )(aug)
    return out[:B, :m, m_pad:m_pad + m], ld[:B, 0]


@_precise
def chol_inverse_ref(M: Array):
    """XLA reference path: Cholesky-based explicit inverse + logdet.
    Same contract as the Pallas kernel (M must already be jittered)."""
    chol = jnp.linalg.cholesky(M)
    eye = jnp.broadcast_to(jnp.eye(M.shape[-1], dtype=M.dtype), M.shape)
    return linalg.cho_solve(chol, eye), linalg.logdet_from_chol(chol)


def _use_pallas() -> bool:
    forced = os.environ.get("SVGPVAE_CHOL_INVERSE")
    if forced == "pallas":
        return True
    if forced == "xla":
        return False
    return jax.default_backend() == "tpu"


def _kernel_params():
    """(block, update) for the dispatched Pallas kernel.

    SVGPVAE_GJ_BLOCK=1 restores the scalar kernel; SVGPVAE_GJ_UPDATE
    selects the blocked full-stack update ("dot" batched MXU dot_general
    / "bcast" unrolled VPU broadcasts).  Defaults measured r5 wave 4
    (tools/probe_titsias_pallas2.py follow-up)."""
    block = int(os.environ.get("SVGPVAE_GJ_BLOCK", "8"))
    update = os.environ.get("SVGPVAE_GJ_UPDATE", "bcast")
    return block, update


@jax.custom_vjp
def chol_inverse(M: Array):
    """Batched (Minv, logdet) of jittered PD matrices with a two-matmul VJP.

    Dispatches to the Pallas kernel on TPU, the XLA reference elsewhere
    (override with SVGPVAE_CHOL_INVERSE={pallas,xla}; the Pallas path off
    TPU runs in interpret mode for tests).
    """
    if _use_pallas():
        block, update = _kernel_params()
        return chol_inverse_pallas(M,
                                   interpret=jax.default_backend() != "tpu",
                                   block=block, update=update)
    return chol_inverse_ref(M)


def _fwd(M):
    out = chol_inverse(M)
    return out, out[0]


@_precise
def _bwd(Minv, cotangents):
    g_inv, g_ld = cotangents
    # M symmetric PD => Minv^T = Minv
    mbar = -jnp.einsum("bij,bjk,bkl->bil", Minv, g_inv, Minv)
    mbar = mbar + g_ld[:, None, None] * Minv
    return (mbar,)


chol_inverse.defvjp(_fwd, _bwd)
