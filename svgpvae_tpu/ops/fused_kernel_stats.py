"""Pallas TPU kernel v2: product-kernel construction fused with the GP
sufficient-statistics accumulation.

Extends ops.gp_stats by also constructing the K_nm tile inside the kernel
from the raw auxiliary features, so the (n, m) kernel matrix never touches
HBM and the transcendentals (periodic kernel) fuse with the MXU matmuls:

  MNIST family  (reference kernel: SVGPVAE_model.py:427-476):
      K = amp^2 exp(-2 sin^2(|view_i - ip_view_j| / 2) / l^2)
          * <obj_i, ip_obj_j>            (optionally cosine-normalized)
  SPRITES family (reference kernel: SVGPVAE_model.py:550-600, linear x
      linear):
      K = <act_i, ip_act_j> * <chr_i, ip_chr_j>   (optionally normalized)

Outputs, for all L channels at once (reference math:
SVGPVAE_model.py:328-334, 1013-1016):
      Sigma_l = sum_n prec[n, l] K[n, :]^T K[n, :]
      r_l     = sum_n (prec * y)[n, l] K[n, :]

GPLVM gathers happen outside (tiny), feature arrays are zero-padded to
lane width; inducing-point norm vectors are padded with ONES so the
cosine normalization of padding columns stays 0/1 = 0.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _kernel_body(scalars_ref, f1_ref, f2_ref, ip1_ref, ip2_ref,
                 ip_norm1_ref, ip_norm2_ref, prec_ref, py_ref,
                 sigma_ref, r_ref, *, L: int, family: str,
                 normalize: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sigma_ref[...] = jnp.zeros_like(sigma_ref)
        r_ref[...] = jnp.zeros_like(r_ref)

    if family == "mnist":
        amp = scalars_ref[0, 0]
        length = scalars_ref[0, 1]
        # periodic part over the 1-D view feature (first column of f1)
        view = f1_ref[:, 0][:, None]           # (tile_n, 1)
        ip_view = ip1_ref[0, :][None, :]       # (1, m_pad)
        d = jnp.abs(view - ip_view)
        s = jnp.sin(0.5 * d)
        k_a = (amp * amp) * jnp.exp(-2.0 * s * s / (length * length))
        # linear part over the object features
        k_b = jnp.dot(f2_ref[...], ip2_ref[...],
                      preferred_element_type=jnp.float32)
        if normalize:
            n2 = jnp.sum(f2_ref[...] * f2_ref[...], axis=1, keepdims=True)
            # clamp: zero-padded data rows would otherwise produce 0/0
            k_b = k_b / (jnp.maximum(jnp.sqrt(n2), 1e-30)
                         * ip_norm2_ref[0, :][None, :])
        k = k_a * k_b
    else:  # "sprites" linear x linear
        k_a = jnp.dot(f1_ref[...], ip1_ref[...],
                      preferred_element_type=jnp.float32)
        k_b = jnp.dot(f2_ref[...], ip2_ref[...],
                      preferred_element_type=jnp.float32)
        if normalize:
            n1 = jnp.sum(f1_ref[...] * f1_ref[...], axis=1, keepdims=True)
            n2 = jnp.sum(f2_ref[...] * f2_ref[...], axis=1, keepdims=True)
            k_a = k_a / (jnp.maximum(jnp.sqrt(n1), 1e-30)
                         * ip_norm1_ref[0, :][None, :])
            k_b = k_b / (jnp.maximum(jnp.sqrt(n2), 1e-30)
                         * ip_norm2_ref[0, :][None, :])
        k = k_a * k_b

    r_ref[...] += jnp.dot(py_ref[...].T, k,
                          preferred_element_type=jnp.float32)
    for l in range(L):
        scaled = k * prec_ref[:, l][:, None]
        sigma_ref[l, :, :] += jnp.dot(scaled.T, k,
                                      preferred_element_type=jnp.float32)


def _pad2(x: Array, rows: int, cols: int) -> Array:
    return jnp.pad(x.astype(jnp.float32),
                   ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


@functools.partial(jax.jit, static_argnames=("family", "normalize",
                                             "tile_n", "interpret"))
def fused_kernel_stats(f1: Array, f2: Array, ip1: Array, ip2: Array,
                       prec: Array, py: Array,
                       amp: Optional[Array] = None,
                       length_scale: Optional[Array] = None,
                       family: str = "mnist", normalize: bool = False,
                       tile_n: int = 512, interpret: bool = False
                       ) -> Tuple[Array, Array]:
    """Fused (Sigma (L, m, m), r (L, m)) directly from kernel features.

    f1/f2: (n, d1)/(n, d2) data-side features (view / object for MNIST,
    action / character for SPRITES); ip1/ip2: (m, d1)/(m, d2) inducing-side
    features; prec/py: (n, L).
    """
    n = f1.shape[0]
    m = ip1.shape[0]
    L = prec.shape[1]
    dtype = jnp.float32

    m_pad = _round_up(m, 128)
    n_pad = _round_up(n, tile_n)
    d1_pad = _round_up(max(f1.shape[1], 1), 128)
    d2_pad = _round_up(max(f2.shape[1], 1), 128)

    f1p = _pad2(f1, n_pad, d1_pad)
    f2p = _pad2(f2, n_pad, d2_pad)
    # inducing features transposed to (d, m) so the in-kernel matmul is
    # (tile_n, d) x (d, m)
    ip1p = _pad2(ip1.T, d1_pad, m_pad)
    ip2p = _pad2(ip2.T, d2_pad, m_pad)
    # norm rows padded with ONES so normalized padding columns are 0/1
    norm1 = jnp.linalg.norm(ip1.astype(dtype), axis=1)
    norm2 = jnp.linalg.norm(ip2.astype(dtype), axis=1)
    norm1p = jnp.concatenate(
        [norm1, jnp.ones(m_pad - m, dtype)])[None, :]
    norm2p = jnp.concatenate(
        [norm2, jnp.ones(m_pad - m, dtype)])[None, :]
    precp = jnp.pad(prec.astype(dtype), ((0, n_pad - n), (0, 0)))
    pyp = jnp.pad(py.astype(dtype), ((0, n_pad - n), (0, 0)))

    scalars = jnp.stack([
        jnp.asarray(1.0 if amp is None else amp, dtype),
        jnp.asarray(1.0 if length_scale is None else length_scale, dtype),
    ])[None, :]  # (1, 2)

    grid = (n_pad // tile_n,)
    sigma, r = pl.pallas_call(
        functools.partial(_kernel_body, L=L, family=family,
                          normalize=normalize),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, d1_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d2_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d1_pad, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d2_pad, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0),
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
            flops=2 * n_pad * m_pad * (m_pad * L + d1_pad + d2_pad),
            bytes_accessed=4 * (n_pad * (d1_pad + d2_pad + 2 * L)
                                + L * m_pad * (m_pad + 1)),
            transcendentals=n_pad * m_pad if family == "mnist" else 0,
        ),
        interpret=interpret,
    )(scalars, f1p, f2p, ip1p, ip2p, norm1p, norm2p, precp, pyp)

    return sigma[:, :m, :m], r[:, :m]
