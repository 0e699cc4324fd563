"""Casale GPVAE: full GP over the train set with Kronecker low-rank V and
first-order Taylor coefficients for low-memory stochastic backprop.

Reference: GPVAE_Casale_model.py:10-21 (kron), 206-359 (casaleGP class).
Functional re-design: parameters in a pytree struct, all matrix work via
batched matmuls (the L-channel Taylor coefficients are one einsum family
rather than a Python loop), Woodbury inverse kept in its factored form where
possible.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from svgpvae_tpu import kernels, linalg


def kron(a: Array, b: Array) -> Array:
    """Kronecker product via broadcasting (reference: tf_kron,
    GPVAE_Casale_model.py:10-21)."""
    ar, ac = a.shape
    br, bc = b.shape
    return (a[:, None, :, None] * b[None, :, None, :]).reshape(ar * br,
                                                               ac * bc)


@struct.dataclass
class CasaleGP:
    """Parameters of the Casale full-GP prior (reference:
    GPVAE_Casale_model.py:206-247)."""

    length_scale: Array   # view-kernel length scale
    amplitude: Array      # view-kernel amplitude
    alpha: Array          # observation noise of the latent GP (raw param)
    object_vectors: Array  # (n_objects, M) GPLVM table
    object_kernel_normalize: bool = struct.field(pytree_node=False,
                                                 default=False)
    ov_joint: bool = struct.field(pytree_node=False, default=True)
    jitter: float = struct.field(pytree_node=False, default=1e-6)
    # raw-alpha -> noise map: "clamp" (identity value; consumers apply the
    # straight-through ALPHA_FLOOR — PARITY.md #7) or "softplus" (always-
    # positive reparameterization, the VERDICT r3 item 4 experiment: is
    # the Casale converged gap caused by alpha pinning at the floor?)
    alpha_transform: str = struct.field(pytree_node=False, default="clamp")
    # Straight-through CEILING on the latent-GP noise (0 = uncapped, the
    # reference semantics).  Round-4 wave-2 trajectory logging showed the
    # free alpha drifts up without bound during joint training
    # (0.1 -> 17+ over 1400 epochs) while amp^2/|ov|^2 co-drift keeps the
    # GP signal-to-noise pinned ~0.2 — an ELBO-ascending scale ridge that
    # progressively flattens the GP smoother cgen relies on (RESULTS.md
    # round 4).  The cap breaks the ridge without touching the floor.
    alpha_max: float = struct.field(pytree_node=False, default=0.0)


def init_casale_gp(object_vectors_init, object_kernel_normalize: bool,
                   ov_joint: bool, jitter: float = 1e-6,
                   dtype=jnp.float32,
                   alpha_transform: str = "clamp",
                   alpha_max: float = 0.0) -> CasaleGP:
    import numpy as np
    alpha0 = 0.1
    raw = (np.log(np.expm1(alpha0)) if alpha_transform == "softplus"
           else alpha0)  # softplus(raw) == alpha0 at init
    return CasaleGP(
        length_scale=jnp.asarray(1.0, dtype=dtype),
        amplitude=jnp.asarray(1.0, dtype=dtype),
        alpha=jnp.asarray(raw, dtype=dtype),
        object_vectors=jnp.asarray(object_vectors_init, dtype=dtype),
        object_kernel_normalize=object_kernel_normalize,
        ov_joint=ov_joint,
        jitter=jitter,
        alpha_transform=alpha_transform,
        alpha_max=alpha_max,
    )


def casale_noise(gp: "CasaleGP"):
    """Raw alpha parameter -> (pre-floor) noise value per alpha_transform.
    Consumers still pass the result through `effective_alpha` (a no-op
    above the floor; softplus output is always positive so the floor
    never binds there).  When `gp.alpha_max > 0` the value is ceilinged
    with the same straight-through trick as the floor (identity gradient,
    so a raw alpha driven above the cap can still train back down)."""
    noise = (jax.nn.softplus(gp.alpha)
             if gp.alpha_transform == "softplus" else gp.alpha)
    if gp.alpha_max > 0:
        capped = jnp.minimum(noise, gp.alpha_max)
        noise = noise + jax.lax.stop_gradient(capped - noise)
    return noise


def casale_kernel_matrix(gp: CasaleGP, x: Array, y: Array,
                         x_has_id: bool = True,
                         y_has_id: bool = True) -> Array:
    """Product kernel K(x, y) = ExpSinSquared(angle) * Linear(object vec).

    Reference: casaleGP.kernel_matrix (GPVAE_Casale_model.py:249-276).
    Aux rows are [id, angle, pca...] when `*_has_id`, else [angle, pca...]
    (the reference's test aux data carries no id column and uses the PCA
    columns directly).
    """
    def unpack(aux, has_id):
        if has_id:
            view = aux[:, 1:2]
            if gp.ov_joint:
                obj = jnp.take(gp.object_vectors,
                               aux[:, 0].astype(jnp.int32), axis=0)
            else:
                obj = aux[:, 2:]
        else:
            view = aux[:, 0:1]
            obj = aux[:, 1:]
        return view, obj

    xv, xo = unpack(x, x_has_id)
    yv, yo = unpack(y, y_has_id)

    k_view = kernels.exp_sin_squared_matrix(xv, yv, gp.amplitude,
                                            gp.length_scale, 2.0 * jnp.pi)
    k_obj = kernels.linear_matrix(xo, yo)
    if gp.object_kernel_normalize:
        k_obj = kernels.cosine_normalize_matrix(k_obj, xo, yo)
    return k_view * k_obj


def mask_to_indices(train_ids_mask) -> "np.ndarray":
    """Host-side: boolean row mask -> integer gather indices (static)."""
    import numpy as np
    return np.nonzero(np.asarray(train_ids_mask))[0]


@linalg.precise
def v_matrix(gp: CasaleGP, unique_angles: Array, object_ids: Array,
             train_ids_mask: Array) -> Array:
    """Low-rank factor V with K ~= V V^T + alpha I.

    V-tilde = kron(object_vectors, chol(K_view)) over the sorted unique
    (object, angle) grid, subsampled to the rows actually present in the
    train set (reference: casaleGP.V_matrix, GPVAE_Casale_model.py:278-309).

    unique_angles: (Q,) sorted unique train angles; object_ids: (P,) sorted
    unique object ids; train_ids_mask: (P*Q,) boolean row mask OR the
    precomputed integer indices from `mask_to_indices` (required under jit —
    boolean masking has a data-dependent shape).  Returns V (N, H) with
    H = M * Q (object-vector dim x angles).
    """
    ov = jnp.take(gp.object_vectors, object_ids.astype(jnp.int32), axis=0)
    if gp.object_kernel_normalize:
        ov = ov / jnp.linalg.norm(ov, axis=-1, keepdims=True)

    K_w = kernels.exp_sin_squared_matrix(
        unique_angles[:, None], unique_angles[:, None], gp.amplitude,
        gp.length_scale, 2.0 * jnp.pi)
    # absolute + relative jitter: the angle gram is near-singular in f32
    # once length_scale grows past ~1 (measured spectrum at Q=15 angles:
    # lambda_min 2.7e-6 at l=1.03, 2e-8 at l=1.5, vs f32 roundoff
    # lambda_max*eps ~ 1e-6), and a failed Cholesky here propagates NaN
    # through V into every GP gradient.  The reference survives only
    # because it runs this factorization in float64
    # (GPVAE_Casale_model.py:300-303).  Same pattern as svgp._sigma_cholesky.
    diag_scale = jnp.mean(jnp.diagonal(K_w))
    L_w = linalg.safe_cholesky(K_w, gp.jitter + 1e-5 * diag_scale)

    V_tilde = kron(ov, L_w)  # (P*Q, M*Q)
    # the mask is a host-side constant of the sorted train layout, so rows
    # are gathered with a static index set (jit-safe)
    if train_ids_mask.dtype == jnp.bool_:
        idx = jnp.asarray(mask_to_indices(train_ids_mask))
    else:
        idx = train_ids_mask
    return jnp.take(V_tilde, idx, axis=0)


ALPHA_FLOOR = 1e-5


def effective_alpha(alpha):
    """f32 guard on the latent-GP observation noise, shared by every
    consumer (Woodbury solves AND the c*alpha Taylor term in
    forward_pass_casale) so the objective stays internally consistent
    when the raw parameter is driven to/below zero.

    Straight-through clamp: the VALUE is floored at ALPHA_FLOOR but the
    gradient is the identity, so a raw alpha that trains below the floor
    is not permanently frozen there (a plain `maximum` has zero gradient
    below the floor — a one-way trap the reference's float64 dynamics
    never hit).  PARITY.md divergence #7 documents this.
    """
    clamped = jnp.maximum(alpha, ALPHA_FLOOR)
    return alpha + jax.lax.stop_gradient(clamped - alpha)


@linalg.precise
def casale_k_inv(V: Array, alpha) -> Array:
    """Woodbury inverse K^{-1} = (1/a) I - (1/a) V (a I + V^T V)^{-1} V^T.

    Reference: GPVAE_Casale_model.py:330-332.  Materializes the (N, N)
    inverse like the reference; the factored application
    `apply_k_inv` below should be preferred in new code paths.
    """
    N, H = V.shape
    dtype = V.dtype
    alpha = effective_alpha(alpha)
    inner = alpha * jnp.eye(H, dtype=dtype) + V.T @ V
    inner_chol = linalg.safe_cholesky(
        inner, 1e-7 * jnp.trace(inner) / H)
    sol = linalg.cho_solve(inner_chol, V.T)  # (H, N)
    return (jnp.eye(N, dtype=dtype) - V @ sol) / alpha


@linalg.precise
def apply_k_inv(V: Array, alpha, rhs: Array) -> Array:
    """K^{-1} @ rhs without materializing the (N, N) inverse."""
    H = V.shape[1]
    alpha = effective_alpha(alpha)
    inner = alpha * jnp.eye(H, dtype=V.dtype) + V.T @ V
    inner_chol = linalg.safe_cholesky(
        inner, 1e-7 * jnp.trace(inner) / H)
    return (rhs - V @ linalg.cho_solve(inner_chol, V.T @ rhs)) / alpha


@linalg.precise
def taylor_terms(gp: CasaleGP, Z: Array, V: Array
                 ) -> Tuple[Array, Array, Array, Array]:
    """Factored first-order Taylor pieces (a, ztKV, K_inv_V, c) of the
    GP prior term, WITHOUT materializing the (L, N, H) B tensor.

    B_l = -K_inv z_l (z_l^T K_inv V) + K_inv V factorizes as a rank-1
    update of the shared K_inv_V, and the training pass only ever reads
    B at the batch's rows (forward_pass_Casale gathers by global index,
    GPVAE_Casale_model.py:109-116), so the gather commutes with the
    outer-product construction: B[l, batch] = -a[l, batch, None] *
    ztKV[l, None, :] + K_inv_V[batch].  Returns a (L, N) = (K^{-1}Z)^T,
    ztKV (L, H), K_inv_V (N, H), c (L,).  Exactly the reference math
    (the (L, N, H) form is pinned against the dense naive loop in
    tests/test_baseline_gps.py; the gathered identity in
    tests/test_models.py), with O(L N H) less HBM traffic per training
    step.  Every K^{-1} application is the factored Woodbury form (see
    taylor_coeffs below for the derivation and citations).
    """
    N, H = V.shape
    dtype = V.dtype
    alpha = effective_alpha(casale_noise(gp))
    inner = alpha * jnp.eye(H, dtype=dtype) + V.T @ V  # (H, H)
    inner_chol = linalg.safe_cholesky(inner, 1e-7 * jnp.trace(inner) / H)

    def kinv_apply(rhs):
        return (rhs - V @ linalg.cho_solve(inner_chol, V.T @ rhs)) / alpha

    KZ = kinv_apply(Z)  # (N, L)
    K_inv_V = kinv_apply(V)  # (N, H)
    a = KZ.T  # (L, N)
    ztKV = Z.T @ K_inv_V  # (L, H)
    tr_K_inv = (N - jnp.trace(linalg.cho_solve(inner_chol, V.T @ V))) / alpha
    c = 0.5 * (-jnp.sum(KZ * KZ, axis=0) + tr_K_inv)  # (L,)
    return a, ztKV, K_inv_V, c


def taylor_coeffs(gp: CasaleGP, Z: Array, V: Array
                  ) -> Tuple[Array, Array, Array]:
    """First-order Taylor coefficients (a, B, c) of the GP prior term.

    Reference: casaleGP.taylor_coeff (GPVAE_Casale_model.py:311-351) —
    "Implementation of low-memory stochastic backpropagation" in Casale's
    paper.  Z: (N, L) latent samples over the full train set, V: (N, H).

    Returns a (L, N), B (L, N, H), c (L,).  The reference's Python loop
    over channels becomes batched matmuls, and — unlike the reference,
    which materializes the (N, N) Woodbury inverse and multiplies it
    into V and Z (GPVAE_Casale_model.py:330-341, O(N^2 H) per step) —
    every K^{-1} application here goes through the factored form
    (rhs - V (alpha I + V^T V)^{-1} V^T rhs) / alpha and
    tr K^{-1} = (N - tr((alpha I + V^T V)^{-1} V^T V)) / alpha,
    i.e. O(N H^2 + N H L + H^3): exactly the same math (pinned against
    the dense-inverse naive loop in
    tests/test_baseline_gps.py::test_taylor_coeffs_vs_naive_loop), ~30x
    fewer FLOPs at the N=4050 reference scale where this runs once per
    training step (MNIST_experiment.py:1020-1023 semantics).

    The training path should prefer `taylor_terms` + the gathered B
    construction in forward_pass_casale (B=None), which never forms the
    (L, N, H) tensor at all; this function materializes it for
    API/parity consumers.
    """
    a, ztKV, K_inv_V, c = taylor_terms(gp, Z, V)
    # B_l = -K_inv z_l z_l^T K_inv_V + K_inv_V
    B = -a[:, :, None] * ztKV[:, None, :] + K_inv_V[None]  # (L, N, H)
    return a, B, c
