"""Classic Hensman (2013) SVI-GP with explicit variational parameters.

Reference: SVIGP_Hensman (SVIGP_Hensman_model.py:14-227).  Unlike the
SVGPVAE's implied q(u), this model carries trainable per-channel variational
loc m_l (m,) and scale A_l (m, m) plus a trainable scalar likelihood noise.
All L channels are processed at once (the reference loops in Python).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from svgpvae_tpu import kernels, linalg


@struct.dataclass
class SVIGP:
    """Parameters; kernel identical to the rotated-MNIST SVGPVAE kernel
    (reference: SVIGP_Hensman_model.py:56-57, 79-125)."""

    inducing_points: Array  # (m, 2 + M)
    length_scale: Array
    amplitude: Array
    object_vectors: Optional[Array]  # (n_objects, M) or None
    q_mu: Array      # (L, m) variational locs
    q_scale: Array   # (L, m, m) variational scale factors (S = A A^T)
    noise: Array     # scalar likelihood noise (enters as 1/noise)
    jitter: float = struct.field(pytree_node=False, default=1e-6)
    N_train: int = struct.field(pytree_node=False, default=0)
    K_obj_normalize: bool = struct.field(pytree_node=False, default=False)

    def _features(self, aux: Array, inducing: bool):
        view = aux[:, 1:2]
        if self.object_vectors is None or inducing:
            obj = aux[:, 2:]
        else:
            obj = jnp.take(self.object_vectors,
                           aux[:, 0].astype(jnp.int32), axis=0)
        return view, obj

    def kmat(self, x, y, x_inducing: bool = True, y_inducing: bool = True):
        xv, xo = self._features(x, x_inducing)
        yv, yo = self._features(y, y_inducing)
        k_view = kernels.exp_sin_squared_matrix(
            xv, yv, self.amplitude, self.length_scale, 2.0 * jnp.pi)
        k_obj = kernels.linear_matrix(xo, yo)
        if self.K_obj_normalize:
            k_obj = kernels.cosine_normalize_matrix(k_obj, xo, yo)
        return k_view * k_obj

    def kdiag(self, x, y, x_inducing: bool = True, y_inducing: bool = True):
        xv, xo = self._features(x, x_inducing)
        yv, yo = self._features(y, y_inducing)
        k_view = kernels.exp_sin_squared_diag(
            xv, yv, self.amplitude, self.length_scale, 2.0 * jnp.pi)
        k_obj = kernels.linear_diag(xo, yo)
        if self.K_obj_normalize:
            k_obj = kernels.cosine_normalize_diag(k_obj, xo, yo)
        return k_view * k_obj


def init_svigp(initial_inducing_points, object_vectors_init, L: int,
               N_train: int, jitter: float = 1e-6,
               K_obj_normalize: bool = False, dtype=jnp.float32) -> SVIGP:
    """Zero locs, identity scales, noise 0.1 (reference:
    SVIGP_Hensman_model.py:68-77)."""
    ip = jnp.asarray(initial_inducing_points, dtype=dtype)
    m = ip.shape[0]
    return SVIGP(
        inducing_points=ip,
        length_scale=jnp.asarray(1.0, dtype=dtype),
        amplitude=jnp.asarray(1.0, dtype=dtype),
        object_vectors=None if object_vectors_init is None
        else jnp.asarray(object_vectors_init, dtype=dtype),
        q_mu=jnp.zeros((L, m), dtype=dtype),
        q_scale=jnp.tile(jnp.eye(m, dtype=dtype)[None], (L, 1, 1)),
        noise=jnp.asarray(0.1, dtype=dtype),
        jitter=jitter,
        N_train=N_train,
        K_obj_normalize=K_obj_normalize,
    )


@linalg.precise
def svigp_variational_loss(gp: SVIGP, aux: Array):
    """L_H pieces for all channels (reference:
    SVIGP_Hensman.variational_loss, SVIGP_Hensman_model.py:135-198).

    Note the reference's sum term keeps only the K_tilde and trace pieces
    (the data-fit quadratic lives in the driver's exact-Gaussian ELBO,
    SVIGP_Hensman_model.py:285-286); we mirror that split.

    Returns (sum_terms (L,), kl_terms (L,), mean_vectors (b, L)).
    """
    z = gp.inducing_points
    Kmm = gp.kmat(z, z)
    Kmm_chol = linalg.safe_cholesky(Kmm, gp.jitter)
    Knm = gp.kmat(aux, z, x_inducing=False)  # (b, m)
    Knn_diag = gp.kdiag(aux, aux, x_inducing=False, y_inducing=False)

    S = gp.q_scale @ jnp.swapaxes(gp.q_scale, -1, -2)  # (L, m, m)

    W = linalg.cho_solve(Kmm_chol, Knm.T)  # (m, b)
    mean_vectors = jnp.einsum("mb,lm->bl", W, gp.q_mu)  # (b, L)

    precision = 1.0 / gp.noise
    k_tilde = Knn_diag - jnp.sum(Knm * W.T, axis=-1)  # (b,)
    wSw = jnp.einsum("mb,lmp,pb->lb", W, S, W)  # (L, b)

    sum_terms = -0.5 * (precision * jnp.sum(k_tilde)
                        + precision * jnp.sum(wSw, axis=-1))  # (L,)

    kl_fn = jax.vmap(
        lambda mu, Sl: linalg.mvn_kl_against_prior(mu, Sl, Kmm_chol,
                                                   gp.jitter))
    kl_terms = kl_fn(gp.q_mu, S)
    return sum_terms, kl_terms, mean_vectors


@linalg.precise
def svigp_posterior_params(gp: SVIGP, aux_test: Array):
    """Predictive posterior q_S at test points for all channels.

    Reference: SVIGP_Hensman.approximate_posterior_params
    (SVIGP_Hensman_model.py:200-227).  Returns (p_m (x, L), p_v (x, L)).
    """
    z = gp.inducing_points
    Kmm = gp.kmat(z, z)
    Kmm_chol = linalg.safe_cholesky(Kmm, gp.jitter)
    Kxm = gp.kmat(aux_test, z, x_inducing=False)  # (x, m)
    Kxx_diag = gp.kdiag(aux_test, aux_test, x_inducing=False,
                        y_inducing=False)

    A = linalg.cho_solve(Kmm_chol, Kxm.T).T  # (x, m) = K_xm K_mm^{-1}
    p_m = jnp.einsum("xm,lm->xl", A, gp.q_mu)

    S = gp.q_scale @ jnp.swapaxes(gp.q_scale, -1, -2)  # (L, m, m)
    mid = Kmm[None] - S  # (L, m, m)
    quad = jnp.einsum("xm,lmp,xp->xl", A, mid, A)
    p_v = Kxx_diag[:, None] - quad
    return p_m, p_v
