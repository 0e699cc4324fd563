"""Casale GPVAE forward/predict passes.

Reference: GPVAE_Casale_model.py:69-203 (encode / forward_pass_Casale /
predict_test_set_Casale).  The training pass consumes Taylor coefficients
precomputed over the FULL train set (gathered per batch by global index);
prediction uses the Woodbury full-GP posterior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from svgpvae_tpu import linalg
from svgpvae_tpu.gp.casale import (CasaleGP, apply_k_inv,
                                   casale_kernel_matrix, casale_noise,
                                   effective_alpha)

QVAR_CLIP = (1e-3, 100.0)  # reference: GPVAE_Casale_model.py:87, 124


class CasaleOutputs(NamedTuple):
    elbo: Array          # minimized directly (reference optimizes +elbo)
    recon_loss: Array    # per-pixel MSE sum
    gp_prior_term: Array
    log_var: Array
    qnet_mu: Array
    qnet_var: Array
    recon_images: Array


def encode_full_casale(vae, vae_params, images: Array, key,
                       clip_qs: bool = False) -> Array:
    """Encode + sample latent vectors z for (a chunk of) the train set
    (reference: encode, GPVAE_Casale_model.py:69-93)."""
    qnet_mu, qnet_var = vae.apply(vae_params, images, method=vae.encode)
    if clip_qs:
        qnet_var = jnp.clip(qnet_var, *QVAR_CLIP)
    eps = jax.random.normal(key, qnet_mu.shape, dtype=qnet_mu.dtype)
    return qnet_mu + eps * linalg.stable_sqrt(qnet_var)


def forward_pass_casale(vae, vae_params, gp: CasaleGP, batch, key,
                        a: Array, B, c: Array, V: Array, beta,
                        clip_qs: bool = False, ztKV=None,
                        K_inv_V=None) -> CasaleOutputs:
    """Training pass using first-order Taylor coefficients (reference:
    forward_pass_Casale, GPVAE_Casale_model.py:96-155).

    a (L, N), B (L, N, H), c (L,), V (N, H); the batch's aux rows carry the
    global train index in column 0 (sorted-train layout).

    B=None takes the factored path: pass ztKV (L, H) and K_inv_V (N, H)
    from gp.taylor_terms instead, and the batch's B rows are built from
    the gathered pieces (B[l, batch] = -a[l, batch, None] * ztKV[l] +
    K_inv_V[batch]) — algebraically identical (the gather commutes with
    the rank-1 construction; pinned in tests/test_models.py) with no
    (L, N, H) tensor ever materialized.
    """
    images, aux_data = batch
    batch_idx = aux_data[:, 0].astype(jnp.int32)
    K = images.shape[1] * images.shape[2]

    qnet_mu, qnet_var = vae.apply(vae_params, images, method=vae.encode)
    L = qnet_mu.shape[1]
    if clip_qs:
        qnet_var = jnp.clip(qnet_var, *QVAR_CLIP)

    log_var = jnp.sum(jnp.log(qnet_var))

    eps = jax.random.normal(key, qnet_mu.shape, dtype=qnet_mu.dtype)
    latent = qnet_mu + eps * linalg.stable_sqrt(qnet_var)

    # gather per-batch Taylor pieces from the full-train coefficients
    a_batch = jnp.take(a, batch_idx, axis=1)        # (L, b)
    V_batch = jnp.take(V, batch_idx, axis=0)        # (b, H)
    if B is None:
        kiv_batch = jnp.take(K_inv_V, batch_idx, axis=0)   # (b, H)
        B_batch = (-a_batch[:, :, None] * ztKV[:, None, :]
                   + kiv_batch[None])               # (L, b, H)
    else:
        B_batch = jnp.take(B, batch_idx, axis=1)    # (L, b, H)

    gp_prior_term = (jnp.sum(latent * a_batch.T)
                     + jnp.sum(B_batch * V_batch[None])
                     + jnp.sum(c) * effective_alpha(casale_noise(gp)))

    recon_images = vae.apply(vae_params, latent, method=vae.decode)
    recon_sum = jnp.sum((images - recon_images) ** 2)

    # loss objective, eq. (18) of Casale's appendix (reference :150)
    elbo = recon_sum / K - (beta / L) * (gp_prior_term + 0.5 * log_var)

    return CasaleOutputs(elbo=elbo, recon_loss=recon_sum / K,
                         gp_prior_term=gp_prior_term, log_var=log_var,
                         qnet_mu=qnet_mu, qnet_var=qnet_var,
                         recon_images=recon_images)


def predict_cgen_casale(vae, vae_params, gp: CasaleGP, test_images: Array,
                        test_aux: Array, train_aux: Array, V: Array,
                        latent_train: Array, key, take_mean: bool = False,
                        noise_override=None):
    """Full-GP predictive posterior via the Woodbury inverse (reference:
    predict_test_set_Casale, GPVAE_Casale_model.py:158-203).

    train_aux rows are [global_id, object_id, angle, pca...] (sorted-train
    layout); test_aux rows are [object_id, angle, pca...].
    Returns (recon_images, mean per-pixel MSE).

    `noise_override` (None = reference semantics) replaces the TRAINED
    latent-GP noise alpha in the predictive smoother only — training is
    untouched.  Probe for the Casale scale-ridge diagnosis (RESULTS.md r4:
    alpha drifts 0.1 -> 17+ along an ELBO ridge while cgen stalls); if
    the ridge hurts only the smoother, a pinned predict-time noise
    recovers quality.  Exposed as cli.mnist --casale_predict_alpha.
    """
    L = latent_train.shape[1]
    noise = casale_noise(gp) if noise_override is None else \
        jnp.asarray(noise_override, dtype=latent_train.dtype)

    # the N-sized predictive solves are cancellation-heavy; keep them at
    # full matmul precision even when the global default is relaxed for
    # the conv nets (bf16 passes here push cgen MSE from ~0.05 to >1)
    @linalg.precise
    def posterior_mean_var():
        K_tt = casale_kernel_matrix(gp, test_aux, train_aux[:, 1:])  # (x, N)
        # factored Woodbury application (gp/casale.py apply_k_inv) — the
        # reference materializes the (N, N) inverse
        # (GPVAE_Casale_model.py:330-332, :173); same math, O(N H^2 +
        # N H x) instead of O(N^2 (N + x)), pinned in
        # tests/test_baseline_gps.py
        mean = K_tt @ apply_k_inv(V, noise, latent_train)  # (x, L)
        if take_mean:
            return mean, None
        K_xx = casale_kernel_matrix(gp, test_aux, test_aux)
        cov = K_xx - K_tt @ apply_k_inv(V, noise, K_tt.T)
        return mean, jnp.diag(cov)  # var same across channels (ref :193)

    mean, var = posterior_mean_var()
    if take_mean:
        latent_test = mean
    else:
        eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        latent_test = mean + eps * linalg.stable_sqrt(
            jnp.tile(var[:, None], (1, L)))

    recon = vae.apply(vae_params, latent_test, method=vae.decode)
    recon_loss = jnp.mean((test_images - recon) ** 2)
    return recon, recon_loss
