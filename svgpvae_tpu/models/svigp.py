"""Deep SVIGP (decoder-only Hensman baseline) forward/predict passes.

Reference: forward_pass_deep_SVIGP_Hensman / predict_deep_SVIGP_Hensman
(SVIGP_Hensman_model.py:230-339).  No encoder: GP posterior means feed the
decoder; exact Gaussian likelihood with trainable noise.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from svgpvae_tpu import linalg
from svgpvae_tpu.gp.svigp import (SVIGP, svigp_posterior_params,
                                  svigp_variational_loss)


class SVIGPOutputs(NamedTuple):
    elbo: Array
    recon_loss: Array   # per-pixel MSE sum
    kl_term: Array
    inside_elbo: Array
    recon_images: Array
    inside_elbo_recon: Array
    inside_elbo_kl: Array
    latent_samples: Array  # posterior mean vectors (b, L)


def forward_pass_deep_svigp(decoder, dec_params, gp: SVIGP,
                            batch) -> SVIGPOutputs:
    """Exact Gaussian-likelihood ELBO (reference:
    SVIGP_Hensman_model.py:230-289):

      elbo = -bK log(noise) - 0.5 bK log(2 pi) - recon / (2 noise^2)
             + [sum_terms - (b/N) KL]

    aux rows are [global_index, id, angle, pca...]; the GP consumes columns
    1: (the reference drops the global index the same way, :257).
    """
    images, aux_data = batch
    b = images.shape[0]
    K = images.shape[1] * images.shape[2] * images.shape[3]

    sum_terms, kl_terms, mean_vectors = svigp_variational_loss(
        gp, aux_data[:, 1:])
    inside_elbo_recon = jnp.sum(sum_terms)
    inside_elbo_kl = jnp.sum(kl_terms)
    inside_elbo = inside_elbo_recon - (b / gp.N_train) * inside_elbo_kl

    recon_images = decoder.apply(dec_params, mean_vectors)
    recon_sum = jnp.sum((images - recon_images) ** 2)

    log2pi = jnp.asarray(linalg.LOG_2PI, images.dtype)
    elbo = (-b * K * jnp.log(gp.noise) - 0.5 * b * K * log2pi
            - 0.5 * recon_sum / (gp.noise ** 2) + inside_elbo)

    return SVIGPOutputs(elbo=elbo, recon_loss=recon_sum / K,
                        kl_term=inside_elbo, inside_elbo=inside_elbo,
                        recon_images=recon_images,
                        inside_elbo_recon=inside_elbo_recon,
                        inside_elbo_kl=inside_elbo_kl,
                        latent_samples=mean_vectors)


def predict_deep_svigp(decoder, dec_params, gp: SVIGP, batch):
    """Posterior means at test aux data -> decode -> per-pixel MSE sum
    (reference: predict_deep_SVIGP_Hensman, SVIGP_Hensman_model.py:292-339)."""
    images, aux_data = batch
    K = images.shape[1] * images.shape[2]

    p_m, _ = svigp_posterior_params(gp, aux_data[:, 1:])
    recon = decoder.apply(dec_params, p_m)
    recon_loss = jnp.sum((images - recon) ** 2) / K
    return recon, recon_loss
