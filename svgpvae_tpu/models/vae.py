"""Plain VAE / CVAE forward passes on image data.

Reference: forward_pass_standard_VAE_rotated_mnist
(SVGPVAE_model.py:718-782) and predict_CVAE (:785-820).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from svgpvae_tpu import linalg

QVAR_CLIP = (1e-3, 10.0)


class VAEOutputs(NamedTuple):
    recon_loss: Array      # per-pixel MSE sum
    kl_term: Array
    elbo: Array
    recon_images: Array
    qnet_mu: Array
    qnet_var: Array
    latent_samples: Array


def cvae_inputs(images: Array, angles: Array) -> Array:
    """Concatenate sin/cos angle channel maps to the images (reference:
    SVGPVAE_model.py:737-740)."""
    b, h, w, _ = images.shape
    sin_map = jnp.broadcast_to(
        jnp.sin(angles)[:, None, None, None], (b, h, w, 1)).astype(images.dtype)
    cos_map = jnp.broadcast_to(
        jnp.cos(angles)[:, None, None, None], (b, h, w, 1)).astype(images.dtype)
    return jnp.concatenate([images, sin_map, cos_map], axis=3)


def forward_pass_vae(vae, vae_params, batch, key,
                     sigma_gaussian_decoder: float = 0.01,
                     clip_qs: bool = False,
                     cvae: bool = False) -> VAEOutputs:
    """Standard-normal-prior VAE ELBO with a Gaussian decoder.

    elbo = -recon/(2 sigma^2) - KL;  the reported recon loss is the
    per-pixel MSE sum (reference: SVGPVAE_model.py:764-781).
    """
    images, aux_data = batch
    K = images.shape[1] * images.shape[2] * images.shape[3]

    if cvae:
        angles = aux_data[:, 1]
        qnet_mu, qnet_var = vae.apply(vae_params, cvae_inputs(images, angles),
                                      angles, method=vae.encode)
    else:
        qnet_mu, qnet_var = vae.apply(vae_params, images, method=vae.encode)

    if clip_qs:
        qnet_var = jnp.clip(qnet_var, *QVAR_CLIP)

    eps = jax.random.normal(key, qnet_mu.shape, dtype=qnet_mu.dtype)
    latent_samples = qnet_mu + eps * linalg.stable_sqrt(qnet_var)

    if cvae:
        recon_images = vae.apply(vae_params, latent_samples, aux_data[:, 1],
                                 method=vae.decode)
    else:
        recon_images = vae.apply(vae_params, latent_samples,
                                 method=vae.decode)

    recon_sum = jnp.sum((images - recon_images) ** 2)
    kl_term = linalg.kl_diag_standard_normal(qnet_mu, qnet_var)
    elbo = -(0.5 / sigma_gaussian_decoder**2) * recon_sum - kl_term

    return VAEOutputs(recon_loss=recon_sum / K, kl_term=kl_term, elbo=elbo,
                      recon_images=recon_images, qnet_mu=qnet_mu,
                      qnet_var=qnet_var, latent_samples=latent_samples)


def predict_cvae(vae, vae_params, images_train: Array, aux_train: Array,
                 images_test: Array, aux_test: Array, key,
                 n_objects: int):
    """CVAE conditional generation: encode train, average latent samples per
    object id, decode at the test angle (reference: predict_CVAE,
    SVGPVAE_model.py:785-820).

    Object ids in aux column 0 must be integers in [0, n_objects); the
    per-id averaging is a segment mean so it stays O(N) and jit-compatible
    (the reference loops over test ids with boolean masks).
    """
    angles_train = aux_train[:, 1]
    qnet_mu, qnet_var = vae.apply(
        vae_params, cvae_inputs(images_train, angles_train), angles_train,
        method=vae.encode)
    eps = jax.random.normal(key, qnet_mu.shape, dtype=qnet_mu.dtype)
    latent = qnet_mu + eps * linalg.stable_sqrt(qnet_var)

    ids = aux_train[:, 0].astype(jnp.int32)
    sums = jax.ops.segment_sum(latent, ids, num_segments=n_objects)
    counts = jax.ops.segment_sum(jnp.ones_like(ids, dtype=latent.dtype), ids,
                                 num_segments=n_objects)
    means_per_id = sums / jnp.maximum(counts, 1.0)[:, None]

    test_ids = aux_test[:, 0].astype(jnp.int32)
    latent_test = jnp.take(means_per_id, test_ids, axis=0)

    recon = vae.apply(vae_params, latent_test, aux_test[:, 1],
                      method=vae.decode)
    recon_loss = jnp.mean((images_test - recon) ** 2)
    return recon, recon_loss
