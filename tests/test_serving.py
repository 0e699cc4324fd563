"""Serving predictor: fit-once / predict-many equals the driver pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from svgpvae_tpu import gp as gpm, nn as nets, parallel, serving
from svgpvae_tpu.gp.svgp import SVGPConfig

KEY = jax.random.PRNGKey(0)
RNG = np.random.RandomState(6)


def _setup(N=64, L=4, M=3, m=6, n_obj=10):
    vae = nets.MnistVAE(L=L)
    vae_params = vae.init(KEY, jnp.zeros((2, 28, 28, 1)))
    ip = np.hstack([np.arange(m)[:, None], RNG.rand(m, 1) * 2 * np.pi,
                    RNG.randn(m, M)])
    gp = gpm.init_mnist_svgp(ip, RNG.randn(n_obj, M),
                             config=SVGPConfig(jitter=1e-6, N_train=N))
    aux = jnp.asarray(np.hstack([
        RNG.randint(0, n_obj, (N, 1)).astype(float),
        RNG.rand(N, 1) * 2 * np.pi, RNG.randn(N, M)]), jnp.float32)
    means = jnp.asarray(RNG.randn(N, L), jnp.float32)
    variances = jnp.asarray(RNG.rand(N, L) + 0.5, jnp.float32)
    return vae, vae_params, gp, aux, means, variances


def test_predictor_matches_direct_posterior():
    vae, vae_params, gp, aux, means, variances = _setup()
    pred = serving.fit(gp, means, variances, aux)
    predict = serving.make_predict_fn(pred, vae, vae_params, sample=False)

    aux_q = aux[:5]
    images, p_m, p_v = predict(aux_q, KEY)
    assert images.shape == (5, 28, 28, 1)

    # equals the direct full-conditioning posterior (scale == 1 at N == b)
    p_m_direct, p_v_direct, _, _ = gpm.posterior_params(
        gp, aux_q, aux, means, variances)
    np.testing.assert_allclose(p_m, p_m_direct, rtol=1e-4, atol=1e-5)


def test_predictor_fit_on_mesh():
    vae, vae_params, gp, aux, means, variances = _setup()
    mesh = parallel.make_mesh(8)
    pred_sharded = serving.fit(gp, means, variances, aux, mesh=mesh)
    pred_local = serving.fit(gp, means, variances, aux)
    np.testing.assert_allclose(pred_sharded.mean_terms,
                               pred_local.mean_terms, rtol=2e-4, atol=1e-5)


def test_predictor_sprites_family():
    """fit/predict also works for the SPRITES GP family (fast posterior)."""
    N, L, L_act, L_chr, m, n_act = 80, 6, 3, 5, 9, 12
    vae = nets.SpritesVAE(L=L)
    vae_params = vae.init(KEY, jnp.zeros((2, 64, 64, 3)))
    ip = RNG.randn(m, L_act + L_chr)
    gp = gpm.init_sprites_svgp(
        ip, RNG.randn(n_act, L_act), L_action=L_act,
        config=__import__("svgpvae_tpu.gp.svgp", fromlist=["SVGPConfig"]
                          ).SVGPConfig(jitter=1e-4, N_train=N))
    aux = jnp.asarray(np.hstack([
        RNG.randint(0, n_act, (N, 1)).astype(float),
        RNG.randn(N, L_chr)]), jnp.float32)
    means = jnp.asarray(RNG.randn(N, L), jnp.float32)
    variances = jnp.asarray(RNG.rand(N, L) + 0.5, jnp.float32)

    pred = serving.fit(gp, means, variances, aux)
    predict = serving.make_predict_fn(pred, vae, vae_params)
    images, p_m, p_v = predict(aux[:4], KEY)
    assert images.shape == (4, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(images)))
