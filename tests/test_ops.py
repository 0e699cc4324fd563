"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from svgpvae_tpu.ops import gp_sufficient_stats, gp_sufficient_stats_reference

RNG = np.random.RandomState(9)


@pytest.mark.parametrize("n,m,L,tile", [(100, 32, 4, 64), (512, 72, 8, 128),
                                        (1000, 128, 16, 256)])
def test_gp_sufficient_stats_matches_reference(n, m, L, tile):
    Knm = jnp.asarray(RNG.randn(n, m), jnp.float32)
    prec = jnp.asarray(RNG.rand(n, L) + 0.5, jnp.float32)
    py = jnp.asarray(RNG.randn(n, L), jnp.float32)

    want_sigma, want_r = gp_sufficient_stats_reference(Knm, prec, py)
    got_sigma, got_r = gp_sufficient_stats(Knm, prec, py, tile_n=tile,
                                           interpret=True)
    np.testing.assert_allclose(got_sigma, want_sigma, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(got_r, want_r, rtol=2e-4, atol=2e-3)


def test_gp_sufficient_stats_padding_exactness():
    """Zero-padded n rows / m cols must not perturb the result."""
    n, m, L = 130, 17, 3  # deliberately unaligned
    Knm = jnp.asarray(RNG.randn(n, m), jnp.float32)
    prec = jnp.asarray(RNG.rand(n, L) + 0.5, jnp.float32)
    py = jnp.asarray(RNG.randn(n, L), jnp.float32)

    want_sigma, want_r = gp_sufficient_stats_reference(Knm, prec, py)
    got_sigma, got_r = gp_sufficient_stats(Knm, prec, py, tile_n=64,
                                           interpret=True)
    assert got_sigma.shape == (L, m, m)
    np.testing.assert_allclose(got_sigma, want_sigma, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(got_r, want_r, rtol=2e-4, atol=2e-3)


def test_gp_stats_custom_vjp_matches_reference_grads():
    import jax
    from svgpvae_tpu.ops.gp_stats import gp_stats

    n, m, L = 40, 9, 3
    Knm = jnp.asarray(RNG.randn(n, m), jnp.float32)
    prec = jnp.asarray(RNG.rand(n, L) + 0.5, jnp.float32)
    py = jnp.asarray(RNG.randn(n, L), jnp.float32)

    def scalar_of(f):
        def g(K, p, q):
            sigma, r = f(K, p, q)
            w_s = jnp.sin(jnp.arange(sigma.size).reshape(sigma.shape))
            w_r = jnp.cos(jnp.arange(r.size).reshape(r.shape))
            return jnp.sum(sigma * w_s) + jnp.sum(r * w_r)
        return g

    g1 = jax.grad(scalar_of(gp_stats), argnums=(0, 1, 2))(Knm, prec, py)
    g2 = jax.grad(scalar_of(gp_sufficient_stats_reference),
                  argnums=(0, 1, 2))(Knm, prec, py)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_fused_kernel_stats_mnist_family():
    from svgpvae_tpu.ops.fused_kernel_stats import fused_kernel_stats
    from svgpvae_tpu import kernels

    n, m, M, L = 200, 20, 8, 4
    view = jnp.asarray(RNG.rand(n, 1) * 2 * np.pi, jnp.float32)
    obj = jnp.asarray(RNG.randn(n, M), jnp.float32)
    ip_view = jnp.asarray(RNG.rand(m, 1) * 2 * np.pi, jnp.float32)
    ip_obj = jnp.asarray(RNG.randn(m, M), jnp.float32)
    prec = jnp.asarray(RNG.rand(n, L) + 0.5, jnp.float32)
    py = jnp.asarray(RNG.randn(n, L), jnp.float32)
    amp, ls = 0.9, 1.3

    for normalize in (False, True):
        k_view = kernels.exp_sin_squared_matrix(view, ip_view, amp, ls,
                                                2 * np.pi)
        k_obj = kernels.linear_matrix(obj, ip_obj)
        if normalize:
            k_obj = kernels.cosine_normalize_matrix(k_obj, obj, ip_obj)
        Knm = k_view * k_obj
        want_sigma, want_r = gp_sufficient_stats_reference(Knm, prec, py)

        got_sigma, got_r = fused_kernel_stats(
            view, obj, ip_view, ip_obj, prec, py, amp=amp,
            length_scale=ls, family="mnist", normalize=normalize,
            tile_n=64, interpret=True)
        np.testing.assert_allclose(got_sigma, want_sigma, rtol=2e-4,
                                   atol=2e-3)
        np.testing.assert_allclose(got_r, want_r, rtol=2e-4, atol=2e-3)


def test_fused_kernel_stats_sprites_family():
    from svgpvae_tpu.ops.fused_kernel_stats import fused_kernel_stats
    from svgpvae_tpu import kernels

    n, m, La, Lc, L = 150, 30, 3, 5, 6
    act = jnp.asarray(RNG.randn(n, La), jnp.float32)
    chr_ = jnp.asarray(RNG.randn(n, Lc), jnp.float32)
    ip_act = jnp.asarray(RNG.randn(m, La), jnp.float32)
    ip_chr = jnp.asarray(RNG.randn(m, Lc), jnp.float32)
    prec = jnp.asarray(RNG.rand(n, L) + 0.5, jnp.float32)
    py = jnp.asarray(RNG.randn(n, L), jnp.float32)

    for normalize in (False, True):
        k_a = kernels.linear_matrix(act, ip_act)
        k_c = kernels.linear_matrix(chr_, ip_chr)
        if normalize:
            k_a = kernels.cosine_normalize_matrix(k_a, act, ip_act)
            k_c = kernels.cosine_normalize_matrix(k_c, chr_, ip_chr)
        Knm = k_a * k_c
        want_sigma, want_r = gp_sufficient_stats_reference(Knm, prec, py)

        got_sigma, got_r = fused_kernel_stats(
            act, chr_, ip_act, ip_chr, prec, py, family="sprites",
            normalize=normalize, tile_n=64, interpret=True)
        np.testing.assert_allclose(got_sigma, want_sigma, rtol=2e-4,
                                   atol=2e-3)
        np.testing.assert_allclose(got_r, want_r, rtol=2e-4, atol=2e-3)


def test_gp_stats_env_override_dispatch(monkeypatch):
    """SVGPVAE_GP_STATS forces the dispatch (A/B measurement hook):
    'pallas' routes below the shape thresholds (interpret mode off-TPU)
    and matches the XLA reference; 'xla' always takes the reference."""
    from svgpvae_tpu.ops import gp_stats as gps
    Knm = jnp.asarray(RNG.rand(40, 12), jnp.float32)
    prec = jnp.asarray(RNG.rand(40, 4) + 0.5, jnp.float32)
    py = jnp.asarray(RNG.randn(40, 4), jnp.float32)
    want = gp_sufficient_stats_reference(Knm, prec, py)

    monkeypatch.setenv("SVGPVAE_GP_STATS", "pallas")
    assert gps._use_pallas(40, 12)
    got = gps.gp_stats(Knm, prec, py)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=2e-4, atol=2e-3)

    monkeypatch.setenv("SVGPVAE_GP_STATS", "xla")
    assert not gps._use_pallas(10**6, 128)
