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
