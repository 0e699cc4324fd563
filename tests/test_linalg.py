"""Linear-algebra substrate identities."""

import numpy as np
import jax.numpy as jnp

from svgpvae_tpu import linalg

RNG = np.random.RandomState(1)


def _rand_psd(n, scale=1.0):
    a = RNG.randn(n, n) * scale
    return a @ a.T + 0.5 * np.eye(n)


def test_psd_solve_matches_numpy():
    m = _rand_psd(12)
    b = RNG.randn(12, 3)
    x = linalg.psd_solve(jnp.asarray(m), jnp.asarray(b), 0.0)
    np.testing.assert_allclose(x, np.linalg.solve(m, b), rtol=1e-4, atol=1e-4)


def test_psd_inverse():
    m = _rand_psd(8)
    inv = linalg.psd_inverse(jnp.asarray(m), 0.0)
    np.testing.assert_allclose(np.asarray(inv) @ m, np.eye(8), atol=1e-4)


def test_logdet_from_chol():
    m = _rand_psd(10)
    chol = linalg.safe_cholesky(jnp.asarray(m), 0.0)
    got = linalg.logdet_from_chol(chol)
    _, want = np.linalg.slogdet(m)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gauss_cross_entropy_against_mc():
    # E_{N(mu1, v1)}[log N(z; mu2, v2)] estimated by Monte Carlo.
    mu1, v1, mu2, v2 = 0.3, 0.5, -0.2, 1.4
    z = RNG.randn(2_000_000) * np.sqrt(v1) + mu1
    mc = np.mean(-0.5 * (np.log(2 * np.pi * v2) + (z - mu2) ** 2 / v2))
    got = linalg.gauss_cross_entropy(mu1, v1, mu2, v2)
    np.testing.assert_allclose(got, mc, atol=2e-3)


def test_kl_diag_standard_normal_closed_form():
    mean = RNG.randn(4, 3)
    var = RNG.rand(4, 3) + 0.1
    want = 0.5 * np.sum(var + mean**2 - 1.0 - np.log(var))
    got = linalg.kl_diag_standard_normal(jnp.asarray(mean), jnp.asarray(var))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mvn_kl_against_prior_naive():
    m = 6
    K = _rand_psd(m)
    S = _rand_psd(m, 0.5)
    mu = RNG.randn(m)
    K_chol = linalg.safe_cholesky(jnp.asarray(K), 0.0)
    got = linalg.mvn_kl_against_prior(jnp.asarray(mu), jnp.asarray(S),
                                      K_chol, 0.0)
    Kinv = np.linalg.inv(K)
    want = 0.5 * (np.linalg.slogdet(K)[1] - np.linalg.slogdet(S)[1] - m
                  + np.trace(Kinv @ S) + mu @ Kinv @ mu)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_reciprocal_no_nan():
    x = jnp.asarray([0.0, 2.0, -4.0])
    got = linalg.reciprocal_no_nan(x)
    np.testing.assert_allclose(got, [0.0, 0.5, -0.25])


def test_tree_value_clip():
    tree = {"a": jnp.asarray([-2e6, 3.0]), "b": jnp.asarray(2e6)}
    clipped = linalg.tree_value_clip(tree, 1e5)
    np.testing.assert_allclose(clipped["a"], [-1e5, 3.0])
    np.testing.assert_allclose(clipped["b"], 1e5)
