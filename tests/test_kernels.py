"""Kernel math identities vs direct numpy computations."""

import numpy as np
import jax.numpy as jnp
import pytest

from svgpvae_tpu import kernels

RNG = np.random.RandomState(0)


def _np_rbf(x, y, l, a=None):
    d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    k = np.exp(-0.5 * d2 / l**2)
    return k if a is None else a * a * k


def _np_ess(x, y, a, l, p):
    d1 = np.abs(x[:, None, :] - y[None, :, :]).sum(-1)
    return a * a * np.exp(-2 * np.sin(np.pi * d1 / p) ** 2 / l**2)


@pytest.mark.parametrize("n,m,d", [(7, 5, 1), (16, 16, 3), (1, 9, 4)])
def test_rbf_matrix(n, m, d):
    x, y = RNG.randn(n, d), RNG.randn(m, d)
    got = kernels.rbf_matrix(jnp.asarray(x), jnp.asarray(y), 1.7, 0.9)
    # fp32 + the ||x||^2 - 2<x,y> + ||y||^2 expansion -> ~1e-5 cancellation
    np.testing.assert_allclose(got, _np_rbf(x, y, 1.7, 0.9), atol=5e-5)


def test_rbf_diag_matches_matrix_diag():
    x = RNG.randn(9, 2)
    full = kernels.rbf_matrix(jnp.asarray(x), jnp.asarray(x), 2.0)
    diag = kernels.rbf_diag(jnp.asarray(x), jnp.asarray(x), 2.0)
    np.testing.assert_allclose(np.diag(full), diag, atol=1e-5)
    np.testing.assert_allclose(diag, np.ones(9), atol=1e-6)


def test_exp_sin_squared_periodicity():
    x = RNG.rand(8, 1) * 2 * np.pi
    y = x + 2 * np.pi  # one full period away
    k_same = kernels.exp_sin_squared_diag(
        jnp.asarray(x), jnp.asarray(x), 1.3, 0.8, 2 * np.pi)
    k_period = kernels.exp_sin_squared_diag(
        jnp.asarray(x), jnp.asarray(y), 1.3, 0.8, 2 * np.pi)
    np.testing.assert_allclose(k_same, k_period, atol=1e-5)
    np.testing.assert_allclose(k_same, 1.3**2 * np.ones(8), atol=1e-5)


def test_exp_sin_squared_matrix():
    x, y = RNG.rand(6, 1), RNG.rand(4, 1)
    got = kernels.exp_sin_squared_matrix(
        jnp.asarray(x), jnp.asarray(y), 0.5, 1.1, 2 * np.pi)
    np.testing.assert_allclose(got, _np_ess(x, y, 0.5, 1.1, 2 * np.pi),
                               atol=1e-6)


def test_linear_and_cosine_normalize():
    x, y = RNG.randn(5, 8), RNG.randn(3, 8)
    k = kernels.linear_matrix(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(k, x @ y.T, atol=1e-5)

    kn = kernels.cosine_normalize_matrix(k, jnp.asarray(x), jnp.asarray(y))
    assert np.all(np.abs(np.asarray(kn)) <= 1.0 + 1e-5)
    # normalized self-kernel diagonal is exactly 1
    ks = kernels.linear_matrix(jnp.asarray(x), jnp.asarray(x))
    kns = kernels.cosine_normalize_matrix(ks, jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.diag(kns), np.ones(5), atol=1e-5)

    kd = kernels.linear_diag(jnp.asarray(x), jnp.asarray(x))
    knd = kernels.cosine_normalize_diag(kd, jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(knd, np.ones(5), atol=1e-5)


def test_symmetry_and_psd():
    x = RNG.randn(20, 3)
    for k in (kernels.rbf_matrix(jnp.asarray(x), jnp.asarray(x), 1.0),
              kernels.exp_sin_squared_matrix(jnp.asarray(x[:, :1]),
                                             jnp.asarray(x[:, :1]),
                                             1.0, 1.0, 2 * np.pi)):
        k = np.asarray(k)
        np.testing.assert_allclose(k, k.T, atol=1e-6)
        evals = np.linalg.eigvalsh(k + 1e-6 * np.eye(len(k)))
        assert evals.min() > 0
