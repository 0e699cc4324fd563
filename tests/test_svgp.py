"""SVGP math parity tests.

Strategy (SURVEY.md §4): (1) compare the channel-batched, Cholesky-based
implementations against naive dense float64 formulas written directly from
the reference math (explicit jittered inverses, per-channel loops);
(2) exact-GP equivalence when inducing points sit at the data points (m=N);
(3) cross-model identities (Titsias bound at m=N == exact log marginal).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from svgpvae_tpu import gp as gpm
from svgpvae_tpu import linalg
from svgpvae_tpu.gp.svgp import (SVGPConfig, ball_posterior_params,
                                 ball_variational_loss, hensman_terms,
                                 titsias_terms, kernel_matrices)

RNG = np.random.RandomState(7)
LOG2PI = np.log(2 * np.pi)


# ---------------------------------------------------------------------------
# naive float64 reference math (written from the formulas, per channel)
# ---------------------------------------------------------------------------


def np_mnist_kernel(x, y, ov, l, a, x_ind, y_ind, normalize=False):
    """[id, angle, obj...] product kernel, mirror of SVGPVAE_model.py:427-476."""
    xv, yv = x[:, 1], y[:, 1]
    xo = x[:, 2:] if (ov is None or x_ind) else ov[x[:, 0].astype(int)]
    yo = y[:, 2:] if (ov is None or y_ind) else ov[y[:, 0].astype(int)]
    dv = np.abs(xv[:, None] - yv[None, :])
    k_view = a**2 * np.exp(-2 * np.sin(np.pi * dv / (2 * np.pi))**2 / l**2)
    k_obj = xo @ yo.T
    if normalize:
        k_obj = k_obj / (np.linalg.norm(xo, axis=1)[:, None]
                         * np.linalg.norm(yo, axis=1)[None, :])
    return k_view * k_obj


def np_posterior_one_channel(Kmm, Knm, Kxm, Kxx_diag, y, noise, scale,
                             jitter):
    """mainSVGP.approximate_posterior_params math (SVGPVAE_model.py:303-343)."""
    m = Kmm.shape[0]
    prec = 1.0 / noise
    Kmm_inv = np.linalg.inv(Kmm + jitter * np.eye(m))
    Sigma = Kmm + scale * Knm.T @ (Knm * prec[:, None])
    Sigma_inv = np.linalg.inv(Sigma + jitter * np.eye(m))
    mean = scale * Kxm @ Sigma_inv @ (Knm.T @ (prec * y))
    B = (Kxx_diag - np.diag(Kxm @ Kmm_inv @ Kxm.T)
         + np.diag(Kxm @ Sigma_inv @ Kxm.T))
    mu_hat = scale * Kmm @ Sigma_inv @ (Knm.T @ (prec * y))
    A_hat = Kmm @ Sigma_inv @ Kmm
    return mean, B, mu_hat, A_hat


def np_hensman_one_channel(Kmm, Knm, Knn_diag, y, noise, mu_hat, A_hat,
                           jitter):
    """mainSVGP.variational_loss Hensman branch (SVGPVAE_model.py:261-301)."""
    b, m = Knm.shape
    prec = 1.0 / noise
    Kmm_inv = np.linalg.inv(Kmm + jitter * np.eye(m))
    mean_vec = Knm @ (Kmm_inv @ mu_hat)
    k_tilde = prec * (Knn_diag - np.diag(Knm @ Kmm_inv @ Knm.T))
    traces = np.array([
        prec[i] * np.trace(A_hat @ (Kmm_inv @ np.outer(Knm[i], Knm[i])
                                    @ Kmm_inv)) for i in range(b)])
    sum_term = -0.5 * (k_tilde.sum() + traces.sum() + np.log(noise).sum()
                       + b * LOG2PI + (prec * (y - mean_vec)**2).sum())
    sign, logdet_K = np.linalg.slogdet(Kmm + jitter * np.eye(m))
    sign, logdet_S = np.linalg.slogdet(A_hat + jitter * np.eye(m))
    kl = 0.5 * (logdet_K - logdet_S - m + np.trace(Kmm_inv @ A_hat)
                + mu_hat @ Kmm_inv @ mu_hat)
    return sum_term, kl


def np_titsias_one_channel(Kmm, Knm, Knn_diag, y, noise, jitter):
    """mainSVGP.variational_loss Titsias branch (SVGPVAE_model.py:246-259)."""
    b, m = Knm.shape
    prec = 1.0 / noise
    Kmm_inv = np.linalg.inv(Kmm + jitter * np.eye(m))
    Q = Knm @ Kmm_inv @ Knm.T
    cov = np.diag(noise) + Q
    cov_j = cov + jitter * np.eye(b)
    sign, logdet = np.linalg.slogdet(cov_j)
    quad = y @ np.linalg.solve(cov_j, y)
    trace = (prec * (Knn_diag - np.diag(Q))).sum()
    return -0.5 * (b * LOG2PI + logdet + quad + trace)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def make_mnist_gp(titsias=False, N_train=0, normalize=False, n_obj=11, M=4,
                  m=9):
    ip = np.hstack([np.arange(m)[:, None],
                    RNG.rand(m, 1) * 2 * np.pi,
                    RNG.randn(m, M)])
    ov = RNG.randn(n_obj, M)
    cfg = SVGPConfig(titsias=titsias, jitter=1e-8, N_train=N_train,
                     K_obj_normalize=normalize, sigma_rel_jitter=0.0)
    gp = gpm.init_mnist_svgp(ip, ov, config=cfg, dtype=jnp.float64)
    return gp, ip, ov


def make_aux(b, n_obj, M):
    return np.hstack([RNG.randint(0, n_obj, (b, 1)).astype(float),
                      RNG.rand(b, 1) * 2 * np.pi,
                      RNG.randn(b, M)])


@pytest.fixture(autouse=True, scope="module")
def _x64():
    import jax
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_mnist_kernel_matrix_vs_naive():
    gp, ip, ov = make_mnist_gp(normalize=True)
    aux = make_aux(13, 11, 4)
    got = gp.kmat(jnp.asarray(aux), jnp.asarray(ip), x_inducing=False)
    want = np_mnist_kernel(aux, ip, ov, 1.0, 1.0, False, True,
                           normalize=True)
    np.testing.assert_allclose(got, want, rtol=1e-8)

    got_d = gp.kdiag(jnp.asarray(aux), jnp.asarray(aux), x_inducing=False,
                     y_inducing=False)
    want_full = np_mnist_kernel(aux, aux, ov, 1.0, 1.0, False, False,
                                normalize=True)
    np.testing.assert_allclose(got_d, np.diag(want_full), rtol=1e-8)


@pytest.mark.parametrize("N_train,normalize", [(0, False), (500, True)])
def test_posterior_params_vs_naive(N_train, normalize):
    b, L, n_obj, M = 17, 3, 11, 4
    gp, ip, ov = make_mnist_gp(N_train=N_train, normalize=normalize)
    aux = make_aux(b, n_obj, M)
    aux_test = make_aux(5, n_obj, M)
    y = RNG.randn(b, L)
    noise = RNG.rand(b, L) + 0.3

    p_m, p_v, mu_hat, A_hat = gpm.posterior_params(
        gp, jnp.asarray(aux_test), jnp.asarray(aux), jnp.asarray(y),
        jnp.asarray(noise))

    Kmm = np_mnist_kernel(ip, ip, ov, 1.0, 1.0, True, True, normalize)
    Knm = np_mnist_kernel(aux, ip, ov, 1.0, 1.0, False, True, normalize)
    Kxm = np_mnist_kernel(aux_test, ip, ov, 1.0, 1.0, False, True, normalize)
    Kxx_diag = np.diag(np_mnist_kernel(aux_test, aux_test, ov, 1.0, 1.0,
                                       False, False, normalize))
    scale = N_train / b if N_train else 1.0

    for l in range(L):
        w_m, w_B, w_mu, w_A = np_posterior_one_channel(
            Kmm, Knm, Kxm, Kxx_diag, y[:, l], noise[:, l], scale, 1e-8)
        np.testing.assert_allclose(p_m[:, l], w_m, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(p_v[:, l], w_B, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(mu_hat[l], w_mu, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(A_hat[l], w_A, rtol=1e-6, atol=1e-9)


def test_hensman_terms_vs_naive():
    b, L, n_obj, M = 17, 3, 11, 4
    gp, ip, ov = make_mnist_gp(N_train=300)
    aux = make_aux(b, n_obj, M)
    y = RNG.randn(b, L)
    noise = RNG.rand(b, L) + 0.3

    _, _, mu_hat, A_hat = gpm.posterior_params(
        gp, jnp.asarray(aux), jnp.asarray(aux), jnp.asarray(y),
        jnp.asarray(noise))
    sum_terms, kl_terms = gpm.variational_loss(
        gp, jnp.asarray(aux), jnp.asarray(y), jnp.asarray(noise),
        mu_hat, A_hat)

    Kmm = np_mnist_kernel(ip, ip, ov, 1.0, 1.0, True, True)
    Knm = np_mnist_kernel(aux, ip, ov, 1.0, 1.0, False, True)
    Knn_diag = np.diag(np_mnist_kernel(aux, aux, ov, 1.0, 1.0, False, False))

    for l in range(L):
        w_sum, w_kl = np_hensman_one_channel(
            Kmm, Knm, Knn_diag, y[:, l], noise[:, l],
            np.asarray(mu_hat[l]), np.asarray(A_hat[l]), 1e-8)
        np.testing.assert_allclose(sum_terms[l], w_sum, rtol=1e-6)
        np.testing.assert_allclose(kl_terms[l], w_kl, rtol=1e-5)


def test_titsias_terms_vs_naive():
    b, L, n_obj, M = 14, 2, 11, 4
    gp, ip, ov = make_mnist_gp(titsias=True)
    aux = make_aux(b, n_obj, M)
    y = RNG.randn(b, L)
    noise = RNG.rand(b, L) + 0.3

    sum_terms, kl_terms = gpm.variational_loss(
        gp, jnp.asarray(aux), jnp.asarray(y), jnp.asarray(noise),
        None, None)
    assert np.allclose(kl_terms, 0.0)

    Kmm = np_mnist_kernel(ip, ip, ov, 1.0, 1.0, True, True)
    Knm = np_mnist_kernel(aux, ip, ov, 1.0, 1.0, False, True)
    Knn_diag = np.diag(np_mnist_kernel(aux, aux, ov, 1.0, 1.0, False, False))
    for l in range(L):
        want = np_titsias_one_channel(Kmm, Knm, Knn_diag, y[:, l],
                                      noise[:, l], 1e-8)
        np.testing.assert_allclose(sum_terms[l], want, rtol=1e-5)


def test_ball_svgp_exact_gp_equivalence_at_m_eq_n():
    """Inducing points at the data points => SVGP posterior == exact GP."""
    T, batch, C = 12, 4, 2
    times = np.arange(1.0, T + 1)
    cfg = SVGPConfig(jitter=1e-10)
    gp = gpm.init_ball_svgp(T, 1.0, float(T), 3.0, n_channels=C, config=cfg,
                            dtype=jnp.float64)
    y = RNG.randn(batch, T, C)
    noise = RNG.rand(batch, T, C) + 0.2

    p_m, p_v, _, _ = ball_posterior_params(gp, jnp.asarray(times),
                                           jnp.asarray(y), jnp.asarray(noise))

    # exact heteroscedastic GP posterior per batch/channel
    d2 = (times[:, None] - times[None, :])**2
    K = np.exp(-0.5 * d2 / 3.0**2)
    for bi in range(batch):
        for c in range(C):
            A = K + np.diag(noise[bi, :, c])
            want_mean = K @ np.linalg.solve(A, y[bi, :, c])
            want_cov = K - K @ np.linalg.solve(A, K)
            np.testing.assert_allclose(p_m[bi, :, c], want_mean, atol=1e-6)
            np.testing.assert_allclose(p_v[bi, :, :, c], want_cov, atol=1e-6)


def test_titsias_at_m_eq_n_equals_exact_log_marginal():
    """L_T with Z == X equals exact GP log marginal (trace term vanishes)."""
    T, batch = 10, 3
    times = np.arange(1.0, T + 1)
    cfg = SVGPConfig(titsias=True, jitter=1e-10)
    gp = gpm.init_ball_svgp(T, 1.0, float(T), 2.0, n_channels=1, config=cfg,
                            dtype=jnp.float64)
    y = RNG.randn(batch, T, 1)
    noise = RNG.rand(batch, T, 1) + 0.2

    sum_terms, _ = ball_variational_loss(gp, jnp.asarray(times),
                                         jnp.asarray(y), jnp.asarray(noise),
                                         jnp.zeros((batch, T, 1)),
                                         jnp.zeros((batch, T, T, 1)))

    exact = gpm.gp_regression_1d(
        jnp.tile(jnp.asarray(times)[None], (batch, 1)),
        jnp.asarray(y[:, :, 0]), jnp.asarray(noise[:, :, 0]),
        jnp.tile(jnp.asarray(times)[None], (batch, 1)), 2.0)
    np.testing.assert_allclose(sum_terms[:, 0], exact.log_marginal,
                               rtol=1e-5)


def test_hensman_bound_below_exact_log_marginal():
    """L_H (sum - KL) is a lower bound on the exact log marginal."""
    T, batch = 10, 5
    times = np.arange(1.0, T + 1)
    cfg = SVGPConfig(jitter=1e-10)
    gp = gpm.init_ball_svgp(6, 1.0, float(T), 2.0, n_channels=1, config=cfg,
                            dtype=jnp.float64)
    y = RNG.randn(batch, T, 1)
    noise = RNG.rand(batch, T, 1) + 0.2

    _, _, mu_hat, A_hat = ball_posterior_params(
        gp, jnp.asarray(times), jnp.asarray(y), jnp.asarray(noise))
    sum_terms, kls = ball_variational_loss(
        gp, jnp.asarray(times), jnp.asarray(y), jnp.asarray(noise),
        mu_hat, A_hat)
    bound = np.asarray(sum_terms[:, 0] - kls[:, 0])

    exact = gpm.gp_regression_1d(
        jnp.tile(jnp.asarray(times)[None], (batch, 1)),
        jnp.asarray(y[:, :, 0]), jnp.asarray(noise[:, :, 0]),
        jnp.tile(jnp.asarray(times)[None], (batch, 1)), 2.0)
    assert np.all(bound <= np.asarray(exact.log_marginal) + 1e-6)


def test_precompute_and_fast_posterior_consistency():
    """Fast posterior from precomputed terms == direct posterior (scale=1)."""
    N, L, n_obj, M = 40, 3, 11, 4
    gp, ip, ov = make_mnist_gp(N_train=N)
    aux = make_aux(N, n_obj, M)
    aux_t = make_aux(6, n_obj, M)
    means = RNG.randn(N, L)
    variances = RNG.rand(N, L) + 0.3

    mean_terms, Sigma_inv, Kmm_inv = gpm.precompute_test_posterior_terms(
        gp, jnp.asarray(means), jnp.asarray(variances), jnp.asarray(aux))
    p_m_fast, p_v_fast = gpm.posterior_from_precomputed(
        gp, jnp.asarray(aux_t), mean_terms, Sigma_inv, Kmm_inv)

    # direct path with N_train == b so the bias scale is 1
    p_m, p_v, _, _ = gpm.posterior_params(
        gp, jnp.asarray(aux_t), jnp.asarray(aux), jnp.asarray(means),
        jnp.asarray(variances))
    np.testing.assert_allclose(p_m_fast, p_m, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(p_v_fast, p_v, rtol=1e-5, atol=1e-7)


def test_bias_analysis_converges_to_full_data_value():
    """The minibatch mu_hat estimator equals the full-data value when the
    'minibatch' IS the full dataset (reference: SVGPVAE_model.py:345-370)."""
    N, L, n_obj, M = 30, 2, 11, 4
    gp, ip, ov = make_mnist_gp(N_train=N)
    aux = make_aux(N, n_obj, M)
    y = RNG.randn(N, L)
    noise = RNG.rand(N, L) + 0.3

    mv = gpm.mean_vector_bias_analysis(gp, jnp.asarray(aux), jnp.asarray(y),
                                       jnp.asarray(noise))
    _, _, mu_hat, _ = gpm.posterior_params(gp, jnp.asarray(aux),
                                           jnp.asarray(aux), jnp.asarray(y),
                                           jnp.asarray(noise))
    np.testing.assert_allclose(mv, mu_hat, rtol=1e-10)


def test_sprites_kernel_and_gplvm_gather():
    m, L_act, L_chr, n_act, b = 8, 3, 5, 6, 10
    ip = RNG.randn(m, L_act + L_chr)
    gplvm = RNG.randn(n_act, L_act)
    cfg = SVGPConfig(jitter=1e-8, K_obj_normalize=True)
    gp = gpm.init_sprites_svgp(ip, gplvm, L_action=L_act, config=cfg,
                               dtype=jnp.float64)
    aux = np.hstack([RNG.randint(0, n_act, (b, 1)).astype(float),
                     RNG.randn(b, L_chr)])

    got = gp.kmat(jnp.asarray(aux), jnp.asarray(ip), x_inducing=False)
    act = gplvm[aux[:, 0].astype(int)]
    chrv = aux[:, 1:]
    k_a = act @ ip[:, :L_act].T
    k_a /= (np.linalg.norm(act, axis=1)[:, None]
            * np.linalg.norm(ip[:, :L_act], axis=1)[None, :])
    k_c = chrv @ ip[:, L_act:].T
    k_c /= (np.linalg.norm(chrv, axis=1)[:, None]
            * np.linalg.norm(ip[:, L_act:], axis=1)[None, :])
    np.testing.assert_allclose(got, k_a * k_c, rtol=1e-8)

    # SE-kernel variant
    gp_se = gpm.init_sprites_svgp(ip, gplvm, L_action=L_act,
                                  use_se_kernel=True, config=cfg,
                                  dtype=jnp.float64)
    got_se = gp_se.kmat(jnp.asarray(ip), jnp.asarray(ip))
    d2a = ((ip[:, None, :L_act] - ip[None, :, :L_act])**2).sum(-1)
    d2c = ((ip[:, None, L_act:] - ip[None, :, L_act:])**2).sum(-1)
    want = (0.01 * np.exp(-0.5 * d2a)) * (0.01 * np.exp(-0.5 * d2c))
    np.testing.assert_allclose(got_se, want, rtol=1e-6)


def test_ball_kl_quirk_flag():
    """The reference ball-SVGP KL quirk (SVGPVAE_model.py:134-137) is
    reproducible behind SVGPConfig.ball_kl_quirk and differs from the
    correct mu_hat-based KL."""
    T, batch = 8, 3
    times = np.arange(1.0, T + 1)
    y = RNG.randn(batch, T, 1)
    noise = RNG.rand(batch, T, 1) + 0.2

    outs = {}
    for quirk in (False, True):
        cfg = SVGPConfig(jitter=1e-10, ball_kl_quirk=quirk)
        gp = gpm.init_ball_svgp(5, 1.0, float(T), 2.0, n_channels=1,
                                config=cfg, dtype=jnp.float64)
        _, _, mu_hat, A_hat = ball_posterior_params(
            gp, jnp.asarray(times), jnp.asarray(y), jnp.asarray(noise))
        sums, kls = ball_variational_loss(
            gp, jnp.asarray(times), jnp.asarray(y), jnp.asarray(noise),
            mu_hat, A_hat)
        outs[quirk] = (np.asarray(sums), np.asarray(kls))

    # sum terms identical; KL terms differ between the two forms
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-10)
    assert not np.allclose(outs[False][1], outs[True][1])
    assert np.all(np.isfinite(outs[True][1]))
