"""Tests for the baseline GP modules: exact 1-D GP (Pearce), Casale
full-GP with Kronecker low-rank V, and SVIGP with explicit variational
parameters."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svgpvae_tpu import gp as gpm
from svgpvae_tpu.gp.casale import apply_k_inv

RNG = np.random.RandomState(3)


@pytest.fixture(autouse=True, scope="module")
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# exact 1-D GP (Pearce)
# ---------------------------------------------------------------------------


def test_gp1d_against_numpy():
    batch, n, ns, lt = 3, 9, 6, 2.5
    x = RNG.rand(batch, n) * 10
    y = RNG.randn(batch, n)
    vy = RNG.rand(batch, n) + 0.1
    xt = RNG.rand(batch, ns) * 10

    post = gpm.gp_regression_1d(jnp.asarray(x), jnp.asarray(y),
                                jnp.asarray(vy), jnp.asarray(xt), lt)

    for b in range(batch):
        K = np.exp(-0.5 * (x[b][:, None] - x[b][None, :])**2 / lt**2)
        A = K + np.diag(vy[b])
        Ks = np.exp(-0.5 * (x[b][:, None] - xt[b][None, :])**2 / lt**2)
        iKy = np.linalg.solve(A, y[b])
        np.testing.assert_allclose(post.mean[b], Ks.T @ iKy, atol=1e-8)
        want_var = 1.0 - np.sum(Ks * np.linalg.solve(A, Ks), axis=0)
        np.testing.assert_allclose(post.var[b], want_var, atol=1e-8)
        sign, logdet = np.linalg.slogdet(A)
        want_lml = -0.5 * (n * np.log(2 * np.pi) + y[b] @ iKy + logdet)
        np.testing.assert_allclose(post.log_marginal[b], want_lml, atol=1e-8)


def test_gp1d_full_variance():
    batch, n, lt = 2, 8, 3.0
    x = np.tile(np.arange(1.0, n + 1)[None], (batch, 1))
    y = RNG.randn(batch, n)
    vy = RNG.rand(batch, n) + 0.1
    post = gpm.gp_regression_1d(jnp.asarray(x), jnp.asarray(y),
                                jnp.asarray(vy), jnp.asarray(x), lt,
                                full_variance=True)
    assert post.var.shape == (batch, n, n)
    diag_post = gpm.gp_regression_1d(jnp.asarray(x), jnp.asarray(y),
                                     jnp.asarray(vy), jnp.asarray(x), lt)
    np.testing.assert_allclose(
        np.diagonal(np.asarray(post.var), axis1=1, axis2=2),
        diag_post.var, atol=1e-8)


# ---------------------------------------------------------------------------
# Casale GP
# ---------------------------------------------------------------------------


def test_kron_matches_numpy():
    a, b = RNG.randn(3, 4), RNG.randn(2, 5)
    np.testing.assert_allclose(gpm.kron(jnp.asarray(a), jnp.asarray(b)),
                               np.kron(a, b), atol=1e-12)


def _make_casale(P=5, Q=4, M=3):
    ov = RNG.randn(P, M)
    gp = gpm.init_casale_gp(ov, object_kernel_normalize=True, ov_joint=True,
                            dtype=jnp.float64)
    angles = np.sort(RNG.rand(Q) * 2 * np.pi)
    mask = RNG.rand(P * Q) < 0.8
    mask[0] = True  # non-empty
    return gp, ov, angles, mask


def test_v_matrix_low_rank_structure():
    gp, ov, angles, mask = _make_casale()
    V = gpm.v_matrix(gp, jnp.asarray(angles), jnp.arange(len(ov)),
                     jnp.asarray(mask))
    N = int(mask.sum())
    assert V.shape == (N, ov.shape[1] * len(angles))

    # V V^T must equal the product kernel on the masked (object, angle) grid
    ids = np.repeat(np.arange(len(ov)), len(angles))[mask]
    angs = np.tile(angles, len(ov))[mask]
    aux = np.hstack([ids[:, None].astype(float), angs[:, None],
                     np.zeros((N, 1))])
    K = gpm.casale_kernel_matrix(gp, jnp.asarray(aux), jnp.asarray(aux))
    # V carries the chol of the jittered view kernel (1e-5 mean-diagonal
    # relative jitter, gp/casale.py v_matrix) -> diffs at jitter scale
    np.testing.assert_allclose(np.asarray(V @ V.T), np.asarray(K), atol=5e-5)


def test_casale_alpha_softplus_transform():
    """softplus alpha reparameterization: same init noise value as the
    clamp default, always positive, and nonzero gradient arbitrarily far
    below zero raw (unlike a plain max-clamp)."""
    import jax
    from svgpvae_tpu.gp.casale import casale_noise

    ov = RNG.randn(4, 3)
    gp_c = gpm.init_casale_gp(ov, object_kernel_normalize=False,
                              ov_joint=True)
    gp_s = gpm.init_casale_gp(ov, object_kernel_normalize=False,
                              ov_joint=True, alpha_transform="softplus")
    assert float(casale_noise(gp_c)) == pytest.approx(0.1)
    assert float(casale_noise(gp_s)) == pytest.approx(0.1, rel=1e-5)

    def noise_of(raw):
        return casale_noise(gp_s.replace(alpha=raw))

    deep = jnp.asarray(-8.0)
    assert float(noise_of(deep)) > 0.0
    assert float(jax.grad(noise_of)(deep)) > 0.0


def test_casale_alpha_max_cap():
    """alpha_max ceilings the noise VALUE with an identity gradient
    (straight-through, mirroring the floor), and alpha_max=0 (the
    default / reference semantics) is a no-op."""
    import jax
    from svgpvae_tpu.gp.casale import casale_noise

    ov = RNG.randn(4, 3)
    gp = gpm.init_casale_gp(ov, object_kernel_normalize=False,
                            ov_joint=True, alpha_max=1.0)
    gp_off = gpm.init_casale_gp(ov, object_kernel_normalize=False,
                                ov_joint=True)

    def noise_of(g, raw):
        return casale_noise(g.replace(alpha=raw))

    above = jnp.asarray(17.0)
    below = jnp.asarray(0.4)
    assert float(noise_of(gp, above)) == pytest.approx(1.0)
    assert float(noise_of(gp, below)) == pytest.approx(0.4)
    assert float(noise_of(gp_off, above)) == pytest.approx(17.0)
    # straight-through: gradient stays identity on both sides of the cap
    assert float(jax.grad(lambda a: noise_of(gp, a))(above)) == 1.0
    assert float(jax.grad(lambda a: noise_of(gp, a))(below)) == 1.0
    # composes with softplus: cap applies to the transformed value
    gp_sp = gpm.init_casale_gp(ov, object_kernel_normalize=False,
                               ov_joint=True, alpha_transform="softplus",
                               alpha_max=1.0)
    assert float(noise_of(gp_sp, jnp.asarray(30.0))) == pytest.approx(1.0)
    assert float(jax.grad(lambda a: noise_of(gp_sp, a))(
        jnp.asarray(30.0))) == pytest.approx(1.0)


def test_casale_k_inv_woodbury():
    gp, ov, angles, mask = _make_casale()
    V = np.asarray(gpm.v_matrix(gp, jnp.asarray(angles), jnp.arange(len(ov)),
                                jnp.asarray(mask)))
    alpha = 0.3
    K_inv = gpm.casale_k_inv(jnp.asarray(V), alpha)
    want = np.linalg.inv(V @ V.T + alpha * np.eye(len(V)))
    # atol covers the 1e-7-relative stabilizing ridge on the inner matrix
    # (gp/casale.py casale_k_inv), which perturbs the inverse by ~3e-7
    np.testing.assert_allclose(np.asarray(K_inv), want, atol=1e-5)

    rhs = RNG.randn(len(V), 2)
    got = apply_k_inv(jnp.asarray(V), alpha, jnp.asarray(rhs))
    np.testing.assert_allclose(np.asarray(got), want @ rhs, atol=1e-5)


def test_taylor_coeffs_vs_naive_loop():
    gp, ov, angles, mask = _make_casale()
    V = np.asarray(gpm.v_matrix(gp, jnp.asarray(angles), jnp.arange(len(ov)),
                                jnp.asarray(mask)))
    N = len(V)
    L = 3
    Z = RNG.randn(N, L)
    gp = gp.replace(alpha=jnp.asarray(0.3))

    a, B, c = gpm.taylor_coeffs(gp, jnp.asarray(Z), jnp.asarray(V))

    K_inv = np.linalg.inv(V @ V.T + 0.3 * np.eye(N))
    K_inv_V = K_inv @ V
    # atol covers the 1e-7-relative stabilizing ridge in casale_k_inv
    np.testing.assert_allclose(np.asarray(a), Z.T @ K_inv, atol=1e-5)
    for l in range(L):
        z = Z[:, l:l + 1]
        want_B = -K_inv @ z @ (z.T @ K_inv_V) + K_inv_V
        want_c = 0.5 * (-(z.T @ K_inv @ K_inv @ z).item()
                        + np.trace(K_inv))
        np.testing.assert_allclose(np.asarray(B[l]), want_B, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c[l]), want_c, atol=1e-4)


# ---------------------------------------------------------------------------
# SVIGP (explicit variational params)
# ---------------------------------------------------------------------------


def _make_svigp(m=7, M=4, n_obj=9, L=3, N_train=100):
    ip = np.hstack([np.arange(m)[:, None], RNG.rand(m, 1) * 2 * np.pi,
                    RNG.randn(m, M)])
    ov = RNG.randn(n_obj, M)
    gp = gpm.init_svigp(ip, ov, L=L, N_train=N_train, jitter=1e-8,
                        dtype=jnp.float64)
    return gp, ip, ov


def test_svigp_posterior_prior_recovery():
    """With q(u) = p(u) (mu=0, S=K_mm) the posterior reverts to the prior."""
    gp, ip, ov = _make_svigp()
    z = gp.inducing_points
    Kmm = gp.kmat(z, z)
    chol = jnp.linalg.cholesky(Kmm + 1e-10 * jnp.eye(len(ip)))
    gp = gp.replace(q_scale=jnp.tile(chol[None], (3, 1, 1)))

    aux = np.hstack([RNG.randint(0, 9, (5, 1)).astype(float),
                     RNG.rand(5, 1) * 2 * np.pi, RNG.randn(5, 4)])
    p_m, p_v = gpm.svigp_posterior_params(gp, jnp.asarray(aux))
    np.testing.assert_allclose(np.asarray(p_m), 0.0, atol=1e-10)
    prior_var = gp.kdiag(jnp.asarray(aux), jnp.asarray(aux),
                         x_inducing=False, y_inducing=False)
    np.testing.assert_allclose(p_v, np.tile(np.asarray(prior_var)[:, None],
                                            (1, 3)), atol=1e-6)


def test_svigp_variational_loss_vs_naive():
    gp, ip, ov = _make_svigp()
    L, m = 3, len(ip)
    q_mu = RNG.randn(L, m)
    q_scale = np.tril(RNG.randn(L, m, m) * 0.2 + np.eye(m))
    gp = gp.replace(q_mu=jnp.asarray(q_mu), q_scale=jnp.asarray(q_scale),
                    noise=jnp.asarray(0.4))

    b = 11
    aux = np.hstack([RNG.randint(0, 9, (b, 1)).astype(float),
                     RNG.rand(b, 1) * 2 * np.pi, RNG.randn(b, 4)])
    sum_terms, kl_terms, mean_vecs = gpm.svigp_variational_loss(
        gp, jnp.asarray(aux))

    Kmm = np.asarray(gp.kmat(gp.inducing_points, gp.inducing_points))
    Knm = np.asarray(gp.kmat(jnp.asarray(aux), gp.inducing_points,
                             x_inducing=False))
    Knn_diag = np.asarray(gp.kdiag(jnp.asarray(aux), jnp.asarray(aux),
                                   x_inducing=False, y_inducing=False))
    Kmm_inv = np.linalg.inv(Kmm + 1e-8 * np.eye(m))
    prec = 1 / 0.4
    for l in range(L):
        S = q_scale[l] @ q_scale[l].T
        k_tilde = prec * (Knn_diag - np.diag(Knm @ Kmm_inv @ Knm.T))
        traces = np.array([prec * np.trace(
            S @ (Kmm_inv @ np.outer(Knm[i], Knm[i]) @ Kmm_inv))
            for i in range(b)])
        want_sum = -0.5 * (k_tilde.sum() + traces.sum())
        np.testing.assert_allclose(sum_terms[l], want_sum, rtol=1e-6)

        sign, ld_K = np.linalg.slogdet(Kmm + 1e-8 * np.eye(m))
        sign, ld_S = np.linalg.slogdet(S + 1e-8 * np.eye(m))
        want_kl = 0.5 * (ld_K - ld_S - m + np.trace(Kmm_inv @ S)
                         + q_mu[l] @ Kmm_inv @ q_mu[l])
        np.testing.assert_allclose(kl_terms[l], want_kl, rtol=1e-5)

        want_mean = Knm @ Kmm_inv @ q_mu[l]
        np.testing.assert_allclose(mean_vecs[:, l], want_mean, rtol=1e-6,
                                   atol=1e-9)


def test_casale_alpha_straight_through_clamp():
    """effective_alpha floors the VALUE at ALPHA_FLOOR but keeps an
    identity gradient below it, so a raw alpha driven under the floor
    can still recover (ADVICE r2: plain `maximum` froze it one-way)."""
    from svgpvae_tpu.gp.casale import effective_alpha, ALPHA_FLOOR

    below = jnp.asarray(-0.3)
    above = jnp.asarray(0.7)
    # value is the floor up to the a + sg(clamp(a) - a) recomposition
    # rounding (~1 ulp of |a|)
    assert float(effective_alpha(below)) == pytest.approx(ALPHA_FLOOR,
                                                          abs=1e-12)
    assert float(effective_alpha(above)) == pytest.approx(0.7)
    # gradient is identity on BOTH sides of the floor
    assert float(jax.grad(lambda a: effective_alpha(a))(below)) == 1.0
    assert float(jax.grad(lambda a: effective_alpha(a))(above)) == 1.0
