"""Fused GP block + chol_inverse kernel parity (VERDICT r2 item 3).

The fused block must reproduce the two-pass reference path
(posterior_params + hensman_terms) in values AND gradients, and the
Pallas/GJ inverse must match float64 linear algebra.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svgpvae_tpu import gp as gpm
from svgpvae_tpu.gp.svgp import SVGPConfig
from svgpvae_tpu.ops import chol_inverse
from svgpvae_tpu.ops.chol_inverse import chol_inverse_pallas, chol_inverse_ref

RNG = np.random.RandomState(3)


def _psd_batch(B, m, cond=1e4, dtype=np.float32):
    """Random PD matrices with controlled conditioning."""
    out = np.empty((B, m, m))
    for i in range(B):
        Q, _ = np.linalg.qr(RNG.randn(m, m))
        lam = np.logspace(0, np.log10(cond), m)
        out[i] = (Q * lam) @ Q.T
    return jnp.asarray(out, dtype)


def test_chol_inverse_values_vs_float64():
    M = _psd_batch(17, 32)
    inv64 = np.linalg.inv(np.asarray(M, np.float64))
    _, ld64 = np.linalg.slogdet(np.asarray(M, np.float64))

    for impl in (chol_inverse_ref,
                 lambda x: chol_inverse_pallas(x, interpret=True)):
        inv, ld = impl(M)
        scale = np.abs(inv64).max()
        np.testing.assert_allclose(np.asarray(inv) / scale, inv64 / scale,
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(ld), ld64, rtol=1e-5)


def test_chol_inverse_nonsquare_tile_batch():
    """m=72 (SPRITES: 9 sublane tiles, 2m=144 -> 256 lanes), odd batch."""
    M = _psd_batch(5, 72, cond=1e3)
    inv, ld = chol_inverse_pallas(M, interpret=True)
    inv_r, ld_r = chol_inverse_ref(M)
    scale = float(jnp.abs(inv_r).max())
    np.testing.assert_allclose(np.asarray(inv) / scale,
                               np.asarray(inv_r) / scale, atol=5e-4)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_r), rtol=1e-4)


@pytest.mark.parametrize("update", ["dot", "bcast"])
@pytest.mark.parametrize("B,m", [(17, 32), (5, 72), (3, 30), (6, 9)])
def test_chol_inverse_blocked_kernel_matches_scalar(B, m, update):
    """Blocked GJ (r5 wave 4) == scalar kernel == f64, incl. m padded to
    a multiple of the block (m=30 -> 32, m=9 -> 16) and both full-stack
    update strategies.  Own RNG so the fixture is order-independent
    (ADVICE r4: module-RNG fixtures drift with suite order)."""
    R = np.random.RandomState(100 + B + m)
    A = np.empty((B, m, m))
    for i in range(B):
        Q, _ = np.linalg.qr(R.randn(m, m))
        A[i] = (Q * np.logspace(0, 3, m)) @ Q.T
    M = jnp.asarray(A, jnp.float32)
    inv64 = np.linalg.inv(np.asarray(M, np.float64))
    _, ld64 = np.linalg.slogdet(np.asarray(M, np.float64))

    inv, ld = chol_inverse_pallas(M, interpret=True, block=8,
                                  update=update)
    scale = np.abs(inv64).max()
    np.testing.assert_allclose(np.asarray(inv) / scale, inv64 / scale,
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(ld), ld64, rtol=1e-4)

    inv_s, ld_s = chol_inverse_pallas(M, interpret=True, block=1)
    np.testing.assert_allclose(np.asarray(inv) / scale,
                               np.asarray(inv_s) / scale, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_s),
                               rtol=1e-5)


def test_chol_inverse_custom_vjp_matches_autodiff():
    """The two-matmul custom VJP == autodiff through the XLA reference.

    Compared through a symmetric constructor M = B B^T + I (how every
    caller builds its PD matrices): matrix cotangents are only defined up
    to an asymmetric null component there (Cholesky autodiff symmetrizes
    its cotangent; the custom VJP does not), so raw dL/dM comparisons are
    convention-dependent while dL/dB is unique.
    """
    B = jnp.asarray(RNG.randn(4, 16, 16), jnp.float32)
    gi = jnp.asarray(RNG.randn(4, 16, 16), jnp.float32)
    gl = jnp.asarray(RNG.randn(4), jnp.float32)

    def make_M(B_):
        return jnp.einsum("bij,bkj->bik", B_, B_) + jnp.eye(16)

    def loss_custom(B_):
        inv, ld = chol_inverse(make_M(B_))
        return jnp.sum(inv * gi) + jnp.sum(ld * gl)

    def loss_ref(B_):
        inv, ld = chol_inverse_ref(make_M(B_))
        return jnp.sum(inv * gi) + jnp.sum(ld * gl)

    g_custom = jax.grad(loss_custom)(B)
    g_ref = jax.grad(loss_ref)(B)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(g_custom) / scale,
                               np.asarray(g_ref) / scale, atol=2e-4)


def _mnist_problem(b=48, L=5, M=4, m=8, n_obj=20):
    R = np.random.RandomState(7)  # own stream: run-order independent
    ip = np.hstack([np.arange(m)[:, None], R.rand(m, 1) * 2 * np.pi,
                    R.randn(m, M)])
    gp = gpm.init_mnist_svgp(
        ip, R.randn(n_obj, M),
        config=SVGPConfig(jitter=1e-6, N_train=16 * b))
    aux = jnp.asarray(np.hstack([
        R.randint(0, n_obj, (b, 1)).astype(float),
        R.rand(b, 1) * 2 * np.pi, R.randn(b, M)]), jnp.float32)
    y = jnp.asarray(R.randn(b, L), jnp.float32)
    noise = jnp.asarray(R.rand(b, L) + 0.5, jnp.float32)
    return gp, aux, y, noise


def _sprites_problem(b=40, L=6, m=12, L_act=3, L_char=4, n_act=8):
    # jitter small: the fused block's closed-form KL identity differs from
    # the two-pass path by O(jitter/lambda_min(A_hat)) terms (the unfused
    # KL re-jitters A_hat before factorizing, mirroring the reference;
    # PARITY.md #10), so parity tightens as jitter -> 0.  Seeded stream
    # with moderate cond(Kmm) ~1e3; ill-conditioned draws (cond ~1e9)
    # widen the semantic gap to ~0.2 relative, which is the A_hat-jitter
    # difference itself, not an error (verified in float64).
    R = np.random.RandomState(2)
    gp = gpm.init_sprites_svgp(
        R.randn(m, L_act + L_char), R.randn(n_act, L_act),
        L_action=L_act, config=SVGPConfig(jitter=1e-6, N_train=10 * b))
    aux = jnp.asarray(np.hstack([
        R.randint(0, n_act, (b, 1)).astype(float),
        R.randn(b, L_char)]), jnp.float32)
    y = jnp.asarray(R.randn(b, L), jnp.float32)
    noise = jnp.asarray(R.rand(b, L) + 0.5, jnp.float32)
    return gp, aux, y, noise


def _reference_block(gp, aux, y, noise):
    p_m, p_v, mu_hat, A_hat = gpm.posterior_params(gp, aux, aux, y, noise)
    sum_terms, kl_terms = gpm.variational_loss(gp, aux, y, noise, mu_hat,
                                               A_hat)
    return p_m, p_v, sum_terms, kl_terms, mu_hat


@pytest.mark.parametrize("problem", [_mnist_problem, _sprites_problem])
@pytest.mark.parametrize("impl", ["chol", "pallas"])
def test_fused_block_matches_two_pass(problem, impl, monkeypatch):
    """p_m/p_v/sum_terms/mu_hat agree to roundoff; kl_terms carries the
    documented O(jitter) semantic gap (the two-pass KL re-jitters A_hat
    before factorizing, PARITY.md #10) so it gets a looser band — its
    roundoff-level correctness is pinned by the float64 self-parity test
    below."""
    if impl == "pallas":
        monkeypatch.setenv("SVGPVAE_CHOL_INVERSE", "pallas")
    gp, aux, y, noise = problem()
    want = _reference_block(gp, aux, y, noise)
    got = gpm.gp_block_hensman(gp, aux, y, noise, inverse_impl=impl)
    names = ["p_m", "p_v", "sum_terms", "kl_terms", "mu_hat"]
    for name, g, w in zip(names, got, want):
        w = np.asarray(w)
        scale = max(np.abs(w).max(), 1.0)
        atol = 5e-3 if name == "kl_terms" else 2e-4
        np.testing.assert_allclose(np.asarray(g) / scale, w / scale,
                                   atol=atol, err_msg=name)


def _titsias(gp):
    return gp.replace(config=gp.config.replace(titsias=True))


def _reference_titsias_block(gp, aux, y, noise):
    p_m, p_v, mu_hat, _ = gpm.posterior_params(gp, aux, aux, y, noise)
    l2, kl = gpm.variational_loss(gp, aux, y, noise, mu_hat, None)
    return p_m, p_v, l2, kl, mu_hat


@pytest.mark.parametrize("problem", [_mnist_problem, _sprites_problem])
@pytest.mark.parametrize("impl", ["chol", "pallas"])
def test_fused_titsias_block_matches_two_pass(problem, impl, monkeypatch):
    """Fused Titsias block vs posterior_params + titsias_terms.

    The fused bound goes through the matrix determinant lemma (no dense
    (b, b) covariance); the identity is exact (float64 test below), but
    the Sigma1 stack carries the same max-diag-relative ridge as Sigma
    (_sigma_cholesky), an O(rel_jitter * tr(Sigma1^{-1})) perturbation
    of l2 — ~8e-4 scaled on the near-rank-deficient sprites kernel, so
    l2_terms gets a slightly looser band there."""
    if impl == "pallas":
        monkeypatch.setenv("SVGPVAE_CHOL_INVERSE", "pallas")
    gp, aux, y, noise = problem()
    gp = _titsias(gp)
    want = _reference_titsias_block(gp, aux, y, noise)
    got = gpm.gp_block_titsias(gp, aux, y, noise, inverse_impl=impl)
    names = ["p_m", "p_v", "l2_terms", "kl_terms", "mu_hat"]
    for name, g, w in zip(names, got, want):
        w = np.asarray(w)
        scale = max(np.abs(w).max(), 1.0)
        atol = 2e-3 if name == "l2_terms" else 5e-4
        np.testing.assert_allclose(np.asarray(g) / scale, w / scale,
                                   atol=atol, err_msg=name)


@pytest.mark.parametrize("problem", [_mnist_problem, _sprites_problem])
def test_fused_titsias_woodbury_identity_exact_f64(problem):
    """With the relative ridge off, the determinant-lemma bound equals
    the dense-covariance bound to float64 roundoff — pinning that the
    ONLY semantic gap of the fused Titsias block is the documented
    Sigma1 ridge."""
    gp, aux, y, noise = problem()
    gp = _titsias(gp)
    gp = gp.replace(config=gp.config.replace(sigma_rel_jitter=0.0))
    f64 = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, t)
    jax.config.update("jax_enable_x64", True)
    try:
        gp64, aux64 = f64(gp), f64(aux)
        y64, n64 = f64(y), f64(noise)
        want = _reference_titsias_block(gp64, aux64, y64, n64)[2]
        got = gpm.gp_block_titsias(gp64, aux64, y64, n64)[2]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_fused_titsias_gradients_match_two_pass():
    """Gradients of the Titsias training objective (inside-ELBO + the
    posterior-consuming CE-like terms) w.r.t. GP params and encoder
    outputs match the two-pass path.  Band 1e-3: the fused bound's
    Sigma1 relative ridge (see test_fused_titsias_block_matches_two_pass)
    perturbs l2 gradients by the same O(rel_jitter) amount as l2."""
    gp, aux, y, noise = _mnist_problem()
    gp = _titsias(gp)

    def objective(pieces):
        p_m, p_v, l2, kl, _ = pieces
        return (jnp.sum(l2) - jnp.sum(kl)
                + jnp.sum(p_m ** 2) + jnp.sum(jnp.log(p_v)))

    def loss_ref(gp, y, noise):
        return objective(_reference_titsias_block(gp, aux, y, noise))

    def loss_fused(gp, y, noise):
        return objective(gpm.gp_block_titsias(gp, aux, y, noise))

    np.testing.assert_allclose(float(loss_fused(gp, y, noise)),
                               float(loss_ref(gp, y, noise)), rtol=2e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(gp, y, noise)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(gp, y, noise)
    leaves_r, _ = jax.tree_util.tree_flatten(g_ref)
    leaves_f, _ = jax.tree_util.tree_flatten(g_fus)
    assert len(leaves_r) == len(leaves_f)
    for lr, lf in zip(leaves_r, leaves_f):
        lr, lf = np.asarray(lr), np.asarray(lf)
        scale = max(np.abs(lr).max(), 1e-3)
        np.testing.assert_allclose(lf / scale, lr / scale, atol=1e-3)


@pytest.mark.parametrize("problem", [_mnist_problem, _sprites_problem])
def test_fused_rejitter_matches_two_pass(problem):
    """kl_impl='rejitter' computes the EXACT two-pass KL (A_hat
    materialized + refactorized with jitter), so unlike the identity
    form it gets the same tight tolerance as every other output."""
    gp, aux, y, noise = problem()
    want = _reference_block(gp, aux, y, noise)
    got = gpm.gp_block_hensman(gp, aux, y, noise, kl_impl="rejitter")
    names = ["p_m", "p_v", "sum_terms", "kl_terms", "mu_hat"]
    for name, g, w in zip(names, got, want):
        w = np.asarray(w)
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(np.asarray(g) / scale, w / scale,
                                   atol=2e-4, err_msg=name)


@pytest.mark.parametrize("problem", [_mnist_problem, _sprites_problem])
def test_fused_rejitter_pallas_matches_two_pass(problem, monkeypatch):
    """inverse_impl='pallas' + kl_impl='rejitter' (the CLI's
    fused_rejitter_pallas): the SAME rejittered KL evaluated from the
    Gauss-Jordan inverse stack plus a second chol_inverse call for
    logdet A_hat — every output pinned to the two-pass path."""
    monkeypatch.setenv("SVGPVAE_CHOL_INVERSE", "pallas")
    gp, aux, y, noise = problem()
    want = _reference_block(gp, aux, y, noise)
    got = gpm.gp_block_hensman(gp, aux, y, noise, inverse_impl="pallas",
                               kl_impl="rejitter")
    names = ["p_m", "p_v", "sum_terms", "kl_terms", "mu_hat"]
    for name, g, w in zip(names, got, want):
        w = np.asarray(w)
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(np.asarray(g) / scale, w / scale,
                                   atol=5e-4, err_msg=name)


def test_fused_rejitter_pallas_gradients_match_chol_rejitter(monkeypatch):
    """The second chol_inverse call's custom VJP must carry d logdet
    A_hat correctly: gradients of sum(kl_terms) wrt the encoder inputs
    agree between the pallas-rejitter and chol-rejitter paths."""
    monkeypatch.setenv("SVGPVAE_CHOL_INVERSE", "pallas")
    gp, aux, y, noise = _sprites_problem()

    def kl_sum(y_, impl):
        out = gpm.gp_block_hensman(gp, aux, y_, noise,
                                   inverse_impl=impl, kl_impl="rejitter")
        return jnp.sum(out[3])

    g_chol = jax.grad(lambda y_: kl_sum(y_, "chol"))(y)
    g_pl = jax.grad(lambda y_: kl_sum(y_, "pallas"))(y)
    scale = max(float(jnp.abs(g_chol).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(g_pl) / scale,
                               np.asarray(g_chol) / scale, atol=1e-3)


def test_fused_rejitter_matches_two_pass_on_rank_deficient_kernel():
    """The SPRITES-killer fixture (same construction as the divergence
    guard below): on the rank-deficient product-linear Kmm where the
    identity-KL fused block diverges by >0.5 relative, the rejitter
    variant matches the two-pass path to float64 roundoff on EVERY
    output including the KL — it is the same formula evaluated from the
    same factorizations."""
    R = np.random.RandomState(5)
    b, L, m, L_act, L_char, n_act = 40, 4, 24, 3, 4, 8
    jax.config.update("jax_enable_x64", True)
    try:
        gp = gpm.init_sprites_svgp(
            R.randn(m, L_act + L_char), R.randn(n_act, L_act),
            L_action=L_act,
            config=SVGPConfig(jitter=1e-6, N_train=100 * b),
            dtype=jnp.float64)
        aux = jnp.asarray(np.hstack([
            R.randint(0, n_act, (b, 1)).astype(float),
            R.randn(b, L_char)]), jnp.float64)
        y = jnp.asarray(R.randn(b, L), jnp.float64)
        noise = jnp.asarray(R.rand(b, L) * 0.01 + 0.001, jnp.float64)

        want = _reference_block(gp, aux, y, noise)
        names = ["p_m", "p_v", "sum_terms", "kl_terms", "mu_hat"]
        for impl, atol in (("chol", 1e-8), ("pallas", 1e-6)):
            got = gpm.gp_block_hensman(gp, aux, y, noise,
                                       inverse_impl=impl,
                                       kl_impl="rejitter")
            for name, g, w in zip(names, got, want):
                w = np.asarray(w)
                scale = max(np.abs(w).max(), 1.0)
                np.testing.assert_allclose(
                    np.asarray(g) / scale, w / scale, atol=atol,
                    err_msg=f"{impl}:{name}")
    finally:
        jax.config.update("jax_enable_x64", False)


def test_fused_kl_diverges_on_rank_deficient_kernel():
    """Guard for the SPRITES carve-out (PARITY.md #10, RESULTS.md round
    3): on a rank-deficient product-linear Kmm (rank <= L_act*L_char=12
    < m=24, PD only through jitter) with Sigma large enough to engage
    the relative Sigma ridge, the fused closed-form KL genuinely
    DIVERGES from the two-pass A_hat-rejittered KL — measured here in
    float64 through the real code paths, so this is semantics, not
    roundoff.  Mechanism: Kmm and Sigma share the low-rank feature span,
    but Sigma's null-direction eigenvalue is its (diag-scaled) relative
    ridge while Kmm's is the absolute 1e-6 jitter, so the identity
    2 ld K - ld Sigma charges each null direction
    log(jitter^2/sigma_ridge) where the rejittered two-pass form pays
    ~log(jitter).  If this test ever fails "the good way" (the gap
    closes), the identity-KL fused impls may be re-gated for SPRITES;
    until then resolve_gp_block_impl must keep them off that workload
    (since r5 the sprites-Hensman-TPU cell is fused_rejitter_pallas,
    which computes the exact two-pass rejittered KL and is immune to
    this divergence — see GP_BLOCK_AUTO_TABLE)."""
    R = np.random.RandomState(5)
    b, L, m, L_act, L_char, n_act = 40, 4, 24, 3, 4, 8
    jax.config.update("jax_enable_x64", True)
    try:
        gp = gpm.init_sprites_svgp(
            R.randn(m, L_act + L_char), R.randn(n_act, L_act),
            L_action=L_act,
            config=SVGPConfig(jitter=1e-6, N_train=100 * b),
            dtype=jnp.float64)
        aux = jnp.asarray(np.hstack([
            R.randint(0, n_act, (b, 1)).astype(float),
            R.randn(b, L_char)]), jnp.float64)
        y = jnp.asarray(R.randn(b, L), jnp.float64)
        # high encoder precision -> Sigma ~ (N/b) * Knm^T prec Knm large
        noise = jnp.asarray(R.rand(b, L) * 0.01 + 0.001, jnp.float64)

        want = _reference_block(gp, aux, y, noise)
        got = gpm.gp_block_hensman(gp, aux, y, noise)
        names = ["p_m", "p_v", "sum_terms"]
        for name, g, w in zip(names, got, want):
            w = np.asarray(w)
            scale = max(np.abs(w).max(), 1.0)
            np.testing.assert_allclose(np.asarray(g) / scale, w / scale,
                                       atol=1e-8, err_msg=name)
        klw = np.asarray(want[3])
        klg = np.asarray(got[3])
        rel_gap = np.abs(klg - klw).max() / np.abs(klw).max()
        assert rel_gap > 0.5, rel_gap  # measured 1.84 at this seed
    finally:
        jax.config.update("jax_enable_x64", False)


def test_fused_block_float64_self_parity():
    """Fused-block f32 vs the same formulas in f64 (the repo's naive-f64
    parity standard, CLAUDE.md) — tight, no semantic slack."""
    R = np.random.RandomState(11)
    b, L, M, m, n_obj = 48, 5, 4, 8, 20
    ip = np.hstack([np.arange(m)[:, None], R.rand(m, 1) * 2 * np.pi,
                    R.randn(m, M)])
    ov = R.randn(n_obj, M)
    auxn = np.hstack([R.randint(0, n_obj, (b, 1)).astype(float),
                      R.rand(b, 1) * 2 * np.pi, R.randn(b, M)])
    yn, nzn = R.randn(b, L), R.rand(b, L) + 0.5

    jax.config.update("jax_enable_x64", True)
    try:
        outs = {}
        for dt in (jnp.float32, jnp.float64):
            gp = gpm.init_mnist_svgp(
                ip, ov, config=SVGPConfig(jitter=1e-6, N_train=16 * b),
                dtype=dt)
            outs[dt] = gpm.gp_block_hensman(
                gp, jnp.asarray(auxn, dt), jnp.asarray(yn, dt),
                jnp.asarray(nzn, dt))
        for name, g32, g64 in zip(["p_m", "p_v", "sum", "kl", "mu_hat"],
                                  outs[jnp.float32], outs[jnp.float64]):
            g64 = np.asarray(g64, np.float64)
            scale = max(np.abs(g64).max(), 1.0)
            np.testing.assert_allclose(
                np.asarray(g32, np.float64) / scale, g64 / scale,
                atol=2e-5, err_msg=name)
    finally:
        jax.config.update("jax_enable_x64", False)


def _ball_problem(V=6, T=12, C=2, m=5, quirk=False):
    R = np.random.RandomState(19)
    gp = gpm.init_ball_svgp(m, tmin=1.0, tmax=float(T),
                            length_scale_init=2.0)
    gp = gp.replace(config=SVGPConfig(jitter=1e-8, ball_kl_quirk=quirk))
    times = jnp.arange(1, T + 1, dtype=jnp.float32)
    y = jnp.asarray(R.randn(V, T, C), jnp.float32)
    noise = jnp.asarray(R.rand(V, T, C) + 0.5, jnp.float32)
    return gp, times, y, noise


def _ball_reference_block(gp, times, y, noise):
    from svgpvae_tpu.gp.svgp import (ball_posterior_params,
                                     ball_variational_loss)
    p_m, p_cov, mu_hat, A_hat = ball_posterior_params(gp, times, y, noise)
    sum_terms, kl_terms = ball_variational_loss(gp, times, y, noise,
                                                mu_hat, A_hat)
    p_v = jnp.moveaxis(jnp.diagonal(p_cov, axis1=1, axis2=2), -1, 1)
    return p_m, p_v, sum_terms, kl_terms, jnp.mean(p_cov, axis=0)


@pytest.mark.parametrize("quirk", [False, True])
@pytest.mark.parametrize("impl", ["chol", "pallas"])
def test_ball_fused_block_matches_two_pass(quirk, impl, monkeypatch):
    """ball_gp_block vs ball_posterior_params + ball_variational_loss:
    posterior marginals, inside-ELBO terms, and the batch-mean covariance
    diagnostic (computed via mean_v Sigma_v^{-1} in the fused path) must
    agree; kl_terms gets the documented O(jitter) band (the two-pass KL
    re-jitters A_hat, PARITY.md #10)."""
    if impl == "pallas":
        monkeypatch.setenv("SVGPVAE_CHOL_INVERSE", "pallas")
    gp, times, y, noise = _ball_problem(quirk=quirk)
    want = _ball_reference_block(gp, times, y, noise)
    got = gpm.ball_gp_block(gp, times, y, noise, inverse_impl=impl)
    names = ["p_m", "p_v", "sum_terms", "kl_terms", "gp_cov_mean"]
    for name, g, w in zip(names, got, want):
        w = np.asarray(w)
        assert np.asarray(g).shape == w.shape, name
        scale = max(np.abs(w).max(), 1.0)
        atol = 5e-3 if name == "kl_terms" else 2e-4
        np.testing.assert_allclose(np.asarray(g) / scale, w / scale,
                                   atol=atol, err_msg=name)


@pytest.mark.parametrize("impl", ["chol", "pallas"])
def test_ball_fused_block_gradients_match_two_pass(impl, monkeypatch):
    """Gradients w.r.t. GP params and encoder outputs through the fused
    ball block match the two-pass path (what ball training consumes)."""
    if impl == "pallas":
        monkeypatch.setenv("SVGPVAE_CHOL_INVERSE", "pallas")
    gp, times, y, noise = _ball_problem()

    def objective(pieces):
        p_m, p_v, sum_terms, kl_terms, _ = pieces
        inside = jnp.sum(sum_terms) - jnp.sum(kl_terms)
        return inside + jnp.sum(p_m ** 2) + jnp.sum(jnp.log(p_v))

    def loss_ref(gp, y, noise):
        return objective(_ball_reference_block(gp, times, y, noise))

    def loss_fused(gp, y, noise):
        return objective(gpm.ball_gp_block(gp, times, y, noise,
                                           inverse_impl=impl))

    np.testing.assert_allclose(float(loss_fused(gp, y, noise)),
                               float(loss_ref(gp, y, noise)), rtol=2e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(gp, y, noise)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(gp, y, noise)
    leaves_r, _ = jax.tree_util.tree_flatten(g_ref)
    leaves_f, _ = jax.tree_util.tree_flatten(g_fus)
    assert len(leaves_r) == len(leaves_f)
    for lr, lf in zip(leaves_r, leaves_f):
        lr, lf = np.asarray(lr), np.asarray(lf)
        scale = max(np.abs(lr).max(), 1e-3)
        np.testing.assert_allclose(lf / scale, lr / scale, atol=5e-4)


@pytest.mark.parametrize("impl", ["chol", "pallas"])
def test_ball_fused_titsias_block_matches_two_pass(impl, monkeypatch):
    """ball_gp_block_titsias vs the two-pass Titsias path: every output
    at tight tolerance (the collapsed L_T bound has no q(u) KL, so no
    identity-KL caveat arises)."""
    if impl == "pallas":
        monkeypatch.setenv("SVGPVAE_CHOL_INVERSE", "pallas")
    gp, times, y, noise = _ball_problem()
    gp = gp.replace(config=gp.config.replace(titsias=True))
    want = _ball_reference_block(gp, times, y, noise)
    got = gpm.ball_gp_block_titsias(gp, times, y, noise, inverse_impl=impl)
    names = ["p_m", "p_v", "l2_terms", "kl_terms", "gp_cov_mean"]
    for name, g, w in zip(names, got, want):
        w = np.asarray(w)
        assert np.asarray(g).shape == w.shape, name
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(np.asarray(g) / scale, w / scale,
                                   atol=2e-4, err_msg=name)


def test_ball_fused_titsias_gradients_match_two_pass():
    gp, times, y, noise = _ball_problem()
    gp = gp.replace(config=gp.config.replace(titsias=True))

    def objective(pieces):
        p_m, p_v, l2, kl, _ = pieces
        return (jnp.sum(l2) - jnp.sum(kl)
                + jnp.sum(p_m ** 2) + jnp.sum(jnp.log(p_v)))

    def loss_ref(gp, y, noise):
        return objective(_ball_reference_block(gp, times, y, noise))

    def loss_fused(gp, y, noise):
        return objective(gpm.ball_gp_block_titsias(gp, times, y, noise))

    np.testing.assert_allclose(float(loss_fused(gp, y, noise)),
                               float(loss_ref(gp, y, noise)), rtol=2e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(gp, y, noise)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(gp, y, noise)
    leaves_r, _ = jax.tree_util.tree_flatten(g_ref)
    leaves_f, _ = jax.tree_util.tree_flatten(g_fus)
    assert len(leaves_r) == len(leaves_f)
    for lr, lf in zip(leaves_r, leaves_f):
        lr, lf = np.asarray(lr), np.asarray(lf)
        scale = max(np.abs(lr).max(), 1e-3)
        np.testing.assert_allclose(lf / scale, lr / scale, atol=5e-4)


def test_ball_elbo_fused_titsias_matches_reference_impl():
    """End-to-end ball_svgpvae_elbo (Titsias config) with
    gp_block_impl='fused' matches the reference impl on every output."""
    from svgpvae_tpu import models, nn as nets
    R = np.random.RandomState(29)
    batch, tmax, px = 4, 8, 16
    vids = jnp.asarray(R.rand(batch, tmax, px, px), jnp.float32)
    key = jax.random.PRNGKey(0)
    encoder = nets.BallEncoder()
    decoder = nets.BallDecoder(px=px, py=px)
    enc_params = encoder.init(key, vids)
    dec_params = decoder.init(key, jnp.zeros((batch, tmax, 2)))
    gp = gpm.init_ball_svgp(5, tmin=1.0, tmax=float(tmax),
                            length_scale_init=2.0)
    gp = gp.replace(config=SVGPConfig(jitter=1e-8, titsias=True))

    outs = {}
    for impl in ("reference", "fused"):
        outs[impl] = models.ball_svgpvae_elbo(
            encoder, enc_params, decoder, dec_params, gp, vids, 1.0, key,
            clip_qs=True, gp_block_impl=impl)
    for field in outs["reference"]._fields:
        w = np.asarray(getattr(outs["reference"], field))
        g = np.asarray(getattr(outs["fused"], field))
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(g / scale, w / scale, atol=5e-4,
                                   err_msg=field)


def test_ball_elbo_fused_matches_reference_impl():
    """End-to-end ball_svgpvae_elbo with gp_block_impl='fused' matches the
    reference impl on every output the training loop and metrics read."""
    from svgpvae_tpu import models, nn as nets
    R = np.random.RandomState(23)
    batch, tmax, px = 4, 8, 16
    vids = jnp.asarray(R.rand(batch, tmax, px, px), jnp.float32)
    key = jax.random.PRNGKey(0)
    encoder = nets.BallEncoder()
    decoder = nets.BallDecoder(px=px, py=px)
    enc_params = encoder.init(key, vids)
    dec_params = decoder.init(key, jnp.zeros((batch, tmax, 2)))
    gp = gpm.init_ball_svgp(5, tmin=1.0, tmax=float(tmax),
                            length_scale_init=2.0)
    gp = gp.replace(config=SVGPConfig(jitter=1e-8))

    outs = {}
    for impl in ("reference", "fused"):
        outs[impl] = models.ball_svgpvae_elbo(
            encoder, enc_params, decoder, dec_params, gp, vids, 1.0, key,
            clip_qs=True, gp_block_impl=impl)
    for field in outs["reference"]._fields:
        w = np.asarray(getattr(outs["reference"], field))
        g = np.asarray(getattr(outs["fused"], field))
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(g / scale, w / scale, atol=5e-4,
                                   err_msg=field)


@pytest.mark.parametrize("impl", ["chol", "pallas", "rejitter"])
def test_fused_block_gradients_match_two_pass(impl, monkeypatch):
    """Gradients of the inside-ELBO objective w.r.t. ALL GP parameters and
    the encoder outputs must match the two-pass reference path — this is
    what training actually consumes."""
    if impl == "pallas":
        monkeypatch.setenv("SVGPVAE_CHOL_INVERSE", "pallas")
    kl_impl = "rejitter" if impl == "rejitter" else "identity"
    inverse_impl = impl if impl in ("chol", "pallas") else "chol"
    gp, aux, y, noise = _mnist_problem()
    b = y.shape[0]

    def objective(pieces):
        p_m, p_v, sum_terms, kl_terms, _ = pieces
        # the forward pass's inside-ELBO + a p_m/p_v-dependent piece (the
        # CE term consumes the posterior)
        inside = jnp.sum(sum_terms) - (b / gp.config.N_train) * jnp.sum(
            kl_terms)
        return inside + jnp.sum(p_m ** 2) + jnp.sum(jnp.log(p_v))

    def loss_ref(gp, y, noise):
        return objective(_reference_block(gp, aux, y, noise))

    def loss_fused(gp, y, noise):
        return objective(gpm.gp_block_hensman(gp, aux, y, noise,
                                              inverse_impl=inverse_impl,
                                              kl_impl=kl_impl))

    val_r = loss_ref(gp, y, noise)
    val_f = loss_fused(gp, y, noise)
    np.testing.assert_allclose(float(val_f), float(val_r), rtol=2e-5)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(gp, y, noise)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(gp, y, noise)
    leaves_r, _ = jax.tree_util.tree_flatten(g_ref)
    leaves_f, _ = jax.tree_util.tree_flatten(g_fus)
    assert len(leaves_r) == len(leaves_f)
    for lr, lf in zip(leaves_r, leaves_f):
        lr, lf = np.asarray(lr), np.asarray(lf)
        scale = max(np.abs(lr).max(), 1e-3)
        np.testing.assert_allclose(lf / scale, lr / scale, atol=5e-4)


def test_fused_titsias_stable_on_ill_conditioned_kernel():
    """Regression guard for the Titsias f32 instability (PARITY.md
    #11/#12, RESULTS.md round 3): at the measured failure regime —
    long periodic length scale collapsing cond(Kmm) past 1/eps32,
    encoder variances at the clip floor — the shipped fused
    (determinant-lemma) bound must stay finite AND track the float64
    truth, where the dense two-pass bound's f32 Q goes indefinite at
    O(1) scale (measured lambda_min(cov) = -22 in the 1000-epoch run)
    and its Cholesky logdet/quad turn into an unbounded false reward.
    Only the shipped path is asserted healthy; the two-pass impl at
    these params is exactly why `auto` routes Titsias to the fused
    bound on every backend."""
    R = np.random.RandomState(11)
    b, L, M, m, n_obj = 256, 16, 8, 32, 400
    ip = np.hstack([np.arange(m)[:, None], R.rand(m, 1) * 2 * np.pi,
                    R.randn(m, M)])
    gp = gpm.init_mnist_svgp(
        ip, R.randn(n_obj, M),
        config=SVGPConfig(jitter=1e-6, N_train=4050, titsias=True))
    # the bisected failure point: ls ~4.6, amp ~1.6 (tools/debug_titsias)
    gp = gp.replace(length_scale=jnp.asarray(4.6, jnp.float32),
                    amplitude=jnp.asarray(1.6, jnp.float32))
    aux = jnp.asarray(np.hstack([
        R.randint(0, n_obj, (b, 1)).astype(float),
        R.rand(b, 1) * 2 * np.pi, R.randn(b, M)]), jnp.float32)
    y = jnp.asarray(R.randn(b, L), jnp.float32)
    noise = jnp.full((b, L), 1e-3, jnp.float32)  # QVAR_CLIP floor

    got = gpm.gp_block_titsias(gp, aux, y, noise)
    l2_32 = np.asarray(got[2])
    assert np.isfinite(l2_32).all()

    # float64 truth through the same fused path
    jax.config.update("jax_enable_x64", True)
    try:
        f64 = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, t)
        l2_64 = np.asarray(gpm.gp_block_titsias(
            f64(gp), f64(aux), f64(y), f64(noise))[2])
    finally:
        jax.config.update("jax_enable_x64", False)
    # no false reward: f32 tracks f64 at a few percent on a bound whose
    # failure mode is +1e16
    np.testing.assert_allclose(l2_32, l2_64, rtol=5e-2)


def test_titsias_objective_runaway_channel():
    """Documents the reference-objective degeneracy behind the Titsias
    training explosions (RESULTS.md round 3): the forward pass's
    KL_term = inside_elbo - ce has a residual channel
    +0.5 (qm - pm)^2 / qv from -ce.  For the HENSMAN bound,
    inside_elbo's data-fit term -0.5 prec (qm - pm)^2 cancels it at the
    identical 1/(2 qv) weight, so gradient ascent on the encoder means
    converges.  The collapsed TITSIAS bound penalizes qm only through
    cov^{-1} <= D^{-1} (and the posterior's N/b scale breaks the
    marginal cancellation), leaving a net unbounded ascent direction —
    measured in training as encoder means exploding to 1e8 with sane GP
    params, ELBO ~ -(beta/L) * ce, in float32 AND float64.  This test
    pins the mechanism at the objective level: 300 normalized-gradient
    ascent steps on y (variances at the clip floor) leave the Hensman
    KL_term bounded while the Titsias KL_term climbs past it by
    hundreds.  If a future objective change makes Titsias bounded here,
    the GECO-default mitigation can be revisited."""
    gp, aux, y0, noise0 = _mnist_problem()
    noise = jnp.full_like(noise0, 1e-3)

    def make_kl_term(g, titsias):
        def kl_term(yy):
            p_m, p_v, mu_hat, A_hat = gpm.posterior_params(
                g, aux, aux, yy, noise)
            s, k = gpm.variational_loss(g, aux, yy, noise, mu_hat, A_hat)
            inside = jnp.sum(s) - (jnp.sum(k) if titsias else
                                   (yy.shape[0] / g.config.N_train)
                                   * jnp.sum(k))
            from svgpvae_tpu import linalg
            ce = jnp.sum(linalg.gauss_cross_entropy(
                p_m, jnp.maximum(p_v, 1e-6), yy, noise))
            return -ce + inside
        return kl_term

    results = {}
    for titsias in (False, True):
        g = gp.replace(config=gp.config.replace(titsias=titsias))
        f = jax.jit(jax.value_and_grad(make_kl_term(g, titsias)))
        yy, v0, v = y0, None, None
        for it in range(301):
            v, grad = f(yy)
            if it == 0:
                v0 = float(v)
            yy = yy + 0.05 * grad / (jnp.linalg.norm(grad) + 1e-9)
        results[titsias] = (v0, float(v), float(jnp.abs(yy).max()))

    h0, h300, hmax = results[False]
    t0, t300, tmax = results[True]
    # Hensman: bounded (ascent gains < 5 nats, means stay data-scale)
    assert h300 - h0 < 5.0, (h0, h300)
    assert hmax < 10.0, hmax
    # Titsias: the same ascent finds the unbounded channel
    assert t300 - t0 > 100.0, (t0, t300)
