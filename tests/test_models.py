"""Model-layer (ELBO forward pass) tests: objective identities, GECO
algebra, finiteness and gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svgpvae_tpu import gp as gpm
from svgpvae_tpu import models, nn as nets
from svgpvae_tpu.gp.svgp import SVGPConfig

KEY = jax.random.PRNGKey(42)
RNG = np.random.RandomState(11)


def _mnist_setup(b=8, L=4, M=3, m=6, n_obj=10, titsias=False):
    vae = nets.MnistVAE(L=L)
    images = jnp.asarray(RNG.rand(b, 28, 28, 1), dtype=jnp.float32)
    vae_params = vae.init(KEY, images)
    ip = np.hstack([np.arange(m)[:, None], RNG.rand(m, 1) * 2 * np.pi,
                    RNG.randn(m, M)])
    ov = RNG.randn(n_obj, M)
    cfg = SVGPConfig(titsias=titsias, jitter=1e-6, N_train=100)
    gp = gpm.init_mnist_svgp(ip, ov, config=cfg)
    aux = jnp.asarray(np.hstack([
        RNG.randint(0, n_obj, (b, 1)).astype(float),
        RNG.rand(b, 1) * 2 * np.pi, RNG.randn(b, M)]), dtype=jnp.float32)
    return vae, vae_params, gp, images, aux


def test_resolve_gp_block_impl_table():
    """'auto' dispatch is a declarative table — enumerate EVERY
    (workload, bound, backend) cell so a default flip can't drift past
    the suite, and pin the cells the current backend resolves to.
    Explicit impls pass through untouched."""
    # the table is total over workloads x bounds x backends
    workloads = ("mnist", "ball", "sprites")
    bounds = ("hensman", "titsias")
    backends = ("tpu", "other")
    valid = {"reference", "fused", "fused_pallas", "fused_rejitter",
             "fused_rejitter_pallas"}
    assert set(models.svgpvae.GP_BLOCK_AUTO_TABLE) == {
        (w, b, k) for w in workloads for b in bounds for k in backends}
    for cell, (impl, evidence) in models.svgpvae.GP_BLOCK_AUTO_TABLE.items():
        assert impl in valid, cell
        assert isinstance(evidence, str) and evidence, cell

    # explicit impls pass through on every workload
    for workload in workloads:
        for impl in sorted(valid):
            assert models.resolve_gp_block_impl(impl, workload) == impl

    # the expected cell values (the r5 default set): identity-KL fused
    # impls on the well-conditioned kernels, fused_rejitter_pallas on
    # SPRITES Hensman TPU (2-seed converged evidence, RESULTS.md r5
    # wave 12), Woodbury-Cholesky for sprites Titsias, two-pass
    # reference anchors off-TPU for Hensman
    expected = {
        ("mnist", "hensman", "tpu"): "fused_pallas",
        ("mnist", "hensman", "other"): "reference",
        ("ball", "hensman", "tpu"): "fused_pallas",
        ("ball", "hensman", "other"): "reference",
        ("sprites", "hensman", "tpu"): "fused_rejitter_pallas",
        ("sprites", "hensman", "other"): "reference",
        ("mnist", "titsias", "tpu"): "fused_pallas",
        ("mnist", "titsias", "other"): "fused",
        ("ball", "titsias", "tpu"): "fused_pallas",
        ("ball", "titsias", "other"): "fused",
        ("sprites", "titsias", "tpu"): "fused",
        ("sprites", "titsias", "other"): "fused",
    }
    for cell, impl in expected.items():
        assert models.svgpvae.GP_BLOCK_AUTO_TABLE[cell][0] == impl, cell

    # resolve() reads the table for the live backend
    backend = "tpu" if jax.default_backend() == "tpu" else "other"
    for w in workloads:
        for titsias in (False, True):
            bound = "titsias" if titsias else "hensman"
            assert models.resolve_gp_block_impl("auto", w, titsias=titsias) \
                == expected[(w, bound, backend)]

    # data_parallel downgrades auto-resolved Pallas variants to their
    # pure-XLA siblings (GSPMD partitioning of the Mosaic custom call is
    # uncertifiable on one chip); explicit Pallas flags pass through
    for w in workloads:
        for titsias in (False, True):
            bound = "titsias" if titsias else "hensman"
            got = models.resolve_gp_block_impl("auto", w, titsias=titsias,
                                               data_parallel=True)
            want = expected[(w, bound, backend)]
            if want.endswith("_pallas"):
                want = want[:-len("_pallas")]
            assert got == want, (w, bound, got, want)
    assert models.resolve_gp_block_impl(
        "fused_rejitter_pallas", "sprites",
        data_parallel=True) == "fused_rejitter_pallas"


def test_svgpvae_forward_fused_rejitter_matches_reference():
    """Model-level wiring check: forward_pass_svgpvae with
    gp_block_impl='fused_rejitter' matches the two-pass reference impl on
    every output the training loop reads (the rejittered KL is the exact
    two-pass formula, so unlike 'fused' no loosened kl tolerance is
    needed)."""
    vae, vae_params, gp, images, aux = _mnist_setup()
    outs = {}
    for impl in ("reference", "fused_rejitter"):
        outs[impl] = models.forward_pass_svgpvae(
            vae, vae_params, gp, (images, aux), KEY, beta=0.001,
            C_ma=0.0, lagrange_mult=1.0, alpha=0.99, kappa=np.sqrt(0.02),
            geco=True, gp_block_impl=impl)
    for field in outs["reference"]._fields:
        w = np.asarray(getattr(outs["reference"], field))
        g = np.asarray(getattr(outs["fused_rejitter"], field))
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(g / scale, w / scale, atol=5e-4,
                                   err_msg=field)


def test_svgpvae_forward_titsias_fused_matches_reference():
    """Titsias configs route gp_block_impl='fused[_*]' to the fused
    Titsias block; every forward output must match the two-pass impl."""
    vae, vae_params, gp, images, aux = _mnist_setup(titsias=True)
    outs = {}
    for impl in ("reference", "fused"):
        outs[impl] = models.forward_pass_svgpvae(
            vae, vae_params, gp, (images, aux), KEY, beta=0.001,
            C_ma=0.0, lagrange_mult=1.0, alpha=0.99, kappa=np.sqrt(0.02),
            geco=False, gp_block_impl=impl)
    for field in outs["reference"]._fields:
        w = np.asarray(getattr(outs["reference"], field))
        g = np.asarray(getattr(outs["fused"], field))
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(g / scale, w / scale, atol=5e-4,
                                   err_msg=field)


def test_svgpvae_plain_objective_identity():
    vae, vae_params, gp, images, aux = _mnist_setup()
    out = models.forward_pass_svgpvae(
        vae, vae_params, gp, (images, aux), KEY, beta=0.001,
        C_ma=0.0, lagrange_mult=1.0, alpha=0.99, kappa=np.sqrt(0.02),
        geco=False)
    L = out.qnet_mu.shape[1]
    want = -out.recon_loss + (0.001 / L) * out.kl_term
    np.testing.assert_allclose(out.elbo, want, rtol=1e-6)
    np.testing.assert_allclose(out.kl_term, -out.ce_term + out.inside_elbo,
                               rtol=1e-6)
    # Hensman (b/N) KL scaling
    b = images.shape[0]
    np.testing.assert_allclose(
        out.inside_elbo,
        out.inside_elbo_recon - (b / 100) * out.inside_elbo_kl, rtol=1e-6)
    assert np.isfinite(out.elbo)


def test_svgpvae_geco_state_updates():
    vae, vae_params, gp, images, aux = _mnist_setup()
    kappa = np.sqrt(0.02)
    C_ma0, lam0, alpha = 0.3, 1.7, 0.9
    out = models.forward_pass_svgpvae(
        vae, vae_params, gp, (images, aux), KEY, beta=0.001,
        C_ma=C_ma0, lagrange_mult=lam0, alpha=alpha, kappa=kappa, geco=True)
    b = images.shape[0]
    want_C = alpha * C_ma0 + (1 - alpha) * np.asarray(out.recon_loss) / b
    np.testing.assert_allclose(out.C_ma, want_C, rtol=1e-5)
    np.testing.assert_allclose(out.lagrange_mult,
                               lam0 * np.exp(want_C), rtol=1e-5)
    # objective value: -KL + lambda * C_ma_new (the stop_grad cancels
    # recon/b in value, leaving the moving average)
    want_obj = -np.asarray(out.kl_term) + lam0 * want_C
    np.testing.assert_allclose(out.elbo, want_obj, rtol=1e-5)


def test_svgpvae_titsias_branch_and_grads():
    vae, vae_params, gp, images, aux = _mnist_setup(titsias=True)

    def loss(vp, gpp):
        out = models.forward_pass_svgpvae(
            vae, vp, gpp, (images, aux), KEY, beta=0.001,
            C_ma=0.0, lagrange_mult=1.0, alpha=0.99, kappa=0.1, geco=False)
        return -out.elbo

    grads_v, grads_g = jax.grad(loss, argnums=(0, 1))(vae_params, gp)
    flat = jax.tree_util.tree_leaves((grads_v, grads_g))
    assert all(np.all(np.isfinite(g)) for g in flat)
    # GP hyperparameter gradients exist and are nonzero
    assert np.abs(np.asarray(grads_g.length_scale)) > 0


def test_svgpvae_bias_analysis_output():
    vae, vae_params, gp, images, aux = _mnist_setup()
    out = models.forward_pass_svgpvae(
        vae, vae_params, gp, (images, aux), KEY, beta=0.001,
        C_ma=0.0, lagrange_mult=1.0, alpha=0.99, kappa=0.1,
        bias_analysis=True)
    assert out.mean_vectors.shape == (4, 6)  # (L, m)


def test_cgen_mnist_pipeline_runs():
    vae, vae_params, gp, images, aux = _mnist_setup()
    n_train = 20
    train_aux = jnp.asarray(np.hstack([
        RNG.randint(0, 10, (n_train, 1)).astype(float),
        RNG.rand(n_train, 1) * 2 * np.pi, RNG.randn(n_train, 3)]),
        dtype=jnp.float32)
    means = jnp.asarray(RNG.randn(n_train, 4), dtype=jnp.float32)
    variances = jnp.asarray(RNG.rand(n_train, 4) + 0.5, dtype=jnp.float32)
    recon, loss = models.predict_cgen_mnist(
        vae, vae_params, gp, (images, aux), means, variances, train_aux, KEY)
    assert recon.shape == images.shape
    assert np.isfinite(loss)


def test_vae_objective_identity_and_cvae():
    b, L = 6, 4
    vae = nets.MnistVAE(L=L)
    images = jnp.asarray(RNG.rand(b, 28, 28, 1), dtype=jnp.float32)
    vae_params = vae.init(KEY, images)
    aux = jnp.asarray(RNG.rand(b, 5), dtype=jnp.float32)

    out = models.forward_pass_vae(vae, vae_params, (images, aux), KEY,
                                  sigma_gaussian_decoder=0.05)
    K = 28 * 28
    want = -(0.5 / 0.05**2) * np.asarray(out.recon_loss) * K \
        - np.asarray(out.kl_term)
    np.testing.assert_allclose(out.elbo, want, rtol=1e-5)

    cvae = nets.MnistCVAE(L=L)
    images3 = models.vae.cvae_inputs(images, aux[:, 1])
    cvae_params = cvae.init(KEY, images3, aux[:, 1])
    out_c = models.forward_pass_vae(cvae, cvae_params, (images, aux), KEY,
                                    cvae=True)
    assert out_c.recon_images.shape == images.shape
    assert np.isfinite(out_c.elbo)


def test_predict_cvae_segment_mean():
    b, L, n_obj = 12, 4, 5
    cvae = nets.MnistCVAE(L=L)
    images = jnp.asarray(RNG.rand(b, 28, 28, 1), dtype=jnp.float32)
    aux = jnp.asarray(np.hstack([
        RNG.randint(0, n_obj, (b, 1)).astype(float),
        RNG.rand(b, 1) * 2 * np.pi]), dtype=jnp.float32)
    images3 = models.vae.cvae_inputs(images, aux[:, 1])
    params = cvae.init(KEY, images3, aux[:, 1])

    test_aux = jnp.asarray(np.hstack([
        np.arange(n_obj)[:, None].astype(float),
        RNG.rand(n_obj, 1) * 2 * np.pi]), dtype=jnp.float32)
    test_images = jnp.asarray(RNG.rand(n_obj, 28, 28, 1), dtype=jnp.float32)
    recon, loss = models.predict_cvae(cvae, params, images, aux, test_images,
                                      test_aux, KEY, n_objects=n_obj)
    assert recon.shape == test_images.shape
    assert np.isfinite(loss)


def test_ball_svgpvae_elbo():
    batch, T = 5, 10
    enc = nets.BallEncoder()
    dec = nets.BallDecoder()
    vids = jnp.asarray(RNG.rand(batch, T, 32, 32) > 0.8, dtype=jnp.float32)
    ep = enc.init(KEY, vids)
    dp = dec.init(KEY, jnp.zeros((batch, T, 2)))
    gp = gpm.init_ball_svgp(6, 1.0, float(T), 2.0,
                            config=SVGPConfig(jitter=1e-6))

    out = models.ball_svgpvae_elbo(enc, ep, dec, dp, gp, vids, 1.0, KEY,
                                   clip_qs=True)
    assert out.elbo.shape == (batch,)
    assert np.all(np.isfinite(np.asarray(out.elbo)))
    np.testing.assert_allclose(out.prior_kl, out.ce_term + out.inside_elbo,
                               rtol=1e-5)
    assert out.gp_cov_elemwise_mean.shape == (T, T, 2)

    def loss(p):
        o = models.ball_svgpvae_elbo(enc, p, dec, dp, gp, vids, 1.0, KEY)
        return -jnp.mean(o.elbo)
    grads = jax.grad(loss)(ep)
    assert all(np.all(np.isfinite(g))
               for g in jax.tree_util.tree_leaves(grads))


@pytest.mark.parametrize("elbo_type", ["GPVAE_Pearce", "VAE", "NP"])
def test_pearce_family_elbos(elbo_type):
    batch, T = 4, 12
    enc = nets.BallEncoder()
    dec = nets.BallDecoder()
    vids = jnp.asarray(RNG.rand(batch, T, 32, 32) > 0.8, dtype=jnp.float32)
    ep = enc.init(KEY, vids)
    dp = dec.init(KEY, jnp.zeros((batch, T, 2)))
    lt = 0.001 if elbo_type == "VAE" else 2.0

    out = models.pearce_elbo(enc, ep, dec, dp, vids, 1.0, KEY, lt,
                             elbo_type=elbo_type)
    assert out.elbo.shape == (batch,)
    assert np.all(np.isfinite(np.asarray(out.elbo)))


def test_pearce_elbo_naive_f64_parity():
    """Term-by-term parity of pearce_elbo against a naive float64 numpy
    implementation of the reference composition (GPVAE_Pearce_model.py:
    89-236 with build_1d_gp :8-86): per-channel exact-GP posterior and
    marginal likelihood, gauss cross-entropy, Bernoulli reconstruction,
    elbo = recon + beta * (lhood - ce).  VERDICT r3 item 2's harness —
    exonerates (or implicates) the implementation independently of the
    training-dynamics question."""
    batch, T, beta, lt = 3, 7, 1.0, 2.0
    enc, dec = nets.BallEncoder(), nets.BallDecoder()
    vids = jnp.asarray(RNG.rand(batch, T, 32, 32) > 0.7, dtype=jnp.float32)
    ep = enc.init(KEY, vids)
    dp = dec.init(KEY, jnp.zeros((batch, T, 2)))

    out = models.pearce_elbo(enc, ep, dec, dp, vids, beta, KEY, lt)

    # naive f64 downstream of the encoder outputs
    qm = np.asarray(out.qnet_mu, np.float64)   # (b, T, 2)
    qv = np.asarray(out.qnet_var, np.float64)
    t = np.arange(T, dtype=np.float64)
    p_m = np.zeros((batch, T, 2))
    p_v = np.zeros((batch, T, 2))
    lhood = np.zeros(batch)
    for b in range(batch):
        for ch in range(2):
            K = np.exp(-0.5 * (t[:, None] - t[None, :]) ** 2 / lt ** 2)
            A = K + np.diag(qv[b, :, ch])
            iKy = np.linalg.solve(A, qm[b, :, ch])
            sign, logdet = np.linalg.slogdet(A)
            lhood[b] += -0.5 * (T * np.log(2 * np.pi)
                                + qm[b, :, ch] @ iKy + logdet)
            p_m[b, :, ch] = K.T @ iKy
            p_v[b, :, ch] = 1.0 - np.sum(K * np.linalg.solve(A, K), axis=0)
    np.testing.assert_allclose(np.asarray(out.p_m), p_m, rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.p_v), p_v, rtol=2e-4,
                               atol=1e-5)

    # gauss cross-entropy term (reference utils.py:483-504)
    ce = -0.5 * (np.log(2 * np.pi) + np.log(qv)
                 + (p_v + p_m ** 2 - 2 * p_m * qm + qm ** 2) / qv)
    ce_b = ce.sum(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out.ce_term), ce_b, rtol=2e-4,
                               atol=1e-4)

    # prior KL and full elbo composition
    np.testing.assert_allclose(np.asarray(out.prior_kl), lhood - ce_b,
                               rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.elbo),
        np.asarray(out.recon, np.float64) + beta * (lhood - ce_b),
        rtol=2e-4, atol=1e-3)

    # Bernoulli reconstruction term against naive f64 on the SAME
    # latent sample (reconstruct it from p_m/p_v and the known eps)
    eps = np.asarray(jax.random.normal(KEY, (batch, T, 2)), np.float64)
    latent = p_m + eps * np.sqrt(np.maximum(np.asarray(out.p_v,
                                                       np.float64), 0.0))
    logits = np.asarray(dec.apply(dp, jnp.asarray(latent, jnp.float32)),
                        np.float64)
    v = np.asarray(vids, np.float64)
    ce_rec = np.maximum(logits, 0) - logits * v + np.log1p(
        np.exp(-np.abs(logits)))
    np.testing.assert_allclose(np.asarray(out.recon),
                               -ce_rec.sum(axis=(1, 2, 3)), rtol=2e-4,
                               atol=1e-2)

    # gradient of the marginal likelihood wrt an encoder mean entry vs
    # f64 central differences of the naive function (the lhood term is
    # the Pearce objective's distinctive gradient channel)
    def lhood_jax(qm_j):
        post = gpm.gp_regression_1d(
            jnp.tile(jnp.asarray(t, jnp.float32)[None], (batch, 1)),
            qm_j[:, :, 0], jnp.asarray(qv[:, :, 0], jnp.float32),
            jnp.tile(jnp.asarray(t, jnp.float32)[None], (batch, 1)), lt)
        return jnp.sum(post.log_marginal)

    g = jax.grad(lhood_jax)(jnp.asarray(qm, jnp.float32))

    def lhood_np(qm_flat):
        qm_ = qm_flat.reshape(qm.shape)
        tot = 0.0
        for b in range(batch):
            K = np.exp(-0.5 * (t[:, None] - t[None, :]) ** 2 / lt ** 2)
            A = K + np.diag(qv[b, :, 0])
            iKy = np.linalg.solve(A, qm_[b, :, 0])
            sign, logdet = np.linalg.slogdet(A)
            tot += -0.5 * (T * np.log(2 * np.pi)
                           + qm_[b, :, 0] @ iKy + logdet)
        return tot

    h = 1e-5
    for (bi, ti) in ((0, 2), (1, 5)):
        e = np.zeros(qm.size)
        e[np.ravel_multi_index((bi, ti, 0), qm.shape)] = h
        fd = (lhood_np(qm.ravel() + e) - lhood_np(qm.ravel() - e)) / (2 * h)
        np.testing.assert_allclose(float(g[bi, ti, 0]), fd, rtol=1e-3,
                                   atol=1e-5)


def test_pearce_gp_joint_length_scales_and_entropy_ce():
    """Per-channel trainable length scales (reference: per-call l_GP
    variables, GPVAE_Pearce_model.py:36-42) get nonzero gradients through
    the marginal likelihood, a scalar length scale reproduces the pair
    form, and the entropy-CE variant is finite and differs from the
    reference CE."""
    batch, T = 3, 10
    enc, dec = nets.BallEncoder(), nets.BallDecoder()
    vids = jnp.asarray(RNG.rand(batch, T, 32, 32) > 0.8, dtype=jnp.float32)
    ep = enc.init(KEY, vids)
    dp = dec.init(KEY, jnp.zeros((batch, T, 2)))

    out_scalar = models.pearce_elbo(enc, ep, dec, dp, vids, 1.0, KEY, 2.0)
    out_pair = models.pearce_elbo(enc, ep, dec, dp, vids, 1.0, KEY,
                                  (jnp.asarray(2.0), jnp.asarray(2.0)))
    np.testing.assert_allclose(np.asarray(out_pair.elbo),
                               np.asarray(out_scalar.elbo), rtol=1e-6)

    def mean_elbo(ls):
        return jnp.mean(models.pearce_elbo(enc, ep, dec, dp, vids, 1.0,
                                           KEY, ls).elbo)

    g = jax.grad(mean_elbo)((jnp.asarray(2.0), jnp.asarray(3.0)))
    assert np.isfinite(float(g[0])) and np.isfinite(float(g[1]))
    assert float(jnp.abs(g[0])) > 0 and float(jnp.abs(g[1])) > 0

    out_ent = models.pearce_elbo(enc, ep, dec, dp, vids, 1.0, KEY, 2.0,
                                 entropy_ce=True)
    assert np.all(np.isfinite(np.asarray(out_ent.elbo)))
    assert not np.allclose(np.asarray(out_ent.ce_term),
                           np.asarray(out_scalar.ce_term))


def test_casale_forward_and_predict():
    N, b, L, M, P, Q = 20, 5, 4, 3, 4, 5
    vae = nets.MnistVAE(L=L)
    images_all = jnp.asarray(RNG.rand(N, 28, 28, 1), dtype=jnp.float32)
    vae_params = vae.init(KEY, images_all[:b])

    gp = gpm.init_casale_gp(RNG.randn(P, M), object_kernel_normalize=False,
                            ov_joint=True)
    angles = np.sort(RNG.rand(Q) * 2 * np.pi)
    mask = np.zeros(P * Q, bool)
    mask[RNG.choice(P * Q, N, replace=False)] = True
    V = gpm.v_matrix(gp, jnp.asarray(angles, dtype=jnp.float32),
                     jnp.arange(P), jnp.asarray(mask))

    Z = models.encode_full_casale(vae, vae_params, images_all, KEY,
                                  clip_qs=True)
    assert Z.shape == (N, L)
    a, B, c = gpm.taylor_coeffs(gp, Z, V)

    # batch with global indices in aux column 0
    ids = np.repeat(np.arange(P), Q)[mask]
    angs = np.tile(angles, P)[mask]
    aux_all = np.hstack([np.arange(N)[:, None].astype(float),
                         ids[:, None].astype(float), angs[:, None]])
    batch_rows = RNG.choice(N, b, replace=False)
    batch = (images_all[batch_rows],
             jnp.asarray(aux_all[batch_rows], dtype=jnp.float32))

    out = models.forward_pass_casale(vae, vae_params, gp, batch, KEY,
                                     a, B, c, V, beta=0.001)
    assert np.isfinite(out.elbo)
    assert out.recon_images.shape == (b, 28, 28, 1)

    # factored path (B=None + taylor_terms pieces): the gathered-B
    # identity must reproduce the materialized-B objective bit-for-bit
    # up to float reassociation, in values AND gradients (the driver
    # trains on this path since r5 — gp/casale.py taylor_terms)
    a2, ztKV, K_inv_V, c2 = gpm.taylor_terms(gp, Z, V)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c), rtol=1e-6)
    out_t = models.forward_pass_casale(vae, vae_params, gp, batch, KEY,
                                       a2, None, c2, V, beta=0.001,
                                       ztKV=ztKV, K_inv_V=K_inv_V)
    np.testing.assert_allclose(float(out_t.elbo), float(out.elbo),
                               rtol=1e-5)
    np.testing.assert_allclose(float(out_t.gp_prior_term),
                               float(out.gp_prior_term), rtol=1e-5)

    def loss_dense(g):
        aa, BB, cc = gpm.taylor_coeffs(g, Z, V)
        return models.forward_pass_casale(vae, vae_params, g, batch, KEY,
                                          aa, BB, cc, V, beta=0.001).elbo

    def loss_terms(g):
        aa, zt, kiv, cc = gpm.taylor_terms(g, Z, V)
        return models.forward_pass_casale(vae, vae_params, g, batch, KEY,
                                          aa, None, cc, V, beta=0.001,
                                          ztKV=zt, K_inv_V=kiv).elbo

    g_d = jax.grad(loss_dense)(gp)
    g_t = jax.grad(loss_terms)(gp)
    for ld, lt in zip(jax.tree_util.tree_leaves(g_d),
                      jax.tree_util.tree_leaves(g_t)):
        ld, lt = np.asarray(ld), np.asarray(lt)
        scale = max(float(np.abs(ld).max()), 1e-6)
        np.testing.assert_allclose(lt / scale, ld / scale, atol=1e-5)

    test_aux = np.hstack([ids[:3, None].astype(float), angs[:3, None]])
    recon, loss = models.predict_cgen_casale(
        vae, vae_params, gp, images_all[:3],
        jnp.asarray(test_aux, dtype=jnp.float32),
        jnp.asarray(aux_all, dtype=jnp.float32), V, Z, KEY)
    assert recon.shape == (3, 28, 28, 1)
    assert np.isfinite(loss)


def test_deep_svigp_forward_and_predict():
    b, L, M, m = 6, 4, 3, 5
    dec = nets.SVIGPDecoder(L=L)
    dec_params = dec.init(KEY, jnp.zeros((b, L)))
    ip = np.hstack([np.arange(m)[:, None], RNG.rand(m, 1) * 2 * np.pi,
                    RNG.randn(m, M)])
    gp = gpm.init_svigp(ip, RNG.randn(9, M), L=L, N_train=50)

    images = jnp.asarray(RNG.rand(b, 28, 28, 1), dtype=jnp.float32)
    aux = jnp.asarray(np.hstack([
        np.arange(b)[:, None].astype(float),
        RNG.randint(0, 9, (b, 1)).astype(float),
        RNG.rand(b, 1) * 2 * np.pi, RNG.randn(b, M)]), dtype=jnp.float32)

    out = models.forward_pass_deep_svigp(dec, dec_params, gp, (images, aux))
    assert np.isfinite(out.elbo)
    assert out.latent_samples.shape == (b, L)

    def loss(g, dp):
        return -models.forward_pass_deep_svigp(dec, dp, g,
                                               (images, aux)).elbo
    gg, gd = jax.grad(loss, argnums=(0, 1))(gp, dec_params)
    assert np.abs(np.asarray(gg.noise)) > 0
    assert all(np.all(np.isfinite(x))
               for x in jax.tree_util.tree_leaves((gg, gd)))


def test_sprites_forward_and_cgen():
    fpc, n_char, L, L_act, L_chr = 4, 3, 8, 3, 5
    b = fpc * n_char
    vae = nets.SpritesVAE(L=L)
    repr_net = nets.SpritesReprNet(L=L_chr)
    images = jnp.asarray(RNG.rand(b, 64, 64, 3), dtype=jnp.float32)
    vae_params = vae.init(KEY, images)
    repr_params = repr_net.init(KEY, images)

    m, n_act = 6, 9
    ip = RNG.randn(m, L_act + L_chr)
    gplvm = RNG.randn(n_act, L_act)
    cfg = SVGPConfig(jitter=1e-2, N_train=100)
    gp = gpm.init_sprites_svgp(ip, gplvm, L_action=L_act, config=cfg)
    action_ids = jnp.asarray(RNG.randint(0, n_act, b), dtype=jnp.float32)

    out = models.forward_pass_svgpvae(
        vae, vae_params, gp, (images, action_ids), KEY, beta=0.001,
        C_ma=0.0, lagrange_mult=1.0, alpha=0.99, kappa=np.sqrt(0.0075),
        geco=True, repr_apply=repr_net.apply, repr_params=repr_params,
        frames_per_char=fpc)
    assert np.isfinite(out.elbo)

    # cgen for unseen characters: 72 frames per char layout
    b_test = 72 * 2
    test_images = jnp.asarray(RNG.rand(b_test, 64, 64, 3), dtype=jnp.float32)
    test_ids = jnp.asarray(np.tile(np.arange(9), 16), dtype=jnp.float32)
    means = jnp.asarray(RNG.randn(40, L), dtype=jnp.float32)
    variances = jnp.asarray(RNG.rand(40, L) + 0.5, dtype=jnp.float32)
    aux_train = jnp.asarray(np.hstack([
        RNG.randint(0, n_act, (40, 1)).astype(float), RNG.randn(40, L_chr)]),
        dtype=jnp.float32)
    mt, si, kmi = models.precompute_gp_params(gp, means, variances, aux_train)
    recon, tgt, loss = models.predict_cgen_sprites(
        vae, vae_params, gp, repr_net.apply, repr_params,
        test_images, test_ids, mt, si, kmi, n_context=36,
        n_actions_total=72, key=KEY)
    assert recon.shape == (2 * 36, 64, 64, 3)
    assert tgt.shape == recon.shape
    assert np.isfinite(loss)


def test_sprites_forward_s2d64_fused_rejitter_composition():
    """The two validated SPRITES speed levers compose: a forward pass with
    SpritesVAE(s2d64=True) (exact space-to-depth conv rewrite, same
    parameter tree) AND gp_block_impl='fused_rejitter' (one-pass GP block
    with the exact two-pass rejittered KL) must reproduce the reference
    path's ELBO and gradients to float tolerance.  Each lever is pinned
    individually (tests/test_nn.py, tests/test_fused_gp.py); this pins
    the combination the drivers run when both flags are set (wave 12).

    The fixture draws from a DEDICATED RandomState so it is independent
    of test execution order (the shared module RNG's stream shifts with
    every test that runs before this one, and the tolerances below are
    calibrated on this exact fixture).  Seed 1234 gives a well-conditioned
    Kmm (measured eig range [1.4, 46], cond ~33), so the production-scale
    jitter works and the fused block's documented O(jitter) perturbation
    (gp/fused.py:35-39) stays below the asserted tolerances."""
    rng = np.random.RandomState(1234)
    fpc, n_char, L, L_act, L_chr = 4, 3, 8, 3, 5
    b = fpc * n_char
    vae_ref = nets.SpritesVAE(L=L)
    vae_s2d = nets.SpritesVAE(L=L, s2d64=True)
    repr_net = nets.SpritesReprNet(L=L_chr)
    images = jnp.asarray(rng.rand(b, 64, 64, 3), dtype=jnp.float32)
    vae_params = vae_ref.init(KEY, images)
    repr_params = repr_net.init(KEY, images)

    m, n_act = 6, 9
    ip = rng.randn(m, L_act + L_chr)
    gplvm = rng.randn(n_act, L_act)
    cfg = SVGPConfig(jitter=1e-4, N_train=100)
    gp = gpm.init_sprites_svgp(ip, gplvm, L_action=L_act, config=cfg)
    action_ids = jnp.asarray(rng.randint(0, n_act, b), dtype=jnp.float32)

    def fwd(vae, params, impl):
        return models.forward_pass_svgpvae(
            vae, params["vae"], params["gp"], (images, action_ids), KEY,
            beta=0.001, C_ma=0.0, lagrange_mult=1.0, alpha=0.99,
            kappa=np.sqrt(0.0075), geco=True, repr_apply=repr_net.apply,
            repr_params=params["repr"], frames_per_char=fpc,
            gp_block_impl=impl)

    params = {"vae": vae_params, "gp": gp, "repr": repr_params}
    o_ref = fwd(vae_ref, params, "reference")
    o_combo = fwd(vae_s2d, params, "fused_rejitter")
    # The fused block's recon sufficient statistics carry a documented
    # O(cfg.jitter) perturbation vs the two-pass path (gp/fused.py:35-39).
    # On THIS fixture (seed 1234, jitter=1e-4) the measured normalized
    # deltas are <= 5.4e-7 in f32 and <= 6.4e-7 in the f64 cross-check
    # below, so the perturbation is jitter placement, not float
    # reassociation; tolerances carry ~15x margin over the measurements.
    # The ELBO is a cancellation of large terms, so normalize by the
    # dominating term's magnitude instead of asserting raw rtol.
    scale = max(float(np.abs(o_ref.inside_elbo_recon)), 1.0)
    for f in ("recon_loss", "inside_elbo_recon", "inside_elbo_kl", "elbo"):
        a = float(getattr(o_ref, f))
        c = float(getattr(o_combo, f))
        np.testing.assert_allclose(c / scale, a / scale, atol=1e-5,
                                   err_msg=f)

    def loss(vae, p, impl):
        return -fwd(vae, p, impl).elbo

    g_ref = jax.grad(lambda p: loss(vae_ref, p, "reference"))(params)
    g_combo = jax.grad(lambda p: loss(vae_s2d, p, "fused_rejitter"))(params)
    for a, c in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_combo)):
        a, c = np.asarray(a), np.asarray(c)
        assert np.all(np.isfinite(c))
        gscale = max(float(np.abs(a).max()), 1e-3)
        # GP-param gradients inherit the same O(jitter) perturbation
        # (max normalized delta 1.5e-4 measured on this pinned fixture);
        # a genuine composition/wiring bug shows O(1) deltas here.
        np.testing.assert_allclose(c / gscale, a / gscale, atol=2e-3)

    # f64 cross-check: the same two impls at float64 on the same fixture
    # agree to the same O(jitter) level, verifying per-fixture that the
    # residual f32 delta above is jitter placement, not precision loss.
    jax.config.update("jax_enable_x64", True)
    try:
        def to64(t):
            return jax.tree_util.tree_map(
                lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float64)
                if jnp.issubdtype(jnp.result_type(x), jnp.floating) else x,
                t)

        p64 = to64(params)
        img64 = jnp.asarray(np.asarray(images), dtype=jnp.float64)
        act64 = jnp.asarray(np.asarray(action_ids), dtype=jnp.float64)

        def fwd64(vae, impl):
            return models.forward_pass_svgpvae(
                vae, p64["vae"], p64["gp"], (img64, act64), KEY,
                beta=0.001, C_ma=0.0, lagrange_mult=1.0, alpha=0.99,
                kappa=np.sqrt(0.0075), geco=True, repr_apply=repr_net.apply,
                repr_params=p64["repr"], frames_per_char=fpc,
                gp_block_impl=impl)

        r64 = fwd64(vae_ref, "reference")
        c64 = fwd64(vae_s2d, "fused_rejitter")
        s64 = max(float(np.abs(r64.inside_elbo_recon)), 1.0)
        for f in ("recon_loss", "inside_elbo_recon", "inside_elbo_kl",
                  "elbo"):
            a = float(getattr(r64, f))
            c = float(getattr(c64, f))
            np.testing.assert_allclose(c / s64, a / s64, atol=1e-5,
                                       err_msg=f"f64 {f}")
    finally:
        jax.config.update("jax_enable_x64", False)


def test_full_cholesky_head_end_to_end():
    """Full-Cholesky encoder head threads through both ball ELBO families;
    the in-graph marginalization matches the numpy post-processing
    (reference: VAE_utils.py:39-47, utils.py:248-259)."""
    from svgpvae_tpu.models.ball import full_cholesky_marginal_vars
    from svgpvae_tpu.utils.metrics import post_process_full_cholesky

    batch, T = 4, 8
    arr = RNG.randn(batch, T, 2 * T)
    np.testing.assert_allclose(
        np.asarray(full_cholesky_marginal_vars(jnp.asarray(arr))),
        post_process_full_cholesky(arr, T), rtol=1e-5)

    enc = nets.BallEncoder(full_cholesky=True)
    dec = nets.BallDecoder()
    vids = jnp.asarray(RNG.rand(batch, T, 32, 32) > 0.8, dtype=jnp.float32)
    ep = enc.init(KEY, vids)
    dp = dec.init(KEY, jnp.zeros((batch, T, 2)))
    mu, var = enc.apply(ep, vids)
    assert var.shape == (batch, T, 2 * T)

    gp = gpm.init_ball_svgp(6, 1.0, float(T), 2.0,
                            config=SVGPConfig(jitter=1e-6))
    out = models.ball_svgpvae_elbo(enc, ep, dec, dp, gp, vids, 1.0, KEY,
                                   clip_qs=True)
    assert out.qnet_var.shape == (batch, T, 2)
    assert np.all(np.isfinite(np.asarray(out.elbo)))

    out_p = models.pearce_elbo(enc, ep, dec, dp, vids, 1.0, KEY, 2.0)
    assert np.all(np.isfinite(np.asarray(out_p.elbo)))

    # the aligned-variance metric accepts the raw Cholesky rows
    from svgpvae_tpu import utils
    Y = RNG.randn(batch, T, 2)
    _, _, _, vx_rot = utils.mse_rotation(np.asarray(mu), Y,
                                         np.asarray(var),
                                         full_cholesky=True)
    assert vx_rot.shape == (batch, T, 2, 2)
