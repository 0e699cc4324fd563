"""Fused GP block for the SVGPVAE training step (VERDICT r2 item 3).

The reference (and the round-1/2 port of it) computes the per-step GP
quantities in two passes — `approximate_posterior_params`
(SVGPVAE_model.py:303-343) then `variational_loss` (:261-301) — each
rebuilding kernel matrices and factorizations.  In the training forward
the posterior is evaluated AT the minibatch points (aux_test == aux_train,
forward_pass_SVGPVAE :868-879), which makes several quantities literally
identical across the two passes:

  mean_vector_l = K_nm K_mm^{-1} mu_hat_l = scale * K_nm Sigma_l^{-1} r_l
                = p_m(train points)                      [':276' == ':336']
  w_i^T A_hat_l w_i = K_nm,i Sigma_l^{-1} K_mn,i = sig_quad(train)_il
  k_tilde = K_nn_diag - nystrom(train)

and the KL( N(mu_hat, A_hat) || N(0, K_mm) ) with A_hat = K Sigma^{-1} K
closes over the Sigma factorization alone:

  logdet A_hat = 2 logdet K_mm - logdet Sigma_l
  tr(K_mm^{-1} A_hat) = tr(Sigma_l^{-1} K_mm)
  mu_hat^T K_mm^{-1} mu_hat = scale^2 * sir_l^T K_mm sir_l

so the third batched Cholesky (of A_hat, inside mvn_kl_against_prior) and
the three W-based einsums disappear.  What remains per step is ONE
batched factorization of the (L+1, m, m) stack [K_mm; Sigma_1..L] plus
MXU einsums.

`inverse_impl="pallas"` additionally replaces the Cholesky + four
triangular-solve chains with one Pallas kernel producing explicit
inverses + logdets (ops.chol_inverse) whose custom VJP is two batched
matmuls — collapsing the ~40-small-op GP block the round-2 profile
identified as the latency bottleneck (PROFILE_r02.json: 0.321 ms of a
0.346 ms forward) into a single fused program region.

Numerical notes: jitter policy is identical to the unfused path
(absolute cfg.jitter on K_mm; absolute + max-diagonal-relative on Sigma,
gp/svgp.py:_sigma_cholesky).  The closed-form logdet identity drops the
extra `jitter` the unfused KL adds to A_hat before refactorizing it —
an O(jitter/lambda_min(A_hat)) perturbation, below f32 noise (parity
tests pin both paths to each other and to naive float64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from svgpvae_tpu import kernels, linalg
from svgpvae_tpu.ops.gp_stats import gp_stats


@linalg.precise
def gp_block_hensman(gp, aux: Array, y: Array, noise: Array,
                     inverse_impl: str = "chol",
                     kl_impl: str = "identity"):
    """Posterior params + Hensman inside-ELBO terms in one pass.

    aux: (b, D) minibatch index points; y/noise: (b, L) encoder means /
    variances.  Returns (p_m (b, L), p_v (b, L), sum_terms (L,),
    kl_terms (L,), mu_hat (L, m)).

    kl_impl selects how logdet A_hat enters the KL:
      "identity"  closed form (logdet A_hat = 2 logdet Kmm - logdet Sigma)
                  — zero extra factorizations, but on a rank-deficient
                  Kmm (the SPRITES product-linear kernel at m=72) it
                  charges each kernel null-space direction
                  log(jitter^2/lambda_Sigma), diverging from the
                  reference's semantics (PARITY.md #10, RESULTS.md r3).
      "rejitter"  materialize A_hat = Kmm Sigma^{-1} Kmm and refactorize
                  it with jitter — the exact two-pass/reference KL
                  (mvn_kl_against_prior on the shared Kmm_chol), at the
                  cost of one extra batched (L, m, m) matmul + Cholesky.
                  Null-space-safe.  With inverse_impl="pallas" the same
                  rejittered KL is evaluated from the Gauss-Jordan
                  inverse stack (trace/quad via Kmm_inv) plus a second
                  chol_inverse call on the jittered A_hat for its
                  logdet — same formula, no Cholesky on the hot path.

    Equivalent to
        posterior_params(gp, aux, aux, y, noise) +
        hensman_terms(gp, ..., mu_hat, A_hat)
    (tests/test_fused_gp.py pins outputs AND gradients to that path;
    with kl_impl="rejitter" the KL parity is exact even on
    rank-deficient kernels).
    """
    cfg = gp.config
    b, L = y.shape
    dtype = y.dtype
    scale = (cfg.N_train / b) if cfg.N_train else 1.0

    z = gp.inducing_points
    m = z.shape[0]
    Kmm = gp.kmat(z, z)                                   # (m, m)
    Knm = gp.kmat(aux, z, x_inducing=False)               # (b, m)
    Knn_diag = gp.kdiag(aux, aux, x_inducing=False,
                        y_inducing=False)                 # (b,)

    precision = linalg.reciprocal_no_nan(noise)           # (b, L)
    sigma_contrib, r = gp_stats(Knm, precision, precision * y)
    Sigma = Kmm[None] + scale * sigma_contrib             # (L, m, m)

    # jitter exactly as the unfused path: absolute on K_mm
    # (kernel_matrices), absolute + max-diag relative on Sigma
    # (_sigma_cholesky)
    sig_jitter = cfg.jitter
    if cfg.sigma_rel_jitter:
        diag_scale = jnp.max(jnp.diagonal(Sigma, axis1=-2, axis2=-1))
        sig_jitter = sig_jitter + cfg.sigma_rel_jitter * diag_scale
    M = jnp.concatenate([
        linalg.add_jitter(Kmm, cfg.jitter)[None],
        linalg.add_jitter(Sigma, sig_jitter)], axis=0)    # (L+1, m, m)

    if inverse_impl == "pallas":
        from svgpvae_tpu.ops.chol_inverse import chol_inverse
        Minv, logdets = chol_inverse(M)
        Kmm_inv, Sigma_inv = Minv[0], Minv[1:]
        logdet_K, logdet_S = logdets[0], logdets[1:]
        sir = jnp.einsum("lmp,lp->lm", Sigma_inv, r)            # (L, m)
        W_ny = Kmm_inv @ Knm.T                                  # (m, b)
        SigInv_Kmn = jnp.einsum("lmp,bp->lmb", Sigma_inv, Knm)  # (L, m, b)
        tr_SiK = jnp.sum(Sigma_inv * Kmm[None], axis=(-2, -1))  # (L,)
    else:
        chol = jnp.linalg.cholesky(M)
        Kmm_chol, Sigma_chol = chol[0], chol[1:]
        logdet_K = linalg.logdet_from_chol(Kmm_chol)
        logdet_S = linalg.logdet_from_chol(Sigma_chol)
        sir = linalg.cho_solve(Sigma_chol, r[..., None])[..., 0]
        W_ny = linalg.cho_solve(Kmm_chol, Knm.T)
        SigInv_Kmn = linalg.cho_solve(
            Sigma_chol, jnp.broadcast_to(Knm.T, (L,) + Knm.T.shape))
        E = linalg.cho_solve(                             # Sigma^{-1} Kmm
            Sigma_chol, jnp.broadcast_to(Kmm, Sigma.shape))
        tr_SiK = jnp.trace(E, axis1=-2, axis2=-1)

    # posterior at the batch points (== the Hensman mean vector / wAw)
    p_m = scale * jnp.einsum("bm,lm->bl", Knm, sir)       # (b, L)
    nystrom = jnp.sum(Knm * W_ny.T, axis=-1)              # (b,)
    sig_quad = jnp.einsum("bm,lmb->bl", Knm, SigInv_Kmn)  # (b, L)
    k_tilde = Knn_diag - nystrom                          # (b,)
    p_v = k_tilde[:, None] + sig_quad                     # (b, L)

    log2pi = jnp.asarray(linalg.LOG_2PI, dtype)
    sum_terms = -0.5 * (
        jnp.sum(precision * k_tilde[:, None], axis=0)
        + jnp.sum(precision * sig_quad, axis=0)
        + jnp.sum(jnp.log(noise), axis=0)
        + b * log2pi
        + jnp.sum(precision * (y - p_m) ** 2, axis=0)
    )                                                     # (L,)

    mu_hat = scale * jnp.einsum("mp,lp->lm", Kmm, sir)    # (L, m)

    if kl_impl == "rejitter" and inverse_impl == "pallas":
        # The same two-pass rejittered KL, evaluated from the
        # Gauss-Jordan inverse stack: A_hat = Kmm Sigma^{-1} Kmm via two
        # batched matmuls, its logdet through a SECOND chol_inverse call
        # on the jittered A_hat (only the logdet feeds the KL; the
        # custom VJP differentiates it through the returned inverse),
        # trace and quad directly via Kmm_inv.
        E = Sigma_inv @ jnp.broadcast_to(Kmm, Sigma.shape)  # (L, m, m)
        A_hat = Kmm[None] @ E
        _, logdet_A = chol_inverse(linalg.add_jitter(A_hat, cfg.jitter))
        tr_KiA = jnp.sum(Kmm_inv[None] * A_hat, axis=(-2, -1))
        quad_mu = jnp.einsum("lm,mp,lp->l", mu_hat, Kmm_inv, mu_hat)
        kl_terms = 0.5 * (logdet_K - logdet_A
                          - jnp.asarray(m, dtype) + tr_KiA + quad_mu)
    elif kl_impl == "rejitter":
        # KL exactly as the two-pass path computes it (gp/svgp.py
        # posterior_params + hensman_terms): materialize
        # A_hat = Kmm Sigma^{-1} Kmm from the already-available
        # E = Sigma^{-1} Kmm and refactorize with jitter
        A_hat = Kmm[None] @ E                             # (L, m, m)
        kl_terms = jax.vmap(
            lambda mu, S: linalg.mvn_kl_against_prior(
                mu, S, Kmm_chol, cfg.jitter))(mu_hat, A_hat)
    else:
        # KL( N(mu_hat, K Sigma^{-1} K) || N(0, K) ) via the logdet
        # identity
        quad = scale * scale * jnp.einsum("lm,mp,lp->l", sir, Kmm, sir)
        kl_terms = 0.5 * (tr_SiK + quad
                          - jnp.asarray(m, dtype)
                          - logdet_K + logdet_S)          # (L,)

    return p_m, p_v, sum_terms, kl_terms, mu_hat


@linalg.precise
def gp_block_titsias(gp, aux: Array, y: Array, noise: Array,
                     inverse_impl: str = "chol"):
    """Posterior params + Titsias L_T inside-ELBO terms in one pass.

    The two-pass path (posterior_params + titsias_terms, gp/svgp.py)
    assembles Kmm/Knm and factorizes Kmm twice, computes the q(u)
    moments mu_hat/A_hat that the Titsias bound never reads (one
    (L, m, m) solve + two matmuls wasted), solves W = Kmm^{-1} Kmn
    twice (posterior Nystrom + the Q gram), and — dominating everything
    at training shapes — factorizes the dense (L, b, b) covariance
    Q + diag(noise_l) of the collapsed bound (reference:
    mainSVGP.variational_loss Titsias branch, SVGPVAE_model.py:246-259),
    an O(L b^3) Cholesky.

    Here the bound is evaluated through the matrix determinant lemma /
    Woodbury instead: with D'_l = diag(noise_l + jitter) (the dense path
    jitters cov, safe_cholesky) and Q = Knm Kmm_j^{-1} Kmn,

        logdet(Q + D'_l) = sum_i log noise'_il
                           + logdet(Kmm_j + Kmn D'_l^{-1} Knm)
                           - logdet Kmm_j
        y^T (Q + D'_l)^{-1} y = y^T D'^{-1} y - r'^T Sigma1_l^{-1} r'
            with  Sigma1_l = Kmm_j + Kmn D'^{-1} Knm,
                  r'_l = Kmn (D'^{-1} y)

    so the whole bound closes over one extra batched (L, m, m)
    factorization — O(L (b m^2 + m^3)) total, never O(b^3) — appended to
    the same [Kmm_j; Sigma_1..L; Sigma1_1..L] stack as the posterior.
    Sigma1 gets the same absolute + max-diag-relative ridge policy as
    Sigma (_sigma_cholesky): an O(rel_jitter) perturbation of the bound,
    below f32 noise (the float64 parity test pins it to the dense form).
    This also removes the dense path's f32 failure surface: cond(cov) =
    lambda_max(Q + D)/min(noise) is unbounded as the encoder sharpens,
    while Sigma1's Cholesky is ridge-protected like Sigma's.

    inverse_impl="pallas" routes the factorizations through the Pallas
    inverse megakernel as TWO stacks ([Kmm_j; Sigma_1..L] and
    [Sigma1_1..L]) — the megakernel holds its whole augmented stack in
    VMEM, and the single (2L+1, m, m) stack overflows it at SPRITES
    scale (L=64, m=72) while each (L+1)-sized launch matches the
    Hensman block's proven footprint.

    aux: (b, D); y/noise: (b, L).  Returns (p_m (b, L), p_v (b, L),
    l2_terms (L,), kl_terms == zeros (L,), mu_hat (L, m)).  Equivalent
    to posterior_params + titsias_terms (tests/test_fused_gp.py).
    """
    cfg = gp.config
    b, L = y.shape
    dtype = y.dtype
    scale = (cfg.N_train / b) if cfg.N_train else 1.0

    z = gp.inducing_points
    Kmm = gp.kmat(z, z)                                   # (m, m)
    Knm = gp.kmat(aux, z, x_inducing=False)               # (b, m)
    Knn_diag = gp.kdiag(aux, aux, x_inducing=False,
                        y_inducing=False)                 # (b,)

    precision = linalg.reciprocal_no_nan(noise)           # (b, L)
    sigma_contrib, r = gp_stats(Knm, precision, precision * y)
    Sigma = Kmm[None] + scale * sigma_contrib             # (L, m, m)

    # bound-side sufficient statistics use the jittered noise (the dense
    # path's safe_cholesky(cov, jitter) == D' = diag(noise + jitter))
    noise_b = noise + cfg.jitter
    prec_b = linalg.reciprocal_no_nan(noise_b)            # (b, L)
    contrib_b, r_b = gp_stats(Knm, prec_b, prec_b * y)
    Kmm_j = linalg.add_jitter(Kmm, cfg.jitter)
    Sigma1 = Kmm_j[None] + contrib_b                      # (L, m, m)

    sig_jitter = cfg.jitter
    sig1_jitter = 0.0
    if cfg.sigma_rel_jitter:
        diag_scale = jnp.max(jnp.diagonal(Sigma, axis1=-2, axis2=-1))
        sig_jitter = sig_jitter + cfg.sigma_rel_jitter * diag_scale
        diag_scale1 = jnp.max(jnp.diagonal(Sigma1, axis1=-2, axis2=-1))
        sig1_jitter = cfg.sigma_rel_jitter * diag_scale1
    if inverse_impl == "pallas":
        # Two kernel launches instead of one (2L+1)-stack: the whole
        # augmented stack lives in VMEM (ops/chol_inverse.py), and at
        # SPRITES scale (L=64, m=72) the single 129-matrix stack
        # overflows it (measured: vmem OOM at compile, r5 wave 4) while
        # the Hensman-sized (L+1)=65 stack is the proven footprint.
        from svgpvae_tpu.ops.chol_inverse import chol_inverse
        Minv, logdets = chol_inverse(jnp.concatenate([
            Kmm_j[None],
            linalg.add_jitter(Sigma, sig_jitter)], axis=0))
        Sigma1_inv, logdet_S1 = chol_inverse(
            linalg.add_jitter(Sigma1, sig1_jitter))
        Kmm_inv, Sigma_inv = Minv[0], Minv[1:]
        logdet_K = logdets[0]
        sir = jnp.einsum("lmp,lp->lm", Sigma_inv, r)            # (L, m)
        W = Kmm_inv @ Knm.T                                     # (m, b)
        SigInv_Kmn = jnp.einsum("lmp,bp->lmb", Sigma_inv, Knm)  # (L, m, b)
        s1ir = jnp.einsum("lmp,lp->lm", Sigma1_inv, r_b)        # (L, m)
    else:
        M = jnp.concatenate([
            Kmm_j[None],
            linalg.add_jitter(Sigma, sig_jitter),
            linalg.add_jitter(Sigma1, sig1_jitter)], axis=0)  # (2L+1,m,m)
        chol = jnp.linalg.cholesky(M)
        Kmm_chol, Sigma_chol = chol[0], chol[1:L + 1]
        Sigma1_chol = chol[L + 1:]
        logdet_K = linalg.logdet_from_chol(Kmm_chol)
        logdet_S1 = linalg.logdet_from_chol(Sigma1_chol)
        sir = linalg.cho_solve(Sigma_chol, r[..., None])[..., 0]
        W = linalg.cho_solve(Kmm_chol, Knm.T)                   # (m, b)
        SigInv_Kmn = linalg.cho_solve(
            Sigma_chol, jnp.broadcast_to(Knm.T, (L,) + Knm.T.shape))
        s1ir = linalg.cho_solve(Sigma1_chol, r_b[..., None])[..., 0]

    # posterior at the batch points (shared with the Hensman block)
    p_m = scale * jnp.einsum("bm,lm->bl", Knm, sir)       # (b, L)
    nystrom = jnp.sum(Knm * W.T, axis=-1)                 # (b,) == diag(Q)
    sig_quad = jnp.einsum("bm,lmb->bl", Knm, SigInv_Kmn)  # (b, L)
    k_tilde = Knn_diag - nystrom                          # (b,)
    p_v = k_tilde[:, None] + sig_quad                     # (b, L)

    # Titsias collapsed bound via the determinant lemma (docstring)
    logdet = (jnp.sum(jnp.log(noise_b), axis=0)
              + logdet_S1 - logdet_K)                     # (L,)
    quad = (jnp.sum(prec_b * y * y, axis=0)
            - jnp.sum(r_b * s1ir, axis=-1))               # (L,)
    # floored Nystrom residual (see titsias_terms, PARITY #11): negative
    # f32 residuals are an unbounded false reward of the collapsed bound
    trace = jnp.sum(precision * jnp.maximum(k_tilde, 0.0)[:, None],
                    axis=0)                               # (L,)

    log2pi = jnp.asarray(linalg.LOG_2PI, dtype)
    l2_terms = -0.5 * (b * log2pi + logdet + quad + trace)

    mu_hat = scale * jnp.einsum("mp,lp->lm", Kmm, sir)    # (L, m)
    return p_m, p_v, l2_terms, jnp.zeros_like(l2_terms), mu_hat


@linalg.precise
def ball_gp_block_titsias(gp, times: Array, y: Array, noise: Array,
                          inverse_impl: str = "chol"):
    """Fused moving-ball Titsias block: posterior + L_T bound in one pass.

    The two-pass path (ball_posterior_params + ball_variational_loss
    Titsias branch, gp/svgp.py) assembles the per-channel kernel
    matrices twice, factorizes Kmm twice, computes the per-video
    q(u) moments mu_hat/A_hat (one (m, m) solve + matmuls per video per
    channel) that the collapsed bound never reads, and factorizes the
    dense (C*V, T, T) covariance Q + diag(noise_v) of the collapsed
    bound (reference Titsias branch: SVGPVAE_model.py:100-118).  Here:
    one assembly, one batched (C*(2V+1), m, m) factorization of
    [Kmm_c; Sigma_c1..cV; Sigma1_c1..cV], one W solve feeding diag(Q)
    and k_tilde — and the dense covariance never exists: the bound's
    logdet/quad close over the Sigma1 factorization via the matrix
    determinant lemma / Woodbury exactly as in `gp_block_titsias`
    (see its docstring for the identities; here D' = diag(noise_v +
    jitter) mirrors the dense path's safe_cholesky(cov, jitter)).

    times: (T,); y/noise: (V, T, C).  Returns (p_m (V, T, C),
    p_v (V, T, C), l2_terms (V, C), kl_terms == zeros (V, C),
    gp_cov_mean (T, T, C)).  Equivalence with the two-pass path is
    pinned by tests/test_fused_gp.py.
    """
    cfg = gp.config
    V, T, C = y.shape
    dtype = y.dtype
    m = gp.inducing_points.shape[-1]

    def channel_mats(ip, ls):
        k = lambda a, b: kernels.rbf_matrix(a[:, None], b[:, None], ls)
        return k(ip, ip), k(times, ip), k(times, times)

    Kmm, Knm, Knn = jax.vmap(channel_mats)(gp.inducing_points,
                                           gp.length_scale)
    # Kmm (C, m, m), Knm (C, T, m), Knn (C, T, T)

    yc = jnp.moveaxis(y, -1, 0)                           # (C, V, T)
    nc = jnp.moveaxis(noise, -1, 0)
    prec = linalg.reciprocal_no_nan(nc)

    Sigma = Kmm[:, None] + jnp.einsum("ctm,cvt,ctp->cvmp",
                                      Knm, prec, Knm)     # (C, V, m, m)
    r = jnp.einsum("ctm,cvt->cvm", Knm, prec * yc)        # (C, V, m)

    # bound-side statistics at the jittered noise (== the dense path's
    # safe_cholesky(cov, jitter))
    nc_b = nc + cfg.jitter
    prec_b = linalg.reciprocal_no_nan(nc_b)
    Kmm_j = linalg.add_jitter(Kmm, cfg.jitter)
    Sigma1 = Kmm_j[:, None] + jnp.einsum("ctm,cvt,ctp->cvmp",
                                         Knm, prec_b, Knm)  # (C, V, m, m)
    r_b = jnp.einsum("ctm,cvt->cvm", Knm, prec_b * yc)    # (C, V, m)

    M = jnp.concatenate([
        Kmm_j[:, None],
        linalg.add_jitter(Sigma, cfg.jitter),
        Sigma1], axis=1)                                  # (C, 2V+1, m, m)
    flat = M.reshape(C * (2 * V + 1), m, m)

    KnmT = jnp.swapaxes(Knm, -1, -2)                      # (C, m, T)
    if inverse_impl == "pallas":
        from svgpvae_tpu.ops.chol_inverse import chol_inverse
        Minv, lds = chol_inverse(flat)
        Minv = Minv.reshape(C, 2 * V + 1, m, m)
        lds = lds.reshape(C, 2 * V + 1)
        Kmm_inv, Sigma_inv = Minv[:, 0], Minv[:, 1:V + 1]
        Sigma1_inv = Minv[:, V + 1:]
        logdet_K, logdet_S1 = lds[:, 0], lds[:, V + 1:]
        sir = jnp.einsum("cvmp,cvp->cvm", Sigma_inv, r)
        W = Kmm_inv @ KnmT                                # (C, m, T)
        SigInv_Kmn = jnp.einsum("cvmp,ctp->cvmt", Sigma_inv, Knm)
        s1ir = jnp.einsum("cvmp,cvp->cvm", Sigma1_inv, r_b)
    else:
        chol = jnp.linalg.cholesky(flat).reshape(C, 2 * V + 1, m, m)
        Kmm_chol, Sigma_chol = chol[:, 0], chol[:, 1:V + 1]
        Sigma1_chol = chol[:, V + 1:]
        logdet_K = linalg.logdet_from_chol(Kmm_chol)      # (C,)
        logdet_S1 = linalg.logdet_from_chol(Sigma1_chol)  # (C, V)
        sir = linalg.cho_solve(Sigma_chol, r[..., None])[..., 0]
        W = linalg.cho_solve(Kmm_chol, KnmT)
        SigInv_Kmn = linalg.cho_solve(
            Sigma_chol, jnp.broadcast_to(KnmT[:, None], (C, V, m, T)))
        s1ir = linalg.cho_solve(Sigma1_chol, r_b[..., None])[..., 0]

    p_m = jnp.einsum("ctm,cvm->cvt", Knm, sir)            # (C, V, T)
    nystrom = jnp.einsum("ctm,cmt->ct", Knm, W)           # (C, T) == diag(Q)
    sig_quad = jnp.einsum("ctm,cvmt->cvt", Knm, SigInv_Kmn)
    k_tilde = 1.0 - nystrom  # RBF(amplitude=None) diag == 1
    p_v = k_tilde[:, None] + sig_quad                     # (C, V, T)

    # Titsias collapsed bound via the determinant lemma, batched over
    # channels AND videos — no (T, T) covariance is ever materialized
    logdet = (jnp.sum(jnp.log(nc_b), axis=-1)
              + logdet_S1 - logdet_K[:, None])            # (C, V)
    quad = (jnp.sum(prec_b * yc * yc, axis=-1)
            - jnp.sum(r_b * s1ir, axis=-1))               # (C, V)
    # floored Nystrom residual (see titsias_terms, PARITY #11)
    trace = jnp.einsum("cvt,ct->cv", prec,
                       jnp.maximum(k_tilde, 0.0))         # (C, V)

    log2pi = jnp.asarray(linalg.LOG_2PI, dtype)
    l2_terms = -0.5 * (T * log2pi + logdet + quad + trace)

    gp_cov_mean = (Knn
                   - jnp.einsum("ctm,cms->cts", Knm, W)
                   + jnp.einsum("ctm,cms->cts", Knm,
                                jnp.mean(SigInv_Kmn, axis=1)))

    return (jnp.moveaxis(p_m, 0, -1), jnp.moveaxis(p_v, 0, -1),
            l2_terms.T, jnp.zeros_like(l2_terms).T,
            jnp.moveaxis(gp_cov_mean, 0, -1))


@linalg.precise
def ball_gp_block(gp, times: Array, y: Array, noise: Array,
                  inverse_impl: str = "chol"):
    """Fused moving-ball GP block: posterior + inside-ELBO in one pass.

    Same dedup as `gp_block_hensman` applied to the per-video SVGP
    (reference: SVGP.approximate_posterior_params /
    SVGP.variational_loss, SVGPVAE_model.py:62-171): the posterior is
    evaluated AT the video's own time grid, so the loss's mean vector
    W^T mu_hat == Knm sir == p_m, w^T A_hat w == sig_quad, and the KL
    closes over the Sigma factorization (logdet A_hat = 2 logdet Kmm -
    logdet Sigma).  One batched factorization of the (C*(V+1), m, m)
    stack [Kmm_c; Sigma_c1..cV] replaces the unfused path's four
    Cholesky chains (Kmm, Sigma, A_hat, and the full-covariance solves).

    The per-video full posterior covariance B_v (T, T) is never consumed
    elementwise by training — only its diagonal (sampling/CE) and its
    batch mean (the gp_cov diagnostic, reference :689-690) are — and the
    mean commutes with the only video-dependent factor:
        mean_v B_v = Knn - Knm Kmm^{-1} Kmn + Knm (mean_v Sigma_v^{-1}) Kmn
    so the fused block materializes (C, T, T) once instead of
    (C, V, T, T).

    times: (T,); y/noise: (V, T, C).  Returns (p_m (V, T, C),
    p_v (V, T, C) posterior marginal variances, sum_terms (V, C),
    kl_terms (V, C), gp_cov_mean (T, T, C)) — `kl_terms` honors
    config.ball_kl_quirk (PARITY: the reference's A_hat-quadratic KL,
    SVGPVAE_model.py:134-137).  Equivalence with the two-pass path is
    pinned (values and gradients) by tests/test_fused_gp.py.
    """
    cfg = gp.config
    V, T, C = y.shape
    dtype = y.dtype
    m = gp.inducing_points.shape[-1]

    def channel_mats(ip, ls):
        k = lambda a, b: kernels.rbf_matrix(a[:, None], b[:, None], ls)
        return k(ip, ip), k(times, ip), k(times, times)

    Kmm, Knm, Knn = jax.vmap(channel_mats)(gp.inducing_points,
                                           gp.length_scale)
    # Kmm (C, m, m), Knm (C, T, m), Knn (C, T, T)

    yc = jnp.moveaxis(y, -1, 0)                           # (C, V, T)
    nc = jnp.moveaxis(noise, -1, 0)
    prec = linalg.reciprocal_no_nan(nc)

    Sigma = Kmm[:, None] + jnp.einsum("ctm,cvt,ctp->cvmp",
                                      Knm, prec, Knm)     # (C, V, m, m)
    r = jnp.einsum("ctm,cvt->cvm", Knm, prec * yc)        # (C, V, m)

    # jitter exactly as the unfused path: absolute cfg.jitter on both
    # (gp/svgp.py ball_posterior_params — no relative Sigma ridge here)
    M = jnp.concatenate([
        linalg.add_jitter(Kmm, cfg.jitter)[:, None],
        linalg.add_jitter(Sigma, cfg.jitter)], axis=1)    # (C, V+1, m, m)
    flat = M.reshape(C * (V + 1), m, m)

    KnmT = jnp.swapaxes(Knm, -1, -2)                      # (C, m, T)
    if inverse_impl == "pallas":
        from svgpvae_tpu.ops.chol_inverse import chol_inverse
        Minv, lds = chol_inverse(flat)
        Minv = Minv.reshape(C, V + 1, m, m)
        lds = lds.reshape(C, V + 1)
        Kmm_inv, Sigma_inv = Minv[:, 0], Minv[:, 1:]
        logdet_K, logdet_S = lds[:, 0], lds[:, 1:]
        sir = jnp.einsum("cvmp,cvp->cvm", Sigma_inv, r)
        W_ny = Kmm_inv @ KnmT                             # (C, m, T)
        SigInv_Kmn = jnp.einsum("cvmp,ctp->cvmt", Sigma_inv, Knm)
        E = jnp.einsum("cvmp,cpq->cvmq", Sigma_inv,
                       Kmm)                               # Sigma^{-1} Kmm
    else:
        chol = jnp.linalg.cholesky(flat).reshape(C, V + 1, m, m)
        Kmm_chol, Sigma_chol = chol[:, 0], chol[:, 1:]
        logdet_K = linalg.logdet_from_chol(Kmm_chol)      # (C,)
        logdet_S = linalg.logdet_from_chol(Sigma_chol)    # (C, V)
        sir = linalg.cho_solve(Sigma_chol, r[..., None])[..., 0]
        W_ny = linalg.cho_solve(Kmm_chol, KnmT)
        SigInv_Kmn = linalg.cho_solve(
            Sigma_chol, jnp.broadcast_to(KnmT[:, None], (C, V, m, T)))
        E = linalg.cho_solve(
            Sigma_chol, jnp.broadcast_to(Kmm[:, None], Sigma.shape))

    tr_SiK = jnp.trace(E, axis1=-2, axis2=-1)             # (C, V)

    p_m = jnp.einsum("ctm,cvm->cvt", Knm, sir)            # (C, V, T)
    nystrom = jnp.einsum("ctm,cmt->ct", Knm, W_ny)        # (C, T)
    sig_quad = jnp.einsum("ctm,cvmt->cvt", Knm, SigInv_Kmn)
    k_tilde = 1.0 - nystrom  # RBF(amplitude=None) diag == 1
    p_v = k_tilde[:, None] + sig_quad                     # (C, V, T)

    log2pi = jnp.asarray(linalg.LOG_2PI, dtype)
    sum_terms = -0.5 * (
        jnp.einsum("cvt,ct->cv", prec, k_tilde)
        + jnp.sum(prec * sig_quad, axis=-1)
        + jnp.sum(jnp.log(nc), axis=-1)
        + T * log2pi
        + jnp.sum(prec * (yc - p_m) ** 2, axis=-1))       # (C, V)

    # logdet A_hat = 2 logdet Kmm - logdet Sigma; logdet_K - logdet_A ==
    # logdet_S - logdet_K in both KL variants
    ld_gap = logdet_S - logdet_K[:, None]                 # (C, V)
    m_f = jnp.asarray(m, dtype)
    if cfg.ball_kl_quirk:
        # reference quirk (SVGPVAE_model.py:134-137): A_hat-quadratic
        # term sum(A ⊙ Kmm^{-1} A) = tr(Kmm E E) with E = Sigma^{-1} Kmm
        quirk_quad = jnp.einsum("cmp,cvpq,cvqm->cv", Kmm, E, E)
        kl_terms = 0.5 * (ld_gap - m_f + tr_SiK + quirk_quad)
    else:
        quad = jnp.einsum("cvm,cmp,cvp->cv", sir, Kmm, sir)
        kl_terms = 0.5 * (tr_SiK + quad - m_f + ld_gap)

    gp_cov_mean = (Knn
                   - jnp.einsum("ctm,cms->cts", Knm, W_ny)
                   + jnp.einsum("ctm,cms->cts", Knm,
                                jnp.mean(SigInv_Kmn, axis=1)))

    return (jnp.moveaxis(p_m, 0, -1), jnp.moveaxis(p_v, 0, -1),
            sum_terms.T, kl_terms.T, jnp.moveaxis(gp_cov_mean, 0, -1))
