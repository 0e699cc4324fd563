"""Moving-ball ELBO graphs: SVGPVAE (Hensman/Titsias) and the
Pearce-GPVAE / Neural-Process / VAE family.

Reference: build_SVGPVAE_elbo_graph (SVGPVAE_model.py:638-715) and
build_pearce_elbo_graphs (GPVAE_Pearce_model.py:89-236).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from svgpvae_tpu import linalg
from svgpvae_tpu.gp.exact import gp_regression_1d
from svgpvae_tpu.gp.fused import ball_gp_block, ball_gp_block_titsias
from svgpvae_tpu.gp.svgp import (BallSVGP, ball_posterior_params,
                                 ball_variational_loss)

# q-variance clip for the ball experiment (reference: SVGPVAE_model.py:671)
BALL_QVAR_CLIP = (1e-6, 1e3)
# posterior-variance clip before sampling (reference: SVGPVAE_model.py:701)
BALL_PVAR_CLIP = (1e-4, 1e3)


class BallOutputs(NamedTuple):
    elbo: Array            # (batch,)
    recon: Array           # (batch,) reconstruction term (log-lik, negative CE)
    prior_kl: Array        # (batch,) "KL" term of the chosen bound
    inside_elbo: Array     # (batch,) SVGP inside-ELBO (zeros for Pearce)
    ce_term: Array         # (batch,)
    p_m: Array             # (batch, T, 2) approximate posterior mean
    p_v: Array             # (batch, T, 2) approximate posterior variance
    qnet_mu: Array
    qnet_var: Array
    pred_vid: Array        # (batch, T, px, py) sigmoid probabilities
    inside_elbo_recon: Array
    inside_elbo_kl: Array
    gp_cov_elemwise_mean: Optional[Array]  # (T, T, 2) diagnostics or None


def full_cholesky_marginal_vars(qnet_var: Array) -> Array:
    """(b, T, 2T) stacked per-frame Cholesky rows -> (b, T, 2) marginal
    variances: diag(tril(L) tril(L)^T) per channel.

    The reference defines the full-Cholesky encoder head
    (VAE_utils.py:39-47) and the matching post-processing
    (post_process_full_cholesky, utils.py:248-259) but never consumes the
    head in an ELBO; the diagonal-noise GP bounds need marginal variances,
    so this is the in-graph (jnp, differentiable) counterpart of that
    post-processing.
    """
    b, t, two_t = qnet_var.shape
    tmax = two_t // 2
    tri = jnp.tril(jnp.ones((tmax, tmax), qnet_var.dtype))
    lx = qnet_var[:, :, :tmax] * tri
    ly = qnet_var[:, :, tmax:] * tri
    return jnp.stack([jnp.sum(lx * lx, axis=-1),
                      jnp.sum(ly * ly, axis=-1)], axis=2)


def _marginalize_qvar(qnet_var: Array) -> Array:
    """Pass (b, T, 2) diagonal variances through; reduce a full-Cholesky
    head's (b, T, 2T) output to its marginal variances."""
    if qnet_var.shape[-1] != 2:
        return full_cholesky_marginal_vars(qnet_var)
    return qnet_var


def _bernoulli_recon(vids: Array, logits: Array) -> Array:
    """Per-video sigmoid-CE reconstruction log-likelihood term (negative CE,
    summed over frames/pixels).  Reference: SVGPVAE_model.py:704-707."""
    ce = jnp.maximum(logits, 0) - logits * vids + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return -jnp.sum(ce, axis=(1, 2, 3))


def ball_svgpvae_elbo(encoder, enc_params, decoder, dec_params,
                      gp: BallSVGP, vids: Array, beta, key,
                      clip_qs: bool = False,
                      gp_block_impl: str = "reference",
                      titsias_reference_ce: bool = False,
                      entropy_ce: bool = False) -> BallOutputs:
    """SVGPVAE ELBO on ball videos (reference: build_SVGPVAE_elbo_graph,
    SVGPVAE_model.py:638-715).  Times run 1..T.

    gp_block_impl: "reference" (two-pass, mirroring the reference call
    structure) | "fused" (one-pass XLA, gp/fused.py ball_gp_block /
    ball_gp_block_titsias by config.titsias) | "fused_pallas" (fused
    with the Pallas inverse megakernel)."""
    assert gp_block_impl in ("reference", "fused", "fused_pallas"), \
        gp_block_impl  # "auto" must be resolved by the caller
    batch, tmax = vids.shape[0], vids.shape[1]
    times = jnp.arange(1, tmax + 1, dtype=vids.dtype)

    qnet_mu, qnet_var = encoder.apply(enc_params, vids)  # (b, T, 2)
    qnet_var = _marginalize_qvar(qnet_var)
    if clip_qs:
        qnet_var = jnp.clip(qnet_var, *BALL_QVAR_CLIP)

    use_fused = gp_block_impl != "reference"
    if use_fused:
        block = (ball_gp_block_titsias if gp.config.titsias
                 else ball_gp_block)
        p_m, p_v, sum_terms, kl_terms, gp_cov_mean = block(
            gp, times, qnet_mu, qnet_var,
            inverse_impl="pallas" if gp_block_impl == "fused_pallas"
            else "chol")
    else:
        p_m, p_cov, mu_hat, A_hat = ball_posterior_params(gp, times, qnet_mu,
                                                          qnet_var)
        sum_terms, kl_terms = ball_variational_loss(gp, times, qnet_mu,
                                                    qnet_var, mu_hat, A_hat)
        # (T, T, C) mean posterior covariance diagnostic (reference :689-690)
        gp_cov_mean = jnp.mean(p_cov, axis=0)
        p_v = jnp.diagonal(p_cov, axis1=1, axis2=2)  # (b, C, T) -> transpose
        p_v = jnp.moveaxis(p_v, -1, 1)  # (b, T, C)

    inside_elbo_recon = jnp.sum(sum_terms, axis=-1)  # (batch,)
    inside_elbo_kl = jnp.sum(kl_terms, axis=-1)
    inside_elbo = inside_elbo_recon - inside_elbo_kl

    if entropy_ce or (gp.config.titsias and not titsias_reference_ce):
        # exact sampling-distribution entropy H(p~) instead of the
        # reference's encoder cross-entropy — see forward_pass_svgpvae
        # and PARITY.md #13 (the collapsed bound has no data-fit term
        # canceling the cross-entropy's divergence reward)
        ce_term = jnp.sum(
            0.5 * (1.0 + linalg.LOG_2PI
                   + jnp.log(jnp.maximum(p_v, 1e-12))), axis=(1, 2))
    else:
        ce = linalg.gauss_cross_entropy(p_m, p_v, qnet_mu, qnet_var)
        ce_term = -jnp.sum(ce, axis=(1, 2))  # (batch,)

    eps = jax.random.normal(key, p_m.shape, dtype=p_m.dtype)
    latent = p_m + eps * linalg.stable_sqrt(jnp.clip(p_v, *BALL_PVAR_CLIP))

    logits = decoder.apply(dec_params, latent)
    pred_vid = jax.nn.sigmoid(logits)
    recon = _bernoulli_recon(vids, logits)

    prior_kl = ce_term + inside_elbo
    elbo = recon + beta * prior_kl

    return BallOutputs(elbo=elbo, recon=recon, prior_kl=prior_kl,
                       inside_elbo=inside_elbo, ce_term=ce_term,
                       p_m=p_m, p_v=p_v, qnet_mu=qnet_mu, qnet_var=qnet_var,
                       pred_vid=pred_vid,
                       inside_elbo_recon=inside_elbo_recon,
                       inside_elbo_kl=inside_elbo_kl,
                       gp_cov_elemwise_mean=gp_cov_mean)


def pearce_elbo(encoder, enc_params, decoder, dec_params, vids: Array,
                beta, key, length_scale, elbo_type: str = "GPVAE_Pearce",
                context_ratio: float = 0.5,
                context_length_scale=None,
                entropy_ce: bool = False) -> BallOutputs:
    """Pearce-GPVAE / NP / VAE ELBO on ball videos (reference:
    build_pearce_elbo_graphs, GPVAE_Pearce_model.py:89-236).

    elbo_type: 'GPVAE_Pearce' | 'VAE' | 'NP'.  For 'VAE' callers pass a tiny
    length scale so the GP prior reduces to iid standard normals (reference:
    BALL_experiment.py:46-49).  For 'NP' a random context/target split is
    drawn per call; the split size follows the reference's truncated normal
    around context_ratio * T, and masking keeps shapes static.

    `length_scale` may be a scalar, or a pair (lx, ly) of per-channel
    scales — trainable under --GP_joint, matching the reference's
    per-channel l_GP variables (GPVAE_Pearce_model.py:36-42, one created
    per build_1d_gp call).  The NP context GPs always use the STATIC
    `context_length_scale` (default: length_scale when untrained) — the
    reference builds them with the constant lt even under GP_joint
    (GPVAE_Pearce_model.py:162-163).

    `entropy_ce` replaces the encoder cross-entropy with the exact
    sampling-distribution entropy term (PARITY.md #13's experiment knob,
    as in ball_svgpvae_elbo / forward_pass_svgpvae).
    """
    batch, tmax = vids.shape[0], vids.shape[1]
    dtype = vids.dtype
    times = jnp.arange(0, tmax, dtype=dtype)
    batch_t = jnp.tile(times[None], (batch, 1))

    if isinstance(length_scale, (tuple, list)):
        ls_x, ls_y = length_scale
    else:
        ls_x = ls_y = length_scale
    ctx_ls = (context_length_scale if context_length_scale is not None
              else length_scale)

    qnet_mu, qnet_var = encoder.apply(enc_params, vids)  # (b, T, 2)
    qnet_var = _marginalize_qvar(qnet_var)

    # full-data posterior + marginal likelihood per channel
    post_x = gp_regression_1d(batch_t, qnet_mu[:, :, 0], qnet_var[:, :, 0],
                              batch_t, ls_x)
    post_y = gp_regression_1d(batch_t, qnet_mu[:, :, 1], qnet_var[:, :, 1],
                              batch_t, ls_y)
    p_m = jnp.stack([post_x.mean, post_y.mean], axis=2)
    p_v = jnp.stack([post_x.var, post_y.var], axis=2)
    full_lhood = post_x.log_marginal + post_y.log_marginal

    if entropy_ce:
        # exact H(p~) in the -E[log q~] slot (see ball_svgpvae_elbo)
        ce = -0.5 * (1.0 + linalg.LOG_2PI
                     + jnp.log(jnp.maximum(p_v, 1e-12)))
    else:
        ce = linalg.gauss_cross_entropy(p_m, p_v, qnet_mu, qnet_var)
    ce_bt = jnp.sum(ce, axis=2)  # (batch, T)

    eps = jax.random.normal(key, p_m.shape, dtype=p_m.dtype)
    latent = p_m + eps * linalg.stable_sqrt(jnp.maximum(p_v, 0.0))
    logits = decoder.apply(dec_params, latent)
    pred_vid = jax.nn.sigmoid(logits)
    ce_recon = jnp.maximum(logits, 0) - logits * vids + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    recon_bt = -jnp.sum(ce_recon, axis=(2, 3))  # (batch, T)

    if elbo_type == "NP":
        key_n, key_perm = jax.random.split(jax.random.fold_in(key, 1))
        mean_c = context_ratio * tmax
        std_c = jnp.sqrt(context_ratio * (1 - context_ratio) * tmax)
        n_ctx = jnp.clip(jnp.round(
            mean_c + std_c * jax.random.normal(key_n, (), dtype=dtype)),
            2, tmax - 2).astype(jnp.int32)

        # per-video random permutation; first n_ctx indices form the context
        perm = jax.vmap(lambda k: jax.random.permutation(k, tmax))(
            jax.random.split(key_perm, batch))  # (b, T)
        is_target = (jnp.arange(tmax)[None, :] >= n_ctx)  # mask in perm order

        # context likelihood: exact GPs on the context subset.  Keep static
        # shapes by sorting context first and masking the rest with huge
        # noise (equivalent to dropping those observations).
        ctx_mask = ~is_target  # (b, T) in perm order
        t_perm = jnp.take_along_axis(batch_t, perm, axis=1)
        mu_perm = jnp.take_along_axis(qnet_mu[:, :, 0], perm, axis=1)
        mv_perm = jnp.take_along_axis(qnet_var[:, :, 0], perm, axis=1)
        mu_perm_y = jnp.take_along_axis(qnet_mu[:, :, 1], perm, axis=1)
        mv_perm_y = jnp.take_along_axis(qnet_var[:, :, 1], perm, axis=1)
        big = jnp.asarray(1e10, dtype)
        ctx_var_x = jnp.where(ctx_mask, mv_perm, big)
        ctx_var_y = jnp.where(ctx_mask, mv_perm_y, big)
        ctx_x = gp_regression_1d(t_perm, mu_perm, ctx_var_x, batch_t,
                                 ctx_ls)
        ctx_y = gp_regression_1d(t_perm, mu_perm_y, ctx_var_y, batch_t,
                                 ctx_ls)
        # masked points contribute -0.5*log(2 pi * big) each; remove that
        # constant so the context lhood matches an exact subset computation.
        n_masked = jnp.sum(is_target, axis=1).astype(dtype)
        pad = -0.5 * n_masked * (jnp.log(big) + linalg.LOG_2PI)
        con_lhood = ctx_x.log_marginal + ctx_y.log_marginal - 2 * pad

        tgt_gather = jnp.take_along_axis(ce_bt, perm, axis=1)
        np_ce = jnp.sum(jnp.where(is_target, tgt_gather, 0.0), axis=1)
        rec_gather = jnp.take_along_axis(recon_bt, perm, axis=1)
        elbo_recon = jnp.sum(jnp.where(is_target, rec_gather, 0.0), axis=1)
        prior_kl = full_lhood - np_ce - con_lhood
    else:
        prior_kl = full_lhood - jnp.sum(ce_bt, axis=1)
        elbo_recon = jnp.sum(recon_bt, axis=1)

    elbo = elbo_recon + beta * prior_kl
    zeros = jnp.zeros_like(elbo)
    return BallOutputs(elbo=elbo, recon=elbo_recon, prior_kl=prior_kl,
                       inside_elbo=zeros, ce_term=jnp.sum(ce_bt, axis=1),
                       p_m=p_m, p_v=p_v, qnet_mu=qnet_mu, qnet_var=qnet_var,
                       pred_vid=pred_vid, inside_elbo_recon=zeros,
                       inside_elbo_kl=zeros, gp_cov_elemwise_mean=None)
