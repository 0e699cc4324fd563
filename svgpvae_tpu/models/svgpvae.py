"""SVGPVAE forward/eval passes (rotated MNIST and SPRITES).

Re-designs the reference's graph builders (SVGPVAE_model.py:823-1195) as
pure functions: encoder -> channel-batched GP posterior + inside-ELBO ->
cross-entropy term -> reparameterized sample -> decoder -> objective.
The per-latent-channel Python loop of the reference (:868-879) is replaced
by the batched GP layer (svgpvae_tpu.gp), and GECO state is threaded
explicitly instead of via feed_dict placeholders.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from svgpvae_tpu import gp as gpm
from svgpvae_tpu import linalg

# q-network variance clip range (reference: SVGPVAE_model.py:858-859)
QVAR_CLIP = (1e-3, 10.0)
# GP posterior variance clip for SPRITES (reference: SVGPVAE_model.py:891-892)
PVAR_CLIP = (1e-4, 100.0)


# Measured dispatch for --gp_block_impl 'auto':
# (workload, bound, backend) -> (impl, one-line evidence).  Full history
# in RESULTS.md + PARITY.md #10/#12/#13; a test enumerates every cell
# (tests/test_models.py::test_resolve_gp_block_impl_table).
GP_BLOCK_AUTO_TABLE = {
    # --- Hensman / plain inside-ELBO -----------------------------------
    ("mnist", "hensman", "tpu"): ("fused_pallas",
        "1.99x north-star step; 2000-ep cgen in seed band (r3)"),
    ("mnist", "hensman", "other"): ("reference",
        "fused 0.81x on CPU; two-pass is the parity anchor"),
    ("ball", "hensman", "tpu"): ("fused_pallas",
        "2.56x ball step; 25k-step trajectory MSE matched (r3)"),
    ("ball", "hensman", "other"): ("reference",
        "same CPU read as mnist"),
    # SPRITES: the identity-KL impls (fused / fused_pallas) stay OFF this
    # workload on every backend — the product-of-linear kernel is rank-
    # deficient at m=72 and the closed-form KL identity diverges from the
    # two-pass rejittered KL by ~3.6 RELATIVE in exact f64 (full-scale
    # runs plateau at cgen 0.0204 vs 0.0164; r3).  fused_rejitter_pallas
    # keeps the one-pass dedup but computes the exact two-pass rejittered
    # KL from the Pallas inverse stack, so it is null-space-safe.
    ("sprites", "hensman", "tpu"): ("fused_rejitter_pallas",
        "1.15-1.25x step (8.2-8.8 vs 9.6-10.0 ms p50); converged 360-ep "
        "cgen in-band on 2 seeds: 0.01482 s0 (r4 w9) / 0.01461 s1 (r5 "
        "w12); 30-ep gates 0.01645/0.01644"),
    ("sprites", "hensman", "other"): ("reference",
        "two-pass parity anchor; fused variants slower on CPU"),
    # --- Titsias bound: fused determinant-lemma form everywhere --------
    # (the dense two-pass bound's f32 Kmm solve makes cov indefinite at
    # O(1) scale once anything drives the spectrum hard — measured
    # lambda_min(cov) = -22, tools/debug_titsias.py; the Woodbury bound
    # has no dense matrix to NaN, and is 3.5-5.7x faster scan-timed)
    ("mnist", "titsias", "tpu"): ("fused_pallas",
        "5.7x vs dense scan-timed; 1000-ep quality matched (r3)"),
    ("mnist", "titsias", "other"): ("fused",
        "Woodbury w/ Cholesky solves; dense bound is f32-fragile"),
    ("ball", "titsias", "tpu"): ("fused_pallas",
        "3.01x ball step, MSE matched (r3 wave 11)"),
    ("ball", "titsias", "other"): ("fused",
        "same read as mnist"),
    # sprites+Titsias: Cholesky Woodbury — the dense bound NaNs from the
    # rank-deficient spectrum (runaway from step 0, r3 wave 13), and the
    # Pallas explicit inverse corrupts p_m to ~1.7e-2 there (r3).
    ("sprites", "titsias", "tpu"): ("fused",
        "full-scale gate clean at cgen 0.01626 where dense NaNs (r3); "
        "r5 blocked-GJ recheck: pallas only reaches block-level parity "
        "(1.58 vs 1.62 ms fwd+bwd) - no speed case to flip"),
    ("sprites", "titsias", "other"): ("fused",
        "same spectrum argument on every backend"),
}


def resolve_gp_block_impl(impl: str, workload: str = "mnist",
                          titsias: bool = False,
                          data_parallel: bool = False) -> str:
    """Resolve --gp_block_impl 'auto' via the measured dispatch table
    GP_BLOCK_AUTO_TABLE (workload x bound x backend); explicit impls pass
    through untouched.  Evidence one-liners live on each table cell.

    `data_parallel=True` downgrades an auto-resolved Pallas variant to
    its pure-XLA sibling (fused_pallas -> fused, fused_rejitter_pallas
    -> fused_rejitter): GSPMD partitioning of the Mosaic custom call
    under a sharded batch is not certifiable in this environment (the
    CPU-mesh equivalence tests resolve to XLA impls, and only one real
    chip is available), while the XLA siblings are ordinary HLO the SPMD
    partitioner handles like the rest of the step.  An EXPLICIT Pallas
    flag is still honored — the user asked for it."""
    if impl != "auto":
        return impl
    import jax
    backend = "tpu" if jax.default_backend() == "tpu" else "other"
    bound = "titsias" if titsias else "hensman"
    resolved = GP_BLOCK_AUTO_TABLE[(workload, bound, backend)][0]
    if data_parallel and resolved.endswith("_pallas"):
        # fused_pallas -> fused; fused_rejitter_pallas -> fused_rejitter
        resolved = resolved[:-len("_pallas")]
    return resolved


class SVGPVAEOutputs(NamedTuple):
    elbo: Array            # training objective (GECO: minimized; else maximized)
    recon_loss: Array      # per-pixel MSE sum (plain) / GECO constraint sum
    kl_term: Array
    inside_elbo: Array
    ce_term: Array
    p_m: Array
    p_v: Array
    qnet_mu: Array
    qnet_var: Array
    recon_images: Array
    inside_elbo_recon: Array
    inside_elbo_kl: Array
    latent_samples: Array
    C_ma: Array
    lagrange_mult: Array
    mean_vectors: Array    # bias-analysis minibatch estimators (L, m) or 0


def sprites_aux_data(repr_apply, repr_params, images: Array,
                     action_ids: Array, frames_per_char: int) -> Array:
    """Build SPRITES auxiliary data: repr net -> per-character mean ->
    broadcast back to frames -> prepend action id column.

    Reference: aux_data_SVGPVAE_sprites (SVGPVAE_model.py:1086-1115), which
    uses tf.segment_mean + tf.repeat with host-built index arrays.  Batches
    here have a static layout of `frames_per_char` consecutive frames per
    character, so the segment mean is a reshape-mean-broadcast — no gather
    needed, fully fusible by XLA.
    """
    emb = repr_apply(repr_params, images)  # (b, L_char)
    b, d = emb.shape
    n_char = b // frames_per_char
    char_mean = emb.reshape(n_char, frames_per_char, d).mean(axis=1)
    char_vecs = jnp.repeat(char_mean, frames_per_char, axis=0)  # (b, d)
    return jnp.concatenate(
        [action_ids.astype(emb.dtype)[:, None], char_vecs], axis=1)


def forward_pass_svgpvae(
        vae, vae_params, gp_params, batch, key,
        beta, C_ma, lagrange_mult, alpha, kappa,
        clip_qs: bool = True, geco: bool = False,
        repr_apply=None, repr_params=None, frames_per_char: int = 0,
        bias_analysis: bool = False,
        lagrange_max: float = 1e5,
        gp_block_impl: str = "reference",
        titsias_reference_ce: bool = False,
        entropy_ce: bool = False) -> SVGPVAEOutputs:
    """Training forward pass (reference: forward_pass_SVGPVAE,
    SVGPVAE_model.py:823-936).

    batch = (images, aux_data); images (b, H, W, C); aux_data (b, D) for
    MNIST or (b,) action ids for SPRITES (repr net builds the rest).
    `gp_params` is a MnistSVGP / SpritesSVGP pytree.

    GECO (constrained optimization, reference :908-915):
      recon = sum_b( mean_px_sq_err - kappa^2 )
      C_ma' = alpha * C_ma + (1 - alpha) * recon / b
      objective = -KL + lambda * (recon/b + stop_grad(C_ma' - recon/b))
      lambda' = min(lambda * exp(C_ma'), lagrange_max)
    The first-step alpha=0 special case is handled by the train loop
    (svgpvae_tpu.train) by passing alpha=0 at step 0.

    `lagrange_max` caps the multiplicative lambda update: the reference
    runs this path in float64, where lambda can compound to ~e^150 while
    the constraint is unmet; in float32 that overflows (and its square
    overflows Adam's second moment much earlier).  Past the cap the
    objective is reconstruction-dominated — exactly GECO's intended regime
    while the constraint is violated — and lambda decays below the cap
    again once MSE < kappa^2.  Set lagrange_max=inf under float64 for
    bit-parity with the reference.
    """
    assert gp_block_impl in ("reference", "fused", "fused_pallas",
                             "fused_rejitter", "fused_rejitter_pallas"), \
        gp_block_impl  # "auto" must be resolved by the caller
    images, aux_data = batch
    b = images.shape[0]
    K = images.shape[1] * images.shape[2] * images.shape[3]
    dtype = images.dtype

    qnet_mu, qnet_var = vae.apply(vae_params, images, method=vae.encode)
    L = qnet_mu.shape[1]

    # GP linear algebra needs >= float32 even when the conv nets compute in
    # bfloat16 (mixed precision); images.dtype is the loss dtype
    qnet_mu = qnet_mu.astype(dtype)
    qnet_var = qnet_var.astype(dtype)

    if clip_qs:
        qnet_var = jnp.clip(qnet_var, *QVAR_CLIP)

    is_sprites = repr_apply is not None
    if is_sprites:
        # the repr net may compute in bfloat16 (--bf16); the GP kernel
        # matrices built from this aux data need >= float32
        aux_data = sprites_aux_data(repr_apply, repr_params, images,
                                    aux_data, frames_per_char).astype(dtype)

    # GP posterior + inside-ELBO, all channels at once.  gp_block_impl:
    #   "reference"      two-pass path mirroring the reference call structure
    #   "fused"          one-pass XLA block (shared factorizations, closed-
    #                    form KL; gp/fused.py) — same math, fewer kernels
    #   "fused_pallas"   fused block with the Pallas inverse megakernel
    #   "fused_rejitter" fused block with the two-pass A_hat-rejittered KL
    #                    (null-space-safe on rank-deficient kernels, e.g.
    #                    SPRITES product-linear at m=72; PARITY.md #10)
    #   "fused_rejitter_pallas"  the rejittered KL evaluated from the
    #                    Pallas inverse megakernel stack (a second
    #                    chol_inverse call supplies logdet A_hat)
    # Titsias configs route to gp_block_titsias (no q(u) KL; the rejitter
    # distinction does not arise there).
    use_fused = gp_block_impl != "reference" and not bias_analysis
    if use_fused and gp_params.config.titsias:
        p_m, p_v, sum_terms, kl_terms, _ = gpm.gp_block_titsias(
            gp_params, aux_data, qnet_mu, qnet_var,
            inverse_impl="pallas" if gp_block_impl in
            ("fused_pallas", "fused_rejitter_pallas") else "chol")
    elif use_fused:
        p_m, p_v, sum_terms, kl_terms, _ = gpm.gp_block_hensman(
            gp_params, aux_data, qnet_mu, qnet_var,
            inverse_impl="pallas" if gp_block_impl in
            ("fused_pallas", "fused_rejitter_pallas") else "chol",
            kl_impl="rejitter" if gp_block_impl in
            ("fused_rejitter", "fused_rejitter_pallas") else "identity")
    else:
        p_m, p_v, mu_hat, A_hat = gpm.posterior_params(
            gp_params, aux_data, aux_data, qnet_mu, qnet_var)
        sum_terms, kl_terms = gpm.variational_loss(
            gp_params, aux_data, qnet_mu, qnet_var, mu_hat, A_hat)

    inside_elbo_recon = jnp.sum(sum_terms)
    inside_elbo_kl = jnp.sum(kl_terms)
    if gp_params.config.titsias:
        inside_elbo = inside_elbo_recon - inside_elbo_kl
    else:
        n_total = gp_params.config.N_train or b
        inside_elbo = inside_elbo_recon - (b / n_total) * inside_elbo_kl

    if is_sprites:  # numerical-stability clip (reference :891-892)
        p_v = jnp.clip(p_v, *PVAR_CLIP)
    else:
        # f32 guard: the posterior-variance cancellation Kxx - nystrom +
        # sig_quad can dip slightly negative in float32 (the reference's
        # float64 hides this; it clips the SPRITES path for the same
        # reason, :1175-1177), which would NaN the log in the CE term
        p_v = jnp.maximum(p_v, 1e-6)

    use_entropy_ce = entropy_ce or (gp_params.config.titsias
                                    and not titsias_reference_ce)
    if use_entropy_ce:
        # Exact entropy of the sampling distribution N(p_m, p_v):
        # ce := E_{p~}[log p~(z)] = sum -0.5 (1 + log 2 pi p_v), so
        # -ce + inside_elbo = inside_elbo + H(p~) — the ELBO's true
        # -E[log q~] term.  The reference instead uses the cross-entropy
        # against the ENCODER Gaussian (E_{p~}[log N(z; qnet_mu,
        # qnet_var)], SVGPVAE_model.py:897-899) — exact only when the
        # encoder equals the GP posterior, and otherwise a REWARD for
        # their divergence.  With the Hensman bound the inside-ELBO's
        # data-fit term cancels that spurious channel at the identical
        # 1/(2 qv) weight (tests/test_fused_gp.py
        # test_titsias_objective_runaway_channel), so the reference form
        # stays the Hensman default; with the collapsed Titsias bound
        # nothing cancels it and training measurably diverges (encoder
        # means -> 1e8, ELBO -> +1e14, in float32 AND float64 —
        # RESULTS.md round 3, PARITY.md #13).
        ce_term = jnp.sum(-0.5 * (1.0 + linalg.LOG_2PI + jnp.log(p_v)))
    else:
        ce_term = jnp.sum(linalg.gauss_cross_entropy(p_m, p_v,
                                                     qnet_mu, qnet_var))
    kl_term = -ce_term + inside_elbo

    eps = jax.random.normal(key, p_m.shape, dtype=p_m.dtype)
    latent_samples = p_m + eps * linalg.stable_sqrt(p_v)

    recon_images = vae.apply(vae_params, latent_samples, method=vae.decode)

    sq_err = (images - recon_images.astype(dtype)) ** 2
    if geco:
        per_image_mse = jnp.mean(sq_err, axis=(1, 2, 3))
        recon_loss = jnp.sum(per_image_mse - kappa * kappa)
        C_ma_new = alpha * C_ma + (1.0 - alpha) * recon_loss / b
        elbo = -kl_term + lagrange_mult * (
            recon_loss / b + jax.lax.stop_gradient(C_ma_new - recon_loss / b))
        lagrange_new = jnp.minimum(lagrange_mult * jnp.exp(C_ma_new),
                                   lagrange_max)
    else:
        recon_loss = jnp.sum(sq_err) / K
        elbo = -recon_loss + (beta / L) * kl_term
        C_ma_new = C_ma
        lagrange_new = lagrange_mult

    if bias_analysis:
        # bias_analysis forces the two-pass branch above, whose
        # posterior_params call has the identical arguments as
        # mean_vector_bias_analysis (gp/svgp.py:454-458) — reuse its
        # mu_hat instead of re-running the full (L, m, m) solve.
        mean_vectors = mu_hat
    else:
        mean_vectors = jnp.zeros((), dtype=dtype)

    # reported recon loss is always the per-pixel MSE sum (reference :909,
    # :918-924 report recon/K; under GECO it reports the constraint sum)
    return SVGPVAEOutputs(
        elbo=elbo, recon_loss=recon_loss,
        kl_term=kl_term, inside_elbo=inside_elbo, ce_term=ce_term,
        p_m=p_m, p_v=p_v, qnet_mu=qnet_mu, qnet_var=qnet_var,
        recon_images=recon_images, inside_elbo_recon=inside_elbo_recon,
        inside_elbo_kl=inside_elbo_kl, latent_samples=latent_samples,
        C_ma=C_ma_new, lagrange_mult=lagrange_new,
        mean_vectors=mean_vectors)


def batching_encode_svgpvae(vae, vae_params, images: Array,
                            clip_qs: bool = True):
    """Encode a batch to (means, vars) for the test pipelines (reference:
    batching_encode_SVGPVAE / _full, SVGPVAE_model.py:939-986)."""
    qnet_mu, qnet_var = vae.apply(vae_params, images, method=vae.encode)
    if clip_qs:
        qnet_var = jnp.clip(qnet_var, *QVAR_CLIP)
    # encodings condition GP posteriors downstream; keep them >= float32
    # even when the encoder computes in bfloat16 (--bf16)
    dt = jnp.promote_types(qnet_mu.dtype, jnp.float32)
    return qnet_mu.astype(dt), qnet_var.astype(dt)


def predict_cgen_mnist(vae, vae_params, gp_params, test_batch,
                       train_means: Array, train_vars: Array,
                       aux_data_train: Array, key) -> tuple:
    """Conditional generation for rotated MNIST: GP posterior at test aux
    data conditioned on ALL train encodings, sample, decode, per-pixel MSE.

    Reference: bacthing_predict_SVGPVAE_rotated_mnist
    (SVGPVAE_model.py:1026-1083).
    """
    images_test, aux_test = test_batch
    K = images_test.shape[1] * images_test.shape[2]

    p_m, p_v, _, _ = gpm.posterior_params(
        gp_params, aux_test, aux_data_train, train_means, train_vars)

    eps = jax.random.normal(key, p_m.shape, dtype=p_m.dtype)
    latent_samples = p_m + eps * linalg.stable_sqrt(p_v)

    recon = vae.apply(vae_params, latent_samples, method=vae.decode)
    recon_loss = jnp.sum((images_test - recon) ** 2) / K
    return recon, recon_loss


def precompute_gp_params(gp_params, means: Array, variances: Array,
                         aux_data: Array):
    """Full-train-set GP posterior precompute for the SPRITES test pipeline
    (reference: precompute_GP_params_SVGPVAE, SVGPVAE_model.py:989-1023)."""
    return gpm.precompute_test_posterior_terms(gp_params, means, variances,
                                               aux_data)


def predict_cgen_sprites(vae, vae_params, gp_params, repr_apply, repr_params,
                         images: Array, action_ids: Array,
                         mean_terms: Array, Sigma_inv: Array, Kmm_inv: Array,
                         n_context: int, n_actions_total: int,
                         key, context_perm: Optional[Array] = None):
    """Conditional generation for unseen SPRITES characters.

    Reference: predict_SVGPVAE_sprites_test_character
    (SVGPVAE_model.py:1118-1195).  The batch holds `batch/72` characters x
    72 frames; the first `n_context` frames of each character's 72-frame
    block form the context (the reference's `context_full_actions=True`
    default sorts context indices, which with its frame layout is exactly
    this prefix split).  Pass `context_perm` (a per-character permutation of
    range(72)) to reproduce the random-context variant.

    Returns (recon_target_images, target_images, recon_loss_sum_per_pixel).
    """
    b = images.shape[0]
    fpc = 72  # frames per character in the test_character layout
    n_char = b // fpc
    K = images.shape[1] * images.shape[2] * images.shape[3]

    im = images.reshape(n_char, fpc, *images.shape[1:])
    aid = action_ids.reshape(n_char, fpc)
    if context_perm is not None:
        im = jnp.take_along_axis(
            im, context_perm[..., None, None, None], axis=1)
        aid = jnp.take_along_axis(aid, context_perm, axis=1)

    ctx_images = im[:, :n_context].reshape(n_char * n_context,
                                           *images.shape[1:])
    tgt_images = im[:, n_context:].reshape(n_char * (fpc - n_context),
                                           *images.shape[1:])
    tgt_ids = aid[:, n_context:].reshape(-1)

    # context frames -> per-character repr vectors -> target aux data
    emb = repr_apply(repr_params, ctx_images)  # (n_char * n_context, d)
    char_mean = emb.reshape(n_char, n_context, -1).mean(axis=1)
    char_vecs = jnp.repeat(char_mean, fpc - n_context, axis=0)
    aux_target = jnp.concatenate(
        [tgt_ids.astype(emb.dtype)[:, None], char_vecs],
        axis=1).astype(images.dtype)  # GP math >= float32 under --bf16

    p_m, p_v = gpm.posterior_from_precomputed(
        gp_params, aux_target, mean_terms, Sigma_inv, Kmm_inv)
    # negative posterior variances occur on SPRITES (reference :1175-1177)
    p_v = jnp.clip(p_v, *PVAR_CLIP)

    eps = jax.random.normal(key, p_m.shape, dtype=p_m.dtype)
    latent_samples = p_m + eps * linalg.stable_sqrt(p_v)

    recon = vae.apply(vae_params, latent_samples, method=vae.decode)
    recon_loss = jnp.sum((tgt_images - recon) ** 2) / K
    return recon, tgt_images, recon_loss
