"""Sparse variational GP core — channel-batched, Cholesky-based, TPU-first.

Re-implements the math of the reference's GP classes
(`SVGP`, `mainSVGP`, `mnistSVGP`, `spritesSVGP` — SVGPVAE_model.py:17-635)
as pure functions over pytree parameter structs:

  * parameters live in `flax.struct` dataclasses (`BallSVGP`, `MnistSVGP`,
    `SpritesSVGP`) so they compose with jit/grad/vmap/pjit; "fixed vs joint"
    training is handled by optimizer masks, not by constant-vs-variable
    graph nodes;
  * all L latent channels are processed at once with batched einsums /
    Cholesky factorizations instead of the reference's Python loop over
    channels (SVGPVAE_model.py:868-879);
  * `K_mm` and its Cholesky factor are computed ONCE per step and shared
    between the posterior and the inside-ELBO (the reference recomputes both
    per channel per call — 32x redundant, see SURVEY.md §3.1);
  * every PSD system is solved with jittered Cholesky + `cho_solve` instead
    of `tf.linalg.inv` (same math, float32-robust on TPU).

Shapes use:  b = minibatch, m = #inducing points, L = #latent channels,
x = #test points, N = full-train size.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from svgpvae_tpu import kernels, linalg
from svgpvae_tpu.ops.gp_stats import gp_stats


# ---------------------------------------------------------------------------
# configuration (static)
# ---------------------------------------------------------------------------


@struct.dataclass
class SVGPConfig:
    """Static GP configuration, hashable so it can be a jit constant."""

    titsias: bool = struct.field(pytree_node=False, default=False)
    jitter: float = struct.field(pytree_node=False, default=1e-6)
    # N_train > 0 enables the minibatch bias correction (N/b) of the
    # batch-level SVGP (reference: SVGPVAE_model.py:328-334).  The ball
    # variant treats each video as a full dataset -> N_train = 0.
    N_train: int = struct.field(pytree_node=False, default=0)
    K_obj_normalize: bool = struct.field(pytree_node=False, default=False)
    # Relative jitter for the Sigma_l factorization, scaled by Sigma's mean
    # diagonal.  With the (N/b) bias correction and clipped encoder
    # precisions, Sigma's magnitude reaches ~1e7-1e8 at SPRITES scale and a
    # fixed absolute jitter becomes meaningless in float32: the Cholesky
    # goes NaN where the reference's `tf.linalg.inv` + posterior-variance
    # clipping returned finite garbage (its documented negative-variance
    # issue, SVGPVAE_model.py:1175-1177).  Set to 0.0 for exact-parity
    # studies against absolute-jitter formulas.
    # Sized from the f32 assembly noise floor: Sigma's roundoff is
    # ~eps*lambda_max (measured: lambda_min -5e-3 vs lambda_max 1.8e7 on a
    # late-training 14-row eval tail — pure roundoff landing negative), so
    # the ridge must clear eps*m*max_diag; 1e-5 * max-diag gives ~10x
    # margin at m=32 while perturbing well-scaled small problems by <=1e-5
    # relative (below every quality metric's resolution).
    sigma_rel_jitter: float = struct.field(pytree_node=False, default=1e-5)
    # Reproduce the reference ball-SVGP KL quirk (SVGPVAE_model.py:134-137)
    # which uses sum(A_hat * K_mm^{-1} A_hat) in place of the correct
    # mu_hat^T K_mm^{-1} mu_hat quadratic term.  Off by default (correct
    # math); on for bit-parity studies.  See SURVEY.md §7 "hard parts".
    ball_kl_quirk: bool = struct.field(pytree_node=False, default=False)


# ---------------------------------------------------------------------------
# parameter structs + kernels on auxiliary data
# ---------------------------------------------------------------------------


@struct.dataclass
class BallSVGP:
    """Per-latent-channel sparse GP over 1-D time (reference: SVGP,
    SVGPVAE_model.py:17-171).  Parameters are stacked over the C latent
    channels (C=2 for the moving-ball data) so the whole model is one pytree.
    """

    config: SVGPConfig
    inducing_points: Array  # (C, m)
    length_scale: Array  # (C,)

    def kmat(self, x: Array, y: Array) -> Array:
        """x: (n,), y: (p,) -> (n, p) for ONE channel (vmap over C outside)."""
        return kernels.rbf_matrix(x[:, None], y[:, None], self.length_scale)

    def kdiag(self, x: Array, y: Array) -> Array:
        return kernels.rbf_diag(x[:, None], y[:, None], self.length_scale)


@struct.dataclass
class MnistSVGP:
    """Rotated-MNIST batch-level SVGP (reference: mnistSVGP,
    SVGPVAE_model.py:381-484).

    Product kernel = ExpSinSquared(period 2*pi) over the angle column x
    Linear over the M-dim object vector; object vectors are either carried in
    the aux data (columns 2:) or gathered from the trainable GPLVM table by
    the integer id column (column 0).
    """

    config: SVGPConfig
    inducing_points: Array  # (m, 2 + M): [id, angle, obj...]
    length_scale: Array  # scalar
    amplitude: Array  # scalar
    object_vectors: Optional[Array] = None  # (n_objects, M) GPLVM table

    def _features(self, aux: Array, inducing: bool) -> Tuple[Array, Array]:
        view = aux[:, 1:2]
        if self.object_vectors is None or inducing:
            obj = aux[:, 2:]
        else:
            obj = jnp.take(self.object_vectors,
                           aux[:, 0].astype(jnp.int32), axis=0)
        return view, obj

    def kmat(self, x: Array, y: Array, x_inducing: bool = True,
             y_inducing: bool = True) -> Array:
        xv, xo = self._features(x, x_inducing)
        yv, yo = self._features(y, y_inducing)
        k_view = kernels.exp_sin_squared_matrix(
            xv, yv, self.amplitude, self.length_scale, 2.0 * jnp.pi)
        k_obj = kernels.linear_matrix(xo, yo)
        if self.config.K_obj_normalize:
            k_obj = kernels.cosine_normalize_matrix(k_obj, xo, yo)
        return k_view * k_obj

    def kdiag(self, x: Array, y: Array, x_inducing: bool = True,
              y_inducing: bool = True) -> Array:
        xv, xo = self._features(x, x_inducing)
        yv, yo = self._features(y, y_inducing)
        k_view = kernels.exp_sin_squared_diag(
            xv, yv, self.amplitude, self.length_scale, 2.0 * jnp.pi)
        k_obj = kernels.linear_diag(xo, yo)
        if self.config.K_obj_normalize:
            k_obj = kernels.cosine_normalize_diag(k_obj, xo, yo)
        return k_view * k_obj


@struct.dataclass
class SpritesSVGP:
    """SPRITES batch-level SVGP (reference: spritesSVGP,
    SVGPVAE_model.py:487-635).

    Aux data rows are [action_id, character_repr...]; inducing rows are
    [action_vec (L_action), character_vec (L_character)].  Kernel = product
    of two Linear kernels (optionally cosine-normalized) or, with
    `use_se_kernel`, two RBF kernels with trainable scales.
    """

    config: SVGPConfig
    inducing_points: Array  # (m, L_action + L_character)
    gplvm_action: Array  # (n_actions, L_action) GPLVM table
    # SE-kernel hyperparameters; unused (but present for pytree stability)
    # when use_se_kernel is False.
    l_action: Array = struct.field(default_factory=lambda: jnp.asarray(1.0))
    sigma_action: Array = struct.field(default_factory=lambda: jnp.asarray(0.1))
    l_character: Array = struct.field(default_factory=lambda: jnp.asarray(1.0))
    sigma_character: Array = struct.field(
        default_factory=lambda: jnp.asarray(0.1))
    L_action: int = struct.field(pytree_node=False, default=6)
    use_se_kernel: bool = struct.field(pytree_node=False, default=False)

    def _features(self, aux: Array, inducing: bool) -> Tuple[Array, Array]:
        if inducing:
            return aux[:, :self.L_action], aux[:, self.L_action:]
        action = jnp.take(self.gplvm_action,
                          aux[:, 0].astype(jnp.int32), axis=0)
        return action, aux[:, 1:]

    def kmat(self, x: Array, y: Array, x_inducing: bool = True,
             y_inducing: bool = True) -> Array:
        xa, xc = self._features(x, x_inducing)
        ya, yc = self._features(y, y_inducing)
        if self.use_se_kernel:
            k_a = kernels.rbf_matrix(xa, ya, self.l_action, self.sigma_action)
            k_c = kernels.rbf_matrix(xc, yc, self.l_character,
                                     self.sigma_character)
        else:
            k_a = kernels.linear_matrix(xa, ya)
            k_c = kernels.linear_matrix(xc, yc)
            if self.config.K_obj_normalize:
                k_a = kernels.cosine_normalize_matrix(k_a, xa, ya)
                k_c = kernels.cosine_normalize_matrix(k_c, xc, yc)
        return k_a * k_c

    def kdiag(self, x: Array, y: Array, x_inducing: bool = True,
              y_inducing: bool = True) -> Array:
        xa, xc = self._features(x, x_inducing)
        ya, yc = self._features(y, y_inducing)
        if self.use_se_kernel:
            k_a = kernels.rbf_diag(xa, ya, self.l_action, self.sigma_action)
            k_c = kernels.rbf_diag(xc, yc, self.l_character,
                                   self.sigma_character)
        else:
            k_a = kernels.linear_diag(xa, ya)
            k_c = kernels.linear_diag(xc, yc)
            if self.config.K_obj_normalize:
                k_a = kernels.cosine_normalize_diag(k_a, xa, ya)
                k_c = kernels.cosine_normalize_diag(k_c, xc, yc)
        return k_a * k_c


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def init_ball_svgp(num_inducing: int, tmin: float, tmax: float,
                   length_scale_init: float, n_channels: int = 2,
                   config: SVGPConfig = SVGPConfig(),
                   dtype=jnp.float32) -> BallSVGP:
    """Linspace inducing grid per channel (reference: SVGPVAE_model.py:44-51)."""
    ip = jnp.linspace(tmin, tmax, num_inducing, dtype=dtype)
    return BallSVGP(
        config=config,
        inducing_points=jnp.tile(ip[None, :], (n_channels, 1)),
        length_scale=jnp.full((n_channels,), length_scale_init, dtype=dtype),
    )


def init_mnist_svgp(initial_inducing_points, object_vectors_init=None,
                    config: SVGPConfig = SVGPConfig(), dtype=jnp.float32
                    ) -> MnistSVGP:
    return MnistSVGP(
        config=config,
        inducing_points=jnp.asarray(initial_inducing_points, dtype=dtype),
        length_scale=jnp.asarray(1.0, dtype=dtype),
        amplitude=jnp.asarray(1.0, dtype=dtype),
        object_vectors=None if object_vectors_init is None
        else jnp.asarray(object_vectors_init, dtype=dtype),
    )


def init_sprites_svgp(initial_inducing_points, initial_gplvm_action,
                      L_action: int, use_se_kernel: bool = False,
                      config: SVGPConfig = SVGPConfig(), dtype=jnp.float32
                      ) -> SpritesSVGP:
    return SpritesSVGP(
        config=config,
        inducing_points=jnp.asarray(initial_inducing_points, dtype=dtype),
        gplvm_action=jnp.asarray(initial_gplvm_action, dtype=dtype),
        l_action=jnp.asarray(1.0, dtype=dtype),
        sigma_action=jnp.asarray(0.1, dtype=dtype),
        l_character=jnp.asarray(1.0, dtype=dtype),
        sigma_character=jnp.asarray(0.1, dtype=dtype),
        L_action=L_action,
        use_se_kernel=use_se_kernel,
    )


# ---------------------------------------------------------------------------
# shared batch-level math (mnist / sprites variants)
# ---------------------------------------------------------------------------


@linalg.precise
def kernel_matrices(gp, aux: Array):
    """Compute the per-step kernel bundle once, shared across L channels.

    Returns (Kmm, Kmm_chol, Knm, Knn_diag).
    """
    z = gp.inducing_points
    Kmm = gp.kmat(z, z)
    Kmm_chol = linalg.safe_cholesky(Kmm, gp.config.jitter)
    Knm = gp.kmat(aux, z, x_inducing=False)
    Knn_diag = gp.kdiag(aux, aux, x_inducing=False, y_inducing=False)
    return Kmm, Kmm_chol, Knm, Knn_diag



def _sigma_cholesky(Sigma, cfg):
    """Cholesky of Sigma with absolute + relative (mean-diagonal-scaled)
    jitter; see SVGPConfig.sigma_rel_jitter."""
    jitter = cfg.jitter
    if cfg.sigma_rel_jitter:
        # max (not mean) diagonal: the f32 assembly's roundoff scales with
        # lambda_max, and rank-deficient minibatch contributions (a tail
        # batch with b << m at scale N/b) make the diagonal very uneven
        diag_scale = jnp.max(jnp.diagonal(Sigma, axis1=-2, axis2=-1))
        jitter = jitter + cfg.sigma_rel_jitter * diag_scale
    return linalg.safe_cholesky(Sigma, jitter)


def _sigma_l(Kmm: Array, Knm: Array, precision: Array, scale) -> Array:
    """Sigma_l = K_mm + scale * K_mn diag(prec_l) K_nm for all L channels.

    precision: (b, L).  Returns (L, m, m) via one batched MXU contraction.
    Reference: SVGPVAE_model.py:328-330.
    """
    # (L, b, m) = precision^T[:, :, None] * Knm[None]
    scaled = precision.T[:, :, None] * Knm[None, :, :]
    sig = jnp.einsum("nm,lnp->lmp", Knm, scaled)
    return Kmm[None] + scale * sig


@linalg.precise
def posterior_params(gp, aux_test: Array, aux_train: Array, y: Array,
                     noise: Array):
    """Parameters of the approximate GP posterior q_S for ALL channels.

    Reference: mainSVGP.approximate_posterior_params
    (SVGPVAE_model.py:303-343), vectorized over the L latent channels.

    aux_test: (x, D) index points to evaluate the posterior at,
    aux_train: (b, D) minibatch index points, y/noise: (b, L) encoder
    means/variances.

    Returns:
      p_m   (x, L)    posterior mean
      p_v   (x, L)    posterior variance (diagonal)
      mu_hat (L, m)   implied q(u) mean
      A_hat (L, m, m) implied q(u) covariance
    """
    cfg = gp.config
    b = y.shape[0]
    scale = (cfg.N_train / b) if cfg.N_train else 1.0

    z = gp.inducing_points
    Kmm = gp.kmat(z, z)
    Kmm_chol = linalg.safe_cholesky(Kmm, cfg.jitter)
    Knm = gp.kmat(aux_train, z, x_inducing=False)  # (b, m)
    Kxm = gp.kmat(aux_test, z, x_inducing=False)  # (x, m)
    Kxx_diag = gp.kdiag(aux_test, aux_test, x_inducing=False,
                        y_inducing=False)  # (x,)

    precision = linalg.reciprocal_no_nan(noise)  # (b, L)
    # fused sufficient statistics: Sigma contribution (L, m, m) and
    # r_l = K_mn (prec_l * y_l) (L, m) — Pallas-fused on TPU at scale
    sigma_contrib, r = gp_stats(Knm, precision, precision * y)
    Sigma = Kmm[None] + scale * sigma_contrib
    Sigma_chol = _sigma_cholesky(Sigma, cfg)  # (L, m, m)
    sir = linalg.cho_solve(Sigma_chol, r[..., None])[..., 0]  # (L, m)

    p_m = scale * jnp.einsum("xm,lm->xl", Kxm, sir)  # (x, L)

    # Nystrom correction term: diag(K_xm K_mm^{-1} K_mx), shared over channels
    KmmInv_Kmx = linalg.cho_solve(Kmm_chol, Kxm.T)  # (m, x)
    nystrom = jnp.sum(Kxm * KmmInv_Kmx.T, axis=-1)  # (x,)
    # diag(K_xm Sigma_l^{-1} K_mx) per channel
    Kmx_b = jnp.broadcast_to(Kxm.T, (Sigma.shape[0],) + Kxm.T.shape)
    SigInv_Kmx = linalg.cho_solve(Sigma_chol, Kmx_b)  # (L, m, x)
    sig_quad = jnp.einsum("xm,lmx->xl", Kxm, SigInv_Kmx)  # (x, L)
    p_v = (Kxx_diag - nystrom)[:, None] + sig_quad  # (x, L)

    mu_hat = scale * (Kmm @ sir[..., None])[..., 0]  # (L, m)
    A_hat = Kmm[None] @ linalg.cho_solve(Sigma_chol,
                                         jnp.broadcast_to(Kmm, Sigma.shape))
    return p_m, p_v, mu_hat, A_hat


@linalg.precise
def hensman_terms(gp, Kmm_chol: Array, Knm: Array, Knn_diag: Array,
                  y: Array, noise: Array, mu_hat: Array, A_hat: Array):
    """Hensman L_H inside-ELBO pieces for all channels at once.

    Reference: mainSVGP.variational_loss, Hensman branch
    (SVGPVAE_model.py:261-301).  Returns (sum_terms (L,), kl_terms (L,)).
    """
    cfg = gp.config
    b = y.shape[0]
    dtype = y.dtype

    W = linalg.cho_solve(Kmm_chol, Knm.T)  # (m, b) = K_mm^{-1} K_mn
    precision = linalg.reciprocal_no_nan(noise)  # (b, L)

    # mean_vector_l = K_nm K_mm^{-1} mu_hat_l
    mean_vec = jnp.einsum("mb,lm->bl", W, mu_hat)  # (b, L)

    # K_tilde diag, shared across channels before precision scaling
    k_tilde = Knn_diag - jnp.sum(Knm * W.T, axis=-1)  # (b,)

    # trace terms: prec_il * w_i^T A_hat_l w_i
    wAw = jnp.einsum("mb,lmp,pb->bl", W, A_hat, W)  # (b, L)

    log2pi = jnp.asarray(linalg.LOG_2PI, dtype)
    sum_terms = -0.5 * (
        jnp.sum(precision * k_tilde[:, None], axis=0)
        + jnp.sum(precision * wAw, axis=0)
        + jnp.sum(jnp.log(noise), axis=0)
        + b * log2pi
        + jnp.sum(precision * (y - mean_vec) ** 2, axis=0)
    )  # (L,)

    kl_fn = jax.vmap(
        lambda mu, S: linalg.mvn_kl_against_prior(mu, S, Kmm_chol, cfg.jitter))
    kl_terms = kl_fn(mu_hat, A_hat)  # (L,)
    return sum_terms, kl_terms


@linalg.precise
def titsias_terms(gp, Kmm_chol: Array, Knm: Array, Knn_diag: Array,
                  y: Array, noise: Array):
    """Titsias L_T inside-ELBO for all channels.

    Reference: mainSVGP.variational_loss, Titsias branch
    (SVGPVAE_model.py:246-259).  Returns (l2_terms (L,), zero KL (L,)).
    """
    cfg = gp.config
    b = y.shape[0]
    dtype = y.dtype

    W = linalg.cho_solve(Kmm_chol, Knm.T)  # (m, b)
    Q = Knm @ W  # (b, b) Nystrom gram, shared across channels
    precision = linalg.reciprocal_no_nan(noise)

    cov = Q[None] + jax.vmap(jnp.diag)(noise.T)  # (L, b, b)
    cov_chol = linalg.safe_cholesky(cov, cfg.jitter)
    logdet = linalg.logdet_from_chol(cov_chol)  # (L,)
    alpha = linalg.cho_solve(cov_chol, y.T[..., None])[..., 0]  # (L, b)
    quad = jnp.sum(y.T * alpha, axis=-1)  # (L,)

    # Nystrom residual floored at its mathematical bound 0: in f32 a
    # near-singular Kmm makes diag(Q) overshoot Knn_diag, and with the
    # encoder variances at their clip floor the resulting NEGATIVE trace
    # rewards driving the kernel singular — an unbounded false ascent
    # direction of the collapsed bound (no q(u) KL opposes it; measured:
    # ELBO -> +1.5e16 by epoch 100, tools/debug_titsias.py, PARITY #11).
    trace = jnp.sum(
        precision * jnp.maximum(Knn_diag - jnp.diagonal(Q), 0.0)[:, None],
        axis=0)

    log2pi = jnp.asarray(linalg.LOG_2PI, dtype)
    l2 = -0.5 * (b * log2pi + logdet + quad + trace)
    return l2, jnp.zeros_like(l2)


def variational_loss(gp, aux: Array, y: Array, noise: Array,
                     mu_hat: Array, A_hat: Array):
    """Channel-summed inside-ELBO terms; dispatches on config.titsias.

    Returns (sum_term_per_channel (L,), kl_per_channel (L,)).
    """
    _, Kmm_chol, Knm, Knn_diag = kernel_matrices(gp, aux)
    if gp.config.titsias:
        return titsias_terms(gp, Kmm_chol, Knm, Knn_diag, y, noise)
    return hensman_terms(gp, Kmm_chol, Knm, Knn_diag, y, noise, mu_hat, A_hat)


def approximate_posterior_params(gp, aux_test, aux_train, y, noise):
    """Reference-signature alias of `posterior_params`
    (SVGPVAE_model.py:303-343)."""
    return posterior_params(gp, aux_test, aux_train, y, noise)


def mean_vector_bias_analysis(gp, aux: Array, y: Array, noise: Array) -> Array:
    """Minibatch estimator of the q(u) mean vector, for the bias analysis of
    the paper's C.4 (reference: SVGPVAE_model.py:345-370).  Returns (L, m)."""
    _, _, mu_hat, _ = posterior_params(gp, aux, aux, y, noise)
    return mu_hat


# ---------------------------------------------------------------------------
# test-time pipelines (precompute over full train set, fast predict)
# ---------------------------------------------------------------------------


def _fused_precompute_stats(gp, aux_train, precision, py):
    """Dispatch to the fully-fused Pallas kernel (ops.fused_kernel_stats)
    when the GP family supports it and the backend/size make it worthwhile.
    Returns None to fall back to the gp_stats path."""
    import jax as _jax
    n = aux_train.shape[0]
    m = gp.inducing_points.shape[0]
    if _jax.default_backend() != "tpu" or n < 4096 or m < 64:
        return None
    from svgpvae_tpu.ops.fused_kernel_stats import fused_kernel_stats

    if isinstance(gp, MnistSVGP):
        view, obj = gp._features(aux_train, inducing=False)
        ip_view = gp.inducing_points[:, 1:2]
        ip_obj = gp.inducing_points[:, 2:]
        return fused_kernel_stats(
            view, obj, ip_view, ip_obj, precision, py, amp=gp.amplitude,
            length_scale=gp.length_scale, family="mnist",
            normalize=gp.config.K_obj_normalize)
    if isinstance(gp, SpritesSVGP) and not gp.use_se_kernel:
        act, chr_ = gp._features(aux_train, inducing=False)
        ip_act = gp.inducing_points[:, :gp.L_action]
        ip_chr = gp.inducing_points[:, gp.L_action:]
        return fused_kernel_stats(
            act, chr_, ip_act, ip_chr, precision, py, family="sprites",
            normalize=gp.config.K_obj_normalize)
    return None


@linalg.precise
def precompute_test_posterior_terms(gp, means: Array, variances: Array,
                                    aux_train: Array):
    """Full-train-set posterior precomputation (reference:
    precompute_GP_params_SVGPVAE, SVGPVAE_model.py:989-1023).

    means/variances: (N, L) encoder outputs over the ENTIRE train set.
    Returns (mean_terms (L, m), Sigma_inv (L, m, m), Kmm_inv (m, m)).

    Memory-aware like the reference's row-scaled multiply (no N x N
    diagonal); the N-sized contraction is a single batched matmul that can be
    sharded over devices along N (see svgpvae_tpu.parallel).
    """
    cfg = gp.config
    z = gp.inducing_points
    Kmm = gp.kmat(z, z)

    precision = linalg.reciprocal_no_nan(variances)  # (N, L)
    # fused over the FULL train set — NO N/b scaling here.  On TPU at scale
    # the fully-fused Pallas path also constructs K_nm in-kernel (this is
    # test-time precompute: no gradients flow here).
    fused = _fused_precompute_stats(gp, aux_train, precision,
                                    precision * means)
    if fused is not None:
        sigma_contrib, r = fused
    else:
        Knm = gp.kmat(aux_train, z, x_inducing=False)  # (N, m)
        sigma_contrib, r = gp_stats(Knm, precision, precision * means)
    Sigma = Kmm[None] + sigma_contrib  # (L, m, m)
    Sigma_chol = _sigma_cholesky(Sigma, cfg)
    eye = jnp.broadcast_to(jnp.eye(Kmm.shape[0], dtype=Kmm.dtype), Sigma.shape)
    Sigma_inv = linalg.cho_solve(Sigma_chol, eye)  # (L, m, m)
    mean_terms = linalg.cho_solve(Sigma_chol, r[..., None])[..., 0]  # (L, m)

    Kmm_inv = linalg.psd_inverse(Kmm, cfg.jitter)
    return mean_terms, Sigma_inv, Kmm_inv


@linalg.precise
def posterior_from_precomputed(gp, aux_target: Array, mean_terms: Array,
                               Sigma_inv: Array, Kmm_inv: Array):
    """Fast GP predictive posterior from precomputed terms (reference:
    approximate_posterior_params_precomputed_GP_posterior_params,
    SVGPVAE_model.py:610-635).  Returns (p_m (x, L), p_v (x, L))."""
    z = gp.inducing_points
    Kbm = gp.kmat(aux_target, z, x_inducing=False)  # (x, m)
    Kbb_diag = gp.kdiag(aux_target, aux_target, x_inducing=False,
                        y_inducing=False)  # (x,)

    p_m = jnp.einsum("xm,lm->xl", Kbm, mean_terms)
    nystrom = jnp.sum(Kbm * (Kbm @ Kmm_inv), axis=-1)  # (x,)
    sig_quad = jnp.einsum("xm,lmp,xp->xl", Kbm, Sigma_inv, Kbm)  # (x, L)
    p_v = (Kbb_diag - nystrom)[:, None] + sig_quad
    return p_m, p_v


# ---------------------------------------------------------------------------
# ball variant: per-video GPs over time, full posterior covariance
# ---------------------------------------------------------------------------


@linalg.precise
def ball_posterior_params(gp: BallSVGP, times: Array, y: Array, noise: Array):
    """Posterior for the moving-ball SVGP (reference:
    SVGP.approximate_posterior_params, SVGPVAE_model.py:141-171).

    times: (T,) shared index grid; y/noise: (batch, T, C).
    Returns p_m (batch, T, C), p_v full covariance (batch, T, T, C),
    mu_hat (batch, m, C), A_hat (batch, m, m, C).  No minibatch bias
    correction — each video is a complete dataset.
    """
    cfg = gp.config

    def one_channel(ip, length_scale, y_c, noise_c):
        k = lambda a, bb: kernels.rbf_matrix(a[:, None], bb[:, None],
                                             length_scale)
        Kmm = k(ip, ip)
        Kmm_chol = linalg.safe_cholesky(Kmm, cfg.jitter)
        Knn = k(times, times)
        Knm = k(times, ip)  # (T, m)

        def one_video(y_v, noise_v):
            prec = linalg.reciprocal_no_nan(noise_v)  # (T,)
            Sigma = Kmm + Knm.T @ (prec[:, None] * Knm)
            Sigma_chol = linalg.safe_cholesky(Sigma, cfg.jitter)
            r = Knm.T @ (prec * y_v)  # (m,)
            sir = linalg.cho_solve(Sigma_chol, r[:, None])[:, 0]
            SigInv_Kmn = linalg.cho_solve(Sigma_chol, Knm.T)  # (m, T)
            KmmInv_Kmn = linalg.cho_solve(Kmm_chol, Knm.T)  # (m, T)
            p_m = Knm @ sir  # (T,)
            B = Knn - Knm @ KmmInv_Kmn + Knm @ SigInv_Kmn  # (T, T)
            mu_hat = Kmm @ sir
            A_hat = Kmm @ linalg.cho_solve(Sigma_chol, Kmm)
            return p_m, B, mu_hat, A_hat

        return jax.vmap(one_video)(y_c, noise_c)

    # vmap channels (leading axis of params / trailing axis of y)
    p_m, B, mu_hat, A_hat = jax.vmap(one_channel, in_axes=(0, 0, 2, 2),
                                     out_axes=-1)(
        gp.inducing_points, gp.length_scale, y, noise)
    return p_m, B, mu_hat, A_hat


@linalg.precise
def ball_variational_loss(gp: BallSVGP, times: Array, y: Array, noise: Array,
                          mu_hat: Array, A_hat: Array):
    """Inside-ELBO for the ball SVGP (reference: SVGP.variational_loss,
    SVGPVAE_model.py:62-139), per video and channel.

    y/noise: (batch, T, C); mu_hat: (batch, m, C); A_hat: (batch, m, m, C).
    Returns (sum_terms (batch, C), kl_terms (batch, C) or zeros for Titsias).
    """
    cfg = gp.config

    def one_channel(ip, length_scale, y_c, noise_c, mu_c, A_c):
        k = lambda a, bb: kernels.rbf_matrix(a[:, None], bb[:, None],
                                             length_scale)
        Kmm = k(ip, ip)
        m = ip.shape[0]
        Kmm_chol = linalg.safe_cholesky(Kmm, cfg.jitter)
        Knm = k(times, ip)  # (T, m)
        Knn_diag = jnp.ones_like(times)  # RBF(amplitude=None) diag == 1
        W = linalg.cho_solve(Kmm_chol, Knm.T)  # (m, T)
        k_tilde = Knn_diag - jnp.sum(Knm * W.T, axis=-1)  # (T,)
        T = times.shape[0]
        log2pi = jnp.asarray(linalg.LOG_2PI, y_c.dtype)

        if cfg.titsias:
            Q = Knm @ W  # (T, T)

            def one_video(y_v, noise_v):
                prec = linalg.reciprocal_no_nan(noise_v)
                cov = Q + jnp.diag(noise_v)
                cov_chol = linalg.safe_cholesky(cov, cfg.jitter)
                logdet = linalg.logdet_from_chol(cov_chol)
                alpha = linalg.cho_solve(cov_chol, y_v[:, None])[:, 0]
                quad = jnp.sum(y_v * alpha)
                # floor at the mathematical bound 0 (see titsias_terms /
                # PARITY #11): negative f32 Nystrom residuals are an
                # unbounded false reward of the collapsed bound
                trace = jnp.sum(prec * jnp.maximum(k_tilde, 0.0))
                l2 = -0.5 * (T * log2pi + logdet + quad + trace)
                return l2, jnp.zeros_like(l2)

            return jax.vmap(one_video)(y_c, noise_c)

        def one_video(y_v, noise_v, mu_v, A_v):
            prec = linalg.reciprocal_no_nan(noise_v)
            mean_vec = W.T @ mu_v  # (T,)
            wAw = jnp.einsum("mt,mp,pt->t", W, A_v, W)
            sum_term = -0.5 * (
                jnp.sum(prec * k_tilde) + jnp.sum(prec * wAw)
                + jnp.sum(jnp.log(noise_v)) + T * log2pi
                + jnp.sum(prec * (y_v - mean_vec) ** 2))
            if cfg.ball_kl_quirk:
                # reference quirk: A_hat-based quadratic term
                # (SVGPVAE_model.py:134-137)
                S_chol = linalg.safe_cholesky(A_v, cfg.jitter)
                kl = 0.5 * (
                    linalg.logdet_from_chol(Kmm_chol)
                    - linalg.logdet_from_chol(S_chol)
                    - m
                    + jnp.trace(linalg.cho_solve(Kmm_chol, A_v))
                    + jnp.sum(A_v * linalg.cho_solve(Kmm_chol, A_v)))
            else:
                kl = linalg.mvn_kl_against_prior(mu_v, A_v, Kmm_chol,
                                                 cfg.jitter)
            return sum_term, kl

        return jax.vmap(one_video)(y_c, noise_c, mu_c, A_c)

    sum_terms, kls = jax.vmap(one_channel, in_axes=(0, 0, 2, 2, 2, 3),
                              out_axes=-1)(
        gp.inducing_points, gp.length_scale, y, noise, mu_hat, A_hat)
    return sum_terms, kls
