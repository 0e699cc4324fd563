"""Neural-network modules (flax.linen), mirroring the reference
architectures exactly (layer sizes, strides, paddings, elu activations,
exp-log-variance splits) while staying dtype-configurable so the same
modules run float32/bfloat16 on TPU and float64 in CPU verification mode.

Reference architecture sources:
  * ball MLP encoder/decoder        VAE_utils.py:9-96
  * mnistVAE conv encoder/decoder   VAE_utils.py:99-162
  * mnistCVAE                       VAE_utils.py:165-258
  * spritesVAE                      VAE_utils.py:275-360
  * sprites representation network  VAE_utils.py:363-391
  * SVIGP decoder                   VAE_utils.py:394-431
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import Array, lax


def safe_exp(x, cap: float = 15.0):
    """exp with a one-sided input cap.

    The encoders emit log-variances; in float32 an unbounded exp overflows
    to inf once the pre-activation drifts past ~88, and the downstream
    variance clip (models.QVAR_CLIP) cannot repair the inf that already
    entered the gradient chain (clip'(x)=0 * inf = NaN).  e^15 ~ 3e6 is far
    above every variance clip ceiling, so values are unchanged in the
    operating range.
    """
    return jnp.exp(jnp.minimum(x, cap))


def upsample2x(x: Array) -> Array:
    """Nearest-neighbour 2x spatial upsampling, NHWC (keras UpSampling2D).

    Implemented as broadcast + reshape rather than jnp.repeat: identical
    values, but the VJP is a contiguous (h, 2, w, 2) window-sum reshape
    instead of repeat's gather-transpose — measurably cheaper in the
    SPRITES decoder backward (tools/profile_step.py upsample probes).
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def space_to_depth2(x: Array) -> Array:
    """(b, h, w, c) -> (b, h/2, w/2, 4c), channel layout (p, q, c)
    phase-major: out[i, j, (p*2+q)*c + k] = x[2i+p, 2j+q, k]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(x: Array) -> Array:
    """Inverse of `space_to_depth2`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def _s2d_phase_matrix() -> np.ndarray:
    """M[di, r, bi, p] = 1 iff a stride-1 3x3 SAME conv's output pixel at
    parity r, reading original tap di (offset di-1), lands on phase p of
    s2d block offset bi-1: p = r + di + 1 - 2*bi."""
    M = np.zeros((3, 2, 3, 2), np.float32)
    for di in range(3):
        for r in range(2):
            for bi in range(3):
                p = r + di + 1 - 2 * bi
                if 0 <= p < 2:
                    M[di, r, bi, p] = 1.0
    return M


class S2DConv3x3(nn.Module):
    """A 3x3 SAME stride-1 conv computed in space-to-depth(2) coordinates.

    TPU lever for the reference's 16-channel convs at 64x64 resolution
    (SPRITES arch, VAE_utils.py:275-360): 16 channels fill 16/128 MXU
    lanes, and the round-4 backward profile puts ~3.6 ms of the 5.5 ms
    decoder fwd+bwd in the three 64x64 convs.  In s2d coordinates the
    same conv runs at 32x32 with 4x the channels (64/128 lanes, 4x fewer
    pixels): the EXACT transformed kernel is

        W'[bi, bj, (p,q,cin), (r,s,cout)] =
            sum_{di,dj} M[di,r,bi,p] M[dj,s,bj,q] W[di,dj,cin,cout]

    with `_s2d_phase_matrix` M (dense compute is 4x the MACs — the point
    is lane fill and pixel count, exactly the trade the ConvTranspose
    probe measured at 1.33x).  SAME padding is exact: the padded s2d
    block's phase p=1 row is precisely the original's padded row -1, and
    phase rows below -1 are never read (M keeps p in range).

    Parameters are stored EXACTLY as ``nn.Conv`` stores them (``kernel``
    (3, 3, cin, features) HWIO + ``bias`` (features,)), so checkpoints
    interop with the materialized path both ways.

    ``to_space=True`` makes it the s2d form of a STRIDE-2 3x3 SAME conv,
    consuming s2d input and emitting normal-space output — the encoder's
    stride-2 conv at 64x64 absorbs the depth-to-space for free.  NOTE the
    stride-2 SAME convention (XLA = keras) pads (0, 1) at even sizes, so
    output i reads X[2i + di] and the phase map is p = di + 2 - 2*bi
    (blocks {i, i+1}; the padded s2d block 33's phase 0 is exactly the
    original's padded row 64).
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    to_space: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1] // 4
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        M = jnp.asarray(_s2d_phase_matrix())
        k32 = kernel.astype(jnp.float32)
        if self.to_space:
            M2 = np.zeros((3, 3, 2), np.float32)  # [di, bi, p]
            for di in range(3):
                p = di + 2 - 2 * ((di + 2) // 2)
                M2[di, (di + 2) // 2, p] = 1.0
            M2 = jnp.asarray(M2)
            Wp = jnp.einsum("iap,jbq,ijck->abpqck", M2, M2, k32)
            Wp = Wp.reshape(3, 3, 4 * cin, self.features)
            bp = bias
        else:
            Wp = jnp.einsum("irap,jsbq,ijck->abpqcrsk", M, M, k32)
            Wp = Wp.reshape(3, 3, 4 * cin, 4 * self.features)
            bp = jnp.tile(bias, 4)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), Wp.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bp.astype(self.dtype)


class FusedUpsampleConv2x(nn.Module):
    """Exact fusion of ``Conv3x3(SAME)(upsample2x(x))`` computed at the
    PRE-upsample resolution.

    Nearest-neighbour 2x upsampling makes every 3x3 window cover at most
    2x2 DISTINCT source pixels, with the multiplicity pattern fixed by the
    output parity (a, b) = (row % 2, col % 2):

        a = 0 -> source rows (i-1, i) with weights (w0, w1 + w2)
        a = 1 -> source rows (i, i+1) with weights (w0 + w1, w2)

    (and the same along columns), so the four parities are four 2x2
    kernels that are fixed linear combinations of the stored 3x3 kernel.
    All four run as ONE 2x2 VALID conv with ``4 * features`` output
    channels over the once-padded input — a parity's output is a shifted
    slice of that conv — followed by a pixel shuffle.  Versus
    materializing the upsample this is ~2.1x fewer MACs, reads the input
    at quarter the pixel count, and fills 4x the MXU output lanes (the
    reference's 16-filter convs occupy 16/128 lanes).

    Parameters are stored EXACTLY as ``nn.Conv`` stores them (``kernel``
    (3, 3, in, features) HWIO + ``bias``), so swapping a decoder between
    the materialized and fused paths preserves the checkpoint tree and
    the math (values match to float-addition reassociation; pinned by
    tests/test_nn.py::test_fused_upsample_conv_matches_reference).
    Reference decoder semantics: VAE_utils.py:275-360 (keras
    UpSampling2D + Conv2D(SAME) pairs).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # parity combination matrix A[a, r, kh]: fused tap r of parity a
        # collects original taps kh (rows above; columns identically)
        comb = jnp.array([[[1., 0., 0.], [0., 1., 1.]],
                          [[1., 1., 0.], [0., 0., 1.]]], jnp.float32)
        fused = jnp.einsum("arh,bsw,hwio->rsiabo", comb, comb,
                           kernel.astype(jnp.float32))
        fused = fused.reshape(2, 2, cin, 4 * self.features)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = lax.conv_general_dilated(
            xp, fused.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(b, h + 1, w + 1, 2, 2, self.features)
        row0 = jnp.stack([y[:, 0:h, 0:w, 0, 0], y[:, 0:h, 1:w + 1, 0, 1]],
                         axis=3)
        row1 = jnp.stack([y[:, 1:h + 1, 0:w, 1, 0],
                          y[:, 1:h + 1, 1:w + 1, 1, 1]], axis=3)
        out = jnp.stack([row0, row1], axis=2)  # (b, h, 2, w, 2, f)
        out = out.reshape(b, 2 * h, 2 * w, self.features)
        return out + bias.astype(self.dtype)


# ---------------------------------------------------------------------------
# moving-ball MLPs
# ---------------------------------------------------------------------------


class BallEncoder(nn.Module):
    """Flatten video frames -> tanh MLP -> per-frame 2-D mean and variance.

    Reference: build_MLP_inference_graph (VAE_utils.py:9-55).  With
    `full_cholesky` the head emits 2*(T+1) values per frame (an
    over-parameterized full Cholesky row), matching the reference option.
    """

    hidden: Sequence[int] = (500,)
    full_cholesky: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vids: Array) -> Tuple[Array, Array]:
        b, t, px, py = vids.shape
        h = vids.reshape(b * t, px * py).astype(self.dtype)
        for width in self.hidden:
            h = nn.tanh(nn.Dense(width, dtype=self.dtype)(h))
        out_dim = 2 * (t + 1) if self.full_cholesky else 4
        h = nn.Dense(out_dim, dtype=self.dtype)(h)
        h = h.reshape(b, t, out_dim)
        means = h[:, :, :2]
        variances = safe_exp(h[:, :, 2:])
        return means, variances


class BallDecoder(nn.Module):
    """2-D latents -> tanh MLP -> per-frame Bernoulli logits.

    Reference: build_MLP_decoder_graph (VAE_utils.py:58-96).
    """

    px: int = 32
    py: int = 32
    hidden: Sequence[int] = (500,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents: Array) -> Array:
        b, t, d = latents.shape
        h = latents.reshape(b * t, d).astype(self.dtype)
        for width in self.hidden:
            h = nn.tanh(nn.Dense(width, dtype=self.dtype)(h))
        h = nn.Dense(self.px * self.py, dtype=self.dtype)(h)
        return h.reshape(b, t, self.px, self.py)


# ---------------------------------------------------------------------------
# rotated-MNIST conv VAE
# ---------------------------------------------------------------------------


class MnistEncoder(nn.Module):
    """3x Conv(8, 3, stride 2, VALID, elu) -> Dense(2L); input NHWC 28x28xC.

    Reference: mnistVAE encoder (VAE_utils.py:114-126).
    """

    L: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: Array) -> Array:
        h = images.astype(self.dtype)
        for _ in range(3):
            h = nn.elu(nn.Conv(8, (3, 3), strides=(2, 2), padding="VALID",
                               dtype=self.dtype)(h))
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(2 * self.L, dtype=self.dtype)(h)


class MnistDecoder(nn.Module):
    """Dense(128) -> (4,4,8) -> [up2 + Conv(8,3,SAME)] -> [up2 + Conv(8,3,
    VALID)] -> [up2 + Conv(1,3,SAME)], all elu; output 28x28x1 logits.

    Reference: mnistVAE decoder (VAE_utils.py:128-141).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents: Array) -> Array:
        h = nn.Dense(128, dtype=self.dtype)(latents.astype(self.dtype))
        h = h.reshape(h.shape[0], 4, 4, 8)
        h = upsample2x(h)  # 8x8
        h = nn.elu(nn.Conv(8, (3, 3), padding="SAME", dtype=self.dtype)(h))
        h = upsample2x(h)  # 16x16
        h = nn.elu(nn.Conv(8, (3, 3), padding="VALID", dtype=self.dtype)(h))
        h = upsample2x(h)  # 28x28
        h = nn.elu(nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(h))
        return h


class MnistVAE(nn.Module):
    """Conv VAE for rotated MNIST; encoder output split into mean and
    exp(log-variance) (reference: mnistVAE, VAE_utils.py:99-162)."""

    L: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = MnistEncoder(L=self.L, dtype=self.dtype)
        self.decoder = MnistDecoder(dtype=self.dtype)

    def encode(self, images: Array) -> Tuple[Array, Array]:
        enc = self.encoder(images)
        return enc[:, :self.L], safe_exp(enc[:, self.L:])

    def decode(self, latents: Array) -> Array:
        return self.decoder(latents)

    def __call__(self, images: Array):
        mean, var = self.encode(images)
        return self.decode(mean), mean, var


class MnistCVAE(nn.Module):
    """Conditional VAE: sin/cos of the rotation angle injected into the
    encoder input + mid-encoder features and into the decoder latent +
    4x4 feature map (reference: mnistCVAE, VAE_utils.py:165-258).

    `encode` expects images already concatenated with sin/cos channel maps
    (3-channel input), as the reference driver prepares them
    (SVGPVAE_model.py:737-744).
    """

    L: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.enc_convs = [
            nn.Conv(8, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"enc_conv{i}") for i in range(3)]
        self.enc_out = nn.Dense(2 * self.L, dtype=self.dtype)
        self.dec_in = nn.Dense(128, dtype=self.dtype)
        self.dec_conv0 = nn.Conv(8, (3, 3), padding="SAME", dtype=self.dtype)
        self.dec_conv1 = nn.Conv(8, (3, 3), padding="VALID", dtype=self.dtype)
        self.dec_conv2 = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)

    def encode(self, images3: Array, angles: Array) -> Tuple[Array, Array]:
        h = images3.astype(self.dtype)
        for conv in self.enc_convs:
            h = nn.elu(conv(h))
        h = h.reshape(h.shape[0], -1)
        ang = angles.astype(self.dtype)
        h = jnp.concatenate(
            [h, jnp.sin(ang)[:, None], jnp.cos(ang)[:, None]], axis=1)
        enc = self.enc_out(h)
        return enc[:, :self.L], safe_exp(enc[:, self.L:])

    def decode(self, latents: Array, angles: Array) -> Array:
        ang = angles.astype(self.dtype)
        sin_, cos_ = jnp.sin(ang), jnp.cos(ang)
        z = jnp.concatenate(
            [latents.astype(self.dtype), sin_[:, None], cos_[:, None]],
            axis=1)
        h = self.dec_in(z)
        h = h.reshape(h.shape[0], 4, 4, 8)
        b = h.shape[0]
        sin_map = jnp.broadcast_to(sin_[:, None, None, None], (b, 4, 4, 1))
        cos_map = jnp.broadcast_to(cos_[:, None, None, None], (b, 4, 4, 1))
        h = jnp.concatenate([h, sin_map, cos_map], axis=3)
        h = upsample2x(h)
        h = nn.elu(self.dec_conv0(h))
        h = upsample2x(h)
        h = nn.elu(self.dec_conv1(h))
        h = upsample2x(h)
        h = nn.elu(self.dec_conv2(h))
        return h

    def __call__(self, images3: Array, angles: Array):
        mean, var = self.encode(images3, angles)
        return self.decode(mean, angles), mean, var


# ---------------------------------------------------------------------------
# SPRITES conv VAE + representation network
# ---------------------------------------------------------------------------


class SpritesVAE(nn.Module):
    """Conv VAE for 64x64x3 SPRITES frames (reference: spritesVAE,
    VAE_utils.py:275-360): encoder 6x Conv(16, 3, SAME, elu) with strides
    1/2/1/2/1/2 -> Dense(2L); decoder Dense(1024) -> (8,8,16) ->
    3x [up2 + 2x Conv(16, 3, SAME, elu)] -> Conv(3, 3, SAME, elu).

    `filters` keeps the reference's 16 by default; 16 channels fill only
    16 of the MXU's 128 lanes, so wider variants exist as a measured perf
    axis for custom models (tools/profile_step.py --workload sprites
    probes filters=128 head-to-head)."""

    L: int = 64
    dtype: jnp.dtype = jnp.float32
    filters: int = 16
    # dtype of the quality-critical head stages (encoder mean/log-var
    # Dense + decoder output Conv); None = same as `dtype`.  The hybrid
    # mixed-precision mode (cli.sprites --bf16_hybrid) runs the conv
    # trunks in bfloat16 and keeps the heads float32 — the wave-24
    # finding was that UNIFORM bf16's noise floor binds at converged
    # horizons, and the heads are where precision touches the losses
    # (the variance head feeds exp -> GP precisions; the output conv
    # feeds the pixel MSE).
    head_dtype: object = None
    # Compute each upsample2x+Conv pair as a FusedUpsampleConv2x at the
    # pre-upsample resolution (exact rewrite, same parameter tree —
    # checkpoints interop both ways).  Perf knob measured in
    # tools/profile_step.py --workload sprites.
    fused_upsample: bool = False
    # Compute every 64x64-resolution conv in space-to-depth(2)
    # coordinates (S2DConv3x3): the encoder's first two convs consume one
    # cheap s2d of the 3-channel input (the stride-2 conv absorbs the
    # inverse), and the decoder's last stage runs at 32x32x4f — the
    # upsample2x+s2d pair degenerates to a free channel-tile, with one
    # depth-to-space on the 3-channel output.  Exact rewrite, same
    # parameter tree; takes precedence over fused_upsample at stage 3.
    s2d64: bool = False

    def setup(self):
        f = self.filters
        hd = self.head_dtype or self.dtype
        if self.s2d64:
            enc0 = [S2DConv3x3(features=f, dtype=self.dtype,
                               name="enc_conv0"),
                    S2DConv3x3(features=f, dtype=self.dtype, to_space=True,
                               name="enc_conv1")]
        else:
            enc0 = [nn.Conv(f, (3, 3), strides=(s, s), padding="SAME",
                            dtype=self.dtype, name=f"enc_conv{i}")
                    for i, s in enumerate((1, 2))]
        self.enc_convs = enc0 + [
            nn.Conv(f, (3, 3), strides=(s, s), padding="SAME",
                    dtype=self.dtype, name=f"enc_conv{i}")
            for i, s in zip((2, 3, 4, 5), (1, 2, 1, 2))]
        self.enc_out = nn.Dense(2 * self.L, dtype=hd)
        self.dec_in = nn.Dense(64 * f, dtype=self.dtype)
        self.dec_convs = [
            (S2DConv3x3(features=f, dtype=self.dtype, name=f"dec_conv{i}")
             if self.s2d64 and i >= 4 else
             FusedUpsampleConv2x(features=f, dtype=self.dtype,
                                 name=f"dec_conv{i}")
             if self.fused_upsample and i % 2 == 0 else
             nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype,
                     name=f"dec_conv{i}")) for i in range(6)]
        self.dec_out = (S2DConv3x3(features=3, dtype=hd) if self.s2d64
                        else nn.Conv(3, (3, 3), padding="SAME", dtype=hd))

    def encode(self, images: Array) -> Tuple[Array, Array]:
        h = images.astype(self.dtype)
        if self.s2d64:
            h = space_to_depth2(h)  # convs 0-1 run in s2d coordinates
        for conv in self.enc_convs:
            h = nn.elu(conv(h))
        h = h.reshape(h.shape[0], -1)  # (b, 8*8*16)
        enc = self.enc_out(h.astype(self.head_dtype or self.dtype))
        return enc[:, :self.L], safe_exp(enc[:, self.L:])

    def decode(self, latents: Array) -> Array:
        h = self.dec_in(latents.astype(self.dtype))
        h = h.reshape(h.shape[0], 8, 8, self.filters)
        for i in range(3):
            if self.s2d64 and i == 2:
                # stage 3 in s2d coordinates: upsample2x then s2d(2) is a
                # phase-tile of the channels (all four phases equal)
                h = jnp.tile(h, (1, 1, 1, 4))
            elif not self.fused_upsample:
                h = upsample2x(h)  # fused conv upsamples internally
            h = nn.elu(self.dec_convs[2 * i](h))
            h = nn.elu(self.dec_convs[2 * i + 1](h))
        out = self.dec_out(h.astype(self.head_dtype or self.dtype))
        if self.s2d64:
            out = depth_to_space2(out)  # elu commutes (elementwise)
        return nn.elu(out)

    def __call__(self, images: Array):
        mean, var = self.encode(images)
        return self.decode(mean), mean, var


class SpritesReprNet(nn.Module):
    """GQN-"Pool"-style character-style embedder: 3x Conv(L, 2, stride 2,
    SAME, elu) + 8x8 average pool + flatten -> L-dim vector per frame.

    Reference: sprites_representation_network (VAE_utils.py:363-391).  The
    reference name-prefixes layers 'GP_repr_NN_*' to partition trainables;
    here the whole module is a separate parameter subtree, so optimizer
    masks address it directly.
    """

    L: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: Array) -> Array:
        h = images.astype(self.dtype)
        for i in range(3):
            h = nn.elu(nn.Conv(self.L, (2, 2), strides=(2, 2),
                               padding="SAME", dtype=self.dtype,
                               name=f"conv{i}")(h))
        h = nn.avg_pool(h, window_shape=(8, 8), strides=(8, 8),
                        padding="SAME")
        return h.reshape(h.shape[0], -1)


class ClassificationHead(nn.Module):
    """Linear classifier stacked on the repr net for pretraining
    (reference: SPRITES_experiment.py:141-144)."""

    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeddings: Array) -> Array:
        return nn.Dense(self.num_classes, dtype=self.dtype)(embeddings)


class SVIGPDecoder(nn.Module):
    """Decoder-only network for the deep-SVIGP baseline; same architecture
    as the mnistVAE decoder (reference: SVIGP_Hensman_decoder,
    VAE_utils.py:394-431)."""

    L: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.decoder = MnistDecoder(dtype=self.dtype)

    def decode(self, latents: Array) -> Array:
        return self.decoder(latents)

    def __call__(self, latents: Array) -> Array:
        return self.decoder(latents)
