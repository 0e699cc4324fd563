"""Shape/behavior tests for the NN modules (architectures of SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from svgpvae_tpu import nn as nets

KEY = jax.random.PRNGKey(0)


def test_ball_encoder_decoder_shapes():
    vids = jnp.zeros((5, 30, 32, 32))
    enc = nets.BallEncoder()
    params = enc.init(KEY, vids)
    means, variances = enc.apply(params, vids)
    assert means.shape == (5, 30, 2)
    assert variances.shape == (5, 30, 2)
    assert np.all(np.asarray(variances) > 0)

    dec = nets.BallDecoder()
    dparams = dec.init(KEY, means)
    logits = dec.apply(dparams, means)
    assert logits.shape == (5, 30, 32, 32)


def test_ball_encoder_full_cholesky_head():
    vids = jnp.zeros((2, 10, 32, 32))
    enc = nets.BallEncoder(full_cholesky=True)
    params = enc.init(KEY, vids)
    means, variances = enc.apply(params, vids)
    assert means.shape == (2, 10, 2)
    assert variances.shape == (2, 10, 2 * (10 + 1) - 2)


def test_mnist_vae_shapes_and_param_count():
    images = jnp.zeros((4, 28, 28, 1))
    vae = nets.MnistVAE(L=16)
    params = vae.init(KEY, images)
    mean, var = vae.apply(params, images, method=vae.encode)
    assert mean.shape == (4, 16) and var.shape == (4, 16)
    assert np.all(np.asarray(var) > 0)
    recon = vae.apply(params, mean, method=vae.decode)
    assert recon.shape == (4, 28, 28, 1)

    # encoder spatial path 28 -> 13 -> 6 -> 2: flatten dim must be 2*2*8
    flat = jax.tree_util.tree_leaves(params["params"]["encoder"]["Dense_0"])
    kernel = params["params"]["encoder"]["Dense_0"]["kernel"]
    assert kernel.shape == (32, 32)  # (2*2*8, 2L)


def test_mnist_cvae_shapes():
    images3 = jnp.zeros((4, 28, 28, 3))
    angles = jnp.linspace(0, 2 * jnp.pi, 4)
    cvae = nets.MnistCVAE(L=16)
    params = cvae.init(KEY, images3, angles)
    mean, var = cvae.apply(params, images3, angles, method=cvae.encode)
    assert mean.shape == (4, 16)
    recon = cvae.apply(params, mean, angles, method=cvae.decode)
    assert recon.shape == (4, 28, 28, 1)


def test_sprites_vae_shapes():
    images = jnp.zeros((2, 64, 64, 3))
    vae = nets.SpritesVAE(L=64)
    params = vae.init(KEY, images)
    mean, var = vae.apply(params, images, method=vae.encode)
    assert mean.shape == (2, 64)
    recon = vae.apply(params, mean, method=vae.decode)
    assert recon.shape == (2, 64, 64, 3)


def test_sprites_vae_bf16_hybrid_heads():
    """--bf16_hybrid mode: trunks compute in bfloat16, the head stages
    (encoder Dense, decoder output Conv) in float32; parameters keep the
    SAME pytree as the f32 net (flax param_dtype unchanged) so trained
    checkpoints swap between modes."""
    import numpy as np
    images = jnp.ones((2, 64, 64, 3)) * 0.3
    vae32 = nets.SpritesVAE(L=8)
    vae_h = nets.SpritesVAE(L=8, dtype=jnp.bfloat16,
                            head_dtype=jnp.float32)
    params = vae32.init(KEY, images)
    # same param structure -> hybrid apply works on f32-initialized params
    mean, var = vae_h.apply(params, images, method=vae_h.encode)
    assert mean.dtype == jnp.float32 and var.dtype == jnp.float32
    recon = vae_h.apply(params, mean, method=vae_h.decode)
    assert recon.dtype == jnp.float32
    # and stays close to the f32 forward (trunks in bf16)
    mean32, _ = vae32.apply(params, images, method=vae32.encode)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean32),
                               atol=0.05)


def test_sprites_repr_net_shapes():
    images = jnp.zeros((6, 64, 64, 3))
    net = nets.SpritesReprNet(L=16)
    params = net.init(KEY, images)
    emb = net.apply(params, images)
    assert emb.shape == (6, 16)

    head = nets.ClassificationHead(num_classes=1000)
    hp = head.init(KEY, emb)
    logits = head.apply(hp, emb)
    assert logits.shape == (6, 1000)


def test_svigp_decoder_shapes():
    dec = nets.SVIGPDecoder(L=16)
    z = jnp.zeros((3, 16))
    params = dec.init(KEY, z)
    out = dec.apply(params, z)
    assert out.shape == (3, 28, 28, 1)


def test_upsample2x():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = nets.upsample2x(x)
    assert up.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(up[0, :2, :2, 0], x[0, 0, 0, 0])


def test_fused_upsample_conv_matches_reference():
    """FusedUpsampleConv2x must be an exact rewrite of
    Conv3x3(SAME)(upsample2x(x)): same parameter tree (checkpoint
    interop), same values and input/parameter gradients to float
    reassociation tolerance — including at image borders, where the
    collapsed 2x2 taps must see the same zero padding."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 5), jnp.float32)

    from flax import linen
    ref = linen.Conv(7, (3, 3), padding="SAME", name="c")
    fused = nets.FusedUpsampleConv2x(features=7, name="c")
    p_ref = ref.init(KEY, nets.upsample2x(x))
    p_fused = fused.init(KEY, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p_ref, p_fused)

    y_ref = ref.apply(p_ref, nets.upsample2x(x))
    y_fused = fused.apply(p_ref, x)
    assert y_fused.shape == (2, 16, 16, 7)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-6, atol=2e-6)

    def loss_ref(p, v):
        return jnp.sum(jnp.sin(ref.apply(p, nets.upsample2x(v))))

    def loss_fused(p, v):
        return jnp.sum(jnp.sin(fused.apply(p, v)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(p_ref, x)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(p_ref, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-6),
        g_ref, g_fused)


def test_sprites_vae_fused_upsample_parity():
    """The fused SpritesVAE decode must match the materialized decode on
    the SAME parameters (identical tree) end to end."""
    vae = nets.SpritesVAE(L=8, filters=4)
    vae_fused = nets.SpritesVAE(L=8, filters=4, fused_upsample=True)
    z = jnp.asarray(np.random.RandomState(2).randn(3, 8), jnp.float32)
    params = vae.init(KEY, jnp.zeros((3, 64, 64, 3)))
    out = vae.apply(params, z, method=nets.SpritesVAE.decode)
    out_f = vae_fused.apply(params, z, method=nets.SpritesVAE.decode)
    assert out_f.shape == out.shape == (3, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out),
                               rtol=2e-5, atol=2e-6)


def test_upsample2x_matches_repeat_values_and_vjp():
    """The broadcast+reshape upsample2x must be bit-equal to the
    jnp.repeat formulation (keras UpSampling2D semantics) in both the
    primal and the VJP — it exists only as a cheaper-backward rewrite."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(3, 8, 8, 4), jnp.float32)
    ref_fn = lambda v: jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    np.testing.assert_array_equal(np.asarray(nets.upsample2x(x)),
                                  np.asarray(ref_fn(x)))
    ct = jnp.asarray(rng.rand(3, 16, 16, 4), jnp.float32)
    g_new = jax.vjp(nets.upsample2x, x)[1](ct)[0]
    g_ref = jax.vjp(ref_fn, x)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=0, atol=0)


def test_s2d_roundtrip_and_layout():
    """space_to_depth2 uses phase-major channel layout (p, q, c) and
    depth_to_space2 inverts it; upsample2x then s2d equals channel-tile."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 8, 8, 5), jnp.float32)
    s = nets.space_to_depth2(x)
    assert s.shape == (2, 4, 4, 20)
    # phase-major layout: s[i, j, (p*2+q)*C + c] == x[2i+p, 2j+q, c]
    np.testing.assert_array_equal(np.asarray(s[0, 1, 2, (1 * 2 + 0) * 5 + 3]),
                                  np.asarray(x[0, 3, 4, 3]))
    np.testing.assert_array_equal(np.asarray(nets.depth_to_space2(s)),
                                  np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(nets.space_to_depth2(nets.upsample2x(x))),
        np.asarray(jnp.tile(x, (1, 1, 1, 4))))


def test_sprites_vae_s2d64_parity():
    """SpritesVAE(s2d64=True) must be an exact rewrite: identical
    parameter tree, and encode/decode values + parameter gradients match
    the reference path to float reassociation tolerance — including the
    asymmetric-(0,1)-padded stride-2 encoder conv and the SAME-padded
    borders of the decoder's 64x64 stage."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    z = jnp.asarray(rng.randn(2, 8), jnp.float32)
    ref = nets.SpritesVAE(L=8, filters=4)
    s2d = nets.SpritesVAE(L=8, filters=4, s2d64=True)
    p_ref = ref.init(KEY, jnp.zeros((2, 64, 64, 3)))
    p_s2d = s2d.init(KEY, jnp.zeros((2, 64, 64, 3)))
    assert (jax.tree_util.tree_structure(p_ref)
            == jax.tree_util.tree_structure(p_s2d))
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_s2d)):
        assert a.shape == b.shape

    m1, v1 = ref.apply(p_ref, x, method=nets.SpritesVAE.encode)
    m2, v2 = s2d.apply(p_ref, x, method=nets.SpritesVAE.encode)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=2e-5, atol=2e-6)
    d1 = ref.apply(p_ref, z, method=nets.SpritesVAE.decode)
    d2 = s2d.apply(p_ref, z, method=nets.SpritesVAE.decode)
    assert d2.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=2e-5, atol=2e-6)

    def loss(mod, p):
        m, v = mod.apply(p, x, method=nets.SpritesVAE.encode)
        return jnp.sum(jnp.sin(mod.apply(p, m + v, 
                                         method=nets.SpritesVAE.decode)))

    g1 = jax.grad(lambda p: loss(ref, p))(p_ref)
    g2 = jax.grad(lambda p: loss(s2d, p))(p_ref)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-5),
        g1, g2)
