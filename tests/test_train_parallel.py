"""Training-runtime and data-parallel mesh tests (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from svgpvae_tpu import gp as gpm
from svgpvae_tpu import models, nn as nets, parallel, train
from svgpvae_tpu.gp.svgp import SVGPConfig

KEY = jax.random.PRNGKey(0)
RNG = np.random.RandomState(5)


def test_parse_opt_regime():
    n, sched = train.parse_opt_regime(["VAE-3", "GP-2", "joint-1"])
    assert n == 6
    assert sched == ["VAE", "VAE", "VAE", "GP", "GP", "joint"]


def test_trainable_mask_and_frozen_updates():
    params = {"vae": {"w": jnp.ones(3)}, "gp": {"l": jnp.ones(())}}
    mask = train.trainable_mask(params,
                                lambda path, leaf: "gp" not in str(path))
    tx = train.make_optimizer(0.1, mask=mask)
    opt_state = tx.init(params)
    grads = {"vae": {"w": jnp.ones(3)}, "gp": {"l": jnp.ones(())}}
    updates, _ = tx.update(grads, opt_state, params)
    assert np.all(np.asarray(updates["gp"]["l"]) == 0.0)
    assert np.any(np.asarray(updates["vae"]["w"]) != 0.0)


def test_value_clip_optimizer():
    params = {"w": jnp.zeros(2)}
    tx = train.make_optimizer(1.0, clip_grad_value=0.5)
    opt_state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray([100.0, -100.0])}, opt_state,
                           params)
    # adam normalizes, so just check finiteness; the clip itself:
    from svgpvae_tpu.linalg import tree_value_clip
    clipped = tree_value_clip({"w": jnp.asarray([100.0, -100.0])}, 0.5)
    np.testing.assert_allclose(clipped["w"], [0.5, -0.5])


def test_geco_effective_alpha():
    assert float(train.geco_effective_alpha(jnp.asarray(0), 0.99)) == 0.0
    np.testing.assert_allclose(
        float(train.geco_effective_alpha(jnp.asarray(5), 0.99)), 0.99,
        rtol=1e-6)


def _tiny_svgpvae(b=16, L=2, M=2, m=4, n_obj=6):
    vae = nets.MnistVAE(L=L)
    images = jnp.asarray(RNG.rand(b, 28, 28, 1), dtype=jnp.float32)
    vae_params = vae.init(KEY, images)
    ip = np.hstack([np.arange(m)[:, None], RNG.rand(m, 1) * 2 * np.pi,
                    RNG.randn(m, M)])
    gp = gpm.init_mnist_svgp(ip, RNG.randn(n_obj, M),
                             config=SVGPConfig(jitter=1e-6, N_train=64))
    aux = jnp.asarray(np.hstack([
        RNG.randint(0, n_obj, (b, 1)).astype(float),
        RNG.rand(b, 1) * 2 * np.pi, RNG.randn(b, M)]), dtype=jnp.float32)
    params = {"vae": vae_params, "gp": gp}

    def loss_fn(params, batch, key, geco, step):
        alpha = train.geco_effective_alpha(step, 0.99)
        out = models.forward_pass_svgpvae(
            vae, params["vae"], params["gp"], batch, key, beta=0.001,
            C_ma=geco.C_ma, lagrange_mult=geco.lagrange_mult, alpha=alpha,
            kappa=np.sqrt(0.02), geco=True)
        new_geco = train.GECOState(C_ma=out.C_ma,
                                   lagrange_mult=out.lagrange_mult)
        return out.elbo, (new_geco, {"recon": out.recon_loss})

    return vae, params, (images, aux), loss_fn


def test_train_step_runs_and_updates_geco():
    vae, params, batch, loss_fn = _tiny_svgpvae()
    tx = train.make_optimizer(1e-3)
    state = train.TrainState.create(params, tx, KEY)
    step = train.make_train_step(loss_fn, tx, donate=False)

    state1, m1 = step(state, batch)
    assert int(state1.step) == 1
    assert np.isfinite(float(m1["loss"]))
    # first step uses alpha=0 -> C_ma == recon/b exactly
    np.testing.assert_allclose(float(state1.geco.C_ma),
                               float(m1["recon"]) / batch[0].shape[0],
                               rtol=1e-5)
    state2, m2 = step(state1, batch)
    assert int(state2.step) == 2
    assert float(state2.geco.lagrange_mult) != 1.0


def test_data_parallel_matches_single_device():
    vae, params, batch, loss_fn = _tiny_svgpvae(b=16)
    tx = train.make_optimizer(1e-3)

    # single device
    state = train.TrainState.create(params, tx, KEY)
    step = train.make_train_step(loss_fn, tx, donate=False)
    s1, m1 = step(state, batch)

    # 8-device mesh, batch sharded
    mesh = parallel.make_mesh(8)
    state_r = parallel.replicate(mesh, train.TrainState.create(params, tx,
                                                               KEY))
    batch_s = parallel.shard_batch(mesh, batch)
    step_dp = parallel.data_parallel_jit(
        train.make_train_step(loss_fn, tx, donate=False), mesh)
    s2, m2 = step_dp(state_r, batch_s)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                     jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)


def test_sharded_precompute_matches_unsharded():
    N, L, M, m, n_obj = 64, 3, 2, 5, 6
    ip = np.hstack([np.arange(m)[:, None], RNG.rand(m, 1) * 2 * np.pi,
                    RNG.randn(m, M)])
    gp = gpm.init_mnist_svgp(ip, RNG.randn(n_obj, M),
                             config=SVGPConfig(jitter=1e-6, N_train=N))
    aux = jnp.asarray(np.hstack([
        RNG.randint(0, n_obj, (N, 1)).astype(float),
        RNG.rand(N, 1) * 2 * np.pi, RNG.randn(N, M)]), dtype=jnp.float32)
    means = jnp.asarray(RNG.randn(N, L), dtype=jnp.float32)
    variances = jnp.asarray(RNG.rand(N, L) + 0.5, dtype=jnp.float32)

    want = gpm.precompute_test_posterior_terms(gp, means, variances, aux)
    mesh = parallel.make_mesh(8)
    got = parallel.sharded_precompute_gp_params(gp, means, variances, aux,
                                                mesh)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4,
                                   atol=1e-5)


def test_sharded_posterior_params_matches_unsharded():
    """Sharded MNIST cgen conditioning (GP posterior over the FULL train
    set) matches gp.posterior_params (reference conditioning pass:
    SVGPVAE_model.py:1026-1083)."""
    N, x, L, M, m, n_obj = 64, 12, 3, 2, 5, 6
    ip = np.hstack([np.arange(m)[:, None], RNG.rand(m, 1) * 2 * np.pi,
                    RNG.randn(m, M)])
    gp = gpm.init_mnist_svgp(ip, RNG.randn(n_obj, M),
                             config=SVGPConfig(jitter=1e-6, N_train=N))
    def make_aux(n):
        return jnp.asarray(np.hstack([
            RNG.randint(0, n_obj, (n, 1)).astype(float),
            RNG.rand(n, 1) * 2 * np.pi, RNG.randn(n, M)]), jnp.float32)
    aux_train, aux_test = make_aux(N), make_aux(x)
    means = jnp.asarray(RNG.randn(N, L), dtype=jnp.float32)
    variances = jnp.asarray(RNG.rand(N, L) + 0.5, dtype=jnp.float32)

    want = gpm.posterior_params(gp, aux_test, aux_train, means, variances)
    mesh = parallel.make_mesh(8)
    got = parallel.sharded_posterior_params(gp, aux_test, aux_train, means,
                                            variances, mesh)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4,
                                   atol=1e-5)


def test_model_axis_mesh():
    """make_mesh exposes a model axis (SURVEY.md §2.9); a data-parallel
    step with parameters replicated over BOTH axes matches single-device."""
    mesh = parallel.make_mesh(8, model=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"data": 4, "model": 2}

    vae, params, batch, loss_fn = _tiny_svgpvae(b=16)
    tx = train.make_optimizer(1e-3)
    state = train.TrainState.create(params, tx, KEY)
    step = train.make_train_step(loss_fn, tx, donate=False)
    s1, m1 = step(state, batch)

    state_r = parallel.replicate(mesh, train.TrainState.create(params, tx,
                                                               KEY))
    batch_s = parallel.shard_batch(mesh, batch)
    step_dp = parallel.data_parallel_jit(
        train.make_train_step(loss_fn, tx, donate=False), mesh)
    s2, m2 = step_dp(state_r, batch_s)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)


def test_data_parallel_multistep_state_equivalence():
    """Ten data-parallel steps keep loss, GECO state, PRNG key and Adam
    moments equivalent to the single-device trajectory (VERDICT round-1
    weak #6)."""
    vae, params, batch, loss_fn = _tiny_svgpvae(b=16)
    tx = train.make_optimizer(1e-3)
    rng = np.random.RandomState(17)
    batches = [(jnp.asarray(rng.rand(16, 28, 28, 1), jnp.float32),
                batch[1]) for _ in range(10)]

    state = train.TrainState.create(params, tx, KEY)
    step = train.make_train_step(loss_fn, tx, donate=False)
    losses1 = []
    for b_ in batches:
        state, m = step(state, b_)
        losses1.append(float(m["loss"]))

    mesh = parallel.make_mesh(8)
    state_r = parallel.replicate(mesh, train.TrainState.create(params, tx,
                                                               KEY))
    step_dp = parallel.data_parallel_jit(
        train.make_train_step(loss_fn, tx, donate=False), mesh)
    losses2 = []
    for b_ in batches:
        state_r, m = step_dp(state_r, parallel.shard_batch(mesh, b_))
        losses2.append(float(m["loss"]))

    np.testing.assert_allclose(losses1, losses2, rtol=5e-4)
    np.testing.assert_allclose(float(state.geco.C_ma),
                               float(state_r.geco.C_ma), rtol=5e-4)
    np.testing.assert_allclose(float(state.geco.lagrange_mult),
                               float(state_r.geco.lagrange_mult), rtol=5e-4)
    np.testing.assert_allclose(np.asarray(state.key),
                               np.asarray(state_r.key))
    for a, b_ in zip(jax.tree_util.tree_leaves(state.opt_state),
                     jax.tree_util.tree_leaves(state_r.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_data_parallel_epoch_scan_matches_single_device():
    """The whole-epoch lax.scan runner under a data mesh: per-batch axis
    sharded via shard_stacked_batches, state replicated; two epochs must
    reproduce the single-device loss trajectory and GECO state."""
    vae, params, batch, loss_fn = _tiny_svgpvae(b=16)
    images, aux = batch
    batches = (jnp.stack([images, images[::-1]]),
               jnp.stack([aux, aux[::-1]]))
    tx = train.make_optimizer(1e-3)
    epoch_fn = train.make_epoch_fn(loss_fn, tx, donate=False)

    state = train.TrainState.create(params, tx, KEY)
    ref_losses = []
    for _ in range(2):
        state, ms = epoch_fn(state, batches)
        ref_losses.extend(np.asarray(ms["loss"]))

    mesh = parallel.make_mesh(8)
    state_dp = parallel.replicate(mesh, train.TrainState.create(params, tx,
                                                                KEY))
    batches_dp = parallel.shard_stacked_batches(mesh, batches)
    dp_losses = []
    for _ in range(2):
        state_dp, ms = epoch_fn(state_dp, batches_dp)
        dp_losses.extend(np.asarray(ms["loss"]))

    np.testing.assert_allclose(dp_losses, ref_losses, rtol=5e-4)
    np.testing.assert_allclose(float(state_dp.geco.C_ma),
                               float(state.geco.C_ma), rtol=5e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(state.params),
                     jax.tree_util.tree_leaves(state_dp.params)):
        # 4 optimizer steps of psum-reordered f32 accumulation
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def _order_probe_epoch(shuffle, shuffle_block=1, n=24, bs=4):
    """Run one epoch over batches of distinct ids; return the visit order."""
    params = {"w": jnp.zeros(())}
    tx = train.make_optimizer(1e-3)

    def loss_fn(p, batch, key, geco, step):
        return jnp.sum(p["w"] * batch), (geco, {"ids": batch})

    epoch_fn = train.make_epoch_fn(loss_fn, tx, donate=False,
                                   shuffle=shuffle,
                                   shuffle_block=shuffle_block)
    batches = jnp.arange(n, dtype=jnp.float32).reshape(n // bs, bs)
    state = train.TrainState.create(params, tx, KEY)
    state, ms = epoch_fn(state, batches)
    order1 = np.asarray(ms["ids"]).reshape(-1)
    state, ms = epoch_fn(state, batches)
    order2 = np.asarray(ms["ids"]).reshape(-1)
    return order1, order2


def test_epoch_reshuffle_permutes_examples():
    """--reshuffle: each epoch visits every example exactly once, in a
    fresh order per epoch (reference tf.data semantics, utils.py:820-824);
    default keeps the fixed order (PARITY.md divergence #9)."""
    o1, o2 = _order_probe_epoch(shuffle=False)
    np.testing.assert_array_equal(o1, np.arange(24))
    np.testing.assert_array_equal(o2, np.arange(24))

    o1, o2 = _order_probe_epoch(shuffle=True)
    np.testing.assert_array_equal(np.sort(o1), np.arange(24))
    np.testing.assert_array_equal(np.sort(o2), np.arange(24))
    assert not np.array_equal(o1, np.arange(24)) or \
        not np.array_equal(o2, np.arange(24))
    assert not np.array_equal(o1, o2)  # key advances between epochs


def test_epoch_reshuffle_block_keeps_groups_contiguous():
    """SPRITES-style block shuffle: frames of one character stay adjacent
    (segment-mean aux layout, models.sprites_aux_data)."""
    o1, _ = _order_probe_epoch(shuffle=True, shuffle_block=4)
    blocks = o1.reshape(-1, 4)
    # each block is a contiguous run [4k, 4k+1, 4k+2, 4k+3]
    np.testing.assert_array_equal(blocks - blocks[:, :1],
                                  np.tile(np.arange(4), (6, 1)))
    assert not np.array_equal(o1, np.arange(24))


def test_multi_epoch_fn_matches_sequential_epochs():
    """--epoch_chunk: N epochs (incl. tail steps) as one program must
    reproduce the per-epoch loop's loss trajectory and final state."""
    vae, params, batch, loss_fn = _tiny_svgpvae(b=16)
    images, aux = batch
    batches = (jnp.stack([images, images[::-1]]),
               jnp.stack([aux, aux[::-1]]))
    tail = (images[:5], aux[:5])
    tx = train.make_optimizer(1e-3)
    step_fn = train.make_train_step(loss_fn, tx, donate=False)
    epoch_fn = train.make_epoch_fn(loss_fn, tx, donate=False)

    state = train.TrainState.create(params, tx, KEY)
    ref_losses = []
    for _ in range(2):
        state, ms = epoch_fn(state, batches)
        ref_losses.extend(np.asarray(ms["loss"]))
        state, m = step_fn(state, tail)
        ref_losses.append(float(m["loss"]))

    multi = train.make_multi_epoch_fn(loss_fn, tx, donate=False)
    state_m = train.TrainState.create(params, tx, KEY)
    state_m, ms = multi(state_m, batches, tail, 2)
    np.testing.assert_allclose(np.asarray(ms["loss"]).reshape(-1),
                               ref_losses, rtol=2e-4)
    assert int(state_m.step) == int(state.step) == 6
    for a, b_ in zip(jax.tree_util.tree_leaves(state.params),
                     jax.tree_util.tree_leaves(state_m.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5)
    np.testing.assert_allclose(float(state_m.geco.C_ma),
                               float(state.geco.C_ma), rtol=2e-4)


def test_lr_schedule():
    """--lr_decay helper: constant when off, cosine lr -> lr*alpha."""
    assert train.lr_schedule(0.01, None, 100) == 0.01
    s = train.lr_schedule(0.01, 0.1, 1000)
    assert float(s(0)) == pytest.approx(0.01)
    assert float(s(1000)) == pytest.approx(0.001)
    assert float(s(0)) > float(s(500)) > float(s(1000))
    # make_optimizer accepts the schedule and updates still apply
    params = {"w": jnp.ones((3,))}
    tx = train.make_optimizer(s)
    opt_state = tx.init(params)
    upd, _ = tx.update({"w": jnp.ones((3,))}, opt_state, params)
    assert float(jnp.abs(upd["w"]).max()) > 0
