"""Data-layer and utils tests."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svgpvae_tpu import data, utils, train

REF_EVAL = "/root/reference/MNIST data/eval_data3.p"


def test_ball_path_and_video_stats():
    traj, vids = data.make_video_batch(tmax=20, batch=8, lt=5.0, seed=1)
    assert traj.shape == (8, 20, 2)
    assert vids.shape == (8, 20, 32, 32)
    assert set(np.unique(vids)).issubset({0.0, 1.0})
    # determinism: same seed -> same batch
    traj2, vids2 = data.make_video_batch(tmax=20, batch=8, lt=5.0, seed=1)
    np.testing.assert_allclose(traj2, traj)
    # GP trajectories: unit marginal variance, strong short-lag correlation
    assert abs(np.std(traj) - 1.0) < 0.3
    lag1_corr = (np.mean(traj[:, :-1, :] * traj[:, 1:, :])
                 / np.var(traj))
    assert lag1_corr > 0.9


def test_ball_video_fn_matches_numpy_stats():
    fn = data.make_video_batch_fn(tmax=12, batch=6, lt=3.0)
    vids = fn(jax.random.PRNGKey(0))
    assert vids.shape == (6, 12, 32, 32)
    # ball exists in (almost) every frame and has bounded area (< pi*(r+1)^2)
    area = np.asarray(vids).sum(axis=(2, 3))
    assert np.median(area) > 0
    assert area.max() <= np.pi * 16 + 10


def test_circles_squares_probes():
    traj_c, v_c = data.make_circles()
    traj_s, v_s = data.make_squares()
    assert v_c.shape == (1, 30, 32, 32)
    assert v_s.shape == (1, 30, 32, 32)
    # 19 ring points; radii 0, 1, 2
    radii = np.linalg.norm(traj_c[:19], axis=1)
    assert np.allclose(sorted(set(np.round(radii, 6)))[0], 0)
    assert np.isclose(radii[1:9], 1.0).all()
    assert np.isclose(radii[9:19], 2.0).all()


def test_mse_rotation_recovers_affine_map():
    rng = np.random.RandomState(0)
    Y = rng.randn(4, 10, 2)
    A = np.asarray([[0.5, -1.2], [0.8, 0.3]])
    b = np.asarray([0.7, -0.4])
    X = (Y - b) @ np.linalg.inv(A.T)  # so that X @ A^T + b == Y
    X_rot, W, mse, _ = utils.mse_rotation(X, Y)
    np.testing.assert_allclose(X_rot, Y, atol=1e-8)
    assert mse < 1e-12


@pytest.mark.skipif(not os.path.exists(REF_EVAL),
                    reason="shipped eval pickle unavailable")
def test_rotated_mnist_generation_schema(tmp_path):
    base = data.derive_base_images_from_eval(REF_EVAL, n_target=60)
    assert base.shape == (60, 28, 28)
    out = data.generate_rotated_mnist(base, str(tmp_path), digits="3",
                                      seed=0)
    train_d, eval_d, test_d = (out["train"], out["eval"], out["test"])
    # schema: images (N, 28, 28, 1); aux (N, 10) = [id, angle, pca0..7]
    assert train_d["images"].shape[1:] == (28, 28, 1)
    assert train_d["aux_data"].shape[1] == 10
    # eval gets valid_set_size of ids at all 16 angles
    assert len(eval_d["images"]) == 6 * 16
    # test set holds exactly one angle, disjoint from train angles
    train_angles = set(np.round(train_d["aux_data"][:, 1], 8))
    test_angles = set(np.round(test_d["aux_data"][:, 1], 8))
    assert len(test_angles) == 1
    assert test_angles.isdisjoint(train_angles)
    # 25% drop of the 54 train-ids x 15 angles grid
    assert len(train_d["images"]) == int(54 * 15 * 0.75)

    # loader round-trip + global index
    tr, ev, te = data.load_rotated_mnist(str(tmp_path), digits="3")
    assert len(tr["images"]) == len(train_d["images"])
    aux_gi = data.add_global_index(tr["aux_data"])
    assert aux_gi.shape[1] == 11
    np.testing.assert_allclose(aux_gi[:, 0], np.arange(len(aux_gi)))


@pytest.mark.skipif(not os.path.exists(REF_EVAL),
                    reason="shipped eval pickle unavailable")
def test_inducing_point_initializer(tmp_path):
    base = data.derive_base_images_from_eval(REF_EVAL, n_target=50)
    out = data.generate_rotated_mnist(base, None, digits="3", seed=0)
    ip = data.generate_init_inducing_points(out["train"], n=2, use_pca=True,
                                            M=8)
    assert ip.shape == (32, 10)  # 2 per angle x 16 angles, [id, angle, pca8]
    np.testing.assert_allclose(ip[:, 0], np.arange(32))
    angles = np.unique(ip[:, 1])
    assert len(angles) == 16

    # fractional n < 1 subsamples angles
    ip_frac = data.generate_init_inducing_points(out["train"], n=0.5,
                                                 use_pca=False, M=8)
    assert ip_frac.shape == (8, 10)


def test_batch_iterator_tail():
    d = {"images": np.arange(10)[:, None], "aux_data": np.arange(10)[:, None]}
    batches = list(data.batch_iterator(d, 4))
    assert [len(b[0]) for b in batches] == [4, 4, 2]
    batches = list(data.batch_iterator(d, 4, drop_remainder=True))
    assert [len(b[0]) for b in batches] == [4, 4]


def test_synthetic_sprites_layout_and_pca_init(tmp_path):
    splits = data.generate_synthetic_sprites(n_train_chars=4,
                                             n_test_chars=2,
                                             n_frames_train=8)
    tr = splits["train"]
    assert tr["frames"].shape == (32, 64, 64, 3)
    assert tr["aux_data"].shape == (32, 2)
    assert splits["test_character"]["frames"].shape == (144, 64, 64, 3)

    # shard round-trip
    data.save_sprites_shards(splits, str(tmp_path), shard_size=10)
    loaded = data.load_sprites(str(tmp_path))
    np.testing.assert_allclose(loaded["train"]["frames"], tr["frames"])

    gplvm, ip = data.sprites_pca_init(tr, m=2, L_action=3, L_character=4)
    assert gplvm.shape == (72, 3)
    assert ip.shape == (144, 7)


def test_result_saver_roundtrip(tmp_path):
    path = str(tmp_path / "res.csv")
    saver = utils.ResultSaver(path, ["step", "elbo"], flush_every=2)
    saver([1, 2.5])
    saver([2, jnp.asarray(3.5)])
    with open(path) as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == "step,elbo"
    assert len(lines) == 3

    # header-compatible recovery appends to the same file
    saver2 = utils.ResultSaver(path, ["step", "elbo"], flush_every=1)
    saver2([3, 4.5])
    with open(path) as f:
        assert len(f.read().strip().split("\n")) == 4


def test_count_params():
    params = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5)}}
    assert utils.count_params(params) == 17


def test_checkpoint_roundtrip(tmp_path):
    import optax
    params = {"w": jnp.arange(4.0), "gp": {"l": jnp.asarray(2.0)}}
    tx = train.make_optimizer(1e-3)
    state = train.TrainState.create(params, tx, jax.random.PRNGKey(0))
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    ckpt = str(tmp_path / "ckpt")
    utils.save_checkpoint(ckpt, state, step=7)
    assert utils.latest_step(ckpt) == 7
    restored = utils.restore_checkpoint(ckpt, state)
    assert int(restored.step) == 7
    np.testing.assert_allclose(restored.params["w"], state.params["w"])
    np.testing.assert_allclose(restored.geco.lagrange_mult, 1.0)


def test_dict_to_flags():
    s = utils.dict_to_flags({"lr": 0.1, "elbo": "VAE"})
    assert s == " --lr 0.1 --elbo VAE"


def test_save_video_frames(tmp_path):
    vids = np.zeros((2, 3, 8, 8))
    out = utils.save_video_frames(vids, str(tmp_path / "v"), index=1)
    import os
    assert len(os.listdir(out)) == 3


def test_post_process_full_cholesky():
    from svgpvae_tpu.utils.metrics import post_process_full_cholesky
    rng = np.random.RandomState(0)
    batch, tmax = 3, 5
    arr = rng.randn(batch, tmax, 2 * tmax)
    out = post_process_full_cholesky(arr, tmax)
    assert out.shape == (batch, tmax, 2)
    # diag of L L^T equals row-wise sum of squares of the lower triangle
    lx = np.tril(arr[0, :, :tmax])
    np.testing.assert_allclose(out[0, :, 0], (lx**2).sum(axis=1), atol=1e-10)


def test_preprocess_sprites_raw_corpus():
    """Raw-corpus preprocessing path (reference:
    preprocess_sprite_SVGPVAE, SPRITES_utils.py:45-131) on a tiny fake
    corpus following the external repo's sprites_act conventions."""
    rng = np.random.RandomState(0)
    T, n_attr = 8, 4

    def corpus(n_chars, seqs_per_char):
        x, a, d = [], [], []
        for c in range(n_chars):
            attr = np.zeros((1, n_attr, 6))
            attr[0, np.arange(n_attr), c % 6] = 1  # unique per character
            for s in range(seqs_per_char):
                x.append(rng.rand(T, 64, 64, 3).astype(np.float32))
                a.append(np.tile(attr, (T, 1, 1)))
                act = np.zeros((1, 9))
                act[0, s % 9] = 1
                d.append(np.tile(act, (T, 1)))
        return np.stack(x), np.stack(a), np.stack(d)

    x_tr, a_tr, d_tr = corpus(3, 9)   # 3 chars x 9 actions x 8 frames = 72
    x_te, a_te, d_te = corpus(2, 9)

    splits = data.preprocess_sprites(x_tr, a_tr, d_tr, x_te, a_te, d_te,
                                     n_frames_train=50)
    assert splits["train"]["frames"].shape == (3 * 50, 64, 64, 3)
    assert splits["test_action"]["frames"].shape == (3 * 22, 64, 64, 3)
    assert splits["test_character"]["frames"].shape == (2 * 72, 64, 64, 3)
    # aux columns: [char_id, action_frame_id in 0..71]
    aux = splits["train"]["aux_data"]
    assert set(np.unique(aux[:, 0])) == {0.0, 1.0, 2.0}
    assert aux[:, 1].min() >= 0 and aux[:, 1].max() < 72
    # per-character rows are contiguous (required by the model's
    # reshape-based segment mean)
    assert (np.diff(aux[:, 0]) >= 0).all()


def test_raw_sprites_npy_exact_published_layout(tmp_path):
    """Byte-level fixture of the external repo's published file layout
    (VERDICT r3 item 7): 36 npy files named
    {walk,spellcard,slash}_{front,left,right}_{frames,attributes}_
    {train,test}.npy with the true shapes/dtypes, loaded through
    data.load_raw_sprites_npys (the sprites_act equivalent,
    SPRITES_utils.py:20,66) and preprocessed end-to-end."""
    rng = np.random.RandomState(3)
    n_tr, n_te, T = 3, 2, 8

    def attrs(n, offset):
        # one attribute signature per character, constant over frames
        a = np.zeros((n, T, 4, 6), np.float32)
        for c in range(n):
            a[c, :, np.arange(4), (offset + c) % 6] = 1
        return a

    for action in data.sprites.RAW_SPRITES_ACTIONS:
        for direction in data.sprites.RAW_SPRITES_DIRECTIONS:
            stem = f"{action}_{direction}"
            np.save(tmp_path / f"{stem}_frames_train.npy",
                    rng.rand(n_tr, T, 64, 64, 3).astype(np.float32))
            np.save(tmp_path / f"{stem}_frames_test.npy",
                    rng.rand(n_te, T, 64, 64, 3).astype(np.float32))
            np.save(tmp_path / f"{stem}_attributes_train.npy",
                    attrs(n_tr, 0))
            np.save(tmp_path / f"{stem}_attributes_test.npy",
                    attrs(n_te, 3))

    assert data.has_raw_sprites_npys(str(tmp_path))
    x_tr, x_te, a_tr, a_te, d_tr, d_te = data.load_raw_sprites_npys(
        str(tmp_path))
    assert x_tr.shape == (9 * n_tr, T, 64, 64, 3)
    assert x_te.shape == (9 * n_te, T, 64, 64, 3)
    assert a_tr.shape == (9 * n_tr, T, 4, 6)
    # the synthesized action one-hot: sequence j of combo k has label k
    assert d_tr.shape == (9 * n_tr, T, 9)
    np.testing.assert_array_equal(np.argmax(d_tr[:, 0], axis=1),
                                  np.repeat(np.arange(9), n_tr))

    splits = data.preprocess_sprites(x_tr, a_tr, d_tr, x_te, a_te, d_te,
                                     n_frames_train=50)
    assert splits["train"]["frames"].shape == (n_tr * 50, 64, 64, 3)
    assert splits["test_character"]["frames"].shape == (n_te * 72,
                                                        64, 64, 3)


def test_keras_mnist_npz_exact_layout(tmp_path):
    """Byte-level fixture of the keras mnist.npz cache layout (what
    tf.keras.datasets.mnist.load_data() reads; reference generator
    utils.py:534-538): uint8 arrays under x_train/y_train/x_test/y_test.
    The driver bootstrap (cli.mnist.ensure_dataset) consumes this file
    for any digit set with zero code change."""
    rng = np.random.RandomState(0)
    n = 200
    x_train = (rng.rand(n, 28, 28) * 255).astype(np.uint8)
    y_train = rng.randint(0, 10, n).astype(np.uint8)
    np.savez(tmp_path / "mnist.npz", x_train=x_train, y_train=y_train,
             x_test=x_train[:10], y_test=y_train[:10])

    base = data.load_keras_mnist_npz(str(tmp_path / "mnist.npz"),
                                     digits="36", per_digit=5, seed=0)
    assert base.shape == (10, 28, 28)
    assert base.dtype == np.float64
    assert 0.0 <= base.min() and base.max() <= 1.0
    # digit-block order: the first 5 rows are digit-3 images
    digit3 = x_train[y_train == 3].astype(np.float64) / 255.0
    for row in base[:5]:
        assert any(np.array_equal(row, img) for img in digit3)

    # the driver-level hook: ensure_dataset picks the archive up and
    # generates the full multi-digit pickles from REAL base images
    from svgpvae_tpu.cli import mnist as mnist_cli
    import warnings
    args = mnist_cli.build_parser().parse_args(
        ["--dataset", "36", "--mnist_data_path", str(tmp_path), "--PCA"])
    # per_digit=400 resampling needs >=400 images/digit; monkey-free
    # shortcut: enlarge the fixture archive
    x_big = (rng.rand(9000, 28, 28) * 255).astype(np.uint8)
    y_big = np.tile(np.arange(10), 900).astype(np.uint8)
    np.savez(tmp_path / "mnist.npz", x_train=x_big, y_train=y_big,
             x_test=x_big[:10], y_test=y_big[:10])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mnist_cli.ensure_dataset(args)
    train_d, eval_d, test_d = data.load_rotated_mnist(str(tmp_path),
                                                      digits="36")
    assert len(train_d["images"]) == 2 * 4050
    assert len(test_d["images"]) == 2 * 270


def test_rotated_mnist_multi_digit_splits():
    """Multi-digit base images get per-digit eval/train splits (reference:
    generate_rotated_MNIST, utils.py:507-657 loops the split per digit)."""
    rng = np.random.RandomState(0)
    base = rng.rand(80, 28, 28)  # two "digits" x 40 base images
    out = data.generate_rotated_mnist(base, None, digits="36", seed=0)
    train_d, eval_d = out["train"], out["eval"]
    # eval: last 10% of EACH digit block (ids 36-39 and 76-79), all 16 angles
    eval_ids = set(eval_d["aux_data"][:, 0].astype(int))
    assert eval_ids == set(range(36, 40)) | set(range(76, 80))
    assert len(eval_d["images"]) == 2 * 4 * 16
    # train: per digit, 36 kept ids x 15 angles x 75% keep rate
    assert len(train_d["images"]) == int(2 * 36 * 15 * 0.75)
    train_ids = set(train_d["aux_data"][:, 0].astype(int))
    assert train_ids.isdisjoint(eval_ids)
    # both digit blocks present in train
    assert any(i < 36 for i in train_ids) and any(40 <= i < 76
                                                  for i in train_ids)


def test_mnist_driver_refuses_derived_multi_digit(tmp_path):
    """The driver must fail loudly rather than derive a '36' dataset from
    the digit-3-only shipped eval pickle."""
    from svgpvae_tpu.cli import mnist as mnist_cli
    args = mnist_cli.build_parser().parse_args(
        ["--dataset", "36", "--mnist_data_path", str(tmp_path)])
    with pytest.raises(SystemExit, match="digit-3"):
        mnist_cli.ensure_dataset(args)


def test_check_finite_sentinel(tmp_path):
    """NaN sentinel (SURVEY §5.3): clean metrics pass; a NaN raises and
    writes an emergency checkpoint of the last state."""
    import optax
    import pytest
    from svgpvae_tpu import train, utils

    utils.check_finite([1.0, -2.5, 0.0], step=10)  # no raise

    params = {"w": jnp.ones(3)}
    tx = optax.adam(1e-3)
    state = train.TrainState.create(params, tx, jax.random.PRNGKey(0))
    run_dir = str(tmp_path)
    with pytest.raises(utils.NonFiniteLossError, match="step 7"):
        utils.check_finite([1.0, float("nan")], step=7, state=state,
                           run_dir=run_dir)
    assert utils.latest_step(os.path.join(run_dir, "ckpt_nan")) == 7

    with pytest.raises(utils.NonFiniteLossError):  # no dir: still raises
        utils.check_finite([float("inf")], step=3)


def test_synthetic_digit_base_images_distinct_classes():
    """Stand-in glyphs (VERDICT r2 item 4): correct layout, [0,1] range,
    and structurally distinct per-class distributions so PCA object
    vectors separate digit classes like real MNIST embeddings would."""
    base = data.synthetic_digit_base_images("369", per_digit=12, seed=0)
    assert base.shape == (36, 28, 28)
    assert base.min() >= 0.0 and base.max() <= 1.0
    means = base.reshape(3, 12, -1).mean(axis=1)
    # class means separate clearly relative to the augmentation spread
    # (MNIST itself has within-class variance of the same order as the
    # between-class distance, so require a healthy ratio, not dominance)
    for i in range(3):
        for j in range(i + 1, 3):
            between = np.linalg.norm(means[i] - means[j])
            within = np.linalg.norm(
                base.reshape(3, 12, -1)[i] - means[i], axis=1).mean()
            assert between > 0.8 * within, (i, j, between, within)


def test_mnist_driver_synthetic_multi_digit_bootstrap(tmp_path):
    """--synthetic_digits lets multi-digit datasets bootstrap end-to-end
    with the reference's split sizes (N = n*4050/640/270,
    MNIST_experiment.py:40-43)."""
    from svgpvae_tpu.cli import mnist as mnist_cli
    args = mnist_cli.build_parser().parse_args(
        ["--dataset", "36", "--synthetic_digits",
         "--mnist_data_path", str(tmp_path)])
    mnist_cli.ensure_dataset(args)
    train_d, eval_d, test_d = data.load_rotated_mnist(str(tmp_path),
                                                      digits="36")
    assert len(train_d["images"]) == 2 * 4050
    assert len(eval_d["images"]) == 2 * 640
    assert len(test_d["images"]) == 2 * 270
    # ids span both digit blocks; aux schema [id, angle, pca0..7]
    ids = train_d["aux_data"][:, 0].astype(int)
    assert ids.min() < 400 <= ids.max()
    assert train_d["aux_data"].shape[1] == 10
