"""Day-one REAL-DATA ingestion e2e (VERDICT r4 item 3).

The quality records in RESULTS.md are measured on eval-pickle-derived /
synthetic corpora (PARITY.md #3/#4 — unavoidable offline), but the
real-data ingestion paths must work the first time a user points the
drivers at the genuine files.  These tests write tiny fixtures in the
EXACT external on-disk layouts —

  * ``mnist.npz`` with uint8 ``x_train/y_train/x_test/y_test`` keys (the
    keras cache the reference loads via
    ``tf.keras.datasets.mnist.load_data()``, utils.py:534-538), and
  * ``<action>_<direction>_{frames,attributes}_{train,test}.npy`` (the
    external sprites repo's raw corpus, consumed by the reference via
    ``sprites_act`` — SPRITES_utils.py:20,66)

— then run the FULL driver path (ensure_dataset -> preprocess/generate ->
train 1-2 epochs -> cgen), asserting finite metrics and correct split
sizes.  Branch-selection proof that the loaders' FALLBACK paths are NOT
taken: the MNIST run requests ``--dataset 36`` WITHOUT
``--synthetic_digits`` (the eval-pickle fallback hard-refuses that,
cli/mnist.py ensure_dataset), and the SPRITES run passes no
``--synthetic`` (ensure_dataset asserts without it unless the raw-npy
layout is detected).
"""

import os

import numpy as np

from svgpvae_tpu import data
from svgpvae_tpu.data.sprites import (FRAMES_PER_ACTION, RAW_SPRITES_ACTIONS,
                                      RAW_SPRITES_DIRECTIONS)
from svgpvae_tpu.cli import mnist as mnist_cli
from svgpvae_tpu.cli import sprites as sprites_cli


def _write_keras_mnist_npz(path, digits=("3", "6"), per_digit=420,
                           seed=0):
    """A synthetic archive in the exact keras mnist.npz layout: uint8
    arrays under x_train (N, 28, 28) / y_train (N,) / x_test / y_test."""
    rng = np.random.RandomState(seed)
    xs, ys = [], []
    for d in digits:
        # digit-distinct structured images (a bright band whose row
        # depends on the digit, over a dark noisy background) so the
        # generator's rotations/PCA see real structure, not iid noise
        img = (rng.rand(per_digit, 28, 28) * 40).astype(np.uint8)
        row = 4 + 3 * int(d)
        img[:, row:row + 4, 6:22] = 230
        xs.append(img)
        ys.append(np.full(per_digit, int(d), dtype=np.uint8))
    # decoy digits the selection must skip
    xs.append((rng.rand(50, 28, 28) * 255).astype(np.uint8))
    ys.append(np.full(50, 7, dtype=np.uint8))
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    perm = rng.permutation(len(x))
    np.savez(path, x_train=x[perm], y_train=y[perm],
             x_test=x[:10], y_test=y[:10])


def test_mnist_real_npz_day_one(tmp_path):
    data_dir = str(tmp_path / "mnist_data")
    os.makedirs(data_dir)
    _write_keras_mnist_npz(os.path.join(data_dir, "mnist.npz"))

    # --dataset 36 without --synthetic_digits: ONLY the real-npz branch
    # can satisfy this (the digit-3 eval-pickle fallback raises)
    args = mnist_cli.build_parser().parse_args([
        "--elbo", "SVGPVAE_Hensman", "--GECO", "--PCA", "--clip_qs",
        "--ip_joint", "--GP_joint", "--ov_joint",
        "--dataset", "36", "--mnist_data_path", data_dir,
        "--opt_regime", "joint-2", "--eval_every", "2"])
    mnist_cli.ensure_dataset(args)

    # generated pickles have the reference's per-digit sizes
    # (N_train=4050, N_eval=640, N_test=270 per digit,
    # MNIST_experiment.py:40-43)
    train_d, eval_d, test_d = data.load_rotated_mnist(
        data_dir, digits="36", M=args.M)
    assert len(train_d["images"]) == 2 * 4050
    assert len(eval_d["images"]) == 2 * 640
    assert len(test_d["images"]) == 2 * 270
    # aux rows: [id, angle, pca_0..7]
    assert train_d["aux_data"].shape[1] == 2 + args.M
    # base images really came from the fixture: every digit block keeps
    # its bright band (mean pixel of the band row range stays far above
    # the background in the unrotated originals' value range)
    assert float(train_d["images"].max()) > 0.7

    out = mnist_cli.run_svgpvae(args)
    assert np.isfinite(out["best_cgen_mse"])
    assert out["best_cgen_mse"] < 0.5, out["best_cgen_mse"]


def _write_raw_sprites_tree(path, n_train_chars=3, n_test_chars=2):
    """The external sprites repo's published file layout: for each of the
    9 action-direction combos, frames (N, 8, 64, 64, 3) float and
    attributes (N, 8, 4, 6) one-hot, train + test."""
    rng = np.random.RandomState(0)

    def char_attr(c):
        attr = np.zeros((4, 6), dtype=np.float32)
        attr[np.arange(4), [(c + k) % 6 for k in range(4)]] = 1.0
        return attr

    os.makedirs(path, exist_ok=True)
    for action in RAW_SPRITES_ACTIONS:
        for direction in RAW_SPRITES_DIRECTIONS:
            for split, n_chars, off in (("train", n_train_chars, 0),
                                        ("test", n_test_chars, 100)):
                frames = rng.rand(
                    n_chars, FRAMES_PER_ACTION, 64, 64, 3
                ).astype(np.float32)
                attrs = np.stack([
                    np.tile(char_attr(off + c)[None],
                            (FRAMES_PER_ACTION, 1, 1))
                    for c in range(n_chars)])
                np.save(os.path.join(
                    path, f"{action}_{direction}_frames_{split}.npy"),
                    frames)
                np.save(os.path.join(
                    path, f"{action}_{direction}_attributes_{split}.npy"),
                    attrs)


def test_sprites_raw_npy_day_one(tmp_path):
    corpus = str(tmp_path / "sprites_raw")
    _write_raw_sprites_tree(corpus)
    assert data.has_raw_sprites_npys(corpus)

    # no --synthetic: ensure_dataset must take the raw-npy branch (it
    # asserts otherwise), preprocess with the reference's 50 train
    # frames/char, and shard
    args = sprites_cli.build_parser().parse_args([
        "--elbo", "SVGPVAE_Hensman", "--GECO", "--clip_qs",
        "--sprites_data_path", corpus,
        "--batch_size", "150", "--batch_size_repr_nn", "150",
        "--opt_regime", "joint-2", "--eval_every", "2",
        "--nr_epochs_repr_nn", "2", "--m", "1", "--L", "16",
        "--L_character", "8", "--L_action", "4"])
    sprites_cli.ensure_dataset(args)
    assert sprites_cli._count_corpus_rows(
        os.path.join(corpus, "train")) == 3 * 50

    loaded = data.load_sprites(corpus)
    # 3 train chars x 50 sampled frames; 2 unseen chars x all 72 frames
    assert len(loaded["train"]["frames"]) == 150
    assert len(loaded["test_character"]["frames"]) == 2 * 72
    # the held-out 22 frames/char of train characters
    assert len(loaded["test_action"]["frames"]) == 3 * 22
    # aux rows: [character_id, action_frame_id]
    assert loaded["train"]["aux_data"].shape[1] == 2
    assert loaded["train"]["aux_data"][:, 1].max() < 72

    out = sprites_cli.run_experiment(args)
    assert np.isfinite(out["best_cgen_mse"])
