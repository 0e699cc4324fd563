"""End-to-end SPRITES ingestion + training (VERDICT r2 item 5).

Drives the REAL-corpus ingestion chain the synthetic generator bypasses:
a tiny fake raw corpus with the external repo's npy conventions ->
preprocess_sprites -> save_sprites_shards -> load_sprites -> the full CLI
driver (pretraining + GECO training + test_character recon/cgen).
Reference: preprocess_sprite_SVGPVAE + save_sprites + import_sprites
(SPRITES_utils.py:45-214).
"""

import numpy as np
import pytest

from svgpvae_tpu import data
from svgpvae_tpu.cli import sprites as sprites_cli

T, N_ATTR = 8, 4


def _fake_raw_corpus(n_chars, seqs_per_char, rng):
    """sprites_act-style arrays: x (seqs, T, 64, 64, 3), attributes
    (seqs, T, n_attr, 6), actions (seqs, T, 9)."""
    x, a, d = [], [], []
    for c in range(n_chars):
        attr = np.zeros((1, N_ATTR, 6))
        attr[0, np.arange(N_ATTR), [c % 6, (c + 1) % 6, (c + 2) % 6,
                                    (c + 3) % 6]] = 1
        for s in range(seqs_per_char):
            x.append(rng.rand(T, 64, 64, 3).astype(np.float32))
            a.append(np.tile(attr, (T, 1, 1)))
            act = np.zeros((1, 9))
            act[0, s % 9] = 1
            d.append(np.tile(act, (T, 1)))
    return np.stack(x), np.stack(a), np.stack(d)


def test_raw_corpus_to_training(tmp_path):
    rng = np.random.RandomState(0)
    x_tr, a_tr, d_tr = _fake_raw_corpus(3, 9, rng)   # 3 chars x 72 frames
    x_te, a_te, d_te = _fake_raw_corpus(2, 9, rng)

    splits = data.preprocess_sprites(x_tr, a_tr, d_tr, x_te, a_te, d_te,
                                     n_frames_train=50)
    shard_dir = tmp_path / "sprites_data"
    # small shard size so every split spans MULTIPLE shards (the loader
    # must reassemble them in numeric order)
    data.save_sprites_shards(splits, str(shard_dir), shard_size=64)
    assert len(list((shard_dir / "train").glob("*.npz"))) > 1

    loaded = data.load_sprites(str(shard_dir))
    for split in ("train", "test_action", "test_character"):
        np.testing.assert_array_equal(loaded[split]["frames"],
                                      splits[split]["frames"])
        np.testing.assert_array_equal(loaded[split]["aux_data"],
                                      splits[split]["aux_data"])

    args = sprites_cli.build_parser().parse_args([
        "--elbo", "SVGPVAE_Hensman", "--GECO", "--clip_qs",
        "--sprites_data_path", str(shard_dir),
        "--batch_size", "150", "--batch_size_repr_nn", "150",
        "--opt_regime", "joint-2", "--eval_every", "2",
        "--nr_epochs_repr_nn", "2", "--m", "1", "--L", "16",
        "--L_character", "8", "--L_action", "4"])
    out = sprites_cli.run_experiment(args)
    assert "best_cgen_mse" in out
    assert np.isfinite(out["best_cgen_mse"])


def test_stale_corpus_guard(tmp_path):
    """ensure_dataset must not silently reuse a synthetic corpus of a
    different scale (round-3 advisor, medium): scale mismatch fails hard
    unless --allow_stale_corpus; an unreadable (partially written) corpus
    is deleted and regenerated instead of crashing the guard."""
    path = str(tmp_path / "corpus")

    def parse(chars, extra=()):
        return sprites_cli.build_parser().parse_args(
            ["--synthetic", "--synthetic_chars", str(chars),
             "--sprites_data_path", path, *extra])

    args = parse(2)
    sprites_cli.ensure_dataset(args)   # generates 2 * 50 rows
    sprites_cli.ensure_dataset(args)   # matching corpus: silent reuse
    assert sprites_cli._count_corpus_rows(
        str(tmp_path / "corpus" / "train")) == 100

    with pytest.raises(SystemExit):
        sprites_cli.ensure_dataset(parse(3))  # scale mismatch: fail hard

    # explicit opt-in reuses the mismatched corpus (warn only)
    sprites_cli.ensure_dataset(parse(3, ["--allow_stale_corpus"]))
    assert sprites_cli._count_corpus_rows(
        str(tmp_path / "corpus" / "train")) == 100

    # corrupt shard -> corpus counts as invalid -> delete + regenerate
    shard = sorted((tmp_path / "corpus" / "train").glob("*.npz"))[0]
    shard.write_bytes(b"not an npz")
    assert sprites_cli._count_corpus_rows(
        str(tmp_path / "corpus" / "train")) is None
    sprites_cli.ensure_dataset(parse(2))
    assert sprites_cli._count_corpus_rows(
        str(tmp_path / "corpus" / "train")) == 100


def test_basin_retry_restarts_main_loop(tmp_path, capsys):
    """--basin_retry (VERDICT r4 item 2): with a detector threshold forced
    to trigger (rel=0.99 after one eval), the driver must detect the
    'plateau', restart the main loop from the post-pretrain params with a
    re-split sampling stream, and complete the full epoch budget on the
    retry attempt (fresh step counter / cgen history)."""
    args = sprites_cli.build_parser().parse_args([
        "--elbo", "SVGPVAE_Hensman", "--GECO", "--clip_qs",
        "--synthetic", "--synthetic_chars", "4",
        "--sprites_data_path", str(tmp_path / "corpus"),
        "--batch_size", "200", "--batch_size_repr_nn", "200",
        "--opt_regime", "joint-2", "--eval_every", "1",
        "--nr_epochs_repr_nn", "1", "--m", "1", "--L", "8",
        "--L_character", "4", "--L_action", "2",
        "--basin_retry", "1", "--basin_detect_evals", "1",
        "--basin_detect_rel", "0.99"])
    out = sprites_cli.run_experiment(args)
    captured = capsys.readouterr().out
    assert "basin detector" in captured
    assert "restarting main loop (attempt 1/1)" in captured
    assert np.isfinite(out["best_cgen_mse"])
    # the retry attempt ran the FULL budget on a fresh TrainState:
    # 2 epochs x 1 full batch (N=200 = batch 200, no tail)
    assert int(out["state"].step) == 2


def test_main_seed_reseeds_only_the_sampling_stream(tmp_path):
    """--main_seed must leave every parameter init and the repr-net
    pretrain on --seed (identical repr params when the repr net is
    frozen post-pretrain) while changing the main loop's per-step
    sampling stream (different trained VAE params)."""
    import jax

    path = str(tmp_path / "corpus")

    def run(extra=()):
        args = sprites_cli.build_parser().parse_args([
            "--elbo", "SVGPVAE_Hensman", "--GECO", "--clip_qs",
            "--synthetic", "--synthetic_chars", "4",
            "--sprites_data_path", path,
            "--batch_size", "200", "--batch_size_repr_nn", "200",
            "--opt_regime", "joint-2", "--eval_every", "2",
            "--nr_epochs_repr_nn", "2", "--m", "2", "--L", "16",
            "--L_character", "8", "--L_action", "4",
            "--repr_nn_pretrain", "yes_fixed", *extra])
        sprites_cli.ensure_dataset(args)
        return sprites_cli.run_experiment(args)

    base = run()
    reseeded = run(["--main_seed", "7"])

    # inits + pretrain untouched: the frozen repr net is bit-identical
    for a, b in zip(jax.tree_util.tree_leaves(base["state"].params["repr"]),
                    jax.tree_util.tree_leaves(
                        reseeded["state"].params["repr"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the sampling stream differs: trained VAE params must diverge
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(
                 jax.tree_util.tree_leaves(base["state"].params["vae"]),
                 jax.tree_util.tree_leaves(reseeded["state"].params["vae"]))]
    assert max(diffs) > 0.0
