"""Serving round trip: train -> orbax checkpoint -> cli.serve restore ->
fit-once predictor -> cgen queries.

Covers the full deployment path: `load_predictor` rebuilds
the driver's exact TrainState structure from args.json, restores the
checkpoint, folds the train-set conditioning into posterior terms
(serving.fit), and the jitted predict serves auxiliary-data queries that
match the driver's own cgen pipeline on the restored parameters.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svgpvae_tpu import data, models, serving
from svgpvae_tpu import gp as gpm
from svgpvae_tpu.cli import mnist as mnist_cli
from svgpvae_tpu.cli import serve as serve_cli
from svgpvae_tpu.cli import sprites as sprites_cli


@pytest.fixture(scope="module")
def mnist_run(tmp_path_factory):
    """A 2-epoch north-star training run with a saved checkpoint."""
    data_dir = str(tmp_path_factory.mktemp("mnist_data"))
    base_dir = str(tmp_path_factory.mktemp("runs"))
    args = mnist_cli.build_parser().parse_args([
        "--elbo", "SVGPVAE_Hensman", "--GECO", "--PCA", "--clip_qs",
        "--ip_joint", "--GP_joint", "--ov_joint",
        "--opt_regime", "joint-2", "--eval_every", "2",
        "--mnist_data_path", data_dir,
        "--save", "--save_model_weights", "--base_dir", base_dir])
    mnist_cli.ensure_dataset(args)
    out = mnist_cli.run_svgpvae(args)
    assert out["run_dir"] is not None
    return out


def test_mnist_serve_round_trip(mnist_run):
    run_dir = mnist_run["run_dir"]
    loaded = serve_cli.load_predictor(run_dir)

    # the restore must reproduce the exact trained parameters
    for a, b in zip(jax.tree_util.tree_leaves(mnist_run["state"].params),
                    jax.tree_util.tree_leaves(loaded["state"].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # served posterior == the driver's direct full-conditioning posterior
    predict = serving.make_predict_fn(loaded["predictor"], loaded["vae"],
                                      loaded["vae_params"], sample=False)
    test_d = loaded["test"]
    aux_q = jnp.asarray(test_d["aux_data"][:16], jnp.float32)
    images, p_m, p_v = predict(aux_q, jax.random.PRNGKey(0))
    assert images.shape == (16, 28, 28, 1)

    args = loaded["args"]
    train_d, _, _ = data.load_rotated_mnist(
        args.mnist_data_path, digits=str(args.dataset), M=args.M)
    im_tr = jnp.asarray(train_d["images"], jnp.float32)
    aux_tr = jnp.asarray(train_d["aux_data"], jnp.float32)
    means, variances = models.batching_encode_svgpvae(
        loaded["vae"], loaded["vae_params"], im_tr, clip_qs=args.clip_qs)
    p_m_direct, p_v_direct, _, _ = gpm.posterior_params(
        loaded["state"].params["gp"], aux_q, aux_tr, means, variances)
    np.testing.assert_allclose(np.asarray(p_m), np.asarray(p_m_direct),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_v), np.asarray(p_v_direct),
                               rtol=1e-3, atol=1e-4)


def test_mnist_serve_main_cli(mnist_run, tmp_path):
    out_npz = str(tmp_path / "preds.npz")
    result = serve_cli.main(["--run_dir", mnist_run["run_dir"],
                             "--out", out_npz, "--mean", "--limit", "32"])
    assert result["n_queries"] == 32
    assert np.isfinite(result["cgen_mse"])
    assert result["cgen_mse"] < 0.2, result["cgen_mse"]
    saved = np.load(out_npz)
    assert saved["images"].shape == (32, 28, 28, 1)
    assert np.isfinite(saved["p_m"]).all()


def test_sprites_serve_round_trip(tmp_path):
    """SPRITES family: train 1 epoch, save, restore, serve an unseen
    character's target actions from its context frames."""
    base = ["--elbo", "SVGPVAE_Hensman", "--GECO", "--clip_qs",
            "--synthetic", "--synthetic_chars", "4",
            "--sprites_data_path", str(tmp_path / "corpus"),
            "--batch_size", "200", "--batch_size_repr_nn", "200",
            "--opt_regime", "joint-1", "--eval_every", "1",
            "--repr_nn_pretrain", "no",
            "--save", "--save_model_weights",
            "--base_dir", str(tmp_path / "runs")]
    out = sprites_cli.run_experiment(
        sprites_cli.build_parser().parse_args(base))
    run_dir = out["run_dir"]
    assert run_dir is not None

    loaded = serve_cli.load_predictor(run_dir)
    assert "repr_net" in loaded
    result = serve_cli.main(["--run_dir", run_dir,
                             "--out", str(tmp_path / "sprites_preds.npz"),
                             "--mean"])
    assert result["n_queries"] == 72 - loaded["args"].N_context
    assert np.isfinite(result["cgen_mse"])
