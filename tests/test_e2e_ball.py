"""End-to-end smoke/convergence test — the reference README's designated
setup check is `BALL_experiment.py --elbo VAE` (SURVEY.md §4.1); this is
its pytest equivalent: train the ball VAE briefly and require the ELBO to
improve and the pipeline to produce finite diagnostics."""

import numpy as np
import pytest

from svgpvae_tpu.cli.ball import build_parser, run_experiment


@pytest.mark.parametrize("elbo", ["VAE", "SVGPVAE_Hensman"])
def test_ball_training_improves(tmp_path, elbo):
    args = build_parser().parse_args([
        "--elbo", elbo, "--steps", "60", "--eval_every", "30",
        "--ckpt_every", "100000", "--plot_every", "100000",
        "--base_dir", str(tmp_path), "--seed", "0",
        *(["--clip_qs"] if "SVGPVAE" in elbo else []),
    ])
    res = run_experiment(args)
    assert np.isfinite(res["mse"])
    assert res["steps_per_sec"] > 0
