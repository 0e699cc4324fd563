"""Tracing/profiling hooks (SURVEY.md §5.1): StepTimer math, trace_if
producing a real profiler trace, and the --profile_dir CLI wiring."""

import glob
import os
import time

import jax
import jax.numpy as jnp

from svgpvae_tpu.utils import profiling


def test_step_timer_accumulates_and_scales():
    timer = profiling.StepTimer(steps_per_block=5)
    for _ in range(4):
        with timer:
            time.sleep(0.01)
    assert len(timer.times) == 4
    # 4 blocks x 5 steps / ~0.04 s
    assert timer.steps_per_sec > 50
    s = timer.summary()
    assert "20 steps" in s and "ms" in s and "steps/s" in s


def test_step_timer_empty_summary():
    assert profiling.StepTimer().summary() == "no steps timed"


def test_trace_if_disabled_is_noop(tmp_path):
    with profiling.trace_if(str(tmp_path / "t"), enabled=False):
        jnp.ones(3).sum()
    assert not (tmp_path / "t").exists()


def test_trace_if_writes_trace(tmp_path):
    trace_dir = str(tmp_path / "trace")
    with profiling.trace_if(trace_dir, enabled=True):
        with profiling.annotate("matmul_region"):
            x = jnp.ones((64, 64))
            (x @ x).block_until_ready()
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert files, "jax.profiler.trace produced no xplane file"


def test_ball_cli_profile_dir(tmp_path):
    from svgpvae_tpu.cli import ball

    trace_dir = str(tmp_path / "ball_trace")
    args = ball.build_parser().parse_args(
        ["--elbo", "VAE", "--steps", "20", "--eval_every", "10",
         "--plot_every", "10", "--ckpt_every", "20",
         "--base_dir", str(tmp_path), "--profile_dir", trace_dir])
    out = ball.run_experiment(args)
    assert jnp.isfinite(out["mse"])
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert files, "--profile_dir produced no trace"
