"""Moving-ball data synthesis (L0).

Reference: Make_path_batch / Make_Video_batch (utils.py:29-121), the
in-graph per-step generator build_video_batch_graph (utils.py:138-192), and
the circles/squares latent probes (utils_circles_grid.py:61-164).

TPU-first design: `make_video_batch_fn` returns a jitted pure function
(key) -> videos that samples fresh GP trajectories on-device each step from
a precomputed time-kernel Cholesky (infinite training data, matching the
reference's in-graph resampling) and rasterizes all frames with one
broadcasted comparison — no per-frame Python loops.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def make_path_batch(batch: int = 40, tmax: int = 30, lt: float = 5.0,
                    seed=None) -> np.ndarray:
    """Sample x(t), y(t) trajectories from a GP with an RBF time kernel.

    Returns (batch, tmax, 2), matching utils.py:29-56 statistics.
    """
    t = np.arange(tmax)
    cov = np.exp(-0.5 * (t[:, None] - t[None, :]) ** 2 / (lt * lt))
    # seed=None draws from the GLOBAL numpy RNG (the reference seeds
    # np.random.seed(...) in the caller and relies on that state here)
    rng = np.random if seed is None else np.random.RandomState(seed)
    traj = rng.multivariate_normal(np.zeros(tmax), cov, (batch, 2))
    return np.transpose(traj, (0, 2, 1))


def _rasterize(traj_px: np.ndarray, px: int, py: int, r: float) -> np.ndarray:
    """(T, 2) pixel-space trajectory -> (T, px, py) binary ball frames.

    Frame convention matches the reference's pixelate_frame (utils.py:93-108):
    the x coordinate runs along the SECOND image axis and y along the first.
    """
    xs = np.arange(px)
    ys = np.arange(py)
    dx2 = (xs[None, None, :] - traj_px[:, 0][:, None, None]) ** 2  # (T,1,px)
    dy2 = (ys[None, :, None] - traj_px[:, 1][:, None, None]) ** 2  # (T,py,1)
    return ((dx2 + dy2) < r * r).astype(np.float32)


def make_video_batch(tmax: int = 50, px: int = 32, py: int = 32,
                     lt: float = 5.0, batch: int = 40, seed: int = 1,
                     r: float = 3.0, backend: str = "auto"
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Sample trajectories and rasterize to binary ball videos.

    Returns (traj (batch, tmax, 2), vids (batch, tmax, px, py)); reference:
    Make_Video_batch (utils.py:59-121) with the traj*(px/5) + px/2 scaling.
    backend 'auto' uses the native C++ rasterizer (svgpvae_tpu.native) when
    built, 'numpy' forces the pure-python path.
    """
    np.random.seed(seed)
    traj0 = make_path_batch(batch=batch, tmax=tmax, lt=lt)
    traj_px = traj0 * (px / 5.0) + 0.5 * px
    if backend == "auto":
        from svgpvae_tpu import native
        vids = native.rasterize_balls(traj_px, px, py, r)
        if vids is not None:
            return traj0, vids
    vids = np.stack([_rasterize(tp, px, py, r) for tp in traj_px])
    return traj0, vids


def make_test_batches(n_batches: int = 10, tmax: int = 30, px: int = 32,
                      py: int = 32, lt: float = 5.0, batch: int = 35,
                      r: float = 3.0) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Fixed-seed reproducible test batches (reference:
    BALL_experiment.py:57-64 uses seeds 0..9)."""
    return [make_video_batch(tmax=tmax, px=px, py=py, lt=lt, batch=batch,
                             seed=s, r=r) for s in range(n_batches)]


def make_video_batch_fn(tmax: int = 30, px: int = 32, py: int = 32,
                        lt: float = 5.0, batch: int = 35, r: float = 3.0,
                        dtype=jnp.float32) -> Callable[[Array], Array]:
    """On-device per-step video generator (key) -> (batch, tmax, px, py).

    Fresh random ball videos every call — the jax analogue of the
    reference's in-graph generator (build_video_batch_graph,
    utils.py:138-192): paths = chol(K_time) @ N(0, I), scaled by 0.2*px +
    0.5*px, rasterized by a broadcasted squared-distance comparison.
    """
    t = np.arange(tmax)
    cov = np.exp(-0.5 * (t[:, None] - t[None, :]) ** 2 / (lt * lt))
    chol = np.linalg.cholesky(cov + 1e-5 * np.eye(tmax))
    chol_j = jnp.asarray(chol, dtype=dtype)
    xs = jnp.arange(px, dtype=dtype)
    ys = jnp.arange(py, dtype=dtype)

    def sample(key: Array) -> Array:
        z = jax.random.normal(key, (tmax, 2 * batch), dtype=dtype)
        paths = (chol_j @ z).reshape(tmax, batch, 2)
        paths = jnp.transpose(paths, (1, 0, 2)) * (0.2 * px) + 0.5 * px
        dx2 = (xs[None, None, None, :] - paths[:, :, 0, None, None]) ** 2
        dy2 = (ys[None, None, :, None] - paths[:, :, 1, None, None]) ** 2
        return ((dx2 + dy2) < r * r).astype(dtype)

    return jax.jit(sample)


# ---------------------------------------------------------------------------
# circles / squares latent-geometry probes (utils_circles_grid.py)
# ---------------------------------------------------------------------------


def _pixelate_series(traj: np.ndarray, px: int, py: int,
                     r: float) -> np.ndarray:
    traj_px = traj * (px / 5.0) + 0.5 * px
    return _rasterize(traj_px, px, py, r)


def make_circles(px: int = 32, py: int = 32, r: float = 3.0,
                 tmax: int = 30) -> Tuple[np.ndarray, np.ndarray]:
    """Two concentric rings of latent points rendered as ball frames
    (reference: Make_circles, utils_circles_grid.py:61-90)."""
    n_in, n_out = 8, 10
    ang_in = 2 * np.pi * np.arange(n_in) / n_in
    ang_out = 2 * np.pi * np.arange(n_out) / n_out
    x = np.concatenate([[0], np.sin(ang_in), 2 * np.sin(ang_out)])
    y = np.concatenate([[0], np.cos(ang_in), 2 * np.cos(ang_out)])
    traj = np.stack([x, y], axis=1)  # (19, 2)
    traj = np.vstack([traj, np.zeros((tmax - len(traj), 2))])
    vids = _pixelate_series(traj, px, py, r)[None]
    return traj, vids


def make_squares(px: int = 32, py: int = 32, r: float = 3.0,
                 tmax: int = 30) -> Tuple[np.ndarray, np.ndarray]:
    """5x5 lattice of latent points rendered as ball frames (reference:
    Make_squares, utils_circles_grid.py:149-164)."""
    base = np.arange(5) - 2
    sq_x = np.tile(base, 5)
    sq_y = np.repeat(base, 5)
    traj = np.stack([sq_x, sq_y], axis=1).astype(float) + 0.01
    traj = np.vstack([traj, np.zeros((tmax - len(traj), 2))])
    vids = _pixelate_series(traj, px, py, r)[None]
    return traj, vids
