"""Metrics and result persistence (L-observability, SURVEY.md §5.5).

  * `mse_rotation` — the moving-ball trajectory metric: affine-align
    predicted latents to ground-truth 2-D paths by least squares, report
    the residual MSE (reference: MSE_rotation, utils.py:195-245).
  * `ResultSaver` — named-column row appender persisted as CSV (replacing
    the pickled-DataFrame pandas_res_saver, utils.py:436-468; CSV keeps
    results greppable and pandas-loadable without pickle-version traps).
  * `count_params` — trainable-parameter count
    (reference: print_trainable_vars, utils.py:878-888).
"""

from __future__ import annotations

import csv
import os
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np


def mse_rotation(X: np.ndarray, Y: np.ndarray,
                 VX: Optional[np.ndarray] = None,
                 full_cholesky: bool = False
                 ) -> Tuple[np.ndarray, np.ndarray, float, np.ndarray]:
    """Least-squares affine alignment of latents X onto true paths Y.

    X, Y: (batch, tmax, 2); VX optional per-point diagonal variances — or,
    with `full_cholesky`, (batch, tmax, 2*tmax) stacked Cholesky rows that
    are reduced to marginal variances first (reference: utils.py:234-235).
    Returns (X_aligned, W (3, 2), MSE, VX_aligned (batch, tmax, 2, 2)).
    Reference: utils.py:195-245.
    """
    batch, tmax, _ = X.shape
    if VX is not None and full_cholesky:
        VX = post_process_full_cholesky(VX, tmax)
    Xf = np.concatenate([X.reshape(-1, 2), np.ones((batch * tmax, 1))],
                        axis=1)
    Yf = Y.reshape(-1, 2)
    W, residuals, _, _ = np.linalg.lstsq(Xf, Yf, rcond=None)
    mse = float(residuals.sum()) if len(residuals) == 2 else float("nan")
    X_rot = (Xf @ W).reshape(batch, tmax, 2)

    VX_rot = np.zeros((batch, tmax, 2, 2))
    if VX is not None:
        A = W[:2, :]  # (2, 2) linear part
        # rotate diagonal covariances: A^T diag(v) A, batched
        VX_rot = np.einsum("ij,btj,jk->btik", A.T, VX, A)
    return X_rot, W, mse, VX_rot


class ResultSaver:
    """Append named-value rows; flush to CSV every `flush_every` rows.

    Column-compatible replacement for pandas_res_saver (utils.py:436-468):
    recovers an existing file when the header matches, otherwise starts a
    timestamped sibling.
    """

    def __init__(self, path: str, colnames: Sequence[str],
                 flush_every: int = 10):
        self.colnames = list(colnames)
        self.flush_every = flush_every
        self._rows: List[list] = []
        if os.path.exists(path):
            with open(path) as f:
                header = f.readline().strip().split(",")
            if header != self.colnames:
                import time
                path = f"{path}_{time.time()}"
        self.path = path
        if not os.path.exists(path):
            with open(path, "w", newline="") as f:
                csv.writer(f).writerow(self.colnames)

    def __call__(self, row: Sequence) -> None:
        assert len(row) == len(self.colnames), \
            f"expected {len(self.colnames)} values, got {len(row)}"
        self._rows.append([_scalarize(v) for v in row])
        if len(self._rows) >= self.flush_every:
            self.flush()

    def flush(self) -> None:
        if not self._rows:
            return
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerows(self._rows)
        self._rows = []


def _scalarize(v):
    arr = np.asarray(v)
    if arr.ndim == 0:
        return arr.item()
    return np.array2string(arr.ravel(), max_line_width=10**9, threshold=64)


def post_process_full_cholesky(arr: np.ndarray, tmax: int) -> np.ndarray:
    """(batch, tmax, 2*tmax) stacked lower-triangular Cholesky rows ->
    (batch, tmax, 2) marginal variances (reference:
    post_process_full_cholesky, utils.py:248-259).  Used when the ball
    encoder runs with the full_cholesky head."""
    def tri_var(block):
        tri = np.tril(block)
        return np.diagonal(tri @ np.transpose(tri, (0, 2, 1)),
                           axis1=1, axis2=2)
    var_x = tri_var(arr[:, :, :tmax])
    var_y = tri_var(arr[:, :, tmax:])
    return np.stack([var_x, var_y], axis=2)


def count_params(params, print_shapes: bool = False) -> int:
    """Total parameter count of a pytree (reference:
    print_trainable_vars, utils.py:878-888)."""
    leaves = jax.tree_util.tree_leaves(params)
    total = 0
    for leaf in leaves:
        n = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        total += n
        if print_shapes:
            print(np.shape(leaf), n)
    return total


class NonFiniteLossError(RuntimeError):
    """Raised by `check_finite` when a training metric goes NaN/inf."""


def check_finite(values, step: int, state=None, run_dir: str = None,
                 context: str = "train"):
    """Fail-fast NaN/inf sentinel for training loops (SURVEY.md §5.3).

    The reference has no failure detection: a NaN silently poisons every
    later epoch (observed on the Casale GP phase, RESULTS.md round 2 —
    90 epochs of NaN metrics after one bad Cholesky).  Drivers call this
    on each epoch's aggregated metrics; on the first non-finite value it
    saves an emergency checkpoint of the CURRENT — typically already
    NaN-poisoned — state (when a run dir and state are available) and
    raises.  The checkpoint is a diagnostic artifact (inspect which
    leaves went non-finite), not a resume point; resume from the last
    periodic save in `ckpt/`.
    """
    import numpy as _np

    arr = _np.asarray(values, dtype=_np.float64)
    if _np.all(_np.isfinite(arr)):
        return
    msg = (f"non-finite {context} metric at step {step}: "
           f"{int(_np.size(arr) - _np.isfinite(arr).sum())}/{arr.size} "
           "bad values")
    if run_dir is not None and state is not None:
        from svgpvae_tpu.utils import checkpoint as _ckpt
        import os as _os
        path = _os.path.join(run_dir, "ckpt_nan")
        _ckpt.save_checkpoint(path, state, step)
        msg += f"; emergency checkpoint written to {path}"
    raise NonFiniteLossError(msg)
