"""Orbax checkpointing with true resume (SURVEY.md §5.4).

The reference saves only model weights via tf Saver (max_to_keep=3,
MNIST_experiment.py:296-297) and only the ball driver ever restores
(BALL_experiment.py:204-209).  Here the checkpoint is the WHOLE TrainState
pytree — parameters, optimizer moments, GECO state, PRNG key, step — so any
driver resumes exactly, including the constrained-optimization trajectory.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(ckpt_dir: str, state: Any, step: int,
                    max_to_keep: int = 3) -> None:
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, target: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure of `target` (an abstract or concrete
    TrainState pytree).  Returns the restored pytree."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      target)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored
