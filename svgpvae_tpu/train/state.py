"""Training state carried through the jitted step.

The reference threads GECO state (C_ma, lambda) between sess.run calls via
feed_dict placeholders (MNIST_experiment.py:313-341) and keeps the step
counter in a tf Variable.  Here everything — parameters, optimizer moments,
GECO state, PRNG key, step — lives in one pytree that flows through the
jitted train step, so a checkpoint of this struct is a complete resume
point (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GECOState:
    """GECO constrained-optimization state (reference:
    MNIST_experiment.py:313-341, SVGPVAE_model.py:908-915)."""

    C_ma: jax.Array
    lagrange_mult: jax.Array

    @classmethod
    def init(cls, dtype=jnp.float32) -> "GECOState":
        return cls(C_ma=jnp.zeros((), dtype),
                   lagrange_mult=jnp.ones((), dtype))


@struct.dataclass
class TrainState:
    """Step counter + params + optimizer state + GECO + PRNG key."""

    step: jax.Array
    params: Any
    opt_state: Any
    geco: GECOState
    key: jax.Array

    @classmethod
    def create(cls, params, tx, key, dtype=jnp.float32) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), geco=GECOState.init(dtype),
                   key=key)
