"""Generic jitted training step factory + optimizer wiring.

Replaces the reference's per-driver optimizer plumbing
(MNIST_experiment.py:196-208, Casale's 3-way optimizers :884-906, value
clipping BALL_experiment.py:127-131) with:

  * one optax Adam chain with optional value/norm gradient clipping;
  * fixed-vs-joint parameter selection via optax.multi_transform masks over
    the parameter pytree (instead of tf variable-collections filtered by
    name substring);
  * an opt_regime schedule DSL ("VAE-100 GP-100 joint-50" -> per-epoch
    regime list, reference: utils.py:891-899);
  * `make_train_step` producing a jitted (state, batch) -> (state, metrics)
    function with GECO state/PRNG threading.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from svgpvae_tpu import linalg
from svgpvae_tpu.train.state import TrainState


def parse_opt_regime(specs: List[str]) -> Tuple[int, List[str]]:
    """'VAE-100 GP-100 joint-50' -> (250, per-epoch regime list).

    Reference: parse_opt_regime (utils.py:891-899).
    """
    schedule: List[str] = []
    for spec in specs:
        regime, _, count = spec.rpartition("-")
        schedule.extend([regime] * int(count))
    return len(schedule), schedule


def trainable_mask(params, predicate: Callable[[Tuple, Any], bool]):
    """Boolean mask pytree: predicate(path, leaf) -> trainable?

    Replaces the reference's name-substring variable partition
    ('GP' in v.name, MNIST_experiment.py:897-903).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: bool(predicate(path, leaf)), params)


def lr_schedule(lr: float, decay_alpha: Optional[float],
                total_steps: int):
    """Constant lr, or cosine decay from `lr` to `lr * decay_alpha` over
    `total_steps` when `decay_alpha` is given.

    Opt-in extension with no reference analogue — the reference trains
    every experiment at a constant Adam lr (MNIST_experiment.py:905-910,
    SPRITES_experiment.py:317) — exposed as `--lr_decay` on the MNIST
    and SPRITES drivers for record runs past the reference's budgets.
    """
    if decay_alpha is None:
        return lr
    return optax.cosine_decay_schedule(init_value=lr,
                                       decay_steps=int(total_steps),
                                       alpha=float(decay_alpha))


def make_optimizer(learning_rate, mask=None,
                   clip_grad_value: Optional[float] = None,
                   clip_grad_norm: Optional[float] = None):
    """Adam with optional gradient clipping and a trainability mask.

    `mask` is a boolean pytree (True = trainable); frozen leaves get
    zero updates.  `learning_rate` may be a float or an optax schedule.

    An all-True mask is dropped (no reason to pay the multi_transform
    wrapper for it).  Checkpoint caveat: dropping vs keeping the
    multi_transform wrapper changes the optimizer-state pytree structure,
    so an orbax `--resume_dir` restore requires the SAME trainability
    configuration (same set of frozen leaves) as the run that wrote the
    checkpoint.  Note: `optax.flatten` was evaluated for the per-leaf
    Adam (0.17 ms scan-timed standalone, PROFILE_r02.json) and measured
    throughput-neutral inside the epoch scan — XLA already schedules the
    tiny per-leaf updates into scheduling gaps — so the plain per-leaf
    form is kept for checkpoint-structure stability.
    """
    if mask is not None and all(jax.tree_util.tree_leaves(mask)):
        mask = None
    chain = []
    if clip_grad_value is not None:
        chain.append(_clip_by_value(clip_grad_value))
    if clip_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(optax.adam(learning_rate))
    tx = optax.chain(*chain)
    if mask is not None:
        return optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda t: "train" if t else "frozen", mask))
    return tx


def _clip_by_value(limit: float) -> optax.GradientTransformation:
    """Value clipping to +/- limit (reference clips to +/-1e5,
    BALL_experiment.py:129)."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return linalg.tree_value_clip(updates, limit), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_train_step(loss_fn, tx, donate: bool = True):
    """Build the jitted train step.

    `loss_fn(params, batch, key, geco_state, step)` must return
    `(loss, (new_geco_state, metrics_dict))`.  The step threads PRNG and
    GECO state, applies the optax update, and increments `step`.
    """

    def step_fn(state: TrainState, batch):
        key, subkey = jax.random.split(state.key)
        (loss, (geco, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, subkey, state.geco,
                                   state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, geco=geco, key=key)
        metrics = dict(metrics, loss=loss)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_epoch_fn(loss_fn, tx, donate: bool = True, shuffle: bool = False,
                  shuffle_block: int = 1):
    """Build a jitted WHOLE-EPOCH runner: `lax.scan` over a device-resident
    pre-batched dataset.

    TPU-first replacement for the reference's per-batch sess.run loop
    (MNIST_experiment.py:327-356): the datasets here are small enough to
    live in HBM (rotated MNIST: ~12 MB), so an epoch is one XLA program —
    no per-step host dispatch, no host<->device transfers.  `batches` is a
    pytree whose leaves are stacked along a leading n_batches axis.

    With `shuffle=True` the epoch starts with an in-program reshuffle of
    the EXAMPLE axis across the whole stack (one `jax.random.permutation`
    gather, keyed off the TrainState PRNG), reproducing the reference's
    per-epoch `tf.data` reshuffle semantics (utils.py:820-824) at ~zero
    cost; default False keeps one fixed batch order for all epochs
    (PARITY.md divergence #9).  `shuffle_block` permutes contiguous blocks
    of that many examples instead of single examples — SPRITES batches
    must keep each character's `frames_per_char` frames contiguous (the
    segment-mean aux-data layout, models.sprites_aux_data), matching the
    reference whose per-batch segment_ids assume the same grouping
    (SPRITES_utils.py:317-332).

    Returns (state, metrics) with metrics stacked per step.
    """

    def step_fn(state: TrainState, batch):
        key, subkey = jax.random.split(state.key)
        (loss, (geco, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, subkey, state.geco,
                                   state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, geco=geco, key=key)
        return new_state, dict(metrics, loss=loss)

    def epoch_fn(state: TrainState, batches):
        if shuffle:
            key, pkey = jax.random.split(state.key)
            state = state.replace(key=key)
            nb, bs = jax.tree_util.tree_leaves(batches)[0].shape[:2]
            n_blocks = (nb * bs) // shuffle_block
            perm = jax.random.permutation(pkey, n_blocks)
            batches = jax.tree_util.tree_map(
                lambda a: a.reshape(n_blocks, shuffle_block, *a.shape[2:])
                           [perm].reshape(nb, bs, *a.shape[2:]), batches)
        return jax.lax.scan(step_fn, state, batches)

    return jax.jit(epoch_fn, donate_argnums=(0,) if donate else ())


def make_multi_epoch_fn(loss_fn, tx, donate: bool = True,
                        shuffle: bool = False, shuffle_block: int = 1):
    """Jitted MULTI-epoch runner: `n_epochs` whole epochs — including the
    tail remainder batch — as ONE `lax.scan`-of-`lax.scan` program.

    On a high-latency device link the per-epoch dispatch + metric
    readback dominates long runs (the tunneled 1000-epoch north-star
    spends ~265 s of its 274 s wall on ~1000 epoch-program round-trips
    while device compute is 8.5 s); running `eval_every` epochs per
    dispatch removes that in proportion.  Local-hardware runs are
    indifferent (per-dispatch cost ~50 us).

    `tail_batch` (or None) keeps exact epoch semantics: each inner epoch
    scans the full batches then runs the tail step, exactly like the
    driver's per-epoch loop.  Metrics come back stacked
    (n_epochs, n_batches [+1 with tail]).

    Returns fn(state, batches, tail_batch, n_epochs) with n_epochs
    static.
    """

    def step_fn(state: TrainState, batch):
        key, subkey = jax.random.split(state.key)
        (loss, (geco, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, subkey, state.geco,
                                   state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, geco=geco, key=key)
        return new_state, dict(metrics, loss=loss)

    def multi_fn(state: TrainState, batches, tail_batch, n_epochs: int):
        def epoch_body(st, _):
            if shuffle:
                key, pkey = jax.random.split(st.key)
                st = st.replace(key=key)
                nb, bs = jax.tree_util.tree_leaves(batches)[0].shape[:2]
                n_blocks = (nb * bs) // shuffle_block
                perm = jax.random.permutation(pkey, n_blocks)
                shuffled = jax.tree_util.tree_map(
                    lambda a: a.reshape(n_blocks, shuffle_block,
                                        *a.shape[2:])
                               [perm].reshape(nb, bs, *a.shape[2:]),
                    batches)
            else:
                shuffled = batches
            st, ms = jax.lax.scan(step_fn, st, shuffled)
            if tail_batch is not None:
                st, m_tail = step_fn(st, tail_batch)
                ms = jax.tree_util.tree_map(
                    lambda a, t: jnp.concatenate([a, t[None]]), ms, m_tail)
            return st, ms

        return jax.lax.scan(epoch_body, state, None, length=n_epochs)

    return jax.jit(multi_fn, static_argnums=(3,),
                   donate_argnums=(0,) if donate else ())


def make_generative_chunk_fn(loss_fn, tx, sample_fn, chunk: int,
                             donate: bool = True):
    """Jitted multi-step runner for experiments whose training data is
    GENERATED on device each step (the ball experiment's in-graph
    resampling, reference utils.py:138-192): `chunk` steps of
    sample -> step run as one `lax.scan` program, removing the per-step
    dispatch round-trips of sample_fn/step_fn/key-split.

    `sample_fn(key) -> batch`.  Returns (state, data_key, stacked metrics).
    """

    def one_step(carry, _):
        state, dkey = carry
        dkey, kb = jax.random.split(dkey)
        batch = sample_fn(kb)
        key, subkey = jax.random.split(state.key)
        (loss, (geco, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, subkey, state.geco,
                                   state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + 1, params=params,
                              opt_state=opt_state, geco=geco, key=key)
        return (state, dkey), dict(metrics, loss=loss)

    def chunk_fn(state: TrainState, data_key):
        (state, data_key), ms = jax.lax.scan(one_step, (state, data_key),
                                             None, length=chunk)
        return state, data_key, ms

    return jax.jit(chunk_fn, donate_argnums=(0, 1) if donate else ())


def stack_batches(data_dict, batch_size: int, dtype=None):
    """Host-side: {'images', 'aux_data'} -> leading-axis-stacked batch pytree
    for `make_epoch_fn` (drops the tail remainder; run it separately with a
    per-batch step to keep exact epoch semantics)."""
    import numpy as np
    dtype = dtype or np.float32
    n = len(data_dict["images"]) // batch_size
    images = np.stack([
        data_dict["images"][i * batch_size:(i + 1) * batch_size]
        for i in range(n)]).astype(dtype)
    aux = np.stack([
        data_dict["aux_data"][i * batch_size:(i + 1) * batch_size]
        for i in range(n)]).astype(dtype)
    return jnp.asarray(images), jnp.asarray(aux)
