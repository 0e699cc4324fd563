"""Serving: precompute-once conditional-generation predictors.

The reference only evaluates conditional generation inside its training
drivers (batched re-conditioning on the full train set each time,
MNIST_experiment.py:457-510).  For deployment this module separates the
two phases cleanly:

  * `fit` — one pass over the train set: encode, then fold the O(N) GP
    conditioning into (L, m)/(L, m, m) posterior terms (optionally sharded
    over a device mesh);
  * `predict` — a jitted O(x * m^2 * L) function of the query auxiliary
    data only: GP posterior at the queries -> decode -> images.

Works for any batch-level SVGP family (MNIST angles/ids, SPRITES
action/character vectors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from svgpvae_tpu import gp as gpm
from svgpvae_tpu import linalg


@struct.dataclass
class CGenPredictor:
    """Frozen predictor state: GP params + precomputed posterior terms."""

    gp_params: object
    mean_terms: Array   # (L, m)
    sigma_inv: Array    # (L, m, m)
    kmm_inv: Array      # (m, m)


def fit(gp_params, train_means: Array, train_vars: Array,
        aux_train: Array, mesh=None) -> CGenPredictor:
    """Fold the full-train-set conditioning into reusable posterior terms.

    train_means/train_vars: (N, L) encoder outputs; aux_train: (N, D).
    Pass a `jax.sharding.Mesh` to shard the N-sized contraction across
    devices (parallel.sharded_precompute_gp_params).
    """
    if mesh is not None:
        from svgpvae_tpu import parallel
        mt, si, ki = parallel.sharded_precompute_gp_params(
            gp_params, train_means, train_vars, aux_train, mesh)
    else:
        mt, si, ki = gpm.precompute_test_posterior_terms(
            gp_params, train_means, train_vars, aux_train)
    return CGenPredictor(gp_params=gp_params, mean_terms=mt, sigma_inv=si,
                         kmm_inv=ki)


def make_predict_fn(predictor: CGenPredictor, vae, vae_params,
                    sample: bool = True):
    """Jitted (aux_query (x, D), key) -> (images, p_m, p_v).

    With sample=False the decoder consumes the posterior mean (the
    reference's take_mean option, GPVAE_Casale_model.py:169-173 analog).
    """

    @jax.jit
    def predict(aux_query: Array, key):
        p_m, p_v = gpm.posterior_from_precomputed(
            predictor.gp_params, aux_query, predictor.mean_terms,
            predictor.sigma_inv, predictor.kmm_inv)
        p_v = jnp.clip(p_v, 1e-4, 100.0)
        if sample:
            eps = jax.random.normal(key, p_m.shape, dtype=p_m.dtype)
            z = p_m + eps * linalg.stable_sqrt(p_v)
        else:
            z = p_m
        images = vae.apply(vae_params, z, method=vae.decode)
        return images, p_m, p_v

    return predict
