"""Validate the static-shape NP context-likelihood trick.

The NP ELBO needs the exact-GP marginal likelihood of a RANDOM SUBSET of
each video's frames (reference: GPVAE_Pearce_model.py:135-164, computed
with dynamic gathers).  models/ball.py keeps shapes static by giving
non-context points huge observation noise and subtracting the analytic
padding constant.  This test proves that equals the exact subset
computation.
"""

import numpy as np
import jax
import jax.numpy as jnp

from svgpvae_tpu import linalg
from svgpvae_tpu.gp.exact import gp_regression_1d

RNG = np.random.RandomState(4)


def test_masked_noise_lml_equals_subset_lml():
    T, n_ctx, lt = 12, 5, 2.0
    big = 1e10

    t = np.arange(T, dtype=np.float64)
    y = RNG.randn(T)
    vy = RNG.rand(T) + 0.1
    perm = RNG.permutation(T)
    ctx = perm[:n_ctx]

    # exact subset marginal likelihood
    exact = gp_regression_1d(
        jnp.asarray(t[ctx])[None], jnp.asarray(y[ctx])[None],
        jnp.asarray(vy[ctx])[None], jnp.asarray(t[ctx])[None], lt)
    want = float(exact.log_marginal[0])

    # masked-noise version over ALL T points
    vy_masked = np.full(T, big)
    vy_masked[ctx] = vy[ctx]
    masked = gp_regression_1d(
        jnp.asarray(t)[None], jnp.asarray(y)[None],
        jnp.asarray(vy_masked)[None], jnp.asarray(t)[None], lt)
    pad = -0.5 * (T - n_ctx) * (np.log(big) + linalg.LOG_2PI)
    got = float(masked.log_marginal[0]) - pad

    np.testing.assert_allclose(got, want, rtol=1e-6)
