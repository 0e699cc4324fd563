"""GECO constrained-optimization helpers.

The GECO update itself lives inside the forward pass (models.svgpvae):
  recon = sum_b(mean_px_sq_err - kappa^2)
  C_ma' = alpha_eff * C_ma + (1 - alpha_eff) * recon / b
  objective = -KL + lambda * (recon/b + stop_grad(C_ma' - recon/b))
  lambda' = lambda * exp(C_ma')
(reference: SVGPVAE_model.py:908-915).

The reference special-cases the very first step with alpha = 0 so the
moving average is seeded by the first batch (MNIST_experiment.py:329-333,
SPRITES_experiment.py:376-398).  Inside a jitted step that Python branch
becomes the branchless select below.
"""

from __future__ import annotations

import jax.numpy as jnp


def geco_effective_alpha(step, alpha):
    """alpha at `step`: 0 on the first step, `alpha` afterwards."""
    return jnp.where(step == 0, jnp.zeros_like(jnp.asarray(alpha)), alpha)
