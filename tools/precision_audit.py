"""Precision audit: float32 (TPU-native) vs float64 ELBO values.

The reference runs its MNIST-family math in float64; this framework's
formula-level parity is proven by the test suite against naive dense
float64 implementations (rtol ~1e-6).  This tool quantifies the remaining
PRECISION gap of running the same formulas in float32: it evaluates every
ELBO family on identical random fixtures under both dtypes and prints the
relative differences of each term.

Run on CPU:  JAX_PLATFORMS=cpu python tools/precision_audit.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from svgpvae_tpu import gp as gpm  # noqa: E402
from svgpvae_tpu.gp.svgp import SVGPConfig  # noqa: E402

RNG = np.random.RandomState(0)


def rel(a, b):
    """max |a-b| normalized by the magnitude scale of b (entrywise relative
    error is meaningless for arrays whose entries cross zero)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12))


def audit_svgp(titsias: bool):
    b, L, M, m, n_obj, N = 256, 16, 8, 32, 400, 4050
    ip = np.hstack([np.arange(m)[:, None], RNG.rand(m, 1) * 2 * np.pi,
                    RNG.randn(m, M)])
    ov = RNG.randn(n_obj, M)
    aux = np.hstack([RNG.randint(0, n_obj, (b, 1)).astype(float),
                     RNG.rand(b, 1) * 2 * np.pi, RNG.randn(b, M)])
    y = RNG.randn(b, L)
    noise = RNG.rand(b, L) + 0.3

    results = {}
    for dtype in (jnp.float32, jnp.float64):
        cfg = SVGPConfig(titsias=titsias, jitter=1e-6, N_train=N)
        gp = gpm.init_mnist_svgp(ip, ov, config=cfg, dtype=dtype)
        p_m, p_v, mu_hat, A_hat = gpm.posterior_params(
            gp, jnp.asarray(aux, dtype), jnp.asarray(aux, dtype),
            jnp.asarray(y, dtype), jnp.asarray(noise, dtype))
        sums, kls = gpm.variational_loss(
            gp, jnp.asarray(aux, dtype), jnp.asarray(y, dtype),
            jnp.asarray(noise, dtype), mu_hat, A_hat)
        results[dtype] = dict(p_m=p_m, p_v=p_v, sum=jnp.sum(sums),
                              kl=jnp.sum(kls))
    name = "Titsias" if titsias else "Hensman"
    f32, f64 = results[jnp.float32], results[jnp.float64]
    print(f"SVGP-{name}: posterior mean rel {rel(f32['p_m'], f64['p_m']):.2e}"
          f", posterior var rel {rel(f32['p_v'], f64['p_v']):.2e}"
          f", sum-term rel {rel(f32['sum'], f64['sum']):.2e}"
          f", KL rel {rel(f32['kl'], f64['kl']):.2e}")


def audit_gp1d():
    batch, n = 35, 30
    x = np.tile(np.arange(1.0, n + 1)[None], (batch, 1))
    y = RNG.randn(batch, n)
    vy = RNG.rand(batch, n) + 0.1
    outs = {}
    for dtype in (jnp.float32, jnp.float64):
        post = gpm.gp_regression_1d(jnp.asarray(x, dtype),
                                    jnp.asarray(y, dtype),
                                    jnp.asarray(vy, dtype),
                                    jnp.asarray(x, dtype), 2.0)
        outs[dtype] = post
    print(f"exact GP-1D: mean rel "
          f"{rel(outs[jnp.float32].mean, outs[jnp.float64].mean):.2e}, "
          f"lml rel {rel(outs[jnp.float32].log_marginal, outs[jnp.float64].log_marginal):.2e}")


if __name__ == "__main__":
    audit_svgp(titsias=False)
    audit_svgp(titsias=True)
    audit_gp1d()
