"""Benchmark: SVGPVAE training throughput on the north-star config.

Measures the jitted EPOCH runner (lax.scan over a device-resident
pre-batched dataset — the TPU-native training mode, svgpvae_tpu.train.
make_epoch_fn) for the paper's main workload: rotated-MNIST SVGPVAE,
Hensman bound, GECO, batch 256, L=16, M=8, m=32 inducing points
(MNIST_experiment.py defaults :1128-1158).  Prints ONE JSON line.

Timing notes: this environment's TPU tunnel does not implement
block_until_ready faithfully, so the loop materializes the final scalar
metric on the host to force the full execution chain before reading the
clock.

vs_baseline compares against the reference's CPU step time for the same
config.  TF1.15 cannot run in this image, so tools/baseline_torch.py
re-creates the reference's step as written (float64, per-channel loops,
explicit inverses, GECO) in torch on this machine's CPU and stores the
measured time in BASELINE_MEASURED.json; the pinned constant below is the
fallback when that file is absent.  The north-star target is >=5x the
reference CPU baseline (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_TF_CPU_STEP_SEC = 0.62  # estimate; superseded by measurement


def _baseline_step_sec() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["cpu_step_sec"])
    return REFERENCE_TF_CPU_STEP_SEC


def _watchdog(seconds: int = 480):
    """The TPU tunnel in this environment can wedge (remote grant stuck);
    a hung bench is worse than a marked-stale result.  On timeout, print
    the last successful measurement flagged as stale, or a zero-value
    failure line, then exit."""
    import signal

    def on_timeout(signum, frame):
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_LAST_GOOD.json")
        if os.path.exists(path):
            with open(path) as f:
                last = json.load(f)
            last["stale_from_previous_run"] = True
            print(json.dumps(last), flush=True)
        else:
            print(json.dumps({
                "metric": "svgpvae_mnist_geco_train_steps_per_sec",
                "value": 0.0, "unit": "steps/s (device unavailable)",
                "vs_baseline": 0.0}), flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_timeout)
    signal.alarm(seconds)


def main() -> None:
    _watchdog()
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu import models, nn as nets, train
    from svgpvae_tpu.gp.svgp import SVGPConfig

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    # north-star sizes; one epoch = 15 full batches of the N_train=4050 set
    b, L, M, m, n_obj, N_train, n_batches = 256, 16, 8, 32, 400, 4050, 15

    vae = nets.MnistVAE(L=L)
    vae_params = vae.init(key, jnp.zeros((b, 28, 28, 1)))
    ip = np.hstack([np.arange(m)[:, None], rng.rand(m, 1) * 2 * np.pi,
                    rng.randn(m, M)])
    gp = gpm.init_mnist_svgp(ip, rng.randn(n_obj, M),
                             config=SVGPConfig(jitter=1e-6, N_train=N_train))

    images = jnp.asarray(rng.rand(n_batches, b, 28, 28, 1), jnp.float32)
    aux = jnp.asarray(np.stack([np.hstack([
        rng.randint(0, n_obj, (b, 1)).astype(float),
        rng.rand(b, 1) * 2 * np.pi, rng.randn(b, M)])
        for _ in range(n_batches)]), jnp.float32)
    batches = (images, aux)

    params = {"vae": vae_params, "gp": gp}
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
    epoch_fn = train.make_epoch_fn(loss_fn, tx, donate=True)

    # warmup / compile; materialize to force execution
    state, metrics = epoch_fn(state, batches)
    float(metrics["recon"][-1])

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = epoch_fn(state, batches)
    final = float(metrics["recon"][-1])  # forces the whole chain
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final), "training step produced non-finite values"

    steps_per_sec = reps * n_batches / elapsed
    vs_baseline = steps_per_sec * _baseline_step_sec()
    result = {
        "metric": "svgpvae_mnist_geco_train_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s (batch 256, L16, m32, epoch-scan)",
        "vs_baseline": round(vs_baseline, 2),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LAST_GOOD.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
