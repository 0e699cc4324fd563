"""Isolated scan-timed probe: gp_block_titsias chol vs pallas at SPRITES
scale (r5 wave 4 follow-up).

The driver A/B showed Titsias+fused_pallas at ~172 ms/step vs 9.1 ms for
the Cholesky fused impl — a ~19x cliff the kernel math cannot explain
(Hensman's fused_rejitter_pallas makes the SAME two chol_inverse
launches, (L+1)+(L) matrices of (m, m), inside an 8.2 ms step).  This
probe isolates the GP block fwd and fwd+bwd per impl to localize where
the 160 ms goes, plus the Hensman rejitter-pallas block as the sanity
anchor.  Run on the chip: python tools/probe_titsias_pallas.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu.gp.svgp import SVGPConfig

    R = np.random.RandomState(0)
    b, L, m, L_act, L_char, n_act = 500, 64, 72, 8, 16, 72
    gp = gpm.init_sprites_svgp(
        R.normal(0, 1.5, (n_act, L_act + L_char)),
        R.normal(0, 1.5, (n_act, L_act)), L_action=L_act,
        config=SVGPConfig(jitter=1e-6, N_train=50000))
    aux = jnp.asarray(np.hstack([
        R.randint(0, n_act, (b, 1)).astype(float),
        R.randn(b, L_char)]), jnp.float32)
    y = jnp.asarray(R.randn(b, L), jnp.float32)
    noise = jnp.asarray(R.rand(b, L) * 0.01 + 0.1, jnp.float32)

    def scan_time(body, reps=100, warmup=2):
        @jax.jit
        def run(c0):
            def step(c, _):
                return body(c), 0.0
            c, _ = jax.lax.scan(step, c0, None, length=reps)
            return c
        c0 = y
        for _ in range(warmup):
            float(jnp.sum(run(c0)))
        t0 = time.perf_counter()
        float(jnp.sum(run(c0)))
        return (time.perf_counter() - t0) / reps * 1e3

    def tit_fwd(impl):
        def body(c):
            p_m, p_v, l2, kl, mu = gpm.gp_block_titsias(
                gp, aux, c, noise, inverse_impl=impl)
            return c + 1e-9 * (p_m + p_v + jnp.sum(l2) + jnp.sum(mu))
        return body

    def tit_fwd_bwd(impl):
        def loss(c):
            p_m, p_v, l2, kl, mu = gpm.gp_block_titsias(
                gp, aux, c, noise, inverse_impl=impl)
            return jnp.sum(p_m) + jnp.sum(p_v) + jnp.sum(l2) + jnp.sum(mu)
        def body(c):
            v, g = jax.value_and_grad(loss)(c)
            return c + 1e-9 * g + 1e-12 * v
        return body

    def hens_fwd_bwd(impl, kl_impl):
        def loss(c):
            p_m, p_v, s, kl, mu = gpm.gp_block_hensman(
                gp, aux, c, noise, inverse_impl=impl, kl_impl=kl_impl)
            return (jnp.sum(p_m) + jnp.sum(p_v) + jnp.sum(s)
                    + jnp.sum(kl) + jnp.sum(mu))
        def body(c):
            v, g = jax.value_and_grad(loss)(c)
            return c + 1e-9 * g + 1e-12 * v
        return body

    out = {"device": jax.devices()[0].device_kind,
           "config": f"b={b} L={L} m={m} (sprites scale)"}
    probes = [
        ("titsias_fwd_chol", tit_fwd("chol")),
        ("titsias_fwd_pallas", tit_fwd("pallas")),
        ("titsias_fwd_bwd_chol", tit_fwd_bwd("chol")),
        ("titsias_fwd_bwd_pallas", tit_fwd_bwd("pallas")),
        ("hensman_fwd_bwd_rejitter_chol", hens_fwd_bwd("chol",
                                                       "rejitter")),
        ("hensman_fwd_bwd_rejitter_pallas", hens_fwd_bwd("pallas",
                                                         "rejitter")),
    ]
    for name, body in probes:
        try:
            reps = 20 if "pallas" in name and "titsias" in name else 100
            out[name] = round(scan_time(body, reps=reps), 4)
        except Exception as e:  # record compile failures (e.g. vmem OOM)
            out[name] = f"{type(e).__name__}: {str(e)[:200]}"
        print(f"# {name}: {out[name]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
