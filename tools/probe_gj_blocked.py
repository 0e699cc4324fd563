"""On-chip A/B of the Gauss-Jordan inverse kernels (r5 wave 4).

Times chol_inverse_pallas at the two production shapes — the SPRITES
(L+1)=65-stack of (72, 72) and the MNIST north-star 17-stack of
(32, 32) — for the scalar kernel (block=1) and the blocked kernel
(block=8) with the VPU-broadcast update.  The batched-MXU "dot" update
is gated behind --dot because its Mosaic compile has hung the remote
tunnel before; run it in its own process.

Run on the chip: python tools/probe_gj_blocked.py [--dot]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dot", action="store_true",
                   help="time ONLY the blocked 'dot' update strategy")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from svgpvae_tpu.ops.chol_inverse import chol_inverse_pallas

    R = np.random.RandomState(0)

    def psd(B, m):
        A = R.randn(B, m, m)
        return jnp.asarray(A @ np.transpose(A, (0, 2, 1)) + m * np.eye(m),
                           jnp.float32)

    def scan_time(B, m, block, update, reps=100, warmup=2):
        M0 = psd(B, m)
        eye = jnp.eye(m, dtype=jnp.float32)

        @jax.jit
        def run(c0):
            def step(c, _):
                inv, ld = chol_inverse_pallas(
                    M0 + 1e-6 * c[0, 0] * eye, block=block, update=update)
                return c + 1e-9 * (jnp.sum(inv) + jnp.sum(ld)) * eye, 0.0
            c, _ = jax.lax.scan(step, c0, None, length=reps)
            return c
        c0 = jnp.ones((m, m), jnp.float32)
        for _ in range(warmup):
            float(jnp.sum(run(c0)))
        t0 = time.perf_counter()
        float(jnp.sum(run(c0)))
        return round((time.perf_counter() - t0) / reps * 1e3, 4)

    out = {"device": jax.devices()[0].device_kind}
    shapes = [(65, 72), (17, 32)]
    variants = ([("blocked_dot", 8, "dot")] if args.dot else
                [("scalar", 1, "bcast"), ("blocked_bcast", 8, "bcast")])
    for B, m in shapes:
        for name, block, update in variants:
            key = f"{name}_B{B}_m{m}"
            try:
                out[key] = scan_time(B, m, block, update)
            except Exception as e:
                out[key] = f"{type(e).__name__}: {str(e)[:160]}"
            print(f"# {key}: {out[key]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
