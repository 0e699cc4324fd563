"""Component-level follow-up to probe_titsias_pallas.py (r5 wave 4).

The block-level probe showed titsias_fwd pallas 1.93 ms vs chol 1.67,
while hensman rejitter+pallas runs 0.92 — despite both pallas branches
making the same two chol_inverse launches ((L+1)=65 and (L)=64 stacks of
(m, m)=(72, 72)).  This probe times each constituent in isolation to
localize the anomaly: the GJ launches themselves, the two gp_stats
sufficient-statistic builds, and the big downstream einsums.
Run on the chip: python tools/probe_titsias_pallas2.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import linalg
    from svgpvae_tpu.ops.chol_inverse import chol_inverse
    from svgpvae_tpu.ops.gp_stats import gp_stats

    R = np.random.RandomState(0)
    b, L, m = 500, 64, 72
    A = R.randn(L + 1, m, m)
    A = A @ np.transpose(A, (0, 2, 1)) + 5 * np.eye(m)
    A65 = jnp.asarray(A, jnp.float32)
    A64 = A65[1:]
    Knm = jnp.asarray(R.randn(b, m), jnp.float32)
    prec = jnp.asarray(R.rand(b, L) + 0.5, jnp.float32)
    y = jnp.asarray(R.randn(b, L), jnp.float32)
    Sinv = jnp.asarray(
        np.linalg.inv(A[1:]).astype(np.float32))          # (L, m, m)
    r = jnp.asarray(R.randn(L, m), jnp.float32)

    def scan_time(body, c0, reps=100, warmup=2):
        @jax.jit
        def run(c0):
            def step(c, _):
                return body(c), 0.0
            c, _ = jax.lax.scan(step, c0, None, length=reps)
            return c
        for _ in range(warmup):
            float(jnp.sum(run(c0)))
        t0 = time.perf_counter()
        float(jnp.sum(run(c0)))
        return (time.perf_counter() - t0) / reps * 1e3

    out = {"config": f"b={b} L={L} m={m}"}

    # 1) a single GJ launch, 65- and 64-stacks (fwd only)
    def inv65(c):
        Minv, ld = chol_inverse(A65 + 1e-6 * c[0, 0] * jnp.eye(m))
        return c + 1e-9 * (jnp.sum(Minv) + jnp.sum(ld))
    def inv64(c):
        Minv, ld = chol_inverse(A64 + 1e-6 * c[0, 0] * jnp.eye(m))
        return c + 1e-9 * (jnp.sum(Minv) + jnp.sum(ld))
    def inv_both(c):
        M1, l1 = chol_inverse(A65 + 1e-6 * c[0, 0] * jnp.eye(m))
        M2, l2 = chol_inverse(A64 + 1e-6 * c[0, 0] * jnp.eye(m))
        return c + 1e-9 * (jnp.sum(M1) + jnp.sum(l1)
                           + jnp.sum(M2) + jnp.sum(l2))
    def inv129(c):
        M1, l1 = chol_inverse(jnp.concatenate(
            [A65, A64]) + 1e-6 * c[0, 0] * jnp.eye(m))
        return c + 1e-9 * (jnp.sum(M1) + jnp.sum(l1))
    c0 = jnp.ones((m, m), jnp.float32)
    with jax.default_matmul_precision("highest"):
        out["gj_65"] = round(scan_time(inv65, c0), 4)
        out["gj_64"] = round(scan_time(inv64, c0), 4)
        out["gj_65_plus_64"] = round(scan_time(inv_both, c0), 4)
        try:
            out["gj_129"] = round(scan_time(inv129, c0, reps=20), 4)
        except Exception as e:
            out["gj_129"] = f"{type(e).__name__}: {str(e)[:120]}"

        # 2) batched cholesky of the 129-stack (the chol-branch anchor)
        def chol129(c):
            M = jnp.concatenate([A65, A64]) + 1e-6 * c[0, 0] * jnp.eye(m)
            ch = jnp.linalg.cholesky(M)
            return c + 1e-9 * jnp.sum(ch)
        out["chol_129"] = round(scan_time(chol129, c0), 4)

        # 3) gp_stats once vs twice
        def stats1(c):
            contrib, rr = gp_stats(Knm + 1e-9 * c[0, :m], prec, prec * y)
            return c + 1e-9 * (jnp.sum(contrib) + jnp.sum(rr))
        def stats2(c):
            c1, r1 = gp_stats(Knm + 1e-9 * c[0, :m], prec, prec * y)
            c2, r2 = gp_stats(Knm + 1e-9 * c[0, :m], prec, prec * y + 1.0)
            return c + 1e-9 * (jnp.sum(c1) + jnp.sum(r1)
                               + jnp.sum(c2) + jnp.sum(r2))
        out["gp_stats_x1"] = round(scan_time(stats1, c0), 4)
        out["gp_stats_x2"] = round(scan_time(stats2, c0), 4)

        # 4) the big downstream einsums (shared shapes)
        def eins(c):
            sir = jnp.einsum("lmp,lp->lm", Sinv, r)
            SigInv_Kmn = jnp.einsum("lmp,bp->lmb", Sinv, Knm)
            sq = jnp.einsum("bm,lmb->bl", Knm, SigInv_Kmn)
            return c + 1e-9 * (jnp.sum(sir) + jnp.sum(sq))
        out["einsums"] = round(scan_time(eins, c0), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
