"""North-star train-step breakdown (VERDICT r1 item 4 / SURVEY §7 step 8).

Times each component of the MNIST SVGPVAE-Hensman GECO step (batch 256,
L=16, M=8, m=32) as a dispatch-free lax.scan program, so the measurement
is device compute, not tunnel round-trips:

  encoder_fwd   conv encoder (images -> qnet mu/var)
  decoder_fwd   conv decoder (latents -> images)
  gp_fwd        posterior_params + variational_loss + cross-entropy
  loss_fwd      the whole forward pass
  loss_fwd_bwd  value_and_grad of the loss
  full_step     fwd+bwd + Adam update (== the trained step)

Each scanned body perturbs its input by carry*1e-30 and folds its output
back into the carry, which defeats XLA's loop-invariant code motion
without changing the numerics measurably.

Also probes the Pallas fused sufficient-stats kernel vs plain XLA at
TRAINING shapes (n=256/4050, m=32) — the data behind the gp_stats
dispatch thresholds (ops/gp_stats.py:_MIN_N/_MIN_M).

Writes PROFILE_r02.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def scan_time(body, reps: int = 200, warmup: int = 2):
    """ms per call of `body(carry_scalar) -> carry_scalar`, measured as one
    lax.scan program (no per-call dispatch)."""
    import jax

    @jax.jit
    def run(c0):
        def step(c, _):
            return body(c), None
        return jax.lax.scan(step, c0, None, length=reps)[0]

    c = run(np.float32(0.0))
    for _ in range(warmup - 1):
        c = run(c)
    float(c)  # force
    t0 = time.perf_counter()
    c = run(np.float32(0.0))
    float(c)
    return (time.perf_counter() - t0) / reps * 1e3


def flops_of(fn, *args):
    import jax
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu import linalg, models, nn as nets, train
    from svgpvae_tpu.gp.svgp import SVGPConfig
    from svgpvae_tpu.ops import gp_stats as ops

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    b, L, M, m, n_obj, N_train = 256, 16, 8, 32, 400, 4050

    vae = nets.MnistVAE(L=L)
    vae_params = vae.init(key, jnp.zeros((b, 28, 28, 1)))
    ip = np.hstack([np.arange(m)[:, None], rng.rand(m, 1) * 2 * np.pi,
                    rng.randn(m, M)])
    gp = gpm.init_mnist_svgp(ip, rng.randn(n_obj, M),
                             config=SVGPConfig(jitter=1e-6, N_train=N_train))
    images = jnp.asarray(rng.rand(b, 28, 28, 1), jnp.float32)
    aux = jnp.asarray(np.hstack([
        rng.randint(0, n_obj, (b, 1)).astype(float),
        rng.rand(b, 1) * 2 * np.pi, rng.randn(b, M)]), jnp.float32)
    latents = jnp.asarray(rng.randn(b, L), jnp.float32)
    mu0 = jnp.asarray(rng.randn(b, L), jnp.float32)
    var0 = jnp.asarray(rng.rand(b, L) + 0.5, jnp.float32)
    params = {"vae": vae_params, "gp": gp}
    kappa = float(np.sqrt(0.02))

    def loss_fn(params, images_, key, C_ma, lam):
        out = models.forward_pass_svgpvae(
            vae, params["vae"], params["gp"], (images_, aux), key,
            beta=0.001, C_ma=C_ma, lagrange_mult=lam, alpha=0.99,
            kappa=kappa, clip_qs=True, geco=True)
        return out.elbo

    tx = train.make_optimizer(1e-3)
    opt_state = tx.init(params)

    # --- component bodies (carry c keeps the loop un-hoistable) ---
    def enc_body(c):
        mu, var = vae.apply(vae_params, images + c * 1e-30,
                            method=vae.encode)
        return jnp.sum(mu) * 1e-30

    def dec_body(c):
        out = vae.apply(vae_params, latents + c * 1e-30, method=vae.decode)
        return jnp.sum(out) * 1e-30

    def gp_body(c):
        mu = mu0 + c * 1e-30
        p_m, p_v, mu_hat, A_hat = gpm.posterior_params(gp, aux, aux, mu,
                                                       var0)
        s, k = gpm.variational_loss(gp, aux, mu, var0, mu_hat, A_hat)
        ce = jnp.sum(linalg.gauss_cross_entropy(
            p_m, jnp.maximum(p_v, 1e-6), mu, var0))
        return (jnp.sum(s) + jnp.sum(k) + ce) * 1e-30

    def fwd_body(c):
        return loss_fn(params, images + c * 1e-30, key,
                       jnp.float32(0.0), jnp.float32(1.0)) * 1e-30

    def fwd_bwd_body(c):
        val, grads = jax.value_and_grad(loss_fn)(
            params, images + c * 1e-30, key, jnp.float32(0.0),
            jnp.float32(1.0))
        return (val + sum(jnp.sum(g) for g in
                          jax.tree_util.tree_leaves(grads))) * 1e-30

    def full_step_body(c):
        val, grads = jax.value_and_grad(loss_fn)(
            params, images + c * 1e-30, key, jnp.float32(0.0),
            jnp.float32(1.0))
        updates, _ = tx.update(grads, opt_state, params)
        new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return (val + sum(jnp.sum(x) for x in
                          jax.tree_util.tree_leaves(new))) * 1e-30

    base_reps = int(os.environ.get("PROFILE_REPS", "200"))
    comps = {}
    for name, body in (("encoder_fwd", enc_body), ("decoder_fwd", dec_body),
                       ("gp_fwd", gp_body), ("loss_fwd", fwd_body),
                       ("loss_fwd_bwd", fwd_bwd_body),
                       ("full_step", full_step_body)):
        ms = scan_time(body, reps=max(base_reps // 2, 10)
                       if name == "full_step" else base_reps)
        comps[name] = {"ms": round(ms, 4)}
        print(f"# {name}: {ms:.4f} ms", file=sys.stderr, flush=True)

    comps["encoder_fwd"]["flops"] = flops_of(
        lambda x: vae.apply(vae_params, x, method=vae.encode), images)
    comps["decoder_fwd"]["flops"] = flops_of(
        lambda z: vae.apply(vae_params, z, method=vae.decode), latents)
    comps["gp_fwd"]["flops"] = flops_of(gp_body, np.float32(0.0))
    comps["loss_fwd"]["flops"] = flops_of(
        lambda x: loss_fn(params, x, key, jnp.float32(0.0),
                          jnp.float32(1.0)), images)

    fwd = comps["loss_fwd"]["ms"]
    comps["shares_of_forward"] = {
        "conv_nets": round((comps["encoder_fwd"]["ms"]
                            + comps["decoder_fwd"]["ms"]) / fwd, 3),
        "gp_block": round(comps["gp_fwd"]["ms"] / fwd, 3),
    }
    comps["bwd_over_fwd"] = round(
        comps["loss_fwd_bwd"]["ms"] / fwd, 2)
    comps["optimizer_ms"] = round(
        comps["full_step"]["ms"] - comps["loss_fwd_bwd"]["ms"], 4)

    # --- Pallas vs XLA sufficient-stats at training shapes ---
    pallas_rows = {}
    for n in (256, 4050):
        Knm = jnp.asarray(rng.rand(n, m), jnp.float32)
        prec = jnp.asarray(rng.rand(n, L) + 0.5, jnp.float32)
        py = jnp.asarray(rng.randn(n, L), jnp.float32)

        def xla_body(c, Knm=Knm, prec=prec, py=py):
            s, r = ops.gp_sufficient_stats_reference(Knm + c * 1e-30, prec,
                                                     py)
            return (jnp.sum(s) + jnp.sum(r)) * 1e-30

        row = {"xla_ms": round(scan_time(xla_body, reps=base_reps), 4)}
        if jax.default_backend() == "tpu":
            def pl_body(c, Knm=Knm, prec=prec, py=py):
                s, r = ops.gp_sufficient_stats(Knm + c * 1e-30, prec, py)
                return (jnp.sum(s) + jnp.sum(r)) * 1e-30

            row["pallas_ms"] = round(scan_time(pl_body, reps=base_reps), 4)
            row["pallas_speedup"] = round(row["xla_ms"] / row["pallas_ms"],
                                          3)
        pallas_rows[f"n={n},m={m},L={L}"] = row
        print(f"# stats {n}x{m}: {row}", file=sys.stderr, flush=True)

    out = {"device": jax.devices()[0].device_kind,
           "config": f"b={b}, L={L}, M={M}, m={m} (north-star)",
           "components": comps,
           "sufficient_stats_training_shapes": pallas_rows}
    with open(os.path.join(ROOT, "PROFILE_r02.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
