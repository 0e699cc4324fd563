"""Train-step component breakdowns (VERDICT r1 item 4 / r2 item 2).

Workloads (--workload):
  mnist    north-star MNIST SVGPVAE-Hensman GECO step (b=256, L=16, M=8,
           m=32) — the round-2 breakdown, kept for regression comparison.
  sprites  reference-scale SPRITES step (b=500, 64x64x3, L=64, m=72,
           L_action=8, L_character=16, repr net in the pass) — the
           conv-dominated workload (21.9 GFLOP/step) the MNIST
           latency-bound conclusion does not cover.

Each component is timed as a dispatch-free lax.scan program, so the
measurement is device compute, not tunnel round-trips:

  repr_fwd      (sprites) character-style repr net on the batch
  encoder_fwd   conv encoder (images -> qnet mu/var)
  decoder_fwd   conv decoder (latents -> images)
  gp_fwd        posterior_params + variational_loss + cross-entropy
  loss_fwd      the whole forward pass
  loss_fwd_bwd  value_and_grad of the loss
  full_step     fwd+bwd + Adam update (== the trained step)
  full_step_bf16 (sprites) same step with conv nets in bfloat16

Each scanned body perturbs its input by carry*1e-30 and folds its output
back into the carry, which defeats XLA's loop-invariant code motion
without changing the numerics measurably.

The mnist workload also probes the Pallas fused sufficient-stats kernel
vs plain XLA at TRAINING shapes (n=256/4050, m=32) — the data behind the
gp_stats dispatch thresholds (ops/gp_stats.py:_MIN_N/_MIN_M).

Writes PROFILE_r03_<workload>.json at the repo root and prints it.
"""

from __future__ import annotations

import argparse
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


def time_components(named_bodies, base_reps):
    comps = {}
    for name, body in named_bodies:
        reps = max(base_reps // 2, 10) if name.startswith("full_step") \
            else base_reps
        ms = scan_time(body, reps=reps)
        comps[name] = {"ms": round(ms, 4)}
        print(f"# {name}: {ms:.4f} ms", file=sys.stderr, flush=True)
    return comps


def derive_shares(comps):
    fwd = comps["loss_fwd"]["ms"]
    conv = comps["encoder_fwd"]["ms"] + comps["decoder_fwd"]["ms"]
    if "repr_fwd" in comps:
        conv += comps["repr_fwd"]["ms"]
    comps["shares_of_forward"] = {
        "conv_nets": round(conv / fwd, 3),
        "gp_block": round(comps["gp_fwd"]["ms"] / fwd, 3),
    }
    comps["bwd_over_fwd"] = round(comps["loss_fwd_bwd"]["ms"] / fwd, 2)
    comps["optimizer_ms"] = round(
        comps["full_step"]["ms"] - comps["loss_fwd_bwd"]["ms"], 4)


def mnist_workload(base_reps):
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

    def loss_fn(params, images_, key, C_ma, lam, gp_block_impl="reference"):
        out = models.forward_pass_svgpvae(
            vae, params["vae"], params["gp"], (images_, aux), key,
            beta=0.001, C_ma=C_ma, lagrange_mult=lam, alpha=0.99,
            kappa=kappa, clip_qs=True, geco=True,
            gp_block_impl=gp_block_impl)
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

    # full step with the round-3 fused GP blocks (PARITY #10): the same
    # trained step, GP posterior+ELBO computed one-pass with shared
    # factorizations (fused) / the Pallas inverse megakernel (fused_pallas)
    def full_step_impl_body(c, impl):
        val, grads = jax.value_and_grad(loss_fn)(
            params, images + c * 1e-30, key, jnp.float32(0.0),
            jnp.float32(1.0), gp_block_impl=impl)
        updates, _ = tx.update(grads, opt_state, params)
        new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return (val + sum(jnp.sum(x) for x in
                          jax.tree_util.tree_leaves(new))) * 1e-30

    # Titsias full step per impl: the dense two-pass bound (O(L b^3)
    # covariance Cholesky) vs the determinant-lemma/Woodbury bound
    # (PARITY #12).  Timed at the random init (both are numerically
    # healthy there; the dense path's divergence needs trained params)
    gp_t = gp.replace(config=gp.config.replace(titsias=True))
    params_t = {"vae": vae_params, "gp": gp_t}
    opt_state_t = tx.init(params_t)

    def loss_titsias(params_, images_, key, gp_block_impl):
        out = models.forward_pass_svgpvae(
            vae, params_["vae"], params_["gp"], (images_, aux), key,
            beta=0.001, C_ma=jnp.float32(0.0),
            lagrange_mult=jnp.float32(1.0), alpha=0.99, kappa=kappa,
            clip_qs=True, geco=False, gp_block_impl=gp_block_impl)
        return -out.elbo

    def titsias_step_body(c, impl):
        val, grads = jax.value_and_grad(loss_titsias)(
            params_t, images + c * 1e-30, key, impl)
        updates, _ = tx.update(grads, opt_state_t, params_t)
        new = jax.tree_util.tree_map(lambda p, u: p + u, params_t, updates)
        return (val + sum(jnp.sum(x) for x in
                          jax.tree_util.tree_leaves(new))) * 1e-30

    named = [("encoder_fwd", enc_body), ("decoder_fwd", dec_body),
             ("gp_fwd", gp_body), ("loss_fwd", fwd_body),
             ("loss_fwd_bwd", fwd_bwd_body), ("full_step", full_step_body),
             ("full_step_fused",
              lambda c: full_step_impl_body(c, "fused")),
             ("titsias_step_dense",
              lambda c: titsias_step_body(c, "reference")),
             ("titsias_step_woodbury",
              lambda c: titsias_step_body(c, "fused"))]
    if jax.default_backend() == "tpu":
        named.append(("full_step_fused_pallas",
                      lambda c: full_step_impl_body(c, "fused_pallas")))
        named.append(("titsias_step_woodbury_pallas",
                      lambda c: titsias_step_body(c, "fused_pallas")))
    comps = time_components(tuple(named), base_reps)
    for k in ("full_step_fused", "full_step_fused_pallas"):
        if k in comps:
            comps[k]["speedup_vs_reference"] = round(
                comps["full_step"]["ms"] / comps[k]["ms"], 3)
    for k in ("titsias_step_woodbury", "titsias_step_woodbury_pallas"):
        if k in comps:
            comps[k]["speedup_vs_dense"] = round(
                comps["titsias_step_dense"]["ms"] / comps[k]["ms"], 3)

    comps["encoder_fwd"]["flops"] = flops_of(
        lambda x: vae.apply(vae_params, x, method=vae.encode), images)
    comps["decoder_fwd"]["flops"] = flops_of(
        lambda z: vae.apply(vae_params, z, method=vae.decode), latents)
    comps["gp_fwd"]["flops"] = flops_of(gp_body, np.float32(0.0))
    comps["loss_fwd"]["flops"] = flops_of(
        lambda x: loss_fn(params, x, key, jnp.float32(0.0),
                          jnp.float32(1.0)), images)
    derive_shares(comps)

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

    # --- full-step A/B of the gp_stats dispatch (round 4): the
    # standalone probe above flipped sign vs the round-2 measurement at
    # n=256 (tunnel-load sensitive), so decide at the level that
    # matters — the production fused_pallas step under each forced
    # dispatch (SVGPVAE_GP_STATS), traced fresh per mode ---
    if jax.default_backend() == "tpu":
        import os as _os
        ab = {}
        for mode in ("xla", "pallas"):
            _os.environ["SVGPVAE_GP_STATS"] = mode
            try:
                ab[f"{mode}_ms"] = round(scan_time(
                    lambda c: full_step_impl_body(c, "fused_pallas"),
                    reps=base_reps), 4)
            finally:
                _os.environ.pop("SVGPVAE_GP_STATS", None)
        ab["pallas_speedup"] = round(ab["xla_ms"] / ab["pallas_ms"], 3)
        comps["full_step_gp_stats_ab"] = ab
        print(f"# full_step gp_stats A/B: {ab}", file=sys.stderr,
              flush=True)

    return {"config": f"b={b}, L={L}, M={M}, m={m} (north-star)",
            "components": comps,
            "sufficient_stats_training_shapes": pallas_rows}


def sprites_workload(base_reps):
    """SPRITES reference-scale step (SPRITES_experiment.py:33-39 constants:
    b=500, 1000 chars, 50 frames/char, 72 actions; arch VAE_utils.py:275-391)."""
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu import linalg, models, nn as nets, train
    from svgpvae_tpu.gp.svgp import SVGPConfig

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    b = int(os.environ.get("PROFILE_B", "500"))  # smoke-test override
    L, L_act, L_char = 64, 8, 16
    n_actions, m_char, fpc, N_train = 72, 1, 50, 50000
    m = n_actions * m_char

    frames = jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32)
    action_ids = jnp.asarray(
        np.tile(rng.permutation(n_actions)[:fpc], b // fpc).astype(float),
        jnp.float32)
    latents = jnp.asarray(rng.randn(b, L), jnp.float32)
    mu0 = jnp.asarray(rng.randn(b, L), jnp.float32)
    var0 = jnp.asarray(rng.rand(b, L) + 0.5, jnp.float32)
    aux0 = jnp.asarray(np.hstack([
        rng.randint(0, n_actions, (b, 1)).astype(float),
        rng.randn(b, L_char)]), jnp.float32)

    gp = gpm.init_sprites_svgp(
        rng.randn(m, L_act + L_char), rng.randn(n_actions, L_act),
        L_action=L_act, use_se_kernel=False,
        config=SVGPConfig(jitter=1e-2, N_train=N_train))

    def build(dtype):
        vae = nets.SpritesVAE(L=L, dtype=dtype)
        repr_net = nets.SpritesReprNet(L=L_char, dtype=dtype)
        vae_params = vae.init(key, jnp.zeros((2, 64, 64, 3)))
        repr_params = repr_net.init(key, jnp.zeros((2, 64, 64, 3)))
        params = {"vae": vae_params, "repr": repr_params, "gp": gp}
        kappa = float(np.sqrt(0.0075))

        def loss_fn(params, frames_, key, C_ma, lam):
            out = models.forward_pass_svgpvae(
                vae, params["vae"], params["gp"], (frames_, action_ids),
                key, beta=0.001, C_ma=C_ma, lagrange_mult=lam, alpha=0.99,
                kappa=kappa, clip_qs=True, geco=True,
                repr_apply=repr_net.apply, repr_params=params["repr"],
                frames_per_char=fpc)
            return out.elbo

        return vae, repr_net, params, loss_fn

    vae, repr_net, params, loss_fn = build(jnp.float32)
    tx = train.make_optimizer(1e-3)
    opt_state = tx.init(params)

    def repr_body(c):
        emb = repr_net.apply(params["repr"], frames + c * 1e-30)
        return jnp.sum(emb) * 1e-30

    def enc_body(c):
        mu, var = vae.apply(params["vae"], frames + c * 1e-30,
                            method=vae.encode)
        return jnp.sum(mu) * 1e-30

    def dec_body(c):
        out = vae.apply(params["vae"], latents + c * 1e-30,
                        method=vae.decode)
        return jnp.sum(out) * 1e-30

    def gp_body(c):
        mu = mu0 + c * 1e-30
        p_m, p_v, mu_hat, A_hat = gpm.posterior_params(gp, aux0, aux0, mu,
                                                       var0)
        s, k = gpm.variational_loss(gp, aux0, mu, var0, mu_hat, A_hat)
        ce = jnp.sum(linalg.gauss_cross_entropy(
            p_m, jnp.maximum(p_v, 1e-6), mu, var0))
        return (jnp.sum(s) + jnp.sum(k) + ce) * 1e-30

    def fwd_body(c):
        return loss_fn(params, frames + c * 1e-30, key,
                       jnp.float32(0.0), jnp.float32(1.0)) * 1e-30

    def fwd_bwd_body(c):
        val, grads = jax.value_and_grad(loss_fn)(
            params, frames + c * 1e-30, key, jnp.float32(0.0),
            jnp.float32(1.0))
        return (val + sum(jnp.sum(g) for g in
                          jax.tree_util.tree_leaves(grads))) * 1e-30

    def make_full_step(loss_fn_, params_):
        def full_step_body(c):
            val, grads = jax.value_and_grad(loss_fn_)(
                params_, frames + c * 1e-30, key, jnp.float32(0.0),
                jnp.float32(1.0))
            updates, _ = tx.update(grads, opt_state, params_)
            new = jax.tree_util.tree_map(lambda p, u: p + u, params_,
                                         updates)
            return (val + sum(jnp.sum(x) for x in
                              jax.tree_util.tree_leaves(new))) * 1e-30
        return full_step_body

    # ---- backward decomposition (VERDICT r3 item 3: the backward is
    # ~69% of the step and was unexamined).  Per-component fwd+bwd
    # probes (grad wrt the component's own params), then a layer-level
    # decoder table: the decoder backward is the dominant share and its
    # cost is resolution-dependent (conv at 64x64 does 16x the pixels of
    # 16x16), so per-resolution conv probes name where it goes.
    def grad_wrt(apply_fn, p, x):
        def body(c):
            g = jax.grad(lambda pp: jnp.sum(apply_fn(pp, x + c * 1e-30)))(p)
            return sum(jnp.sum(v) for v in
                       jax.tree_util.tree_leaves(g)) * 1e-30
        return body

    repr_bwd_body = grad_wrt(
        lambda p, x: repr_net.apply(p, x), params["repr"], frames)
    enc_bwd_body = grad_wrt(
        lambda p, x: vae.apply(p, x, method=vae.encode)[0],
        params["vae"], frames)
    dec_bwd_body = grad_wrt(
        lambda p, z: vae.apply(p, z, method=vae.decode),
        params["vae"], latents)

    def gp_bwd_body(c):
        def gp_loss(mu):
            p_m, p_v, mu_hat, A_hat = gpm.posterior_params(gp, aux0, aux0,
                                                           mu, var0)
            s, k = gpm.variational_loss(gp, aux0, mu, var0, mu_hat, A_hat)
            ce = jnp.sum(linalg.gauss_cross_entropy(
                p_m, jnp.maximum(p_v, 1e-6), mu, var0))
            return jnp.sum(s) + jnp.sum(k) + ce
        g = jax.grad(gp_loss)(mu0 + c * 1e-30)
        return jnp.sum(g) * 1e-30

    # per-resolution decoder conv probes: one Conv(16,3x3) fwd+bwd at
    # each decoder feature-map size, plus the upsample and output conv
    f = 16
    import flax.linen as fnn

    def conv_probe_body(res, cin, cout):
        conv = fnn.Conv(cout, (3, 3), padding="SAME")
        x = jnp.asarray(rng.rand(b, res, res, cin), jnp.float32)
        p = conv.init(key, x)

        def body(c):
            g = jax.grad(lambda pp: jnp.sum(
                fnn.elu(conv.apply(pp, x + c * 1e-30))))(p)
            return sum(jnp.sum(v) for v in
                       jax.tree_util.tree_leaves(g)) * 1e-30
        return body

    def conv_probe_nchw_body(res, cin, cout):
        # layout lever (VERDICT r3 item 3): the same Conv(3x3)+elu
        # fwd+bwd with the tensors held feature-major (NCHW) instead of
        # flax's NHWC default, so XLA's layout assignment sees the other
        # canonical ordering.  Grad wrt weights, like conv_probe_body.
        x = jnp.asarray(rng.rand(b, cin, res, res), jnp.float32)
        w = jnp.asarray(rng.randn(cout, cin, 3, 3) / np.sqrt(9 * cin),
                        jnp.float32)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))

        def body(c):
            g = jax.grad(lambda ww: jnp.sum(fnn.elu(
                jax.lax.conv_general_dilated(
                    x + c * 1e-30, ww, (1, 1), "SAME",
                    dimension_numbers=dn))))(w)
            return jnp.sum(g) * 1e-30
        return body

    def upsample_bwd_body(c):
        x = jnp.asarray(rng.rand(b, 32, 32, f), jnp.float32)
        g = jax.grad(lambda xx: jnp.sum(nets.upsample2x(xx)))(x + c * 1e-30)
        return jnp.sum(g) * 1e-30

    def upsample_repeat_bwd_body(c):
        # the pre-round-4 jnp.repeat formulation, kept as the head-to-head
        # baseline for the broadcast+reshape upsample2x
        x = jnp.asarray(rng.rand(b, 32, 32, f), jnp.float32)
        g = jax.grad(lambda xx: jnp.sum(
            jnp.repeat(jnp.repeat(xx, 2, axis=1), 2, axis=2)))(
            x + c * 1e-30)
        return jnp.sum(g) * 1e-30

    comps = time_components(
        (("repr_fwd", repr_body), ("encoder_fwd", enc_body),
         ("decoder_fwd", dec_body), ("gp_fwd", gp_body),
         ("repr_fwd_bwd", repr_bwd_body),
         ("encoder_fwd_bwd", enc_bwd_body),
         ("decoder_fwd_bwd", dec_bwd_body),
         ("gp_fwd_bwd", gp_bwd_body),
         ("dec_conv16_fwd_bwd", conv_probe_body(16, f, f)),
         ("dec_conv32_fwd_bwd", conv_probe_body(32, f, f)),
         ("dec_conv64_fwd_bwd", conv_probe_body(64, f, f)),
         ("dec_out_conv64_fwd_bwd", conv_probe_body(64, f, 3)),
         ("dec_conv64_nchw_fwd_bwd", conv_probe_nchw_body(64, f, f)),
         ("dec_conv32_nchw_fwd_bwd", conv_probe_nchw_body(32, f, f)),
         ("upsample32_bwd", upsample_bwd_body),
         ("upsample32_repeat_bwd", upsample_repeat_bwd_body),
         ("loss_fwd", fwd_body), ("loss_fwd_bwd", fwd_bwd_body),
         ("full_step", make_full_step(loss_fn, params))),
        base_reps)

    comps["repr_fwd"]["flops"] = flops_of(
        lambda x: repr_net.apply(params["repr"], x), frames)
    comps["encoder_fwd"]["flops"] = flops_of(
        lambda x: vae.apply(params["vae"], x, method=vae.encode), frames)
    comps["decoder_fwd"]["flops"] = flops_of(
        lambda z: vae.apply(params["vae"], z, method=vae.decode), latents)
    comps["gp_fwd"]["flops"] = flops_of(gp_body, np.float32(0.0))
    comps["loss_fwd"]["flops"] = flops_of(
        lambda x: loss_fn(params, x, key, jnp.float32(0.0),
                          jnp.float32(1.0)), frames)
    derive_shares(comps)

    # bfloat16 conv nets, same params (flax param_dtype stays float32)
    _, _, params16, loss16 = build(jnp.bfloat16)
    params16 = {**params16, "vae": params["vae"], "repr": params["repr"]}
    ms16 = scan_time(make_full_step(loss16, params16),
                     reps=max(base_reps // 2, 10))
    comps["full_step_bf16"] = {"ms": round(ms16, 4)}
    comps["bf16_step_speedup"] = round(comps["full_step"]["ms"] / ms16, 3)
    print(f"# full_step_bf16: {ms16:.4f} ms", file=sys.stderr, flush=True)

    # ---- backward levers (VERDICT r3 item 3) ----
    # (a) hybrid mixed precision: bf16 trunks, f32 heads (the driver's
    #     --bf16_hybrid) — keeps the precision where it touches the
    #     losses while riding most of the bf16 conv speedup
    vae_h = nets.SpritesVAE(L=L, dtype=jnp.bfloat16,
                            head_dtype=jnp.float32)
    repr_h = nets.SpritesReprNet(L=L_char, dtype=jnp.bfloat16)
    kappa_ = float(np.sqrt(0.0075))

    def loss_hybrid(params_, frames_, key_, C_ma, lam):
        out = models.forward_pass_svgpvae(
            vae_h, params_["vae"], params_["gp"], (frames_, action_ids),
            key_, beta=0.001, C_ma=C_ma, lagrange_mult=lam, alpha=0.99,
            kappa=kappa_, clip_qs=True, geco=True,
            repr_apply=repr_h.apply, repr_params=params_["repr"],
            frames_per_char=fpc)
        return out.elbo

    msh = scan_time(make_full_step(loss_hybrid, params),
                    reps=max(base_reps // 2, 10))
    comps["full_step_bf16_hybrid"] = {
        "ms": round(msh, 4),
        "speedup_vs_f32": round(comps["full_step"]["ms"] / msh, 3)}
    print(f"# full_step_bf16_hybrid: {msh:.4f} ms", file=sys.stderr,
          flush=True)

    # (b) rematerialized loss: trade backward memory/reads for
    #     recompute — on an HBM-bound backward this can WIN
    def remat_step_body(c):
        remat_loss = jax.checkpoint(loss_fn, static_argnums=())
        val, grads = jax.value_and_grad(remat_loss)(
            params, frames + c * 1e-30, key, jnp.float32(0.0),
            jnp.float32(1.0))
        updates, _ = tx.update(grads, opt_state, params)
        new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return (val + sum(jnp.sum(x) for x in
                          jax.tree_util.tree_leaves(new))) * 1e-30

    msr = scan_time(remat_step_body, reps=max(base_reps // 2, 10))
    comps["full_step_remat"] = {
        "ms": round(msr, 4),
        "speedup_vs_f32": round(comps["full_step"]["ms"] / msr, 3)}
    print(f"# full_step_remat: {msr:.4f} ms", file=sys.stderr, flush=True)

    # (d) fused upsample+conv decoder (nn.FusedUpsampleConv2x): EXACT
    #     rewrite of each upsample2x+Conv(SAME) pair as one 2x2 conv at
    #     the pre-upsample resolution with 4x output channels + pixel
    #     shuffle — ~2.1x fewer MACs, 4x MXU lane fill, identical
    #     parameter tree (cli.sprites --fused_upsample)
    vae_fu = nets.SpritesVAE(L=L, fused_upsample=True)
    fu_dec_body = grad_wrt(
        lambda p, z: vae_fu.apply(p, z, method=vae_fu.decode),
        params["vae"], latents)
    msfud = scan_time(fu_dec_body, reps=base_reps)
    comps["decoder_fused_upsample_fwd_bwd"] = {
        "ms": round(msfud, 4),
        "vs_reference_decoder_fwd_bwd": round(
            comps["decoder_fwd_bwd"]["ms"] / msfud, 3)}
    print(f"# decoder_fused_upsample_fwd_bwd: {msfud:.4f} ms",
          file=sys.stderr, flush=True)

    def loss_fused_up(params_, frames_, key_, C_ma, lam):
        out = models.forward_pass_svgpvae(
            vae_fu, params_["vae"], params_["gp"], (frames_, action_ids),
            key_, beta=0.001, C_ma=C_ma, lagrange_mult=lam, alpha=0.99,
            kappa=kappa_, clip_qs=True, geco=True,
            repr_apply=repr_net.apply, repr_params=params_["repr"],
            frames_per_char=fpc)
        return out.elbo

    msfu = scan_time(make_full_step(loss_fused_up, params),
                     reps=max(base_reps // 2, 10))
    comps["full_step_fused_upsample"] = {
        "ms": round(msfu, 4),
        "speedup_vs_f32": round(comps["full_step"]["ms"] / msfu, 3)}
    print(f"# full_step_fused_upsample: {msfu:.4f} ms", file=sys.stderr,
          flush=True)

    # (e) space-to-depth 64x64 stage (nn.S2DConv3x3, --s2d64): every
    #     64x64-resolution conv computed at 32x32 with 4x channels —
    #     EXACT rewrite (tests/test_nn.py::test_sprites_vae_s2d64_parity),
    #     same parameter tree.  4x the MACs at 4x lane fill and 1/4 the
    #     pixels; the round-4 backward profile put ~3.6 ms of the step in
    #     the three 64x64 decoder convs.
    vae_s2d = nets.SpritesVAE(L=L, s2d64=True)
    s2d_dec_body = grad_wrt(
        lambda p, z: vae_s2d.apply(p, z, method=vae_s2d.decode),
        params["vae"], latents)
    mss2d = scan_time(s2d_dec_body, reps=base_reps)
    comps["decoder_s2d_fwd_bwd"] = {
        "ms": round(mss2d, 4),
        "vs_reference_decoder_fwd_bwd": round(
            comps["decoder_fwd_bwd"]["ms"] / mss2d, 3)}
    print(f"# decoder_s2d_fwd_bwd: {mss2d:.4f} ms", file=sys.stderr,
          flush=True)
    s2d_enc_body = grad_wrt(
        lambda p, x: vae_s2d.apply(p, x, method=vae_s2d.encode)[0],
        params["vae"], frames)
    mss2de = scan_time(s2d_enc_body, reps=base_reps)
    comps["encoder_s2d_fwd_bwd"] = {
        "ms": round(mss2de, 4),
        "vs_reference_encoder_fwd_bwd": round(
            comps["encoder_fwd_bwd"]["ms"] / mss2de, 3)}
    print(f"# encoder_s2d_fwd_bwd: {mss2de:.4f} ms", file=sys.stderr,
          flush=True)

    def loss_s2d(params_, frames_, key_, C_ma, lam):
        out = models.forward_pass_svgpvae(
            vae_s2d, params_["vae"], params_["gp"], (frames_, action_ids),
            key_, beta=0.001, C_ma=C_ma, lagrange_mult=lam, alpha=0.99,
            kappa=kappa_, clip_qs=True, geco=True,
            repr_apply=repr_net.apply, repr_params=params_["repr"],
            frames_per_char=fpc)
        return out.elbo

    mss2df = scan_time(make_full_step(loss_s2d, params),
                       reps=max(base_reps // 2, 10))
    comps["full_step_s2d"] = {
        "ms": round(mss2df, 4),
        "speedup_vs_f32": round(comps["full_step"]["ms"] / mss2df, 3)}
    print(f"# full_step_s2d: {mss2df:.4f} ms", file=sys.stderr, flush=True)

    # s2d + bf16 trunks: do the two levers compose?
    vae_s2d16 = nets.SpritesVAE(L=L, dtype=jnp.bfloat16, s2d64=True)
    repr_16 = nets.SpritesReprNet(L=L_char, dtype=jnp.bfloat16)

    def loss_s2d16(params_, frames_, key_, C_ma, lam):
        out = models.forward_pass_svgpvae(
            vae_s2d16, params_["vae"], params_["gp"], (frames_, action_ids),
            key_, beta=0.001, C_ma=C_ma, lagrange_mult=lam, alpha=0.99,
            kappa=kappa_, clip_qs=True, geco=True,
            repr_apply=repr_16.apply, repr_params=params_["repr"],
            frames_per_char=fpc)
        return out.elbo

    mss2d16 = scan_time(make_full_step(loss_s2d16, params),
                        reps=max(base_reps // 2, 10))
    comps["full_step_s2d_bf16"] = {
        "ms": round(mss2d16, 4),
        "speedup_vs_f32": round(comps["full_step"]["ms"] / mss2d16, 3)}
    print(f"# full_step_s2d_bf16: {mss2d16:.4f} ms", file=sys.stderr,
          flush=True)

    # (c) ConvTranspose decoder probe: fuse each upsample+conv pair into
    #     one strided transpose conv (perf shape probe only — different
    #     parameterization, not the reference architecture)
    class _CTDecoder(fnn.Module):
        @fnn.compact
        def __call__(self, z):
            h = fnn.Dense(64 * f)(z).reshape(z.shape[0], 8, 8, f)
            for _ in range(3):
                h = fnn.elu(fnn.ConvTranspose(f, (3, 3),
                                              strides=(2, 2),
                                              padding="SAME")(h))
                h = fnn.elu(fnn.Conv(f, (3, 3), padding="SAME")(h))
            return fnn.elu(fnn.Conv(3, (3, 3), padding="SAME")(h))

    ct = _CTDecoder()
    ct_params = ct.init(key, latents)
    ct_body = grad_wrt(lambda p, z: ct.apply(p, z), ct_params, latents)
    msct = scan_time(ct_body, reps=max(base_reps // 2, 10))
    comps["dec_convtranspose_fwd_bwd"] = {
        "ms": round(msct, 4),
        "vs_reference_decoder_fwd_bwd": round(
            comps["decoder_fwd_bwd"]["ms"] / msct, 3)}
    print(f"# dec_convtranspose_fwd_bwd: {msct:.4f} ms", file=sys.stderr,
          flush=True)

    # channel-width probe (VERDICT r2 item 2): the reference's 16-filter
    # convs fill 16/128 MXU lanes; a 128-filter variant does ~35x the
    # conv FLOPs — if its step time is far below 35x, channel width is
    # the limiter and wide custom models ride nearly free
    wide = nets.SpritesVAE(L=L, filters=128)
    wide_params = {"vae": wide.init(key, jnp.zeros((2, 64, 64, 3))),
                   "repr": params["repr"], "gp": gp}
    kappa = float(np.sqrt(0.0075))

    def loss_wide(params, frames_, key, C_ma, lam):
        out = models.forward_pass_svgpvae(
            wide, params["vae"], params["gp"], (frames_, action_ids),
            key, beta=0.001, C_ma=C_ma, lagrange_mult=lam, alpha=0.99,
            kappa=kappa, clip_qs=True, geco=True,
            repr_apply=repr_net.apply, repr_params=params["repr"],
            frames_per_char=fpc)
        return out.elbo

    tx_w = train.make_optimizer(1e-3)
    opt_w = tx_w.init(wide_params)

    def full_step_wide(c):
        val, grads = jax.value_and_grad(loss_wide)(
            wide_params, frames + c * 1e-30, key, jnp.float32(0.0),
            jnp.float32(1.0))
        updates, _ = tx_w.update(grads, opt_w, wide_params)
        new = jax.tree_util.tree_map(lambda p, u: p + u, wide_params,
                                     updates)
        return (val + sum(jnp.sum(x) for x in
                          jax.tree_util.tree_leaves(new))) * 1e-30

    msw = scan_time(full_step_wide, reps=max(base_reps // 4, 5))
    flops_w = flops_of(
        lambda x: loss_wide(wide_params, x, key, jnp.float32(0.0),
                            jnp.float32(1.0)), frames)
    comps["full_step_wide128"] = {
        "ms": round(msw, 4), "fwd_flops": flops_w,
        "flops_ratio_vs_16": round(flops_w / comps["loss_fwd"]["flops"], 1)
        if flops_w and comps["loss_fwd"].get("flops") else None,
        "time_ratio_vs_16": round(msw / comps["full_step"]["ms"], 2)}
    print(f"# full_step_wide128: {msw:.4f} ms", file=sys.stderr,
          flush=True)

    # fused upsample+conv on the wide axis: at reference scale (16
    # filters, bandwidth-bound) the exact rewrite measured 0.98x; its
    # documented prediction (nn/nets.py, docs/cli.md) is a win where the
    # decoder convs are MAC-bound.  filters=128 is that regime — same
    # parameter tree, so wide_params is reused verbatim.
    wide_fu = nets.SpritesVAE(L=L, filters=128, fused_upsample=True)

    def loss_wide_fu(params, frames_, key, C_ma, lam):
        out = models.forward_pass_svgpvae(
            wide_fu, params["vae"], params["gp"], (frames_, action_ids),
            key, beta=0.001, C_ma=C_ma, lagrange_mult=lam, alpha=0.99,
            kappa=kappa, clip_qs=True, geco=True,
            repr_apply=repr_net.apply, repr_params=params["repr"],
            frames_per_char=fpc)
        return out.elbo

    def full_step_wide_fu(c):
        val, grads = jax.value_and_grad(loss_wide_fu)(
            wide_params, frames + c * 1e-30, key, jnp.float32(0.0),
            jnp.float32(1.0))
        updates, _ = tx_w.update(grads, opt_w, wide_params)
        new = jax.tree_util.tree_map(lambda p, u: p + u, wide_params,
                                     updates)
        return (val + sum(jnp.sum(x) for x in
                          jax.tree_util.tree_leaves(new))) * 1e-30

    mswf = scan_time(full_step_wide_fu, reps=max(base_reps // 4, 5))
    comps["full_step_wide128_fusedup"] = {
        "ms": round(mswf, 4),
        "speedup_vs_wide128": round(msw / mswf, 3)}
    print(f"# full_step_wide128_fusedup: {mswf:.4f} ms "
          f"({msw / mswf:.3f}x vs plain wide128)", file=sys.stderr,
          flush=True)

    return {"config": f"b={b}, 64x64x3, L={L}, m={m}, L_action={L_act}, "
                      f"L_character={L_char} (reference scale)",
            "components": comps}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workload", choices=["mnist", "sprites"],
                   default="mnist")
    args = p.parse_args()

    import jax
    base_reps = int(os.environ.get("PROFILE_REPS", "200"))
    if args.workload == "sprites":
        base_reps = min(base_reps, 50)  # ~10 ms/step; keep programs short
        out = sprites_workload(base_reps)
    else:
        out = mnist_workload(base_reps)
    out = {"device": jax.devices()[0].device_kind, **out}
    path = os.path.join(ROOT, f"PROFILE_r04_{args.workload}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
