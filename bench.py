"""Benchmark suite: training throughput + MFU across the three workloads.

Primary metric (the JSON line's headline, unchanged from round 1) is the
north-star config: rotated-MNIST SVGPVAE, Hensman bound, GECO, batch 256,
L=16, M=8, m=32 inducing points (MNIST_experiment.py defaults :1128-1158),
measured on the jitted EPOCH runner (lax.scan over a device-resident
pre-batched dataset — svgpvae_tpu.train.make_epoch_fn).

The `suite` field carries the rest (VERDICT r1 item 3, r2 item 7):
  * mnist_train        — steps/s, ms/step, XLA-counted FLOPs/step, MFU
  * mnist_titsias_train — same shapes on the collapsed-L_T bound (no
                         GECO), guarding the determinant-lemma bound
  * mnist_eval         — the driver's full eval pass group (recon stacks
                         + full-train encode + cgen), ms per pass
  * sprites_train      — SPRITES train step at reference scale
                         (batch 500, 64x64x3, L=64, m=72 IPs)
  * sprites_train_s2d  — same step with the exact space-to-depth
                         64x64-conv rewrite (--s2d64; r4 wave-11 win)
  * sprites_eval       — the SPRITES eval pass (test_character recon +
                         encode + precompute + cgen), ms per pass
  * sprites_precompute — the n=50k sufficient-statistics contraction,
                         Pallas fused kernel vs plain-XLA einsum
  * ball_train         — moving-ball sample->train chunk throughput
                         (batch 35, T=30, in-graph video generation)

MFU = XLA-reported logical FLOPs / elapsed / peak.  Peak is the chip's
bf16 MXU rate; convs here run at DEFAULT precision (bf16 multiplies) and
the GP math at HIGHEST (multi-pass, costs >1 logical-FLOP each), so the
logical-FLOP numerator makes this a conservative lower bound.  These are
small convnets with tiny GP solves — the workload is HBM/VPU-bound, not
MXU-bound, so MFU here measures headroom honestly rather than flattering
the kernel (see RESULTS.md profiling section for the step breakdown).

Timing notes: this environment's TPU tunnel does not implement
block_until_ready faithfully, so every loop materializes a scalar from the
final output on the host to force the full execution chain.

vs_baseline compares against the reference's CPU step time for the same
config (tools/baseline_torch.py measurement in BASELINE_MEASURED.json;
pinned fallback below).  North-star target: >=5x (BASELINE.md).

`python bench.py --scaling` additionally probes batch scaling with
device-GENERATED data (no host->device transfer, sidestepping the
tunnel's transfer limit) and prints one extra JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REFERENCE_TF_CPU_STEP_SEC = 0.62  # estimate; superseded by measurement

# BENCH_SMOKE=1 shrinks every workload to seconds (CI/CPU validation of the
# harness itself; the numbers it prints are meaningless as benchmarks)
SMOKE = os.environ.get("BENCH_SMOKE") == "1"

# BENCH_GP_IMPL={reference,fused,fused_pallas,auto} selects the GP-block
# implementation for the train workloads (gp/fused.py head-to-head).
# Default "auto" (fused_pallas on TPU, reference elsewhere) — the shipped
# default after the round-3 quality gates (RESULTS.md: 2000-epoch cgen
# 0.03046/0.03096 vs 0.03019 two-pass, within seed noise)
GP_IMPL = os.environ.get("BENCH_GP_IMPL", "auto")
GP_IMPL_SPRITES = GP_IMPL  # resolved per-workload in main()
GP_IMPL_TITSIAS = GP_IMPL  # resolved per-bound in main()

PEAK_FLOPS = (  # bf16 MXU peak per chip, by device_kind substring
    ("v5 lite", 197.0e12),
    ("v5e", 197.0e12),
    ("v5p", 459.0e12),
    ("v4", 275.0e12),
    ("v6", 918.0e12),
)

PEAK_HBM_BPS = (  # HBM bandwidth per chip (bytes/s)
    ("v5 lite", 819.0e9),
    ("v5e", 819.0e9),
    ("v5p", 2765.0e9),
    ("v4", 1228.0e9),
    ("v6", 1640.0e9),
)


def _baseline_step_sec() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["cpu_step_sec"])
    return REFERENCE_TF_CPU_STEP_SEC


def _watchdog(seconds: int = 540):
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


def _lookup(table):
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in table:
        if sub in kind:
            return peak
    return None  # CPU / unknown


def _peak_flops():
    return _lookup(PEAK_FLOPS)


def _aot(jitted, *args):
    """(callable, flops, bytes): compile ONCE ahead of time and reuse the
    executable for both cost analysis and the timed loop (a separate
    jitted call would compile the program a second time).  FLOPs are
    XLA's logical count (each f32-highest multi-pass matmul counts once);
    bytes are its post-fusion memory-traffic estimate."""
    try:
        compiled = jitted.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return (compiled, float(cost["flops"]),
                float(cost.get("bytes accessed", 0.0)))
    except Exception:
        return jitted, None, None


def _mfu(flops_per_call, calls_per_sec, peak):
    if flops_per_call is None or peak is None:
        return None
    return round(flops_per_call * calls_per_sec / peak, 5)


def annotate_s2d_logical(suite, peak):
    """The s2d64 phase-matrix transform executes ~3-4x the conv FLOPs of
    the logical (non-s2d) model, so the s2d line's XLA-counted MFU is
    inflated relative to logical work (VERDICT r4).  Annotate the honest
    number: logical FLOPs = the same step WITHOUT the transform (the
    sprites_train line — same scale, same resolved GP impl).  No-op when
    either line is missing/errored."""
    s2d = suite.get("sprites_train_s2d", {})
    base = suite.get("sprites_train", {})
    if s2d.get("flops_per_step") and base.get("flops_per_step"):
        logical = base["flops_per_step"]
        s2d["flops_logical_per_step"] = logical
        s2d["mfu_logical"] = _mfu(logical, 1e3 / s2d["ms_per_step"], peak)


def _hbm_util(bytes_per_call, calls_per_sec):
    """Achieved HBM traffic / peak bandwidth — the speed-of-light axis for
    these small-model workloads (they are bandwidth-, not MXU-bound)."""
    peak = _lookup(PEAK_HBM_BPS)
    if not bytes_per_call or peak is None:
        return None
    return round(bytes_per_call * calls_per_sec / peak, 4)


# ---------------------------------------------------------------------------
# workloads
# ---------------------------------------------------------------------------

def bench_mnist(peak, titsias=False, n_digits=1):
    """North-star MNIST SVGPVAE epoch-scan: Hensman+GECO by default;
    titsias=True benches the collapsed-L_T bound instead (no GECO, like
    cli.mnist --elbo SVGPVAE_Titsias) — regression guard for the
    determinant-lemma bound (PARITY.md #12), which replaced the
    reference's O(L b^3) dense covariance Cholesky.  n_digits>1 benches
    the multi-digit config (--dataset 36: N_train=8100, 800-object GPLVM
    table — the config that trained to cgen 0.02669, RESULTS.md r3)."""
    import jax.numpy as jnp
    import jax
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu import models, nn as nets, train
    from svgpvae_tpu.gp.svgp import SVGPConfig

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    # north-star sizes; one epoch = 15 full batches of the N_train=4050 set
    b, L, M, m = 256, 16, 8, 32
    n_obj, N_train = 400 * n_digits, 4050 * n_digits
    n_batches = N_train // b
    if SMOKE:
        b, n_batches = 32, 2

    # BENCH_BF16=1 runs the conv nets in bfloat16 (the drivers' --bf16
    # mode; GP math stays f32 via the scoped linalg.precise)
    net_dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16") == "1" \
        else jnp.float32
    vae = nets.MnistVAE(L=L, dtype=net_dtype)
    vae_params = vae.init(key, jnp.zeros((b, 28, 28, 1)))
    ip = np.hstack([np.arange(m)[:, None], rng.rand(m, 1) * 2 * np.pi,
                    rng.randn(m, M)])
    gp = gpm.init_mnist_svgp(ip, rng.randn(n_obj, M),
                             config=SVGPConfig(jitter=1e-6, N_train=N_train,
                                               titsias=titsias))

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
            kappa=kappa, clip_qs=True, geco=not titsias,
            gp_block_impl=GP_IMPL_TITSIAS if titsias else GP_IMPL)
        new_geco = train.GECOState(C_ma=out.C_ma,
                                   lagrange_mult=out.lagrange_mult)
        loss = out.elbo if not titsias else -out.elbo  # GECO minimizes
        return loss, (new_geco, {"recon": out.recon_loss})

    tx = train.make_optimizer(1e-3)
    state = train.TrainState.create(params, tx, jax.random.PRNGKey(0))
    epoch_fn = train.make_epoch_fn(loss_fn, tx, donate=True)

    epoch_fn, flops_epoch, bytes_epoch = _aot(epoch_fn, state, batches)

    state, metrics = epoch_fn(state, batches)  # warmup
    float(metrics["recon"][-1])

    reps = 2 if SMOKE else (10 if n_digits > 1 else 20)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = epoch_fn(state, batches)
    final = float(metrics["recon"][-1])  # forces the whole chain
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final), "training step produced non-finite values"

    steps_per_sec = reps * n_batches / elapsed
    flops_step = flops_epoch / n_batches if flops_epoch else None
    return {
        "steps_per_sec": round(steps_per_sec, 1),
        "ms_per_step": round(1e3 / steps_per_sec, 4),
        "flops_per_step": flops_step,
        "mfu": _mfu(flops_epoch, reps / elapsed, peak),
        "hbm_util": _hbm_util(bytes_epoch, reps / elapsed),
        "config": (f"batch {b}, 28x28x1, L{L}, M{M}, m{m}, "
                   f"{n_digits * 400}-obj GPLVM, "
                   f"{'Titsias' if titsias else 'GECO'}, epoch-scan"),
    }


def bench_svigp(peak):
    """Deep-SVIGP (decoder-only Hensman baseline) epoch-scan at the
    north-star shapes — the family every quality comparison is anchored
    to (reference: SVIGP_Hensman_model.py:230-289).  Regression guard
    for its true device step, which the tunneled driver obscures
    (~60 ms/epoch readback over 15-batch epochs reads as ~4 ms/step)."""
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu import models, nn as nets, train

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    b, L, M, m, n_obj, N_train, n_batches = 256, 16, 8, 32, 400, 4050, 15
    if SMOKE:
        b, n_batches = 32, 2

    decoder = nets.SVIGPDecoder(L=L)
    dec_params = decoder.init(key, jnp.zeros((2, L)))
    ip = np.hstack([np.arange(m)[:, None], rng.rand(m, 1) * 2 * np.pi,
                    rng.randn(m, M)])
    gp = gpm.init_svigp(ip, rng.randn(n_obj, M), L=L, N_train=N_train)
    params = {"dec": dec_params, "gp": gp}

    images = jnp.asarray(rng.rand(n_batches, b, 28, 28, 1), jnp.float32)
    # aux rows: [global_index, id, angle, pca...] (cli.mnist.run_svigp)
    aux = jnp.asarray(np.stack([np.hstack([
        rng.randint(0, N_train, (b, 1)).astype(float),
        rng.randint(0, n_obj, (b, 1)).astype(float),
        rng.rand(b, 1) * 2 * np.pi, rng.randn(b, M)])
        for _ in range(n_batches)]), jnp.float32)
    batches = (images, aux)

    def loss_fn(params, batch, key, geco, step):
        out = models.forward_pass_deep_svigp(decoder, params["dec"],
                                             params["gp"], batch)
        return -out.elbo, (geco, {"recon": out.recon_loss})

    tx = train.make_optimizer(1e-3)
    state = train.TrainState.create(params, tx, jax.random.PRNGKey(0))
    epoch_fn = train.make_epoch_fn(loss_fn, tx, donate=True)

    epoch_fn, flops_epoch, bytes_epoch = _aot(epoch_fn, state, batches)
    state, metrics = epoch_fn(state, batches)  # warmup
    float(metrics["recon"][-1])

    reps = 2 if SMOKE else 20
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = epoch_fn(state, batches)
    final = float(metrics["recon"][-1])
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final), "SVIGP step produced non-finite values"

    steps_per_sec = reps * n_batches / elapsed
    return {
        "steps_per_sec": round(steps_per_sec, 1),
        "ms_per_step": round(1e3 / steps_per_sec, 4),
        "flops_per_step": flops_epoch / n_batches if flops_epoch else None,
        "mfu": _mfu(flops_epoch, reps / elapsed, peak),
        "hbm_util": _hbm_util(bytes_epoch, reps / elapsed),
        "config": f"batch {b}, 28x28x1, L{L}, M{M}, m{m}, "
                  "deep-SVIGP, epoch-scan",
    }


def bench_sprites_train(peak, s2d64=False, gp_impl=None):
    """SPRITES SVGPVAE-Hensman GECO train step at reference scale:
    batch 500 (10 chars x 50 frames), 64x64x3, L=64, m=72 IPs
    (SPRITES_experiment.py defaults).  s2d64 benches the exact
    space-to-depth 64x64-conv rewrite (--s2d64, nn.S2DConv3x3 — the
    round-4 wave-11 f32 step win; parity pinned in tests/test_nn.py).
    gp_impl overrides the resolved GP-block impl (None = the 'auto'
    dispatch, fused_rejitter_pallas on TPU since r5 — the suite's
    sprites_train_ref line keeps the two-pass anchor comparable to
    pre-r5 history)."""
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu import models, nn as nets, train
    from svgpvae_tpu.gp.svgp import SVGPConfig

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    b, fpc, L, L_action, L_char = 500, 50, 64, 8, 16
    n_actions, n_batches, N_train = 72, 5, 50000
    if SMOKE:
        b, n_batches = 50, 2

    # BENCH_BF16=1 runs the conv/repr nets in bfloat16 (the driver's
    # --bf16 mode; GP math stays f32 via the scoped linalg.precise)
    net_dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16") == "1" \
        else jnp.float32
    vae = nets.SpritesVAE(L=L, dtype=net_dtype, s2d64=s2d64)
    vae_params = vae.init(key, jnp.zeros((2, 64, 64, 3)))
    repr_net = nets.SpritesReprNet(L=L_char, dtype=net_dtype)
    repr_params = repr_net.init(key, jnp.zeros((2, 64, 64, 3)))
    gp = gpm.init_sprites_svgp(
        rng.normal(0, 1.5, (n_actions, L_action + L_char)),
        rng.normal(0, 1.5, (n_actions, L_action)), L_action=L_action,
        config=SVGPConfig(jitter=1e-6, N_train=N_train))

    frames = jnp.asarray(rng.rand(n_batches, b, 64, 64, 3), jnp.float32)
    actions = jnp.asarray(
        rng.randint(0, n_actions, (n_batches, b)), jnp.float32)
    batches = (frames, actions)

    params = {"vae": vae_params, "repr": repr_params, "gp": gp}
    kappa = float(np.sqrt(0.02))

    impl = GP_IMPL_SPRITES if gp_impl is None else gp_impl

    def loss_fn(params, batch, key, geco, step):
        alpha = train.geco_effective_alpha(step, 0.99)
        out = models.forward_pass_svgpvae(
            vae, params["vae"], params["gp"], batch, key, beta=0.001,
            C_ma=geco.C_ma, lagrange_mult=geco.lagrange_mult, alpha=alpha,
            kappa=kappa, clip_qs=True, geco=True,
            repr_apply=repr_net.apply, repr_params=params["repr"],
            frames_per_char=fpc, gp_block_impl=impl)
        new_geco = train.GECOState(C_ma=out.C_ma,
                                   lagrange_mult=out.lagrange_mult)
        return out.elbo, (new_geco, {"recon": out.recon_loss})

    tx = train.make_optimizer(1e-3)
    state = train.TrainState.create(params, tx, jax.random.PRNGKey(0))
    epoch_fn = train.make_epoch_fn(loss_fn, tx, donate=True)

    epoch_fn, flops_epoch, bytes_epoch = _aot(epoch_fn, state, batches)
    state, metrics = epoch_fn(state, batches)
    float(metrics["recon"][-1])

    reps = 2 if SMOKE else 8
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = epoch_fn(state, batches)
    final = float(metrics["recon"][-1])
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final), "sprites step produced non-finite values"

    steps_per_sec = reps * n_batches / elapsed
    return {
        "steps_per_sec": round(steps_per_sec, 1),
        "ms_per_step": round(1e3 / steps_per_sec, 3),
        "flops_per_step": flops_epoch / n_batches if flops_epoch else None,
        "mfu": _mfu(flops_epoch, reps / elapsed, peak),
        "hbm_util": _hbm_util(bytes_epoch, reps / elapsed),
        "config": (f"batch {b}, 64x64x3, L{L}, m{n_actions}, GECO, "
                   f"epoch-scan, gp={impl}"
                   f"{', s2d64' if s2d64 else ''}"),
    }


def bench_mnist_eval(peak):
    """The MNIST eval pass group as the driver runs it (cli/mnist.py):
    eval-set recon + test-set recon as lax.map programs, full-train
    encode as one lax.map program, then conditional generation at the
    held-out angle conditioned on ALL 4050 train encodings.  This was the
    round-2 wall-clock win (1000-epoch run 610 s -> 274 s) — this line
    regression-guards it."""
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu import models, nn as nets, train
    from svgpvae_tpu.gp.svgp import SVGPConfig

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    L, M, m, n_obj, N_train = 16, 8, 32, 400, 4050
    b_tr, n_tr = 270, 15          # 4050 = 15 x 270 train-encode chunks
    b_ev, n_ev = 320, 2           # N_eval = 640
    b_te, n_te = 270, 1           # N_test = 270
    if SMOKE:
        b_tr, n_tr, b_ev, n_ev = 64, 2, 64, 1

    vae = nets.MnistVAE(L=L)
    vae_params = vae.init(key, jnp.zeros((2, 28, 28, 1)))
    ip = np.hstack([np.arange(m)[:, None], rng.rand(m, 1) * 2 * np.pi,
                    rng.randn(m, M)])
    gp = gpm.init_mnist_svgp(ip, rng.randn(n_obj, M),
                             config=SVGPConfig(jitter=1e-6, N_train=N_train))
    params = {"vae": vae_params, "gp": gp}
    kappa = float(np.sqrt(0.02))

    def aux_block(n):
        return np.hstack([rng.randint(0, n_obj, (n, 1)).astype(float),
                          rng.rand(n, 1) * 2 * np.pi, rng.randn(n, M)])

    train_imgs = jnp.asarray(rng.rand(n_tr, b_tr, 28, 28, 1), jnp.float32)
    aux_train = jnp.asarray(aux_block(n_tr * b_tr), jnp.float32)
    eval_stack = (jnp.asarray(rng.rand(n_ev, b_ev, 28, 28, 1), jnp.float32),
                  jnp.asarray(np.stack([aux_block(b_ev)
                                        for _ in range(n_ev)]), jnp.float32))
    test_stack = (jnp.asarray(rng.rand(n_te, b_te, 28, 28, 1), jnp.float32),
                  jnp.asarray(np.stack([aux_block(b_te)
                                        for _ in range(n_te)]), jnp.float32))

    geco = train.GECOState(C_ma=jnp.float32(0.0),
                           lagrange_mult=jnp.float32(1.0))

    @jax.jit
    def recon_stack_fn(params, stack, key, geco):
        def body(batch):
            out = models.forward_pass_svgpvae(
                vae, params["vae"], params["gp"], batch, key, beta=0.001,
                C_ma=geco.C_ma, lagrange_mult=geco.lagrange_mult,
                alpha=0.99, kappa=kappa, clip_qs=True, geco=True)
            return out.recon_loss
        return jnp.sum(jax.lax.map(body, stack))

    @jax.jit
    def encode_stack_fn(params, images_stack):
        mus, vs = jax.lax.map(
            lambda im: models.batching_encode_svgpvae(
                vae, params["vae"], im, clip_qs=True), images_stack)
        return (mus.reshape(-1, mus.shape[-1]), vs.reshape(-1, vs.shape[-1]))

    @jax.jit
    def cgen_stack_fn(params, stack, means, variances, aux_train, key):
        def body(b):
            _, loss = models.predict_cgen_mnist(
                vae, params["vae"], params["gp"], b, means, variances,
                aux_train, key)
            return loss
        return jnp.sum(jax.lax.map(body, stack))

    def eval_group():
        ev = recon_stack_fn(params, eval_stack, key, geco)
        te = recon_stack_fn(params, test_stack, key, geco)
        mus, vs = encode_stack_fn(params, train_imgs)
        cg = cgen_stack_fn(params, test_stack, mus, vs, aux_train, key)
        return float(ev) + float(te) + float(cg)  # force full chain

    final = eval_group()  # warmup/compile
    reps = 2 if SMOKE else 15
    t0 = time.perf_counter()
    for _ in range(reps):
        final = eval_group()
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final), "mnist eval produced non-finite values"
    return {
        "eval_ms": round(elapsed / reps * 1e3, 2),
        "config": f"recon {n_ev}x{b_ev}+{n_te}x{b_te}, encode "
                  f"{n_tr}x{b_tr}, cgen vs {n_tr * b_tr} train encodings",
    }


def bench_sprites_eval(peak):
    """The SPRITES eval pass as the driver runs it (cli/sprites.py):
    test_character recon over stacked 576-frame batches + full-train
    encode + GP-params precompute + conditional generation, each stage a
    lax.map program.  Guards the round-2 662 s -> 159 s eval rework.
    Data is device-generated (no tunnel upload); train encode covers a
    10k-frame slice — the n=50k precompute contraction has its own
    line (sprites_precompute)."""
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu import models, nn as nets, train
    from svgpvae_tpu.gp.svgp import SVGPConfig

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    L, L_action, L_char = 64, 8, 16
    n_actions, fpc, b_tc = 72, 50, 576
    n_tc, b_tr, n_tr = 6, 500, 20
    if SMOKE:
        n_tc, b_tr, n_tr = 1, 100, 2

    vae = nets.SpritesVAE(L=L)
    vae_params = vae.init(key, jnp.zeros((2, 64, 64, 3)))
    repr_net = nets.SpritesReprNet(L=L_char)
    repr_params = repr_net.init(key, jnp.zeros((2, 64, 64, 3)))
    gp = gpm.init_sprites_svgp(
        rng.normal(0, 1.5, (n_actions, L_action + L_char)),
        rng.normal(0, 1.5, (n_actions, L_action)), L_action=L_action,
        config=SVGPConfig(jitter=1e-6, N_train=n_tr * b_tr))
    params = {"vae": vae_params, "repr": repr_params, "gp": gp}

    k1, k2 = jax.random.split(key)
    tc_frames = jax.random.uniform(k1, (n_tc, b_tc, 64, 64, 3))
    tc_actions = jnp.tile(jnp.arange(n_actions, dtype=jnp.float32),
                          (n_tc, b_tc // n_actions))
    tr_frames = jax.random.uniform(k2, (n_tr, b_tr, 64, 64, 3))
    tr_actions = jnp.asarray(
        rng.randint(0, n_actions, (n_tr, b_tr)), jnp.float32)

    @jax.jit
    def test_recon_losses_fn(params, frames_st, action_st, key):
        def body(b):
            out = models.forward_pass_svgpvae(
                vae, params["vae"], params["gp"], b, key, beta=0.001,
                C_ma=jnp.float32(0.0), lagrange_mult=jnp.float32(1.0),
                alpha=0.99, kappa=float(np.sqrt(0.02)), clip_qs=True,
                geco=True, repr_apply=repr_net.apply,
                repr_params=params["repr"], frames_per_char=n_actions)
            return out.recon_loss
        return jnp.sum(jax.lax.map(body, (frames_st, action_st)))

    @jax.jit
    def encode_all_fn(params, frames_st, action_st):
        def enc(fb):
            mu, var = models.batching_encode_svgpvae(
                vae, params["vae"], fb[0], clip_qs=True)
            aux = models.sprites_aux_data(repr_net.apply, params["repr"],
                                          fb[0], fb[1], fpc)
            return mu, var, aux
        mus, vs, auxs = jax.lax.map(enc, (frames_st, action_st))
        return (mus.reshape(-1, mus.shape[-1]), vs.reshape(-1, vs.shape[-1]),
                auxs.reshape(-1, auxs.shape[-1]))

    @jax.jit
    def precompute_fn(params, means, variances, aux):
        return models.precompute_gp_params(params["gp"], means, variances,
                                           aux)

    @jax.jit
    def cgen_losses_fn(params, frames_st, action_st, mean_terms, sigma_inv,
                       kmm_inv, key):
        def body(b):
            _, _, loss = models.predict_cgen_sprites(
                vae, params["vae"], params["gp"], repr_net.apply,
                params["repr"], b[0], b[1], mean_terms, sigma_inv, kmm_inv,
                n_context=36, n_actions_total=n_actions, key=key)
            return loss
        return jnp.sum(jax.lax.map(body, (frames_st, action_st)))

    def eval_pass():
        te = test_recon_losses_fn(params, tc_frames, tc_actions, key)
        means, variances, auxs = encode_all_fn(params, tr_frames, tr_actions)
        mean_terms, sigma_inv, kmm_inv = precompute_fn(params, means,
                                                       variances, auxs)
        cg = cgen_losses_fn(params, tc_frames, tc_actions, mean_terms,
                            sigma_inv, kmm_inv, key)
        return float(te) + float(cg)

    final = eval_pass()  # warmup/compile
    reps = 2 if SMOKE else 8
    t0 = time.perf_counter()
    for _ in range(reps):
        final = eval_pass()
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final), "sprites eval produced non-finite values"
    return {
        "eval_ms": round(elapsed / reps * 1e3, 2),
        "config": f"recon {n_tc}x{b_tc} + encode {n_tr}x{b_tr} + "
                  f"precompute(n={n_tr * b_tr}) + cgen, m={n_actions}",
    }


def bench_sprites_precompute():
    """The full-train-set sufficient-statistics contraction behind the
    SPRITES test pipeline (precompute_GP_params): Pallas fused kernel vs
    plain-XLA einsum at n=50k, m=72, L=64."""
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu.ops import gp_stats as ops

    n, m, L = (5000, 72, 64) if SMOKE else (50000, 72, 64)
    rng = np.random.RandomState(0)
    Knm = jnp.asarray(rng.rand(n, m), jnp.float32)
    prec = jnp.asarray(rng.rand(n, L) + 0.5, jnp.float32)
    py = jnp.asarray(rng.randn(n, L), jnp.float32)

    xla = jax.jit(ops.gp_sufficient_stats_reference)
    s, r = xla(Knm, prec, py)
    float(r[0, 0])
    reps = 3 if SMOKE else 30
    t0 = time.perf_counter()
    for _ in range(reps):
        s, r = xla(Knm, prec, py)
    float(r[0, 0])
    xla_ms = (time.perf_counter() - t0) / reps * 1e3

    out = {"xla_ms": round(xla_ms, 3),
           "config": f"n={n}, m={m}, L={L} (SPRITES full-train precompute)"}
    if jax.default_backend() == "tpu":
        pallas = jax.jit(ops.gp_sufficient_stats)
        s, r = pallas(Knm, prec, py)
        float(r[0, 0])
        t0 = time.perf_counter()
        for _ in range(reps):
            s, r = pallas(Knm, prec, py)
        float(r[0, 0])
        pallas_ms = (time.perf_counter() - t0) / reps * 1e3
        out["pallas_ms"] = round(pallas_ms, 3)
        out["pallas_speedup"] = round(xla_ms / pallas_ms, 3)
    return out


def bench_ball(peak):
    """Moving-ball SVGPVAE: sample->train chunks (in-graph video
    generation + train step as one lax.scan program), batch 35, T=30."""
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import data, gp as gpm
    from svgpvae_tpu import models, nn as nets, train
    from svgpvae_tpu.gp.svgp import SVGPConfig

    batch, px, py_, tmax, m = 35, 32, 32, 30, 15
    key = jax.random.PRNGKey(0)
    encoder = nets.BallEncoder()
    decoder = nets.BallDecoder(px=px, py=py_)
    enc_params = encoder.init(key, jnp.zeros((batch, tmax, px, py_)))
    dec_params = decoder.init(key, jnp.zeros((batch, tmax, 2)))
    gp = gpm.init_ball_svgp(m, tmin=1.0, tmax=float(tmax),
                            length_scale_init=2.0)
    gp = gp.replace(config=SVGPConfig(jitter=1e-9))
    params = {"enc": enc_params, "dec": dec_params, "gp": gp}

    def loss_fn(params, vids, key, geco, step):
        out = models.ball_svgpvae_elbo(
            encoder, params["enc"], decoder, params["dec"], params["gp"],
            vids, 1.0, key, clip_qs=False, gp_block_impl=GP_IMPL)
        return -jnp.mean(out.elbo), (geco, {"elbo": jnp.mean(out.elbo)})

    video_fn = data.make_video_batch_fn(tmax=tmax, px=px, py=py_, lt=2.0,
                                        batch=batch, r=3.0)
    tx = train.make_optimizer(1e-3)
    state = train.TrainState.create(params, tx, key)
    chunk = 10 if SMOKE else 100
    chunk_fn = train.make_generative_chunk_fn(loss_fn, tx, video_fn, chunk,
                                              donate=False)
    dkey = jax.random.PRNGKey(1)
    chunk_fn, flops_chunk, bytes_chunk = _aot(chunk_fn, state, dkey)

    state, dkey, ms = chunk_fn(state, dkey)
    float(ms["elbo"][-1])
    reps = 1 if SMOKE else 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state, dkey, ms = chunk_fn(state, dkey)
    final = float(ms["elbo"][-1])
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final), "ball step produced non-finite values"

    steps_per_sec = reps * chunk / elapsed
    return {
        "steps_per_sec": round(steps_per_sec, 1),
        "ms_per_step": round(1e3 / steps_per_sec, 4),
        "flops_per_step": flops_chunk / chunk if flops_chunk else None,
        "mfu": _mfu(flops_chunk, reps / elapsed, peak),
        "hbm_util": _hbm_util(bytes_chunk, reps / elapsed),
        "config": f"batch {batch}, T={tmax}, 32x32, m{m}, on-device video gen, "
                  f"{chunk}-step chunks",
    }


def bench_casale(peak):
    """Casale GPVAE joint-regime train step at reference scale: every
    step encodes the ENTIRE train set (N=4050) to build the Kronecker-V
    Taylor coefficients, then runs the batch forward (reference:
    MNIST_experiment.py:861-881 — the graph feeds the whole train set per
    sess.run, :1020-1023).  Regression guard for the weakest-quality
    family (VERDICT r3 item 6)."""
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu import models, nn as nets, train

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    b, L, M, P, Q, N = 256, 16, 8, 400, 15, 4050
    n_batches = 5  # each step re-encodes the full set; 5 steps suffice
    if SMOKE:
        b, P, Q, N, n_batches = 32, 20, 5, 80, 2

    vae = nets.MnistVAE(L=L)
    vae_params = vae.init(key, jnp.zeros((2, 28, 28, 1)))
    gp = gpm.init_casale_gp(rng.randn(P, M), object_kernel_normalize=False,
                            ov_joint=True)
    angles = np.sort(rng.rand(Q) * 2 * np.pi)
    mask = np.zeros(P * Q, bool)
    mask[rng.choice(P * Q, N, replace=False)] = True
    mask_j = jnp.asarray(gpm.mask_to_indices(mask))
    angles_j = jnp.asarray(angles, jnp.float32)
    oid_j = jnp.arange(P)
    params = {"vae": vae_params, "gp": gp}

    full_images = jnp.asarray(rng.rand(N, 28, 28, 1), jnp.float32)
    ids = np.repeat(np.arange(P), Q)[mask]
    angs = np.tile(angles, P)[mask]
    aux_all = np.hstack([np.arange(N)[:, None].astype(float),
                         ids[:, None].astype(float), angs[:, None]])
    rows = rng.randint(0, N, (n_batches, b))
    batches = (full_images[rows.reshape(-1)].reshape(n_batches, b,
                                                     28, 28, 1),
               jnp.asarray(aux_all[rows.reshape(-1)].reshape(
                   n_batches, b, -1), jnp.float32))

    def loss_fn(params, batch, key, geco, step):
        # the driver's r5 path: factored Taylor pieces + gathered-B
        # forward (gp.taylor_terms; PARITY #14) — no (N,N) inverse, no
        # (L,N,H) B tensor
        k1, k2 = jax.random.split(key)
        Z = models.encode_full_casale(vae, params["vae"], full_images, k1,
                                      clip_qs=True)
        V = gpm.v_matrix(params["gp"], angles_j, oid_j, mask_j)
        a, ztKV, K_inv_V, c = gpm.taylor_terms(params["gp"], Z, V)
        out = models.forward_pass_casale(vae, params["vae"], params["gp"],
                                         batch, k2, a, None, c, V, 0.001,
                                         clip_qs=True, ztKV=ztKV,
                                         K_inv_V=K_inv_V)
        return out.elbo, (geco, {"recon": out.recon_loss})

    tx = train.make_optimizer(0.001)
    state = train.TrainState.create(params, tx, jax.random.PRNGKey(0))
    epoch_fn = train.make_epoch_fn(loss_fn, tx, donate=True)
    epoch_fn, flops_epoch, bytes_epoch = _aot(epoch_fn, state, batches)
    state, metrics = epoch_fn(state, batches)
    float(metrics["recon"][-1])

    reps = 2 if SMOKE else 8
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = epoch_fn(state, batches)
    final = float(metrics["recon"][-1])
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final), "casale step produced non-finite values"

    steps_per_sec = reps * n_batches / elapsed
    return {
        "steps_per_sec": round(steps_per_sec, 1),
        "ms_per_step": round(1e3 / steps_per_sec, 3),
        "flops_per_step": flops_epoch / n_batches if flops_epoch else None,
        "mfu": _mfu(flops_epoch, reps / elapsed, peak),
        "hbm_util": _hbm_util(bytes_epoch, reps / elapsed),
        "config": f"batch {b}, full-train encode N={N}/step, P{P} Q{Q}, "
                  "3-way joint regime",
    }


def bench_pearce(peak):
    """Moving-ball GPVAE-Pearce (exact dense per-channel 1-D GPs,
    reference: GPVAE_Pearce_model.py:89-236) sample->train chunks — the
    first throughput guard for the exact-GP baseline family (VERDICT r3
    item 6)."""
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import data, models, nn as nets, train

    batch, px, py_, tmax = 35, 32, 32, 30
    key = jax.random.PRNGKey(0)
    encoder = nets.BallEncoder()
    decoder = nets.BallDecoder(px=px, py=py_)
    enc_params = encoder.init(key, jnp.zeros((batch, tmax, px, py_)))
    dec_params = decoder.init(key, jnp.zeros((batch, tmax, 2)))
    params = {"enc": enc_params, "dec": dec_params}

    def loss_fn(params, vids, key, geco, step):
        out = models.pearce_elbo(encoder, params["enc"], decoder,
                                 params["dec"], vids, 1.0, key, 2.0)
        return -jnp.mean(out.elbo), (geco, {"elbo": jnp.mean(out.elbo)})

    video_fn = data.make_video_batch_fn(tmax=tmax, px=px, py=py_, lt=2.0,
                                        batch=batch, r=3.0)
    tx = train.make_optimizer(1e-3)
    state = train.TrainState.create(params, tx, key)
    chunk = 10 if SMOKE else 100
    chunk_fn = train.make_generative_chunk_fn(loss_fn, tx, video_fn, chunk,
                                              donate=False)
    dkey = jax.random.PRNGKey(1)
    chunk_fn, flops_chunk, bytes_chunk = _aot(chunk_fn, state, dkey)

    state, dkey, ms = chunk_fn(state, dkey)
    float(ms["elbo"][-1])
    reps = 1 if SMOKE else 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state, dkey, ms = chunk_fn(state, dkey)
    final = float(ms["elbo"][-1])
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final), "pearce step produced non-finite values"

    steps_per_sec = reps * chunk / elapsed
    return {
        "steps_per_sec": round(steps_per_sec, 1),
        "ms_per_step": round(1e3 / steps_per_sec, 4),
        "flops_per_step": flops_chunk / chunk if flops_chunk else None,
        "mfu": _mfu(flops_chunk, reps / elapsed, peak),
        "hbm_util": _hbm_util(bytes_chunk, reps / elapsed),
        "config": f"batch {batch}, T={tmax}, 32x32, exact dense GP, "
                  f"on-device video gen, {chunk}-step chunks",
    }


def bench_batch_scaling(peak):
    """Batch-scaling probe with device-GENERATED data: the MNIST train
    step at batch 256..4096 where images/aux are produced by jax.random
    inside the scanned program — zero host->device transfer, so the
    tunnel's transfer limit (RESULTS.md round 1) does not apply."""
    import jax
    import jax.numpy as jnp
    from svgpvae_tpu import gp as gpm
    from svgpvae_tpu import models, nn as nets, train
    from svgpvae_tpu.gp.svgp import SVGPConfig

    rng = np.random.RandomState(0)
    L, M, m, n_obj = 16, 8, 32, 400
    key = jax.random.PRNGKey(0)
    vae = nets.MnistVAE(L=L)
    vae_params = vae.init(key, jnp.zeros((2, 28, 28, 1)))
    ip = np.hstack([np.arange(m)[:, None], rng.rand(m, 1) * 2 * np.pi,
                    rng.randn(m, M)])
    rows = {}
    for b in (256, 1024, 4096):
        gp = gpm.init_mnist_svgp(
            ip, rng.randn(n_obj, M),
            config=SVGPConfig(jitter=1e-6, N_train=16 * b))
        params = {"vae": vae_params, "gp": gp}
        kappa = float(np.sqrt(0.02))

        def sample_fn(key, b=b):
            k1, k2, k3 = jax.random.split(key, 3)
            images = jax.random.uniform(k1, (b, 28, 28, 1))
            aux = jnp.concatenate([
                jax.random.randint(k2, (b, 1), 0, n_obj).astype(jnp.float32),
                jax.random.uniform(k3, (b, 1 + M))], axis=1)
            return images, aux

        def loss_fn(params, batch, key, geco, step):
            alpha = train.geco_effective_alpha(step, 0.99)
            out = models.forward_pass_svgpvae(
                vae, params["vae"], params["gp"], batch, key, beta=0.001,
                C_ma=geco.C_ma, lagrange_mult=geco.lagrange_mult,
                alpha=alpha, kappa=kappa, clip_qs=True, geco=True)
            return out.elbo, (train.GECOState(
                C_ma=out.C_ma, lagrange_mult=out.lagrange_mult),
                {"recon": out.recon_loss})

        tx = train.make_optimizer(1e-3)
        state = train.TrainState.create(params, tx, jax.random.PRNGKey(0))
        chunk = 50
        chunk_fn = train.make_generative_chunk_fn(loss_fn, tx, sample_fn,
                                                  chunk, donate=False)
        chunk_fn, flops_chunk, _ = _aot(chunk_fn, state, key)
        dkey = jax.random.PRNGKey(1)
        state, dkey, ms = chunk_fn(state, dkey)
        float(ms["recon"][-1])
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            state, dkey, ms = chunk_fn(state, dkey)
        float(ms["recon"][-1])
        elapsed = time.perf_counter() - t0
        sps = reps * chunk / elapsed
        rows[str(b)] = {
            "steps_per_sec": round(sps, 1),
            "images_per_sec": round(sps * b, 0),
            "mfu": _mfu(flops_chunk, reps / elapsed, peak),
        }
        print(f"# scaling b={b}: {json.dumps(rows[str(b)])}",
              file=sys.stderr, flush=True)
    return rows


# ---------------------------------------------------------------------------

def main() -> None:
    scaling = "--scaling" in sys.argv
    # generous: the tunnel shows slow phases where one workload's remote
    # compile+run stretches to ~1000 s (wave-3 logs); a stale-marked
    # result is still worse than a late one
    _watchdog(3000 if scaling else 2100)
    # import the package BEFORE jax so an explicit JAX_PLATFORMS=cpu is
    # honored (svgpvae_tpu.__init__ re-asserts it over the axon tunnel's
    # sitecustomize hook).  Without the env var, bench runs on the chip
    # as before.  This makes CPU smoke runs actually stay off the TPU —
    # two processes on the tunnel at once can wedge it (CLAUDE.md).
    import svgpvae_tpu  # noqa: F401
    import jax

    global GP_IMPL, GP_IMPL_SPRITES, GP_IMPL_TITSIAS
    from svgpvae_tpu.models import resolve_gp_block_impl
    # per-workload measured dispatch (models.GP_BLOCK_AUTO_TABLE): auto ->
    # fused_rejitter_pallas on SPRITES-TPU (r5 flip, 2-seed converged
    # evidence), fused_pallas-on-TPU elsewhere; Titsias configs -> the
    # fused determinant-lemma bound on every backend (PARITY #12)
    GP_IMPL_SPRITES = resolve_gp_block_impl(GP_IMPL, workload="sprites")
    GP_IMPL_TITSIAS = resolve_gp_block_impl(GP_IMPL, titsias=True)
    GP_IMPL = resolve_gp_block_impl(GP_IMPL)

    peak = _peak_flops()
    only = os.environ.get("BENCH_ONLY")  # comma-separated workload filter
    suite = {}
    for name, fn in (("mnist_train", lambda: bench_mnist(peak)),
                     ("mnist_titsias_train",
                      lambda: bench_mnist(peak, titsias=True)),
                     ("mnist36_train",
                      lambda: bench_mnist(peak, n_digits=2)),
                     ("mnist_eval", lambda: bench_mnist_eval(peak)),
                     ("svigp_train", lambda: bench_svigp(peak)),
                     ("casale_train", lambda: bench_casale(peak)),
                     ("sprites_train", lambda: bench_sprites_train(peak)),
                     ("sprites_train_s2d",
                      lambda: bench_sprites_train(peak, s2d64=True)),
                     # two-pass anchor: comparable to pre-r5 history now
                     # that 'auto' resolves sprites-Hensman-TPU to
                     # fused_rejitter_pallas (RESULTS.md r5 wave 12)
                     ("sprites_train_ref",
                      lambda: bench_sprites_train(peak,
                                                  gp_impl="reference")),
                     ("sprites_eval", lambda: bench_sprites_eval(peak)),
                     ("sprites_precompute", bench_sprites_precompute),
                     ("ball_train", lambda: bench_ball(peak)),
                     ("pearce_train", lambda: bench_pearce(peak))):
        if only and name not in only.split(","):
            continue
        t0 = time.perf_counter()
        try:
            suite[name] = fn()
        except Exception as e:  # keep the primary metric printable
            suite[name] = {"error": f"{type(e).__name__}: {e}"}
        suite[name]["wall_s"] = round(time.perf_counter() - t0, 1)
        print(f"# {name}: {json.dumps(suite[name])}", file=sys.stderr,
              flush=True)

    annotate_s2d_logical(suite, peak)

    mnist = suite.get("mnist_train", {})
    steps_per_sec = float(mnist.get("steps_per_sec", 0.0))
    result = {
        "metric": "svgpvae_mnist_geco_train_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": f"steps/s ({mnist.get('config', 'mnist_train failed')})",
        "vs_baseline": round(steps_per_sec * _baseline_step_sec(), 2),
        "device": jax.devices()[0].device_kind,
        "peak_flops_bf16": peak,
        "suite": suite,
    }
    nonstandard = (SMOKE or only or os.environ.get("BENCH_BF16")
                   or os.environ.get("BENCH_GP_IMPL", "auto") != "auto")
    if steps_per_sec > 0 and not nonstandard:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LAST_GOOD.json"), "w") as f:
            json.dump(result, f)
    print(json.dumps(result))

    if scaling:
        try:
            rows = bench_batch_scaling(peak)
        except Exception as e:
            rows = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({"metric": "mnist_batch_scaling_device_data",
                          "rows": rows}))


if __name__ == "__main__":
    main()
