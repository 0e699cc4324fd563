"""SPRITES experiment driver.

CLI-compatible rebuild of the reference driver (SPRITES_experiment.py):
SVGPVAE (Hensman/Titsias) or plain VAE on 64x64x3 sprite frames, with an
optional representation-network pretraining phase (1000-way character
classifier), GECO training, per-5-epoch test_character reconstruction and
conditional generation from precomputed full-train GP posterior terms.

The raw SPRITES corpus (external repo) is not shipped here; pass
--synthetic to generate a structurally-identical synthetic corpus
(data.generate_synthetic_sprites) scaled by --synthetic_chars, or point
--sprites_data_path at shards produced by data.save_sprites_shards.
"""

from __future__ import annotations

import argparse
import contextlib
import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from svgpvae_tpu import data, models, parallel, train, utils
from svgpvae_tpu import gp as gpm
from svgpvae_tpu import nn as nets
from svgpvae_tpu.gp.svgp import SVGPConfig
from svgpvae_tpu.utils import plots

N_ACTIONS = 72


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SPRITES SVGPVAE experiment")
    p.add_argument("--expid", type=str, default="debug_SPRITES")
    p.add_argument("--base_dir", type=str, default=os.getcwd())
    p.add_argument("--elbo", type=str, default="VAE",
                   choices=["VAE", "SVGPVAE_Hensman", "SVGPVAE_Titsias"])
    p.add_argument("--sprites_data_path", type=str, default="SPRITES_data/")
    p.add_argument("--batch_size", type=int, default=500)
    p.add_argument("--nr_epochs", type=int, default=50)
    p.add_argument("--beta", type=float, default=0.001)
    p.add_argument("--m", type=int, default=1,
                   help="character vectors per action for inducing points")
    p.add_argument("--save", action="store_true")
    p.add_argument("--ip_joint", action="store_true")
    p.add_argument("--GPLVM_joint", action="store_true")
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--lr_decay", type=float, default=None,
                   help="cosine-decay the lr to lr*LR_DECAY over the full "
                        "run. Off (constant lr, reference semantics) "
                        "when unset.")
    p.add_argument("--save_model_weights", action="store_true")
    p.add_argument("--show_pics", action="store_true")
    p.add_argument("--beta_schedule_switch", type=int, default=100)
    p.add_argument("--opt_regime", type=str, default=["joint-50"], nargs="+")
    p.add_argument("--L", type=int, default=64)
    p.add_argument("--L_action", type=int, default=8)
    p.add_argument("--L_character", type=int, default=16)
    p.add_argument("--clip_qs", action="store_true")
    p.add_argument("--ram", type=float, default=1.0)
    p.add_argument("--GECO", action="store_true")
    p.add_argument("--alpha", type=float, default=0.99)
    p.add_argument("--kappa_squared", type=float, default=0.0075)
    p.add_argument("--geco_lambda_max", type=float, default=1e5,
                   help="cap on the GECO lagrange multiplier (float32 safety)")
    p.add_argument("--jitter", type=float, default=0.01)
    p.add_argument("--PCA", action="store_true")
    p.add_argument("--N_context", type=int, default=36)
    p.add_argument("--test_set_metrics", action="store_true")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of one post-warmup "
                        "epoch to this directory (view with xprof)")
    p.add_argument("--clip_grad", action="store_true")
    p.add_argument("--repr_nn_pretrain", type=str, default="yes_joint",
                   choices=["no", "yes_fixed", "yes_joint"])
    p.add_argument("--lr_repr_nn", type=float, default=0.01)
    p.add_argument("--nr_epochs_repr_nn", type=int, default=400)
    p.add_argument("--batch_size_repr_nn", type=int, default=5000)
    p.add_argument("--object_kernel_normalize", action="store_true")
    p.add_argument("--K_SE", action="store_true")
    p.add_argument("--GP_joint", action="store_true")
    p.add_argument("--clip_grad_thres", type=float, default=1e6)
    # runtime extensions
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic stand-in corpus if needed")
    p.add_argument("--synthetic_chars", type=int, default=12)
    p.add_argument("--allow_stale_corpus", action="store_true",
                   help="reuse an existing corpus at --sprites_data_path "
                        "even when its N_train does not match "
                        "--synthetic_chars (default: fail hard so "
                        "unattended runs cannot silently train on a "
                        "leftover corpus of a different scale)")
    p.add_argument("--corpus_seed", type=int, default=0,
                   help="RNG seed for the synthetic corpus draw, kept "
                        "separate from --seed so seed studies vary only "
                        "the training RNG on a fixed dataset")
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--main_seed", type=int, default=-1,
                   help="if >= 0, re-seed ONLY the main loop's per-step "
                        "sampling stream, keeping all inits and the "
                        "repr-net pretrain on --seed (basin-diagnosis "
                        "knob, RESULTS.md round 4)")
    p.add_argument("--basin_retry", type=int, default=0,
                   help="plateau-basin rescue (SVGPVAE_Hensman family): the "
                        "SPRITES Hensman run family has a reproducible "
                        "attractor near cgen 0.0204 that SOME (binary, "
                        "seed) pairs fall into from epoch 0 — cgen starts "
                        "~0.0206 and never descends, while good-basin runs "
                        "descend from their first eval (RESULTS.md r4 "
                        "waves 5/10).  With N > 0: after "
                        "--basin_detect_evals cgen evals, if the best cgen "
                        "so far has not descended by --basin_detect_rel "
                        "relative to the first eval, restart the main loop "
                        "(same post-pretrain params/inits, re-split "
                        "sampling stream — the --main_seed isolation) up "
                        "to N times.  0 disables (default)")
    p.add_argument("--basin_detect_evals", type=int, default=4,
                   help="number of cgen evals the basin detector waits "
                        "before judging (epoch ~= this * --eval_every)")
    p.add_argument("--basin_detect_rel", type=float, default=0.03,
                   help="minimum relative cgen descent (first eval -> best "
                        "so far) that counts as escaping the plateau")
    p.add_argument("--resume_dir", type=str, default=None,
                   help="existing run dir to resume from (restores the full "
                        "TrainState from its ckpt/ and skips pretraining)")
    p.add_argument("--bf16", action="store_true",
                   help="run the conv nets (VAE + repr net) in bfloat16; "
                        "GP linear algebra stays float32")
    p.add_argument("--bf16_hybrid", action="store_true",
                   help="mixed precision: conv trunks in bfloat16, the "
                        "quality-critical head stages (encoder mean/"
                        "log-var Dense, decoder output Conv) in float32 "
                        "— probes whether uniform bf16's converged-"
                        "horizon quality floor (RESULTS.md wave 24) "
                        "lives in the heads")
    p.add_argument("--s2d64", action="store_true", default=None,
                   help="compute every 64x64-resolution conv in "
                        "space-to-depth(2) coordinates (nn.S2DConv3x3: "
                        "4x MXU lane fill, 4x fewer pixels; exact "
                        "rewrite, same parameter tree — checkpoints "
                        "interop).  Default: ON for f32 runs on TPU "
                        "(the measured 1.09x exact step win, RESULTS.md "
                        "r4 wave 11 + r5 wave 12), OFF under --bf16/"
                        "--bf16_hybrid (does not compose: bf16 already "
                        "doubles effective lane throughput) and off-TPU")
    p.add_argument("--no_s2d64", dest="s2d64", action="store_false",
                   help="force the plain NHWC 64x64 convs even where "
                        "--s2d64 would default on")
    p.add_argument("--fused_upsample", action="store_true",
                   help="compute each decoder upsample2x+Conv pair as a "
                        "single conv at the pre-upsample resolution "
                        "(exact rewrite, same parameter tree — "
                        "nn.FusedUpsampleConv2x); perf knob, measured in "
                        "tools/profile_step.py --workload sprites")
    p.add_argument("--gp_block_impl", type=str, default="auto",
                   choices=["reference", "fused", "fused_pallas",
                            "fused_rejitter", "fused_rejitter_pallas", "auto"],
                   help="GP-block implementation for the Hensman training "
                        "forward (see gp/fused.py and the measured "
                        "dispatch table models.GP_BLOCK_AUTO_TABLE); "
                        "auto = fused_rejitter_pallas on TPU since r5 "
                        "(one-pass dedup + the exact two-pass rejittered "
                        "KL from the Pallas inverse stack — 1.15-1.25x "
                        "step, 2-seed converged quality in-band, "
                        "RESULTS.md r5 wave 12), reference off-TPU.  The "
                        "identity-KL impls (fused/fused_pallas) stay OFF "
                        "this workload's rank-deficient kernel unless "
                        "forced (PARITY.md #10)")
    p.add_argument("--titsias_reference_ce", action="store_true",
                   help="restore the reference's encoder cross-entropy CE term for\n                   Titsias configs (PARITY.md #13: it rewards encoder-posterior\n                   divergence and measurably diverges; default uses the exact\n                   sampling-distribution entropy)")
    p.add_argument("--entropy_ce", action="store_true",
                   help="use the exact sampling-distribution entropy CE term for ANY\n                   ELBO family (it is already the Titsias default, PARITY.md #13;\n                   for Hensman this is an opt-in experiment — the reference CE\n                   channel cancels exactly there)")
    p.add_argument("--reshuffle", action="store_true",
                   help="reshuffle the example order each epoch inside the "
                        "epoch-scan program (the reference's tf.data "
                        "semantics); default keeps one fixed batch order "
                        "(PARITY.md divergence #9)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="train data-parallel over this many devices "
                        "(-1 = all): parameters replicated, each batch "
                        "sharded over a jax.sharding.Mesh data axis "
                        "(gradient psum over ICI via SPMD).  Requires "
                        "batch_size %% devices == 0; the repr-net "
                        "segment-mean over frames_per_char blocks is "
                        "handled by GSPMD even when a character's 50 "
                        "frames straddle a device boundary (certified "
                        "by tests/test_e2e_sprites.py).  0 disables.")
    return p


def _count_corpus_rows(train_dir: str):
    """Total train rows across shards, or None if any shard is unreadable
    (a partially-written corpus from an interrupted save_sprites_shards
    must count as invalid, not crash the guard)."""
    import glob as _glob
    n = 0
    for s in sorted(_glob.glob(os.path.join(train_dir, "*.npz"))):
        try:
            with np.load(s) as z:
                n += len(z["aux_data"])
        except Exception as e:  # truncated/corrupt shard
            print(f"corpus shard {s} unreadable ({e}); treating the corpus "
                  "as invalid")
            return None
    return n


def ensure_dataset(args) -> None:
    train_dir = os.path.join(args.sprites_data_path, "train")
    if os.path.isdir(train_dir):
        if not args.synthetic:
            return
        # Guard against silently training on a stale corpus of a
        # different scale (incident: a full-scale bench reused a
        # 600-frame leftover at /tmp/sprites_full — tools/tpu_round3.py
        # wave-3 note).  Unattended queue runs must not proceed past a
        # mismatch, so the default is fail-hard; --allow_stale_corpus
        # opts back into reuse, and an unreadable (partially written)
        # corpus is deleted and regenerated.
        n_train = _count_corpus_rows(train_dir)
        expect = args.synthetic_chars * 50
        if n_train == expect:
            return
        if n_train is None:
            print(f"existing corpus at {args.sprites_data_path} is "
                  "unreadable; deleting and regenerating")
            import shutil
            shutil.rmtree(args.sprites_data_path)
        elif args.allow_stale_corpus:
            print(f"WARNING: existing corpus at {args.sprites_data_path} "
                  f"has N_train={n_train}, but --synthetic_chars "
                  f"{args.synthetic_chars} implies {expect}; reusing it "
                  "(--allow_stale_corpus)")
            return
        else:
            raise SystemExit(
                f"existing corpus at {args.sprites_data_path} has "
                f"N_train={n_train}, but --synthetic_chars "
                f"{args.synthetic_chars} implies {expect}; delete the "
                "directory to regenerate, or pass --allow_stale_corpus "
                "to reuse it anyway")
    # real raw corpus in the published npy layout (the external sprites
    # repo's {action}_{direction}_{frames,attributes}_{train,test}.npy
    # files, consumed by the reference via sprites_act —
    # SPRITES_utils.py:20,66): preprocess once into shards, zero code
    # change for day-one real-data runs.
    if data.has_raw_sprites_npys(args.sprites_data_path):
        print(f"raw sprites npy corpus found at {args.sprites_data_path}; "
              "preprocessing (50 train frames/char, reference "
              "SPRITES_experiment.py:37)")
        x_tr, x_te, a_tr, a_te, d_tr, d_te = data.load_raw_sprites_npys(
            args.sprites_data_path)
        splits = data.preprocess_sprites(x_tr, a_tr, d_tr, x_te, a_te,
                                         d_te, n_frames_train=50,
                                         seed=args.corpus_seed)
        data.save_sprites_shards(splits, args.sprites_data_path)
        return
    assert args.synthetic, (
        "no SPRITES shards found; provide preprocessed data "
        "(data.save_sprites_shards) or pass --synthetic")
    print("generating synthetic SPRITES corpus "
          f"({args.synthetic_chars} train characters)")
    # The corpus draw is seeded independently of the training seed
    # (--corpus_seed, default 0): multi-seed record confirmation varies
    # only the init/shuffle RNG on a FIXED dataset, matching how the
    # round-2/3 record corpus at /tmp/sprites_full was produced.
    splits = data.generate_synthetic_sprites(
        n_train_chars=args.synthetic_chars,
        n_test_chars=max(2, args.synthetic_chars // 4),
        n_frames_train=50, seed=args.corpus_seed)
    data.save_sprites_shards(splits, args.sprites_data_path)


def run_experiment(args) -> dict:
    args.gp_block_impl = models.resolve_gp_block_impl(
        args.gp_block_impl, workload="sprites",
        titsias=args.elbo == "SVGPVAE_Titsias",
        data_parallel=bool(args.data_parallel))
    print(f"gp_block_impl resolved to: {args.gp_block_impl}")
    if args.s2d64 is None:
        # default ON for f32 TPU runs: exact rewrite, measured 1.09x step
        # (RESULTS.md r4 wave 11; composed gate r5 wave 12).  bf16 runs
        # stay plain — the two levers attack the same lane-fill
        # bottleneck and s2d+bf16 measured SLOWER than plain bf16.
        args.s2d64 = (jax.default_backend() == "tpu"
                      and not (args.bf16 or args.bf16_hybrid))
        print(f"s2d64 resolved to: {args.s2d64}")
    assert args.object_kernel_normalize + args.K_SE <= 1, \
        "at most one GP kernel engineering flag at once"
    assert not (args.basin_retry and args.resume_dir), \
        "--basin_retry restarts from the post-pretrain params and cannot " \
        "be combined with --resume_dir"
    fpc_train = 50  # train frames per character (SPRITES_experiment.py:37)

    ensure_dataset(args)
    splits = data.load_sprites(args.sprites_data_path)
    train_d, test_char_d = splits["train"], splits["test_character"]
    N_train = len(train_d["frames"])
    N_test = len(test_char_d["frames"])
    n_chars = N_train // fpc_train
    assert args.batch_size % fpc_train == 0, \
        f"batch size must be divisible by {fpc_train}"
    batch_size = min(args.batch_size, N_train)
    # test_character batches: multiple of 72 frames (reference uses 576)
    batch_test_char = min(576, N_test - (N_test % N_ACTIONS) or N_ACTIONS)
    while N_test % batch_test_char:
        batch_test_char -= N_ACTIONS

    run_dir = None
    if args.resume_dir:
        run_dir = args.resume_dir
        print(f"resuming into: {run_dir}")
    elif args.save:
        run_dir = utils.make_checkpoint_folder(
            args.base_dir, args.expid, f"{args.elbo}_{args.beta}")
        utils.dump_args(run_dir, args)
        print(f"checkpoint dir: {run_dir}")

    key = jax.random.PRNGKey(args.seed)
    is_svgpvae = "SVGPVAE" in args.elbo
    if is_svgpvae and any(not s.startswith("joint-")
                          for s in args.opt_regime):
        # the reference SPRITES driver also reads only the epoch count
        # from --opt_regime (SPRITES_experiment.py:317, 376 — the parsed
        # regime list is never consulted); refuse multi-phase specs loudly
        # instead of silently training the full joint objective throughout.
        raise SystemExit("cli.sprites trains jointly only (matching the "
                         "reference SPRITES driver); use --opt_regime "
                         "joint-N — phase schedules are an MNIST/Casale "
                         "feature (cli.mnist)")

    net_dtype = (jnp.bfloat16 if (args.bf16 or args.bf16_hybrid)
                 else jnp.float32)
    vae = nets.SpritesVAE(L=args.L, dtype=net_dtype,
                          head_dtype=jnp.float32
                          if args.bf16_hybrid else None,
                          fused_upsample=args.fused_upsample,
                          s2d64=args.s2d64)
    dummy = jnp.zeros((2, 64, 64, 3))
    vae_params = vae.init(key, dummy)
    params = {"vae": vae_params}

    repr_net = nets.SpritesReprNet(L=args.L_character, dtype=net_dtype)
    if is_svgpvae:
        params["repr"] = repr_net.init(key, dummy)
        if args.PCA:
            with open(os.path.join(args.sprites_data_path,
                                   "sprites_train_dict.p"), "rb") as f:
                train_dict = pickle.load(f)
            gplvm_init, ip_init = data.sprites_pca_init(
                train_dict, m=args.m, L_action=args.L_action,
                L_character=args.L_character)
        else:
            rng = np.random.RandomState(args.seed)
            gplvm_init = rng.normal(0, 1.5, (N_ACTIONS, args.L_action))
            ip_init = rng.normal(
                0, 1.5, (N_ACTIONS * args.m,
                         args.L_action + args.L_character))
        cfg = SVGPConfig(titsias="Titsias" in args.elbo, jitter=args.jitter,
                         N_train=N_train,
                         K_obj_normalize=args.object_kernel_normalize)
        params["gp"] = gpm.init_sprites_svgp(
            ip_init, gplvm_init, L_action=args.L_action,
            use_se_kernel=args.K_SE, config=cfg)

    # upload the train set to device memory ONCE; pretraining and the main
    # loop scan over zero-copy reshapes of these arrays (per-batch
    # host->device transfers are the bottleneck on a tunneled device)
    train_frames_dev = jnp.asarray(train_d["frames"], jnp.float32)
    train_action_dev = jnp.asarray(train_d["aux_data"][:, 1], jnp.float32)
    train_char_dev = jnp.asarray(train_d["aux_data"][:, 0], jnp.float32)

    def device_batches(leading: int, *arrays):
        n = (arrays[0].shape[0] // leading) * leading
        return tuple(a[:n].reshape(n // leading, leading, *a.shape[1:])
                     for a in arrays)

    # ---------------- representation-network pretraining ----------------
    if is_svgpvae and "yes" in args.repr_nn_pretrain and not args.resume_dir:
        head = nets.ClassificationHead(num_classes=n_chars)
        head_params = head.init(key, jnp.zeros((2, args.L_character)))
        pre_params = {"repr": params["repr"], "head": head_params}
        pre_tx = train.make_optimizer(args.lr_repr_nn)

        def pretrain_loss(p, batch, key, geco, step):
            frames, char_ids = batch
            emb = repr_net.apply(p["repr"], frames)
            logits = head.apply(p["head"], emb)
            labels = char_ids.astype(jnp.int32)
            loss = jnp.mean(
                -jax.nn.log_softmax(logits)[jnp.arange(len(labels)), labels])
            acc = jnp.mean(jnp.argmax(logits, 1) == labels)
            return loss, (geco, {"acc": acc})

        pre_epoch = train.make_epoch_fn(pretrain_loss, pre_tx, donate=True)
        # fresh key: the epoch runner donates its state (incl. the key
        # buffer), so the shared init key must not be captured by it
        pre_state = train.TrainState.create(pre_params, pre_tx,
                                            jax.random.fold_in(key, 101))
        bs_pre = min(args.batch_size_repr_nn, N_train)
        pre_batches = device_batches(bs_pre, train_frames_dev,
                                     train_char_dev)

        # held-out validation on the test_action split: frames of TRAIN
        # characters performing actions not seen in training (reference:
        # SPRITES_experiment.py:344-357 evaluates classifier loss/acc on
        # test_action every 10 pretraining epochs)
        ta_d = splits["test_action"]
        ta_frames = jnp.asarray(ta_d["frames"], jnp.float32)
        ta_chars = jnp.asarray(ta_d["aux_data"][:, 0], jnp.float32)

        @jax.jit
        def pretrain_eval(p, frames, char_ids):
            emb = repr_net.apply(p["repr"], frames)
            logits = head.apply(p["head"], emb)
            labels = char_ids.astype(jnp.int32)
            logp = jax.nn.log_softmax(logits)
            loss = jnp.sum(-logp[jnp.arange(labels.shape[0]), labels])
            hits = jnp.sum(jnp.argmax(logits, 1) == labels)
            return loss, hits

        def eval_test_action(p):
            n = ta_frames.shape[0]
            c = min(bs_pre, n)
            loss = hits = 0.0
            for lo in range(0, (n // c) * c, c):
                l_, h_ = pretrain_eval(p, ta_frames[lo:lo + c],
                                       ta_chars[lo:lo + c])
                loss += float(l_)
                hits += float(h_)
            if n % c:
                l_, h_ = pretrain_eval(p, ta_frames[-(n % c):],
                                       ta_chars[-(n % c):])
                loss += float(l_)
                hits += float(h_)
            return loss / n, hits / n

        t0 = time.time()
        print("pretraining representation net "
              f"({args.nr_epochs_repr_nn} epochs, batch {bs_pre})")
        for epoch in range(args.nr_epochs_repr_nn):
            pre_state, ms = pre_epoch(pre_state, pre_batches)
            if epoch % 10 == 0:
                va_loss, va_acc = eval_test_action(pre_state.params)
                print(f"  pretrain epoch {epoch}: loss "
                      f"{float(ms['loss'].mean()):.4f} acc "
                      f"{float(ms['acc'].mean()):.3f} | test_action loss "
                      f"{va_loss:.4f} acc {va_acc:.3f}")
        print(f"pretraining done in {time.time() - t0:.1f}s")
        params["repr"] = pre_state.params["repr"]

    # ---------------- main training ----------------
    def trainable(path, leaf):
        name = jax.tree_util.keystr(path)
        if name.startswith("['repr']"):
            return args.repr_nn_pretrain != "yes_fixed"
        if "inducing_points" in name:
            return args.ip_joint
        if "gplvm_action" in name:
            return args.GPLVM_joint
        if ("l_action" in name or "sigma_action" in name
                or "l_character" in name or "sigma_character" in name):
            return args.GP_joint and args.K_SE
        return True

    mask = train.trainable_mask(params, trainable) if is_svgpvae else None
    print(f"trainable parameters: {utils.count_params(params)}")
    sched_epochs = (train.parse_opt_regime(list(args.opt_regime))[0]
                    if is_svgpvae else args.nr_epochs)
    lr = train.lr_schedule(args.lr, args.lr_decay,
                           sched_epochs * (-(-N_train // batch_size)))
    tx = train.make_optimizer(
        lr, mask=mask,
        clip_grad_value=args.clip_grad_thres if args.clip_grad else None)
    # --main_seed: re-seed ONLY the main loop's per-step sampling stream
    # (the reparameterization epsilon draws), keeping every parameter
    # init and the repr-net pretrain on --seed.  Basin-diagnosis knob:
    # the SPRITES Hensman family splits into a record basin and a
    # 0.0204-plateau basin per seed (RESULTS.md r4 wave 5/8 — a
    # 400-epoch, 0.995-acc pretrain does NOT escape the plateau), and
    # this isolates whether the split is decided by the inits or by the
    # sampling noise.
    main_key = (jax.random.PRNGKey(args.main_seed) if args.main_seed >= 0
                else jax.random.fold_in(key, 202))
    state = train.TrainState.create(params, tx, main_key)
    if args.resume_dir:
        ckpt = os.path.join(args.resume_dir, "ckpt")
        if utils.latest_step(ckpt) is not None:
            state = utils.restore_checkpoint(ckpt, state)
            print(f"resumed from {ckpt} at step {int(state.step)}")

    kappa = float(np.sqrt(args.kappa_squared))

    def svgpvae_outputs(params, batch, key, geco, alpha, fpc: int):
        return models.forward_pass_svgpvae(
            vae, params["vae"], params["gp"], batch, key, beta=args.beta,
            C_ma=geco.C_ma, lagrange_mult=geco.lagrange_mult, alpha=alpha,
            kappa=kappa, clip_qs=args.clip_qs, geco=args.GECO, lagrange_max=args.geco_lambda_max,
            repr_apply=repr_net.apply, repr_params=params["repr"],
            frames_per_char=fpc, gp_block_impl=args.gp_block_impl,
            titsias_reference_ce=args.titsias_reference_ce,
            entropy_ce=args.entropy_ce)

    def loss_fn(params, batch, key, geco, step):
        if is_svgpvae:
            alpha = train.geco_effective_alpha(step, args.alpha)
            out = svgpvae_outputs(params, batch, key, geco, alpha, fpc_train)
            new_geco = train.GECOState(C_ma=out.C_ma,
                                       lagrange_mult=out.lagrange_mult)
            loss = out.elbo if args.GECO else -out.elbo
            return loss, (new_geco, {"elbo": out.elbo,
                                     "recon": out.recon_loss})
        out = models.forward_pass_vae(vae, params["vae"], batch, key,
                                      clip_qs=args.clip_qs)
        return -out.elbo, (geco, {"elbo": out.elbo, "recon": out.recon_loss})

    step_fn = train.make_train_step(loss_fn, tx, donate=False)
    # reshuffle permutes CHARACTER blocks (fpc_train consecutive frames),
    # preserving the segment-mean layout sprites_aux_data requires
    epoch_fn = train.make_epoch_fn(loss_fn, tx, donate=True,
                                   shuffle=args.reshuffle,
                                   shuffle_block=fpc_train)
    main_batches = device_batches(batch_size, train_frames_dev,
                                  train_action_dev)
    n_full = main_batches[0].shape[0]
    tail_n = N_train - n_full * batch_size

    # --data_parallel: state replicated, each scanned batch sharded on the
    # frame axis.  A device shard need NOT align with the 50-frame
    # character blocks — the aux path's reshape-mean-broadcast
    # (models.sprites_aux_data) is partitioned by GSPMD with the needed
    # cross-device collectives; equivalence vs single-device is pinned in
    # tests/test_e2e_sprites.py.  The tail runs replicated.
    mesh = parallel.resolve_data_parallel(args.data_parallel, batch_size)
    if mesh is not None:
        print(f"data-parallel training over {mesh.devices.size} devices")
        state = parallel.replicate(mesh, state)
        main_batches = parallel.shard_stacked_batches(mesh, main_batches)

    @jax.jit
    def test_recon_fn(params, batch, key, geco):
        if is_svgpvae:
            out = svgpvae_outputs(params, batch, key, geco, args.alpha,
                                  N_ACTIONS)
            return out.recon_loss, out.recon_images
        out = models.forward_pass_vae(vae, params["vae"], batch, key,
                                      clip_qs=args.clip_qs)
        return out.recon_loss, out.recon_images

    @jax.jit
    def encode_fn(params, frames, action_ids):
        mu, var = models.batching_encode_svgpvae(vae, params["vae"], frames,
                                                 clip_qs=args.clip_qs)
        aux = models.sprites_aux_data(repr_net.apply, params["repr"], frames,
                                      action_ids, fpc_train)
        return mu, var, aux

    @jax.jit
    def precompute_fn(params, means, variances, aux):
        return models.precompute_gp_params(params["gp"], means, variances,
                                           aux)

    @jax.jit
    def cgen_fn(params, frames, action_ids, mean_terms, sigma_inv, kmm_inv,
                key):
        return models.predict_cgen_sprites(
            vae, params["vae"], params["gp"], repr_net.apply,
            params["repr"], frames, action_ids, mean_terms, sigma_inv,
            kmm_inv, n_context=args.N_context, n_actions_total=N_ACTIONS,
            key=key)

    nr_epochs, regime = (train.parse_opt_regime(list(args.opt_regime))
                         if is_svgpvae else (args.nr_epochs, None))
    del regime  # joint-only (guard at the top of run_experiment)

    # per-epoch metric streams on one batch of the train set, or of the
    # test_character set under --test_set_metrics (reference:
    # SPRITES_experiment.py:243-296 res_vars/res_vars_GP, :445-467)
    @jax.jit
    def metrics_train_fn(params, batch, key, geco):
        if is_svgpvae:
            return svgpvae_outputs(params, batch, key, geco, args.alpha,
                                   fpc_train)
        return models.forward_pass_vae(vae, params["vae"], batch, key,
                                       clip_qs=args.clip_qs)

    @jax.jit
    def metrics_test_fn(params, batch, key, geco):
        if is_svgpvae:
            return svgpvae_outputs(params, batch, key, geco, args.alpha,
                                   N_ACTIONS)
        return models.forward_pass_vae(vae, params["vae"], batch, key,
                                       clip_qs=args.clip_qs)

    savers = {}
    if run_dir:
        cols = ["step", "ELBO", "recon_loss", "KL_term", "min_qm", "max_qm",
                "min_qv", "max_qv"]
        if is_svgpvae:
            cols += ["inside_elbo", "inside_elbo_recon", "inside_elbo_kl",
                     "ce_term", "min_pm", "max_pm", "min_pv", "max_pv",
                     "C_ma", "lagrange_mult"]
        savers["elbo"] = utils.ResultSaver(
            os.path.join(run_dir, "res", "ELBO_results.csv"), cols,
            flush_every=1)
        if is_svgpvae:
            savers["gp"] = utils.ResultSaver(
                os.path.join(run_dir, "res", "GP_params.csv"),
                ["step", "gplvm_norm", "ip_norm", "l_action", "sigma_action",
                 "l_character", "sigma_character"], flush_every=1)
    # only staged when a run dir consumes the stream (savers gate the use)
    if savers and args.test_set_metrics:
        m_frames, m_aux = next(data.sprites_batch_iterator(test_char_d,
                                                           batch_test_char))
        metrics_batch = (jnp.asarray(m_frames), jnp.asarray(m_aux[:, 1]))
        metrics_fn = metrics_test_fn
    else:
        metrics_batch = (main_batches[0][0], main_batches[1][0])
        metrics_fn = metrics_train_fn

    # device-resident, pre-stacked test_character batches: each eval pass
    # then runs as one lax.map program instead of ~30 tunneled dispatches
    # with per-batch host->device transfers
    _tc = list(data.sprites_batch_iterator(test_char_d, batch_test_char))
    tc_frames_dev = jnp.asarray(np.stack([f for f, _ in _tc]), jnp.float32)
    tc_action_dev = jnp.asarray(np.stack([a[:, 1] for _, a in _tc]),
                                jnp.float32)
    tc_last_frames = _tc[-1][0]
    del _tc

    # NOTE: the stacked arrays are passed as ARGUMENTS, not closed over —
    # a closure would embed them as compile-time constants, which the
    # device link re-uploads with the program (hundreds of MB)
    @jax.jit
    def test_recon_losses_fn(params, frames_st, action_st, key, geco):
        def body(b):
            loss, _ = test_recon_fn(params, b, key, geco)
            return loss
        return jnp.sum(jax.lax.map(body, (frames_st, action_st)))

    @jax.jit
    def encode_all_fn(params, frames_st, action_st):
        mus, vs, auxs = jax.lax.map(
            lambda fb: encode_fn(params, fb[0], fb[1]),
            (frames_st, action_st))
        return (mus.reshape(-1, mus.shape[-1]),
                vs.reshape(-1, vs.shape[-1]),
                auxs.reshape(-1, auxs.shape[-1]))

    @jax.jit
    def cgen_losses_fn(params, frames_st, action_st, mean_terms, sigma_inv,
                       kmm_inv, key):
        def body(b):
            _, _, loss = cgen_fn(params, b[0], b[1], mean_terms, sigma_inv,
                                 kmm_inv, key)
            return loss
        return jnp.sum(jax.lax.map(body, (frames_st, action_st)))

    eval_key = jax.random.PRNGKey(11)
    cgen_history = []
    steps_done = start_steps = int(state.step)  # nonzero on resume
    t_start = time.time()
    timer = utils.StepTimer(steps_per_block=n_full)
    # --basin_retry: snapshot the post-pretrain params on the HOST (the
    # device buffers are donated into the first epoch program, so a
    # restart cannot reuse them directly)
    params_host = jax.device_get(params) if args.basin_retry else None
    basin_attempt = 0
    epoch = 0
    while epoch < nr_epochs:
        plateau = False
        t_epoch = time.time()
        trace = utils.trace_if(args.profile_dir or "",
                               enabled=bool(args.profile_dir) and epoch == 1)
        with trace, (timer if epoch > 0 else contextlib.nullcontext()):
            state, ms = epoch_fn(state, main_batches)
            elbos = list(np.asarray(ms["elbo"]))
            losses = list(np.asarray(ms["recon"]))
        steps_done += n_full
        if tail_n:
            batch = (train_frames_dev[-tail_n:], train_action_dev[-tail_n:])
            state, m = step_fn(state, batch)
            elbos.append(float(m["elbo"]))
            losses.append(float(m["recon"]))
            steps_done += 1
        utils.check_finite(elbos, steps_done, state, run_dir)
        print(f"epoch {epoch}: mean ELBO/batch {np.mean(elbos):.3f}, "
              f"train MSE {np.sum(losses) / N_train:.5f}, "
              f"{time.time() - t_epoch:.2f}s")

        if run_dir:
            out = metrics_fn(state.params, metrics_batch, eval_key,
                             state.geco)
            row = [steps_done, float(out.elbo), float(out.recon_loss),
                   float(out.kl_term),
                   float(out.qnet_mu.min()), float(out.qnet_mu.max()),
                   float(out.qnet_var.min()), float(out.qnet_var.max())]
            if is_svgpvae:
                row += [float(out.inside_elbo),
                        float(out.inside_elbo_recon),
                        float(out.inside_elbo_kl), float(out.ce_term),
                        float(out.p_m.min()), float(out.p_m.max()),
                        float(out.p_v.min()), float(out.p_v.max()),
                        float(state.geco.C_ma),
                        float(state.geco.lagrange_mult)]
            savers["elbo"](row)
            if is_svgpvae:
                gp_p = state.params["gp"]
                savers["gp"]([steps_done,
                              float(jnp.linalg.norm(gp_p.gplvm_action)),
                              float(jnp.linalg.norm(gp_p.inducing_points)),
                              float(gp_p.l_action), float(gp_p.sigma_action),
                              float(gp_p.l_character),
                              float(gp_p.sigma_character)])

        if (epoch + 1) % args.eval_every == 0:
            # full GP parameter arrays for offline diagnostics (the
            # reference streams GPLVM/IP arrays through res_saver_GP,
            # SPRITES_experiment.py:287-294)
            if run_dir and is_svgpvae:
                gp_p = state.params["gp"]
                np.savez(os.path.join(run_dir, "res",
                                      f"gp_params_{steps_done}.npz"),
                         gplvm_action=np.asarray(gp_p.gplvm_action),
                         inducing_points=np.asarray(gp_p.inducing_points))
            # test_character reconstruction (aux columns are
            # [character_id, action_frame_id]; the GP consumes ACTION ids)
            test_mse = float(test_recon_losses_fn(
                state.params, tc_frames_dev, tc_action_dev, eval_key,
                state.geco)) / N_test
            print(f"  test recon MSE: {test_mse:.5f}")
            if run_dir:
                _, recon_imgs = test_recon_fn(
                    state.params, (tc_frames_dev[-1], tc_action_dev[-1]),
                    eval_key, state.geco)
                plots.plot_image_grid(
                    tc_last_frames, np.asarray(recon_imgs),
                    f"epoch {epoch + 1}. recon MSE {test_mse:.4f}",
                    save_path=os.path.join(run_dir, "pics",
                                           f"{steps_done}_recon.png"))

            # conditional generation for unseen characters
            if is_svgpvae:
                means, variances, auxs = encode_all_fn(
                    state.params, main_batches[0], main_batches[1])
                if tail_n:
                    mu, var, aux_j = encode_fn(state.params,
                                               train_frames_dev[-tail_n:],
                                               train_action_dev[-tail_n:])
                    means = jnp.concatenate([means, mu])
                    variances = jnp.concatenate([variances, var])
                    auxs = jnp.concatenate([auxs, aux_j])
                mean_terms, sigma_inv, kmm_inv = precompute_fn(
                    state.params, means, variances, auxs)

                cg_sum = cgen_losses_fn(state.params, tc_frames_dev,
                                        tc_action_dev, mean_terms,
                                        sigma_inv, kmm_inv, eval_key)
                pics, tgts, _ = cgen_fn(
                    state.params, tc_frames_dev[-1], tc_action_dev[-1],
                    mean_terms, sigma_inv, kmm_inv, eval_key)
                cgen_mse = float(cg_sum) / (
                    N_test * (1 - args.N_context / N_ACTIONS))
                cgen_history.append((epoch, cgen_mse))
                print(f"  cgen test MSE: {cgen_mse:.5f}")

                if (args.basin_retry and basin_attempt < args.basin_retry
                        and len(cgen_history) == args.basin_detect_evals):
                    first_cgen = cgen_history[0][1]
                    best_cgen = min(c for _, c in cgen_history)
                    if best_cgen > (1 - args.basin_detect_rel) * first_cgen:
                        plateau = True

                best = min(cgen_history, key=lambda x: x[1])[1]
                if run_dir and cgen_mse <= best:
                    with open(os.path.join(run_dir, "cgen_images.p"),
                              "wb") as f:
                        pickle.dump(np.asarray(pics), f)
                    with open(os.path.join(run_dir,
                                           "cgen_images_target.p"),
                              "wb") as f:
                        pickle.dump(np.asarray(tgts), f)
                if run_dir:
                    plots.plot_image_grid(
                        np.asarray(tgts), np.asarray(pics),
                        f"epoch {epoch + 1}. CGEN MSE {cgen_mse:.4f}",
                        save_path=os.path.join(run_dir, "pics",
                                               f"{steps_done}_cgen.png"))
                    with open(os.path.join(run_dir, "pics",
                                           "test_metrics.txt"), "a") as f:
                        f.write(f"{epoch + 1},{round(test_mse, 4)},"
                                f"{round(cgen_mse, 4)}\n")

            if run_dir and args.save_model_weights:
                utils.save_checkpoint(os.path.join(run_dir, "ckpt"), state,
                                      steps_done)

        epoch += 1
        if plateau:
            basin_attempt += 1
            first_cgen = cgen_history[0][1]
            best_cgen = min(c for _, c in cgen_history)
            print(f"basin detector: cgen has not descended "
                  f"{args.basin_detect_rel:.0%} from its first eval "
                  f"({first_cgen:.5f} -> best {best_cgen:.5f}) after "
                  f"{len(cgen_history)} evals — plateau attractor; "
                  f"restarting main loop (attempt {basin_attempt}/"
                  f"{args.basin_retry}) with a re-split sampling stream")
            # rebuild the stream root from the seed args — main_key itself
            # was donated into the epoch program with the TrainState
            base_key = (jax.random.PRNGKey(args.main_seed)
                        if args.main_seed >= 0
                        else jax.random.fold_in(
                            jax.random.PRNGKey(args.seed), 202))
            retry_key = jax.random.fold_in(base_key, 7000 + basin_attempt)
            fresh_params = jax.tree_util.tree_map(jnp.asarray, params_host)
            state = train.TrainState.create(fresh_params, tx, retry_key)
            if mesh is not None:
                state = parallel.replicate(mesh, state)
            cgen_history = []
            steps_done = start_steps
            timer = utils.StepTimer(steps_per_block=n_full)
            epoch = 0

    elapsed = time.time() - t_start
    run_steps = steps_done - start_steps
    print(f"total: {run_steps} steps in {elapsed:.1f}s "
          f"({run_steps / max(elapsed, 1e-9):.2f} steps/s)")
    print(f"train-step timing (excl. compile/eval): {timer.summary()}")
    for s in savers.values():
        s.flush()
    if run_dir and args.save_model_weights:
        utils.save_checkpoint(os.path.join(run_dir, "ckpt"), state,
                              steps_done)
    result = {"steps_per_sec": run_steps / max(elapsed, 1e-9),
              "run_dir": run_dir, "state": state}
    if cgen_history:
        best = min(cgen_history, key=lambda x: x[1])
        print(f"best cgen MSE {best[1]:.5f} at epoch {best[0]}")
        result["best_cgen_mse"] = best[1]
    return result


if __name__ == "__main__":
    run_experiment(build_parser().parse_args())
