"""svgpvae_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
Scalable Gaussian Process Variational Autoencoders.

Re-implements, TPU-first, every capability of the reference TF1.15 research
codebase (ratschlab/SVGP-VAE): the SVGPVAE model with Hensman/Titsias
inside-ELBOs, GPLVM object/action kernels and GECO constrained optimization;
the baseline zoo (plain VAE, CVAE, Pearce GPVAE, Neural-Process ELBO, Casale
GPVAE, deep SVIGP); the moving-ball / rotated-MNIST / SPRITES workloads with
their conditional-generation evaluation pipelines; and the surrounding
runtime (training loops, checkpointing, metrics, data synthesis).

Design principles (see SURVEY.md §7):
  * pure functions + pytree parameter structs, `vmap` over latent channels,
    `jit`-compiled train/eval steps with static shapes;
  * Cholesky-solve linear algebra (never explicit inverses) tuned for MXU;
  * data parallelism via `jax.sharding.Mesh` + `shard_map`, gradients
    reduced with `psum` over ICI;
  * float32 by default (TPU-native), float64 verification mode on CPU.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Honor JAX_PLATFORMS even when a sitecustomize hook pre-registered a
# different backend (this environment's axon/TPU tunnel registers itself at
# interpreter start and wins over the env var unless re-asserted here).
if _os.environ.get("JAX_PLATFORMS"):
    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - backends already initialized
        pass

# TPU matmuls default to bfloat16-pass arithmetic, which destroys the
# cancellation-heavy GP linear algebra (Sigma assembly / Nystrom terms go
# non-PSD after a few hundred training steps and Cholesky NaNs).  The GP
# entry points therefore force full precision locally (linalg.precise);
# the global default stays relaxed so the conv nets keep the fast path
# (validated: 100-epoch north-star run clean, 1813 vs 1317 steps/s).
# Override with SVGPVAE_MATMUL_PRECISION={default,high,highest}.
if _os.environ.get("SVGPVAE_MATMUL_PRECISION"):
    _jax.config.update("jax_default_matmul_precision",
                       _os.environ["SVGPVAE_MATMUL_PRECISION"])

# Opt-in persistent XLA compilation cache (SVGPVAE_COMPILATION_CACHE=<dir>).
# On high-latency device links (this environment's TPU tunnel) compilation
# is the dominant wall-clock cost of a repeat-config run: the 1000-epoch
# north-star via --epoch_chunk spends ~53 s executing and ~60 s compiling.
# The cache persists serialized executables across processes keyed on HLO,
# so sweeps and re-runs of identical configs skip the compile entirely.
_cache_dir = _os.environ.get("SVGPVAE_COMPILATION_CACHE")
if _cache_dir:
    try:  # pragma: no cover - exercised on real backends
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

from svgpvae_tpu import kernels, linalg  # noqa: F401
