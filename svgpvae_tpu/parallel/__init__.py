from svgpvae_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_jit,
    sharded_precompute_gp_params,
)
