from svgpvae_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    resolve_data_parallel,
    shard_batch,
    shard_stacked_batches,
    replicate,
    data_parallel_jit,
    sharded_posterior_params,
    sharded_precompute_gp_params,
)
