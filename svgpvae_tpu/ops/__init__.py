from svgpvae_tpu.ops.gp_stats import (  # noqa: F401
    gp_sufficient_stats,
    gp_sufficient_stats_reference,
)
