from svgpvae_tpu.ops.gp_stats import (  # noqa: F401
    gp_sufficient_stats,
    gp_sufficient_stats_reference,
)
from svgpvae_tpu.ops.chol_inverse import (  # noqa: F401
    chol_inverse,
    chol_inverse_pallas,
    chol_inverse_ref,
)
