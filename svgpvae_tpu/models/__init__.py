from svgpvae_tpu.models.svgpvae import (  # noqa: F401
    SVGPVAEOutputs,
    forward_pass_svgpvae,
    batching_encode_svgpvae,
    predict_cgen_mnist,
    precompute_gp_params,
    predict_cgen_sprites,
    sprites_aux_data,
    resolve_gp_block_impl,
)
from svgpvae_tpu.models.vae import (  # noqa: F401
    VAEOutputs,
    forward_pass_vae,
    predict_cvae,
)
from svgpvae_tpu.models.ball import (  # noqa: F401
    BallOutputs,
    ball_svgpvae_elbo,
    pearce_elbo,
)
from svgpvae_tpu.models.casale import (  # noqa: F401
    CasaleOutputs,
    encode_full_casale,
    forward_pass_casale,
    predict_cgen_casale,
)
from svgpvae_tpu.models.svigp import (  # noqa: F401
    SVIGPOutputs,
    forward_pass_deep_svigp,
    predict_deep_svigp,
)
