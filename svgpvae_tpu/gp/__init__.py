from svgpvae_tpu.gp.svgp import (  # noqa: F401
    SVGPConfig,
    BallSVGP,
    MnistSVGP,
    SpritesSVGP,
    init_ball_svgp,
    init_mnist_svgp,
    init_sprites_svgp,
    kernel_matrices,
    posterior_params,
    hensman_terms,
    titsias_terms,
    variational_loss,
    approximate_posterior_params,
    mean_vector_bias_analysis,
    precompute_test_posterior_terms,
    posterior_from_precomputed,
)
from svgpvae_tpu.gp.fused import (gp_block_hensman, gp_block_titsias,  # noqa: F401
                                  ball_gp_block, ball_gp_block_titsias)
from svgpvae_tpu.gp.exact import gp_regression_1d  # noqa: F401
from svgpvae_tpu.gp.casale import (  # noqa: F401
    CasaleGP,
    init_casale_gp,
    kron,
    casale_kernel_matrix,
    mask_to_indices,
    v_matrix,
    taylor_coeffs,
    taylor_terms,
    casale_k_inv,
    casale_noise,
)
from svgpvae_tpu.gp.svigp import (  # noqa: F401
    SVIGP,
    init_svigp,
    svigp_variational_loss,
    svigp_posterior_params,
)
