from svgpvae_tpu.nn.nets import (  # noqa: F401
    BallEncoder,
    BallDecoder,
    MnistEncoder,
    MnistDecoder,
    MnistVAE,
    MnistCVAE,
    SpritesVAE,
    SpritesReprNet,
    ClassificationHead,
    SVIGPDecoder,
    FusedUpsampleConv2x,
    upsample2x,
)
