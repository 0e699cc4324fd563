from svgpvae_tpu.train.state import GECOState, TrainState  # noqa: F401
from svgpvae_tpu.train.geco import geco_effective_alpha  # noqa: F401
from svgpvae_tpu.train.trainer import (  # noqa: F401
    lr_schedule,
    make_optimizer,
    make_train_step,
    make_epoch_fn,
    make_multi_epoch_fn,
    make_generative_chunk_fn,
    stack_batches,
    parse_opt_regime,
    trainable_mask,
)
