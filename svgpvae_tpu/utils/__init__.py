from svgpvae_tpu.utils.metrics import (  # noqa: F401
    mse_rotation,
    ResultSaver,
    count_params,
)
from svgpvae_tpu.utils.rundir import (  # noqa: F401
    make_checkpoint_folder,
    dump_args,
)
from svgpvae_tpu.utils.checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    latest_step,
)
