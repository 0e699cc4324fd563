from svgpvae_tpu.utils.metrics import (  # noqa: F401
    mse_rotation,
    ResultSaver,
    count_params,
    check_finite,
    NonFiniteLossError,
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
from svgpvae_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    annotate,
    trace_if,
)
from svgpvae_tpu.utils.misc import (  # noqa: F401
    dict_to_flags,
    save_video_frames,
)
