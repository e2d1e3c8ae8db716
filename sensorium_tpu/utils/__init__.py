from sensorium_tpu.utils.misc import (  # noqa: F401
    get_best_model_path,
    get_length_without_nan,
    get_lr,
)
from sensorium_tpu.utils.profiling import (  # noqa: F401
    Stopwatch,
    annotate,
    debug_nans,
    sync,
    trace,
)
