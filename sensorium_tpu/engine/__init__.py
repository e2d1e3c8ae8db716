from sensorium_tpu.engine.callbacks import (  # noqa: F401
    Callback,
    Checkpoint,
    EngineState,
    LoggingToCSV,
    LoggingToFile,
    Timer,
)
from sensorium_tpu.engine.ema import ema_update  # noqa: F401
from sensorium_tpu.engine.losses import (  # noqa: F401
    get_loss,
    mice_poisson_distill_loss,
    mice_poisson_loss,
)
from sensorium_tpu.engine.metrics import CorrelationMetric, corr  # noqa: F401
from sensorium_tpu.engine.model import MouseModel, load_model  # noqa: F401
from sensorium_tpu.engine.schedule import cosine_annealing, warmup_cosine  # noqa: F401
from sensorium_tpu.engine.state import TrainState  # noqa: F401
