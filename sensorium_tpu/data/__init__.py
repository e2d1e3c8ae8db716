from sensorium_tpu.data.indexes import WindowIndexer  # noqa: F401
from sensorium_tpu.data.mouse_data import get_folds_tiers, get_mouse_data  # noqa: F401
from sensorium_tpu.data.inputs import get_inputs_processor  # noqa: F401
from sensorium_tpu.data.responses import (  # noqa: F401
    ResponseNormalizer,
    get_responses_processor,
)
from sensorium_tpu.data.datasets import (  # noqa: F401
    MiceBatch,
    TrainMiceDataset,
    ValMiceDataset,
)
