from sensorium_tpu.models.dwiseneuro import DwiseNeuro  # noqa: F401
from sensorium_tpu.models.registry import get_nn_module  # noqa: F401
