from sensorium_tpu.compat.torch_weights import (  # noqa: F401
    convert_torch_state_dict,
    to_torch_state_dict,
)
