from sensorium_tpu.ops.norm import BatchNorm  # noqa: F401
from sensorium_tpu.ops.conv import (  # noqa: F401
    depthwise_conv_spatial,
    depthwise_conv_temporal,
    grouped_pointwise,
)
from sensorium_tpu.ops.pe import position_encoding_3d  # noqa: F401
from sensorium_tpu.ops.stochastic import channel_dropout, drop_path  # noqa: F401
from sensorium_tpu.ops.shuffle import channel_shuffle  # noqa: F401
