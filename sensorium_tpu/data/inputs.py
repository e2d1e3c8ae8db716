"""Input assembly: raw trial arrays -> (5, T, H, W) float32 model input.

Channel layout (reference: ``/root/reference/src/inputs.py:15-36``):
  0     grayscale video frame, zero-padded and centered to the target size
  1..2  behavior signals (pupil dilation, running speed) broadcast to planes
  3..4  pupil center (x, y) broadcast to planes

No normalization is applied — the model's first BatchNorm learns it.

Unlike the reference (one sample at a time through torch), processors here
are pure NumPy; the batched sliding-window predictor assembles its inputs
on device (infer/predictor.py) and only falls back to this host path for
non-``stack_inputs`` processors.
"""

from __future__ import annotations

import abc

import numpy as np


class InputsProcessor(abc.ABC):
    @abc.abstractmethod
    def __call__(
        self, frames: np.ndarray, behavior: np.ndarray, pupil_center: np.ndarray
    ) -> np.ndarray:
        """frames (H, W, T), behavior (2, T), pupil_center (2, T) -> (5, T, H', W')."""


class StackInputsProcessor(InputsProcessor):
    def __init__(self, size: tuple[int, int], pad_fill_value: float = 0.0):
        self.size = tuple(size)  # (width, height)
        self.pad_fill_value = pad_fill_value

    def __call__(self, frames, behavior, pupil_center):
        width, height = self.size
        length = frames.shape[-1]
        stacked = np.full((5, length, height, width), self.pad_fill_value, dtype=np.float32)

        planes = np.transpose(frames.astype(np.float32), (2, 0, 1))  # (T, H, W)
        src_h, src_w = planes.shape[-2:]
        if src_h > height or src_w > width:
            # The centering below assumes the frame fits the canvas; with
            # negative offsets numpy would raise an obscure broadcast error
            # (the reference has the same latent failure, inputs.py:26-30).
            raise ValueError(
                f"Video frame ({src_h}x{src_w}) exceeds the model canvas "
                f"({height}x{width}); resize the input or enlarge "
                "inputs_processor.size"
            )
        h0 = (height - src_h) // 2
        w0 = (width - src_w) // 2
        stacked[0, :, h0 : h0 + src_h, w0 : w0 + src_w] = planes

        stacked[1:3] = behavior[:, :, None, None]
        stacked[3:5] = pupil_center[:, :, None, None]
        return stacked


_REGISTRY: dict[str, type[InputsProcessor]] = {
    "stack_inputs": StackInputsProcessor,
}


def get_inputs_processor(name: str, processor_params: dict) -> InputsProcessor:
    if name not in _REGISTRY:
        raise KeyError(f"Unknown inputs processor '{name}'")
    return _REGISTRY[name](**processor_params)
