"""3-axis sinusoidal absolute positional encoding.

The reference adds a 3-D sinusoidal PE before every core block
(``/root/reference/src/models/dwiseneuro.py:147-192``): the channel budget
is split evenly over the three axes (ceil(C/6)*2 channels per axis, bumped
to even), each axis contributing [sin(f_0 p) .. sin(f_{n-1} p),
cos(f_0 p) .. cos(f_{n-1} p)] with f_i = 10000^(-2i/ch); the concatenated
(3*ch) table is truncated to C channels.  Remaining channel slots (when
3*ch > C) are cut, and unused slots would be zero.

On TPU the table depends only on static shapes, so it is precomputed in
NumPy at trace time and baked into the program as a constant — zero
runtime cost beyond the fused add.

Returned layout is channels-last: (T, H, W, C) for input (B, T, H, W, C),
with axis order (T, H, W) matching the reference's (x, y, z).
"""

from __future__ import annotations

import functools
import math

import numpy as np


@functools.lru_cache(maxsize=None)
def _pe_table(channels: int, t: int, h: int, w: int) -> np.ndarray:
    per_axis = math.ceil(channels / 6) * 2
    if per_axis % 2:
        per_axis += 1
    inv_freq = 1.0 / (10000 ** (np.arange(0, per_axis, 2, dtype=np.float32) / per_axis))

    def axis_embedding(length: int) -> np.ndarray:
        # (per_axis, length): first half sines, second half cosines.
        angles = np.outer(inv_freq, np.arange(length, dtype=np.float32))
        return np.concatenate([np.sin(angles), np.cos(angles)], axis=0)

    table = np.zeros((3 * per_axis, t, h, w), dtype=np.float32)
    table[:per_axis] = axis_embedding(t)[:, :, None, None]
    table[per_axis : 2 * per_axis] = axis_embedding(h)[:, None, :, None]
    table[2 * per_axis :] = axis_embedding(w)[:, None, None, :]
    # Truncate to the requested channel count and move channels last.
    return np.ascontiguousarray(np.transpose(table[:channels], (1, 2, 3, 0)))


def position_encoding_3d(channels: int, t: int, h: int, w: int) -> np.ndarray:
    """PE table of shape (T, H, W, C) to be added (broadcast over batch)."""
    return _pe_table(channels, t, h, w)
