"""Perceptual hashing for group-k-fold assignment of video trials.

Several trials share identical stimulus videos; folds are assigned by a
64-bit perceptual hash of the video so duplicates always land in the same
fold (reference: ``/root/reference/src/phash.py`` + ``src/data.py:20-30``).

The hash is the classic pHash construction (the same one the ``imagehash``
package implements): resize the frame to 32x32 with Lanczos resampling,
take the 2-D DCT-II, keep the top-left 8x8 low-frequency block, threshold
at its median, and pack the 64 resulting bits MSB-first.  A video's hash is
the XOR of the hashes of five frames sampled evenly over its NaN-trimmed
length.  Fold id = hash % num_folds.
"""

from __future__ import annotations

import numpy as np
from PIL import Image
from scipy.fftpack import dct

from sensorium_tpu.utils import get_length_without_nan

HASH_SIZE = 8
HIGHFREQ_FACTOR = 4


def pack_bits(bits: np.ndarray) -> int:
    """Pack a flat boolean array into an int, first element = MSB."""
    value = 0
    for bit in np.asarray(bits, dtype=np.uint8).ravel():
        value = (value << 1) | int(bit)
    return value


def frame_phash(frame: np.ndarray) -> int:
    """64-bit pHash of a single grayscale frame (H, W) of uint8 range."""
    img_size = HASH_SIZE * HIGHFREQ_FACTOR
    image = Image.fromarray(frame.astype(np.uint8), "L")
    image = image.resize((img_size, img_size), Image.Resampling.LANCZOS)
    pixels = np.asarray(image)
    freq = dct(dct(pixels, axis=0), axis=1)
    low = freq[:HASH_SIZE, :HASH_SIZE]
    return pack_bits(low > np.median(low))


def video_phash(video: np.ndarray, num_hash_frames: int = 5) -> int:
    """XOR-combined pHash of ``num_hash_frames`` frames sampled evenly.

    ``video`` has shape (H, W, T); frames past the first NaN are ignored.
    """
    length = get_length_without_nan(video[0, 0])
    if length < num_hash_frames:
        # ValueError, not assert (-O-proof): a degenerate video must not
        # silently fold-assign from a zero-stride frame sample.
        raise ValueError(
            f"video has {length} usable frames, need >= {num_hash_frames} to hash"
        )
    step = length // num_hash_frames
    combined = 0
    for frame_index in range(step // 2, length, step)[:num_hash_frames]:
        combined ^= frame_phash(video[..., frame_index])
    return combined
