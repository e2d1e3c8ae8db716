"""Native host-runtime (C++ via ctypes) parity with the NumPy pipeline."""

import numpy as np
import pytest

from sensorium_tpu.data import native
from sensorium_tpu.data.inputs import StackInputsProcessor

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(37, 50)).astype(np.float32)
    idx = np.array([0, 3, 5, 49, 7], np.int64)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[:, idx])


def test_gather_rows_fallback_non_f32():
    src = np.arange(20, dtype=np.float64).reshape(2, 10)
    idx = np.array([1, 3], np.int64)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[:, idx])


@pytest.mark.parametrize("video_hw", [(12, 16), (16, 16), (36, 64)])
def test_assemble_matches_stack_inputs_processor(video_hw):
    rng = np.random.default_rng(1)
    h, w = video_hw
    t = 30
    size = (16, 16) if w <= 16 else (64, 64)  # (width, height)
    video = rng.uniform(0, 255, (h, w, t)).astype(np.float32)
    behavior = rng.uniform(0, 5, (2, t)).astype(np.float32)
    pupil = rng.uniform(0, 200, (2, t)).astype(np.float32)
    idx = np.array([0, 2, 4, 29], np.int64)

    proc = StackInputsProcessor(size=size, pad_fill_value=0.5)
    expected = proc(video[..., idx], behavior[:, idx], pupil[:, idx])
    actual = native.assemble_stack_input(
        video, behavior, pupil, idx, size, fill=0.5
    )
    assert actual is not None
    np.testing.assert_allclose(actual, expected, rtol=0, atol=0)


def test_assemble_rejects_unsupported_dtype():
    video = np.zeros((4, 4, 5), np.float64)
    out = native.assemble_stack_input(
        video,
        np.zeros((2, 5), np.float32),
        np.zeros((2, 5), np.float32),
        np.array([0], np.int64),
        (4, 4),
    )
    assert out is None


def test_assemble_from_memory_mapped_file(tmp_path):
    rng = np.random.default_rng(2)
    video = rng.uniform(0, 255, (8, 10, 20)).astype(np.float32)
    path = tmp_path / "video.npy"
    np.save(path, video)
    mapped = np.load(path, mmap_mode="r")
    behavior = rng.uniform(0, 1, (2, 20)).astype(np.float32)
    pupil = rng.uniform(0, 1, (2, 20)).astype(np.float32)
    idx = np.array([1, 5, 19], np.int64)
    proc = StackInputsProcessor(size=(16, 16), pad_fill_value=0.0)
    expected = proc(video[..., idx], behavior[:, idx], pupil[:, idx])
    actual = native.assemble_stack_input(mapped, behavior, pupil, idx, (16, 16))
    np.testing.assert_allclose(actual, expected)
