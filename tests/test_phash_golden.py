"""Fold-assignment hash parity pinning.

The reference assigns CV folds by ``imagehash.phash`` of video frames
(``/root/reference/src/phash.py:13-26``); a single differing bit silently
scrambles every fold.  The ``imagehash`` package is not installable in this
environment, so parity is pinned three independent ways:

0. the relevant ~10 lines of ``imagehash.phash`` itself (v4.3.1, BSD
   2-Clause) are vendored below as the oracle and run on the REAL PIL
   resize + scipy DCT against natural-image-statistics frames
   (``TestVendoredImagehashParity``);

1. an independent re-derivation of the exact pHash pipeline — PIL Lanczos
   resize to 32x32, *naive O(n^2) DCT-II from the textbook cosine formula*
   (matching scipy.fftpack's unnormalized type-2 convention that imagehash
   uses), median threshold, and the reference's string-based bit packing
   (``binary_array_to_int``, ``src/phash.py:8-10``) — asserted bit-exact
   against ``sensorium_tpu.data.phash`` on many random and structured
   frames;
2. frozen golden hash values (``tests/golden/phash_golden.json``) for
   deterministic synthetic frames and videos, so any future drift in the
   implementation (or in PIL/scipy behavior) fails loudly.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from sensorium_tpu.data.phash import frame_phash, video_phash

GOLDEN_PATH = Path(__file__).parent / "golden" / "phash_golden.json"


def naive_dct2(x: np.ndarray) -> np.ndarray:
    """Unnormalized DCT-II along axis 0, straight from the definition.

    scipy.fftpack.dct(x, type=2, norm=None):
        X[k] = 2 * sum_n x[n] * cos(pi * k * (2n + 1) / (2N))
    """
    n = x.shape[0]
    grid_n = np.arange(n)
    basis = 2.0 * np.cos(np.pi * np.outer(grid_n, 2 * grid_n + 1) / (2 * n))
    return np.tensordot(basis, x.astype(np.float64), axes=(1, 0))


def independent_frame_phash(frame: np.ndarray) -> int:
    """imagehash.phash re-derived with no shared DCT/packing code.

    Mirrors imagehash's phash (hash_size=8, highfreq_factor=4): convert to
    'L', Lanczos resize to 32x32, 2-D DCT-II (axis 0 then axis 1), keep the
    top-left 8x8, threshold at the median, pack bits via the reference's
    string construction.
    """
    image = Image.fromarray(frame.astype(np.uint8), "L").convert("L")
    image = image.resize((32, 32), Image.Resampling.LANCZOS)
    pixels = np.asarray(image)
    freq = naive_dct2(naive_dct2(pixels).T).T  # axis 0 then axis 1
    low = freq[:8, :8]
    bits = (low > np.median(low)).ravel()
    bit_string = "".join(str(b) for b in 1 * bits)  # src/phash.py:8-10
    return int(bit_string, 2)


# --- Vendored imagehash oracle --------------------------------------------
# Transcribed from the ``imagehash`` package, v4.3.1 (BSD 2-Clause license,
# (c) Johannes Buchner and contributors — github.com/JohannesBuchner/
# imagehash, ``imagehash/__init__.py::phash``).  The reference computes fold
# assignment with exactly this function (src/phash.py:13-16 calls
# ``imagehash.phash``); the package itself is not installable in this
# environment, so its ~10 relevant lines are vendored as the test-only
# oracle, running on the REAL PIL resize + scipy.fftpack DCT.


def vendored_imagehash_phash(image: Image.Image, hash_size=8, highfreq_factor=4):
    """imagehash.phash, verbatim behavior; returns the boolean hash array."""
    import scipy.fftpack

    img_size = hash_size * highfreq_factor
    image = image.convert("L").resize(
        (img_size, img_size), Image.Resampling.LANCZOS
    )
    pixels = np.asarray(image)
    dct = scipy.fftpack.dct(scipy.fftpack.dct(pixels, axis=0), axis=1)
    dctlowfreq = dct[:hash_size, :hash_size]
    med = np.median(dctlowfreq)
    diff = dctlowfreq > med
    return diff


def vendored_frame_phash(frame: np.ndarray) -> int:
    """reference ``calculate_frame_phash`` (src/phash.py:13-16) on top of
    the vendored oracle, including its string-based bit packing
    (src/phash.py:8-10)."""
    image = Image.fromarray(frame.astype(np.uint8), "L")
    bits = vendored_imagehash_phash(image).ravel()
    bit_string = "".join(str(b) for b in 1 * bits)
    return int(bit_string, 2)


def natural_frames() -> list[np.ndarray]:
    """Frames with natural-image statistics (1/f-ish smoothed noise at
    several correlation lengths, plus a gradient+blobs scene), at the real
    data's 36x64 frame geometry and others."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(42)
    frames = []
    for sigma in (1.0, 2.0, 4.0, 8.0):
        for shape in ((36, 64), (64, 64), (90, 120)):
            img = gaussian_filter(rng.normal(size=shape), sigma)
            img = (img - img.min()) / (np.ptp(img) + 1e-9) * 255.0
            frames.append(img.astype(np.float32))
    yy, xx = np.mgrid[0:36, 0:64]
    scene = 80.0 + 1.5 * xx + 0.8 * yy
    for cx, cy, r, amp in [(20, 12, 6, 90.0), (45, 25, 9, -60.0)]:
        scene = scene + amp * np.exp(
            -(((xx - cx) ** 2 + (yy - cy) ** 2) / (2.0 * r * r))
        )
    frames.append(np.clip(scene, 0, 255).astype(np.float32))
    return frames


class TestVendoredImagehashParity:
    """Bit-identity against the vendored imagehash.phash on natural frames
    — the fold-assignment parity proof (data.py:28: fold = phash % 7)."""

    def test_natural_frames_bit_identical(self):
        for i, frame in enumerate(natural_frames()):
            assert frame_phash(frame) == vendored_frame_phash(frame), i

    def test_random_frames_bit_identical(self):
        rng = np.random.default_rng(1234)
        for _ in range(30):
            h, w = int(rng.integers(8, 120)), int(rng.integers(8, 120))
            frame = rng.uniform(0, 255, (h, w)).astype(np.float32)
            assert frame_phash(frame) == vendored_frame_phash(frame)

    def test_video_hash_matches_reference_loop(self):
        """Full video hash (XOR of 5 sampled frames, src/phash.py:19-26)
        against the reference loop run on the vendored oracle."""
        base = [f[:36, :64] for f in natural_frames()[:6]]
        length = 37
        video = np.clip(
            np.stack(
                [base[t % len(base)] * (0.8 + 0.05 * t) for t in range(length)],
                axis=-1,
            ),
            0,
            255,
        ).astype(np.float32)
        step = length // 5
        expected = 0
        for frame_index in range(step // 2, length, step)[:5]:
            expected ^= vendored_frame_phash(video[..., frame_index])
        assert video_phash(video) == expected

    def test_fold_assignment_identical(self):
        """fold = phash % 7 (data.py:28) — one differing bit scrambles CV."""
        for frame in natural_frames():
            # 7 identical frames: the XOR of an odd number of equal hashes
            # is the frame hash itself, so the video fold must equal it.
            video = np.repeat(frame[:, :, None], 7, axis=2)
            assert video_phash(video) % 7 == vendored_frame_phash(frame) % 7


class TestFramePhashIndependentParity:
    def test_random_frames(self):
        rng = np.random.default_rng(7)
        for _ in range(50):
            h = int(rng.integers(8, 80))
            w = int(rng.integers(8, 80))
            frame = rng.uniform(0, 255, (h, w)).astype(np.float32)
            assert frame_phash(frame) == independent_frame_phash(frame)

    def test_structured_frames(self):
        """Gradients/constants stress the median threshold and DCT signs.

        Degenerate frames produce exact-zero DCT coefficients tied with the
        median; scipy's FFT-based DCT keeps them exactly zero while the
        naive cosine-sum DCT leaves ~1e-12 rounding noise, so bits tied at
        the median are excluded from the comparison (imagehash itself uses
        scipy, which ``sensorium_tpu.data.phash`` shares).
        """
        from scipy.fftpack import dct as scipy_dct

        ramp = np.tile(np.linspace(0, 255, 64, dtype=np.float32), (36, 1))
        checker = (np.indices((36, 64)).sum(axis=0) % 2 * 255).astype(np.float32)
        for frame in (ramp, ramp.T.copy(), checker, np.full((36, 64), 128.0)):
            image = Image.fromarray(frame.astype(np.uint8), "L")
            pixels = np.asarray(image.resize((32, 32), Image.Resampling.LANCZOS))
            low = scipy_dct(scipy_dct(pixels, axis=0), axis=1)[:8, :8]
            med = np.median(low)
            untied = (np.abs(low - med) > 1e-6 * max(np.abs(low).max(), 1.0)).ravel()
            ours = np.array(
                [(frame_phash(frame) >> (63 - i)) & 1 for i in range(64)], bool
            )
            theirs = np.array(
                [(independent_frame_phash(frame) >> (63 - i)) & 1 for i in range(64)],
                bool,
            )
            np.testing.assert_array_equal(ours[untied], theirs[untied])

    def test_video_xor_combination(self):
        """Video hash = XOR of 5 evenly sampled frames (src/phash.py:19-26)."""
        rng = np.random.default_rng(3)
        length = 53
        video = rng.uniform(0, 255, (36, 64, length)).astype(np.float32)
        step = length // 5
        expected = 0
        for frame_index in range(step // 2, length, step)[:5]:
            expected ^= independent_frame_phash(video[..., frame_index])
        assert video_phash(video) == expected

    def test_video_nan_trimmed_length(self):
        """Frames past the first NaN must not contribute to the hash."""
        rng = np.random.default_rng(5)
        video = rng.uniform(0, 255, (20, 30, 40)).astype(np.float32)
        trimmed = video.copy()
        trimmed[:, :, 25:] = np.nan
        assert video_phash(trimmed) == video_phash(video[:, :, :25])


class TestFrozenGoldens:
    """Golden values frozen at generation time — catches any drift."""

    def test_golden_values(self):
        golden = json.loads(GOLDEN_PATH.read_text())
        for case in golden["frames"]:
            rng = np.random.default_rng(case["seed"])
            frame = rng.uniform(0, 255, tuple(case["shape"])).astype(np.float32)
            assert frame_phash(frame) == int(case["hash"], 16), case
        for case in golden["videos"]:
            rng = np.random.default_rng(case["seed"])
            video = rng.uniform(0, 255, tuple(case["shape"])).astype(np.float32)
            assert video_phash(video) == int(case["hash"], 16), case

    def test_natural_frame_goldens(self):
        """Frozen hashes of the natural-image-statistics frames, checked
        against BOTH implementations (ours and the vendored imagehash)."""
        golden = json.loads(GOLDEN_PATH.read_text())
        frames = natural_frames()
        assert len(golden["natural_frames"]) == len(frames)
        for case, frame in zip(golden["natural_frames"], frames):
            assert frame_phash(frame) == int(case["hash"], 16), case
            assert vendored_frame_phash(frame) == int(case["hash"], 16), case

    def test_goldens_are_nontrivial(self):
        golden = json.loads(GOLDEN_PATH.read_text())
        hashes = {c["hash"] for c in golden["frames"] + golden["videos"]}
        assert len(hashes) == len(golden["frames"]) + len(golden["videos"])
        assert all(int(h, 16) != 0 for h in hashes)


if __name__ == "__main__":
    # Regenerate the frozen goldens (run only when the hash definition is
    # intentionally revalidated against the independent implementation).
    frames = []
    for seed, shape in [(0, (36, 64)), (1, (12, 16)), (2, (70, 70)), (3, (8, 8))]:
        rng = np.random.default_rng(seed)
        frame = rng.uniform(0, 255, shape).astype(np.float32)
        value = frame_phash(frame)
        assert value == independent_frame_phash(frame)
        frames.append({"seed": seed, "shape": list(shape), "hash": f"{value:016x}"})
    videos = []
    for seed, shape in [(10, (36, 64, 60)), (11, (20, 30, 31))]:
        rng = np.random.default_rng(seed)
        video = rng.uniform(0, 255, shape).astype(np.float32)
        videos.append(
            {"seed": seed, "shape": list(shape), "hash": f"{video_phash(video):016x}"}
        )
    natural = []
    for i, frame in enumerate(natural_frames()):
        value = frame_phash(frame)
        assert value == vendored_frame_phash(frame), i
        natural.append({"index": i, "shape": list(frame.shape), "hash": f"{value:016x}"})
    GOLDEN_PATH.write_text(
        json.dumps(
            {"frames": frames, "videos": videos, "natural_frames": natural}, indent=1
        )
    )
    print(f"wrote {GOLDEN_PATH}")
