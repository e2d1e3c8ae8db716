"""ctypes bindings for the native host runtime (``native/sensorium_host.cpp``).

Loads (building on first use if a toolchain is available) the C++ shared
library implementing the hot host-side copies of the data pipeline:
time-window gathers and the fused StackInputs assembly.  Every entry point
has a NumPy fallback, so the framework degrades gracefully on systems
without ``g++``.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libsensorium_host.so"

_lib = None
_lib_checked = False
# First-use build+load must be single-flight: the loader fans dataset.get
# across a thread pool, and two threads racing through here would run two
# concurrent `make` jobs linking the same .so.
_load_lock = threading.Lock()


def reset() -> None:
    """Drop the cached library handle (re-evaluates SENSORIUM_NATIVE).

    Only affects FUTURE ``_load_library`` calls: datasets built earlier
    hold per-trial fillers whose closures captured the previous handle and
    keep calling it — rebuild any ``MouseTrialStore``/dataset after
    ``reset()`` for the new setting to take effect (what the A/B tests do).
    """
    global _lib, _lib_checked
    with _load_lock:
        _lib = None
        _lib_checked = False


def _load_library():
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    with _load_lock:
        if _lib_checked:
            return _lib
        return _load_library_locked()


def _load_library_locked():
    # _lib_checked flips LAST (in the finally): the unlocked fast path in
    # _load_library must never observe checked=True with _lib mid-build.
    global _lib, _lib_checked
    import os

    try:
        if os.environ.get("SENSORIUM_NATIVE", "1") == "0":
            return None
        try:
            if not _LIB_PATH.exists():
                _build()
            lib = ctypes.CDLL(str(_LIB_PATH))
            _configure(lib)
        except AttributeError:
            # A stale prebuilt .so lacking a newer entry point (build/ is
            # gitignored, so it can outlive the .cpp that produced it).
            # Force a rebuild; the Makefile's atomic rename gives the new
            # file a fresh inode, so this re-dlopen maps the NEW library
            # rather than returning the stale cached handle.
            try:
                _build(force=True)
                lib = ctypes.CDLL(str(_LIB_PATH))
                _configure(lib)
            except (OSError, subprocess.SubprocessError, AttributeError):
                return None
        except (OSError, subprocess.SubprocessError):
            return None
        _lib = lib
        return _lib
    finally:
        _lib_checked = True


def _build(force: bool = False) -> None:
    """Run ``make`` under a cross-process file lock.

    The in-process ``_load_lock`` cannot stop N *processes* (e.g.
    ``--fold-procs`` on a fresh checkout) from racing concurrent links of
    the same .so; the flock serializes them (the Makefile's atomic rename
    additionally guarantees no partial file is ever dlopen'd).
    """
    import fcntl

    build_dir = _NATIVE_DIR / "build"
    build_dir.mkdir(parents=True, exist_ok=True)
    with open(build_dir / ".build.lock", "w") as lock_file:
        fcntl.flock(lock_file, fcntl.LOCK_EX)
        cmd = ["make", "-C", str(_NATIVE_DIR)]
        if force:
            cmd.insert(1, "-B")
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def _configure(lib) -> None:

    i64 = ctypes.c_int64
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int64)
    lib.gather_rows_f32.argtypes = [fp, i64, i64, ip, i64, fp]
    lib.gather_rows_f32.restype = None
    lib.gather_rows_relu_f32.argtypes = [fp, i64, i64, ip, i64, fp]
    lib.gather_rows_relu_f32.restype = None
    lib.fill_sample.argtypes = [
        fp, i64, i64, i64,  # video
        fp, i64,  # behavior
        fp, i64,  # pupil
        fp, i64, i64,  # responses (nullable)
        ip, i64,  # indexes
        i64, i64, ctypes.c_float,  # out_h, out_w, fill
        fp, fp,  # input_out, target_out (nullable)
    ]
    lib.fill_sample.restype = None
    lib.assemble_stack_input.argtypes = [
        fp, i64, i64, i64,  # video
        fp, i64,  # behavior
        fp, i64,  # pupil
        ip, i64,  # indexes
        i64, i64, ctypes.c_float,  # out_h, out_w, fill
        fp,
    ]
    lib.assemble_stack_input.restype = None


def available() -> bool:
    return _load_library() is not None


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gather_rows(src: np.ndarray, indexes: np.ndarray) -> np.ndarray:
    """``src[..., indexes]`` for 2-D float32 row-major ``src`` (rows, T)."""
    lib = _load_library()
    indexes = np.ascontiguousarray(indexes, dtype=np.int64)
    if (
        lib is None
        or src.dtype != np.float32
        or src.ndim != 2
        or src.strides[1] != 4
    ):
        return np.ascontiguousarray(src[..., indexes])
    rows, t = src.shape
    if src.strides[0] != t * 4:
        return np.ascontiguousarray(src[..., indexes])
    if indexes.size == 0 or indexes.min() < 0 or indexes.max() >= t:
        # NumPy raises a loud IndexError; the C kernel would read OOB.
        return np.ascontiguousarray(src[..., indexes])
    out = np.empty((rows, indexes.shape[0]), np.float32)
    lib.gather_rows_f32(_f32ptr(src), rows, t, _i64ptr(indexes), indexes.shape[0], _f32ptr(out))
    return out


def gather_rows_relu_into(src: np.ndarray, indexes: np.ndarray, out: np.ndarray) -> bool:
    """``out[...] = max(src[..., indexes], 0)`` for 2-D float32 ``src``.

    Writes directly into ``out`` (a collated batch row slice); returns
    False when the native library or array layout cannot handle it (the
    caller then runs the NumPy fallback).
    """
    lib = _load_library()
    if (
        lib is None
        or src.dtype != np.float32
        or out.dtype != np.float32
        or src.ndim != 2
        or src.strides[1] != 4
        or not out.flags["C_CONTIGUOUS"]
    ):
        return False
    rows, t = src.shape
    if src.strides[0] != t * 4 or out.shape != (rows, indexes.shape[0]):
        return False
    indexes = np.ascontiguousarray(indexes, dtype=np.int64)
    if indexes.size == 0 or indexes.min() < 0 or indexes.max() >= t:
        # Caller's NumPy fallback raises a loud IndexError.
        return False
    lib.gather_rows_relu_f32(
        _f32ptr(src), rows, t, _i64ptr(indexes), indexes.shape[0], _f32ptr(out)
    )
    return True


def make_trial_filler(
    video: np.ndarray,
    behavior: np.ndarray,
    pupil_center: np.ndarray,
    responses: np.ndarray | None,
    out_size: tuple[int, int],
):
    """Pre-marshalled per-trial sample filler, or None if unsupported.

    Layout validation and the source-pointer ctypes conversions happen ONCE
    per trial here; the returned callable ``fill(indexes, fill_value,
    input_out, target_out)`` performs a single native call per sample (the
    per-call marshalling of the two-entry-point path measured comparable to
    the actual copy work).  The caller must keep batch-row outputs C-contig
    float32 (the loader's arrays are) and hold this filler no longer than
    the source arrays.
    """
    lib = _load_library()
    if lib is None:
        return None
    if video.dtype != np.float32 or video.ndim != 3:
        return None
    h, w, t = video.shape
    if video.strides != (w * t * 4, t * 4, 4):
        return None
    width, height = out_size
    if h > height or w > width:
        return None
    for sig in (behavior, pupil_center):
        # The C kernel reads exactly 2 rows unconditionally.
        if (
            sig.dtype != np.float32
            or sig.ndim != 2
            or sig.shape[0] != 2
            or not sig.flags["C_CONTIGUOUS"]
        ):
            return None
    if responses is not None:
        if (
            responses.dtype != np.float32
            or responses.ndim != 2
            or responses.strides[1] != 4
            or responses.strides[0] != responses.shape[1] * 4
        ):
            return None
        resp_ptr = _f32ptr(responses)
        resp_rows, resp_t = responses.shape
    else:
        resp_ptr, resp_rows, resp_t = None, 0, 0

    video_ptr = _f32ptr(video)
    behavior_ptr = _f32ptr(behavior)
    pupil_ptr = _f32ptr(pupil_center)
    bt, pt = behavior.shape[-1], pupil_center.shape[-1]
    # Window frame indexes address every source's time axis; trial length
    # is NaN-trimmed from ONE file (mouse_data.py), so a truncated sibling
    # file would otherwise read past its mmap end silently.
    time_limit = min(t, bt, pt) if responses is None else min(t, bt, pt, resp_t)
    fill_sample = lib.fill_sample
    c_float = ctypes.c_float
    # Closure keeps the source arrays (and their pointers) alive.
    sources = (video, behavior, pupil_center, responses)

    def fill(indexes: np.ndarray, fill_value: float, input_out, target_out) -> None:
        assert sources is not None
        # Same marshalling contract as the other wrappers: the C kernel
        # reads the buffer as contiguous int64 (a no-op when the indexer
        # already produced one; anything else would be reinterpreted as
        # garbage window indexes and read out of bounds).
        indexes = np.ascontiguousarray(indexes, dtype=np.int64)
        s = indexes.shape[0]
        # The NumPy paths fail loudly on these (fancy-index IndexError /
        # broadcast ValueError); the C kernel would corrupt memory — so
        # the fast path must raise the same class of error, not skip.
        if s == 0 or indexes.min() < 0 or indexes.max() >= time_limit:
            raise IndexError(
                f"window indexes out of range [0, {time_limit}) for trial "
                f"sources (video t={t}, behavior t={bt}, pupil t={pt}, "
                f"responses t={resp_t if responses is not None else 'n/a'})"
            )
        if (
            input_out.dtype != np.float32
            or not input_out.flags["C_CONTIGUOUS"]
            or input_out.shape != (5, s, height, width)
        ):
            raise ValueError(
                f"input_out must be C-contiguous float32 (5, {s}, {height}, "
                f"{width}); got {input_out.dtype} {input_out.shape}"
            )
        if target_out is not None:
            if (
                responses is None
                or target_out.dtype != np.float32
                or not target_out.flags["C_CONTIGUOUS"]
                or target_out.shape != (resp_rows, s)
            ):
                raise ValueError(
                    f"target_out must be C-contiguous float32 "
                    f"({resp_rows}, {s}) matching the responses file; got "
                    f"{target_out.dtype} {target_out.shape} (a mismatch "
                    "means responses rows disagree with meta neuron count)"
                )
        fill_sample(
            video_ptr, h, w, t,
            behavior_ptr, bt,
            pupil_ptr, pt,
            resp_ptr, resp_rows, resp_t,
            _i64ptr(indexes), s,
            height, width, c_float(fill_value),
            _f32ptr(input_out),
            _f32ptr(target_out) if target_out is not None else None,
        )

    return fill


def assemble_stack_input(
    video: np.ndarray,  # (H, W, T) float32, C-contiguous (mmap ok)
    behavior: np.ndarray,  # (2, T)
    pupil_center: np.ndarray,  # (2, T)
    indexes: np.ndarray,  # (S,) window frame indexes
    out_size: tuple[int, int],  # (width, height) canvas
    fill: float = 0.0,
    out: np.ndarray | None = None,
) -> np.ndarray | None:
    """Fused window gather + canvas pad + broadcast into (5, S, H', W').

    Returns None when the native path cannot handle the input (caller
    falls back to the NumPy processor).
    """
    lib = _load_library()
    if lib is None:
        return None
    if video.dtype != np.float32 or video.ndim != 3:
        return None
    if behavior.dtype != np.float32 or pupil_center.dtype != np.float32:
        return None
    h, w, t = video.shape
    if video.strides != (w * t * 4, t * 4, 4):
        return None
    # The C kernel reads exactly 2 rows of each signal.
    for sig in (behavior, pupil_center):
        if sig.ndim != 2 or sig.shape[0] != 2:
            return None

    width, height = out_size
    if h > height or w > width:
        # The C++ centering assumes the frame fits the canvas; an oversized
        # frame would index out of bounds (the NumPy fallback fails loudly).
        return None
    indexes = np.ascontiguousarray(indexes, dtype=np.int64)
    s = indexes.shape[0]
    time_limit = min(t, behavior.shape[-1], pupil_center.shape[-1])
    if s == 0 or indexes.min() < 0 or indexes.max() >= time_limit:
        # Out-of-range window: defer to the NumPy processor, whose fancy
        # indexing raises a loud IndexError (the C kernel would read past
        # the mmap end silently).
        return None
    if out is not None and (
        out.dtype != np.float32
        or not out.flags["C_CONTIGUOUS"]
        or out.shape != (5, s, height, width)
    ):
        return None
    if out is None:
        out = np.empty((5, s, height, width), np.float32)
    # Keep contiguous copies referenced for the duration of the C call
    # (ascontiguousarray also normalizes any exotic stride layout, so no
    # stride guard is needed on the signals).
    behavior_c = np.ascontiguousarray(behavior)
    pupil_c = np.ascontiguousarray(pupil_center)
    lib.assemble_stack_input(
        _f32ptr(video), h, w, t,
        _f32ptr(behavior_c), behavior_c.shape[-1],
        _f32ptr(pupil_c), pupil_c.shape[-1],
        _i64ptr(indexes), s,
        height, width, ctypes.c_float(fill),
        _f32ptr(out),
    )
    return out
