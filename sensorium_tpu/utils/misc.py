"""Small host-side helpers.

Capability parity with the reference helpers in
``/root/reference/src/utils.py`` (linear LR scaling, best-checkpoint lookup
by filename-embedded score, NaN-trimmed trial length).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

# The sign belongs to the score: 'model-003--0.500000.ckpt' is val_corr
# -0.5 (Checkpoint formats {val_corr:.6f} after the epoch's own dash), and
# ranking it by |score| would load a worse-than-zero model as 'best'.
_SCORE_RE = re.compile(r"-(-?\d+(?:\.\d+)?)\.(?:pth|ckpt|msgpack)$")


def get_lr(base_lr: float, batch_size: int, base_batch_size: int = 4) -> float:
    """Linear learning-rate scaling with global batch size."""
    return base_lr * (batch_size / base_batch_size)


def get_best_model_path(dir_path, return_score: bool = False, more_better: bool = True):
    """Find the checkpoint with the best score embedded in its filename.

    Checkpoints are named ``model-{epoch:03d}-{score:.6f}.ckpt``; this parses
    the score suffix and returns the argmax (or argmin) path.
    """
    dir_path = Path(dir_path)
    scored: list[tuple[Path, float]] = []
    for pattern in ("*.ckpt", "*.pth", "*.msgpack"):
        for model_path in dir_path.glob(pattern):
            match = _SCORE_RE.search(model_path.name)
            if match is not None:
                scored.append((model_path, float(match.group(1))))

    if not scored:
        if return_score:
            return None, -np.inf if more_better else np.inf
        return None

    scored.sort(key=lambda item: item[1], reverse=more_better)
    best_path, best_score = scored[0]
    if return_score:
        return best_path, best_score
    return best_path


def get_length_without_nan(array: np.ndarray) -> int:
    """Length of the leading NaN-free prefix of a 1-D array."""
    nan_indexes = np.argwhere(np.isnan(array)).ravel()
    if nan_indexes.shape[0]:
        return int(nan_indexes[0])
    return int(array.shape[0])


def probe_jax_device_count(timeout_s: float = 300.0, strict: bool = True) -> int:
    """Count local JAX devices in a THROWAWAY subprocess.

    An orchestrating parent must never initialize a JAX backend itself (a
    TPU process owns every chip it touches, starving its children), and
    PJRT backend discovery can HANG — not raise — when a device endpoint
    is unreachable, so the probe initializes (and, by exiting, releases)
    the backend in a killable child.  The child honors the same overrides
    the CLIs apply via ``jax.config.update`` (``SENSORIUM_JAX_PLATFORM`` /
    ``JAX_PLATFORMS`` / ``SENSORIUM_CPU_DEVICES``): env-only platform
    selection is unreliable once a TPU plugin is installed.

    ``strict=True`` raises on timeout/failure (callers that need an
    answer); ``strict=False`` returns 0 (callers with a fallback path,
    e.g. the dryrun's re-exec-into-CPU-subprocess route).
    """
    import subprocess
    import sys

    code = (
        "import os, jax\n"
        "p = (os.environ.get('SENSORIUM_JAX_PLATFORM')\n"
        "     or os.environ.get('JAX_PLATFORMS'))\n"
        "c = os.environ.get('SENSORIUM_CPU_DEVICES')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "if c: jax.config.update('jax_num_cpu_devices', int(c))\n"
        "print(len(jax.devices()))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        if strict:
            raise RuntimeError(
                f"device-count probe timed out after {timeout_s:.0f}s — "
                "device endpoint unreachable?"
            ) from None
        return 0
    if proc.returncode != 0:
        if strict:
            raise RuntimeError(f"device-count probe failed:\n{proc.stderr[-1000:]}")
        return 0
    return int(proc.stdout.strip().splitlines()[-1])
