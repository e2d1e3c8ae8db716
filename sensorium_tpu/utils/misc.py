"""Small host-side helpers.

Capability parity with the reference helpers in
``/root/reference/src/utils.py`` (linear LR scaling, best-checkpoint lookup
by filename-embedded score, NaN-trimmed trial length).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

_SCORE_RE = re.compile(r"-(\d+(?:\.\d+)?)\.(?:pth|ckpt|msgpack)$")


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
