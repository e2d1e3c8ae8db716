"""Validation metrics.

Capability parity with ``/root/reference/src/metrics.py``: the per-neuron
single-trial correlation, accumulated on host across validation batches and
reported per mouse plus averaged (keys ``val_corr_mouse_{i}`` /
``val_corr``).

The device hands the metric padded ``(M, B, N_max, T)`` predictions, the
compact ``(B, N_max, T)`` targets and the ``(B, M)`` weight matrix; the
metric slices each mouse's real neurons and flattens (batch, time) into the
sample axis exactly like the reference's ``(B, N, T) -> (B*T, N)`` reshape
(metrics.py:59-63).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from sensorium_tpu import constants


def corr(y1: np.ndarray, y2: np.ndarray, axis=-1, eps: float = 1e-8, **kwargs) -> np.ndarray:
    """Pearson correlation along ``axis`` (standardized product mean, ddof 0)."""
    y1 = (y1 - y1.mean(axis=axis, keepdims=True)) / (
        y1.std(axis=axis, keepdims=True, ddof=0) + eps
    )
    y2 = (y2 - y2.mean(axis=axis, keepdims=True)) / (
        y2.std(axis=axis, keepdims=True, ddof=0) + eps
    )
    return (y1 * y2).mean(axis=axis, **kwargs)


class CorrelationMetric:
    """Accumulates masked per-mouse (prediction, target) pairs on host."""

    name = "corr"
    better = "max"

    def __init__(self, num_neurons: list[int] | None = None):
        self.num_neurons = num_neurons if num_neurons is not None else constants.num_neurons
        self.reset()

    def reset(self) -> None:
        self._predictions: dict[int, list[np.ndarray]] = defaultdict(list)
        self._targets: dict[int, list[np.ndarray]] = defaultdict(list)

    def update(self, prediction, target, weights) -> None:
        """prediction (M, B, N_max, T); target (B, N_max, T); weights (B, M)."""
        prediction = np.asarray(prediction)
        target = np.asarray(target)
        weights = np.asarray(weights)
        for mouse_index in range(weights.shape[1]):
            mask = weights[:, mouse_index] != 0.0
            if not mask.any():
                continue
            n = self.num_neurons[mouse_index]
            pred = prediction[mouse_index][mask][:, :n]  # (b, N, T)
            tgt = target[mask][:, :n]
            # (b, N, T) -> (b*T, N): samples are (trial-window, frame) pairs.
            pred = np.transpose(pred, (0, 2, 1)).reshape(-1, n)
            tgt = np.transpose(tgt, (0, 2, 1)).reshape(-1, n)
            self._predictions[mouse_index].append(pred)
            self._targets[mouse_index].append(tgt)

    def compute(self) -> dict[int, float]:
        mice_corr: dict[int, float] = {}
        for mouse_index in sorted(self._predictions):
            predictions = np.concatenate(self._predictions[mouse_index], axis=0)
            targets = np.concatenate(self._targets[mouse_index], axis=0)
            mice_corr[mouse_index] = float(corr(predictions, targets, axis=0).mean())
        return mice_corr

    def epoch_metrics(self, prefix: str = "val_") -> dict[str, float]:
        """Finalize into the reference's metric-name contract."""
        mice_corr = self.compute()
        metrics = {
            f"{prefix}{self.name}_mouse_{i}": value for i, value in mice_corr.items()
        }
        if mice_corr:
            metrics[f"{prefix}{self.name}"] = float(np.mean(list(mice_corr.values())))
        return metrics


_METRICS = {
    "corr": CorrelationMetric,
}


def get_metric(name: str, **kwargs):
    if name not in _METRICS:
        raise KeyError(f"Unknown metric '{name}'")
    return _METRICS[name](**kwargs)
