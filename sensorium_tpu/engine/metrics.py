"""Validation metrics.

Capability parity with ``/root/reference/src/metrics.py``: the per-neuron
single-trial correlation reported per mouse plus averaged (keys
``val_corr_mouse_{i}`` / ``val_corr``), with the reference's sample axis —
(batch, time) flattened, ``(B, N, T) -> (B*T, N)`` (metrics.py:59-63).

TPU redesign: the reference stores every masked (prediction, target) pair
on the CPU until epoch end (metrics.py:49-66) — memory grows with the
validation set and, on an accelerator, each batch drags the full padded
``(M, B, N_max, T)`` prediction across the device->host link.  Pearson
correlation over a fixed population is a function of five running sums
(Σx, Σy, Σxy, Σx², Σy²) per neuron, so this metric accumulates a constant
``(M, N_max, 5)`` statistics block instead:

* ``batch_stats`` is jit-compatible — ``MouseModel.fit`` runs it on device
  and fetches ~1.7 MB of sums per batch instead of ~170 MB of predictions;
* host accumulation is float64; the final correlation
  ``cov / ((std_x + eps) * (std_y + eps))`` is algebraically identical to
  the reference's standardized-product mean (ddof 0, eps on the std).
"""

from __future__ import annotations

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


def batch_corr_stats(prediction, target, weights):
    """Per-mouse correlation sufficient statistics for one batch.

    prediction (M, B, N_max, T); target (B, N_max, T); weights (B, M).
    Returns ``counts (M,)`` — number of (sample, frame) pairs — and
    ``sums (M, N_max, 5)`` = [Σx, Σy, Σxy, Σx², Σy²] over the masked
    samples.  Pure jnp: jit/GSPMD-compatible, runs on device.
    """
    import jax.numpy as jnp

    x = prediction.astype(jnp.float32)  # (M, B, N, T)
    y = target.astype(jnp.float32)[None]  # (1, B, N, T)
    mask = (weights != 0.0).astype(jnp.float32)  # (B, M)
    w = jnp.transpose(mask)[:, :, None, None]  # (M, B, 1, 1)

    def msum(v):
        return jnp.sum(v * w, axis=(1, 3))  # (M, N)

    sums = jnp.stack(
        [msum(x), msum(y), msum(x * y), msum(x * x), msum(y * y)], axis=-1
    )
    counts = jnp.sum(mask, axis=0) * x.shape[-1]  # (M,)
    return counts, sums


class CorrelationMetric:
    """Running-sums Pearson correlation per mouse (see module docstring)."""

    name = "corr"
    better = "max"
    eps = 1e-8

    def __init__(self, num_neurons: list[int] | None = None):
        self.num_neurons = num_neurons if num_neurons is not None else constants.num_neurons
        self.reset()

    def reset(self) -> None:
        m = len(self.num_neurons)
        n_max = max(self.num_neurons)
        self._counts = np.zeros(m, np.float64)
        self._sums = np.zeros((m, n_max, 5), np.float64)

    # Device path: MouseModel.fit computes ``batch_corr_stats`` on device
    # and feeds the fetched sums here.
    batch_stats = staticmethod(batch_corr_stats)

    def update_stats(self, counts, sums) -> None:
        counts = np.asarray(counts, np.float64)
        sums = np.asarray(sums, np.float64)
        # Predictions may be padded beyond this metric's (M, N_max) for
        # extra mice-alignment; slice both accumulators symmetrically.
        self._counts += counts[: self._counts.shape[0]]
        self._sums += sums[: self._sums.shape[0], : self._sums.shape[1]]

    def update(self, prediction, target, weights) -> None:
        """Host-array path (same signature as the reference's metric).

        prediction (M, B, N_max, T); target (B, N_max, T); weights (B, M).
        """
        prediction = np.asarray(prediction, np.float32)
        target = np.asarray(target, np.float32)[None]
        mask = (np.asarray(weights) != 0.0).astype(np.float64)  # (B, M)
        w = mask.T[:, :, None, None]  # (M, B, 1, 1)
        x = prediction.astype(np.float64)
        y = target.astype(np.float64)

        def msum(v):
            return np.sum(v * w, axis=(1, 3))

        sums = np.stack([msum(x), msum(y), msum(x * y), msum(x * x), msum(y * y)], axis=-1)
        counts = mask.sum(axis=0) * prediction.shape[-1]
        self.update_stats(counts, sums)

    def compute(self) -> dict[int, float]:
        mice_corr: dict[int, float] = {}
        for mouse_index, count in enumerate(self._counts):
            if count == 0:
                continue
            n = self.num_neurons[mouse_index]
            sx, sy, sxy, sxx, syy = np.moveaxis(self._sums[mouse_index, :n], -1, 0)
            mean_x = sx / count
            mean_y = sy / count
            cov = sxy / count - mean_x * mean_y
            std_x = np.sqrt(np.maximum(sxx / count - mean_x**2, 0.0))
            std_y = np.sqrt(np.maximum(syy / count - mean_y**2, 0.0))
            values = cov / ((std_x + self.eps) * (std_y + self.eps))
            mice_corr[mouse_index] = float(values.mean())
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
