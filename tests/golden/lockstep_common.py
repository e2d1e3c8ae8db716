"""Shared recipe for the N-step lockstep training-dynamics parity proof.

Both sides of the proof import this module by file path:

* ``generate_golden.py --lockstep`` (torch side) drives the REFERENCE
  training engine — ``MouseModel.train_step`` semantics
  (/root/reference/src/argus_models.py:43-71, iter_size chunking included),
  ``ModelEma`` over the full state dict (/root/reference/src/ema.py:47-55),
  AdamW(wd=0.05) under the warmup ``LambdaLR(x/N)`` + ``CosineAnnealingLR``
  per-iteration plan (/root/reference/scripts/train.py:122-134) — and
  records per-step losses/LRs plus the final model/EMA state dicts;
* ``tests/test_train_lockstep.py`` (JAX side) replays the SAME precomputed
  batch stream from the SAME initial weights through ``make_train_step``
  (one jitted fwd->loss->bwd->AdamW->EMA->BN-stats executable) and must
  track the recorded trajectory.

Keeping the batch recipe here (regenerated from seeds, never committed as
arrays) guarantees bit-identical inputs on both sides while the fixture
stays a few hundred KB.
"""

from __future__ import annotations

import numpy as np

# Trajectory "a": the composed production plan at toy scale — warmup stage
# (linear 0->peak) then cosine stage, iter_size=1, EMA decay 0.999 like
# true_batch_001 (configs/true_batch_001.py:14).
# Trajectory "b": gradient accumulation — iter_size=2 through the same
# engine chain (argus_models.py:48-56 deep_chunk loop).
# Trajectory "c": the engine-capability extensions composed into the same
# chain — global-norm grad clipping (torch clip_grad_norm_ before
# optimizer.step) and a registry train-stage scheduler
# (CosineAnnealingWarmRestarts) replacing the cosine stage.
TRAJECTORIES = {
    "a": dict(warmup_steps=6, cosine_steps=14, iter_size=1),
    "b": dict(warmup_steps=3, cosine_steps=5, iter_size=2),
    "c": dict(
        warmup_steps=3,
        cosine_steps=10,
        iter_size=1,
        grad_clip=1.0,
        scheduler=("CosineAnnealingWarmRestarts", {"T_0": 4, "T_mult": 2, "eta_min": 1e-5}),
    ),
}
PEAK_LR = 1e-3
MIN_LR = 1e-5
WEIGHT_DECAY = 0.05
EMA_DECAY = 0.999
BATCH = 4
FRAMES = 8
CANVAS = 16  # H == W

READOUT_OUTPUTS = (11, 7, 10)


def make_batches(num_steps: int, seed: int):
    """The precomputed batch stream: identical on both sides.

    Returns ``(inputs, targets, weights)`` with shapes
    ``(K, B, 5, T, H, W)``, ``[(K, B, N_m, T)] * M``, ``(K, B, M)``.
    Each sample belongs to one mouse (one-hot weights with non-unit
    magnitudes to exercise the loss normalization); other-mouse targets are
    zero, mirroring ``construct_mice_sample``
    (/root/reference/src/datasets.py:172-187).
    """
    rng = np.random.default_rng(seed)
    inputs = rng.normal(0.0, 1.5, (num_steps, BATCH, 5, FRAMES, CANVAS, CANVAS)).astype(
        np.float32
    )
    mice = rng.integers(0, len(READOUT_OUTPUTS), (num_steps, BATCH))
    weights = np.zeros((num_steps, BATCH, len(READOUT_OUTPUTS)), np.float32)
    magnitudes = rng.uniform(0.5, 1.5, (num_steps, BATCH)).astype(np.float32)
    targets = [
        np.zeros((num_steps, BATCH, n, FRAMES), np.float32) for n in READOUT_OUTPUTS
    ]
    for k in range(num_steps):
        for b in range(BATCH):
            m = int(mice[k, b])
            weights[k, b, m] = magnitudes[k, b]
            targets[m][k, b] = rng.poisson(1.5, (READOUT_OUTPUTS[m], FRAMES)).astype(
                np.float32
            )
    return inputs, targets, weights


def compact_targets(targets, weights):
    """(K, B, N_max, T) own-mouse targets for the TPU loss's padded layout."""
    n_max = max(READOUT_OUTPUTS)
    num_steps, batch = weights.shape[:2]
    out = np.zeros((num_steps, batch, n_max, targets[0].shape[-1]), np.float32)
    for k in range(num_steps):
        for b in range(batch):
            m = int(np.argmax(weights[k, b]))
            out[k, b, : READOUT_OUTPUTS[m]] = targets[m][k, b]
    return out
