"""Headline benchmark: flagship training-step throughput on one chip.

Measures clips/sec for the full jitted training step (forward over all 10
readouts + Poisson loss + backward + AdamW + EMA, bf16 compute) of the
``true_batch_001`` DwiseNeuro at global batch 32 — the reference's training
regime, which sustains ~35 clips/s on an RTX A6000 with AMP fp16
(BASELINE.md: 72,000 samples x 21 epochs / 12 h).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_CLIPS_PER_SEC = 35.0  # reference derived throughput (BASELINE.md)
BATCH = 32
FRAMES, HEIGHT, WIDTH = 16, 64, 64
WARMUP_STEPS = 3
MEASURE_STEPS = 10


def build():
    from sensorium_tpu import constants
    from sensorium_tpu.engine.losses import get_loss
    from sensorium_tpu.engine.model import MouseModel
    from sensorium_tpu.engine.steps import make_train_step

    params = {
        "nn_module": (
            "dwiseneuro",
            {
                "readout_outputs": constants.num_neurons,
                "in_channels": 5,
                "core_features": (64, 64, 64, 64, 128, 128, 128, 256, 256),
                "spatial_strides": (2, 1, 1, 1, 2, 1, 1, 2, 1),
                "spatial_kernel": 3,
                "temporal_kernel": 5,
                "expansion_ratio": 7,
                "se_reduce_ratio": 32,
                "cortex_features": (1024, 2048, 4096),
                "groups": 2,
                "softplus_beta": 0.07,
                "drop_rate": 0.4,
                "drop_path_rate": 0.1,
                "dtype": "bfloat16",
            },
        ),
        "loss": ("mice_poisson", {}),
        "optimizer": ("AdamW", {"lr": 2.4e-3, "weight_decay": 0.05}),
        "frame_stack": {"size": FRAMES, "step": 2, "position": "last"},
        "inputs_processor": ("stack_inputs", {"size": (HEIGHT, WIDTH), "pad_fill_value": 0.0}),
        "responses_processor": ("identity", {}),
        "iter_size": 1,
    }
    model = MouseModel(params)
    model.set_ema(0.999)
    state = model.build_state(seed=0, learning_rate=2.4e-3)
    step = make_train_step(model.nn_module, model.tx, get_loss("mice_poisson", {}), ema_decay=0.999)
    return state, step


def main():
    from sensorium_tpu import constants

    state, step = build()
    rng = np.random.default_rng(0)
    inputs = rng.uniform(0, 255, (BATCH, 5, FRAMES, HEIGHT, WIDTH)).astype(np.float32)
    targets = rng.gamma(1.5, 1.0, (BATCH, constants.max_num_neurons, FRAMES)).astype(
        np.float32
    )
    weights = np.zeros((BATCH, constants.num_mice), np.float32)
    weights[np.arange(BATCH), np.arange(BATCH) % constants.num_mice] = 1.0
    inputs, targets, weights = jax.device_put((inputs, targets, weights))

    for _ in range(WARMUP_STEPS):
        state, loss = step(state, inputs, targets, weights)
    float(jax.device_get(loss))  # hard sync (block_until_ready can be a
    # no-op under remote-execution tunnels — device_get always drains)

    start = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, loss = step(state, inputs, targets, weights)
    float(jax.device_get(loss))
    elapsed = time.perf_counter() - start

    clips_per_sec = BATCH * MEASURE_STEPS / elapsed
    print(
        json.dumps(
            {
                "metric": "train_clips_per_sec_per_chip_b32_fwd_bwd",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
