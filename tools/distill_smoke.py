"""Flagship distillation-step smoke on real TPU.

Builds the distillation_001 student (expansion 6, remat_blocks 3) plus the
frozen true_batch_001 teacher (expansion 7) and runs batch-32 train steps —
the highest-memory production regime.  Validates the configs' HBM headroom
claims on a 16 GB chip and reports clips/s.

Run: PYTHONPATH=. python tools/distill_smoke.py
"""

from __future__ import annotations

import json
import time
from importlib.machinery import SourceFileLoader

import jax
import numpy as np


def main():
    from sensorium_tpu import constants
    from sensorium_tpu.engine.losses import get_loss
    from sensorium_tpu.engine.model import MouseModel
    from sensorium_tpu.engine.steps import make_train_step

    student_cfg = SourceFileLoader(
        "distillation_001", "configs/distillation_001.py"
    ).load_module().config["argus_params"]
    teacher_cfg = SourceFileLoader(
        "true_batch_001", "configs/true_batch_001.py"
    ).load_module().config["argus_params"]

    teacher = MouseModel(teacher_cfg)
    teacher_state = teacher.build_state(seed=1, learning_rate=0.0)
    teacher_vars = {
        "params": teacher_state.params,
        "batch_stats": teacher_state.batch_stats,
    }
    # Free the teacher's optimizer tree; only params/stats are needed.
    # (teacher.state holds the same TrainState — drop that reference too,
    # or the AdamW moments stay resident and skew the HBM-headroom check.)
    teacher.state = None
    del teacher_state

    student = MouseModel(student_cfg)
    student.set_ema(0.999)
    state = student.build_state(seed=0, learning_rate=2.4e-3)
    step = make_train_step(
        student.nn_module,
        student.tx,
        get_loss(*student_cfg["loss"]),
        ema_decay=0.999,
        distill_ratio=0.36,
        teacher_model=teacher.nn_module,
    )

    batch = 32
    rng = np.random.default_rng(0)
    inputs = rng.uniform(0, 255, (batch, 5, 16, 64, 64)).astype(np.float32)
    targets = rng.gamma(1.5, 1.0, (batch, constants.max_num_neurons, 16)).astype(np.float32)
    weights = np.zeros((batch, constants.num_mice), np.float32)
    weights[np.arange(batch), np.arange(batch) % constants.num_mice] = 1.0
    inputs, targets, weights = jax.device_put((inputs, targets, weights))

    for _ in range(3):
        state, loss = step(state, inputs, targets, weights, teacher_vars)
    loss0 = float(jax.device_get(loss))

    start = time.perf_counter()
    steps = 6
    for _ in range(steps):
        state, loss = step(state, inputs, targets, weights, teacher_vars)
    loss1 = float(jax.device_get(loss))
    elapsed = time.perf_counter() - start

    assert np.isfinite(loss1), loss1
    print(
        json.dumps(
            {
                "metric": "distill_train_clips_per_sec",
                "value": round(batch * steps / elapsed, 2),
                "loss_first": round(loss0, 4),
                "loss_last": round(loss1, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
