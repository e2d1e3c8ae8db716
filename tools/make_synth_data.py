"""Generate a production-shaped synthetic dataset for hardware smokes.

Writes the Sensorium on-disk layout (``<root>/<mouse>/{data,meta}/...``)
for all 10 mice with REAL neuron counts and the real 36x64 video geometry,
but short trials — enough to drive the full training/predict CLI stack at
flagship model shapes without the 148 GB download. Pair with
``configs/smoke_001.py`` and ``SENSORIUM_FOLD_ASSIGNMENT=trial``.

Usage: python tools/make_synth_data.py <root> [--trial-length 120] [--trials 9]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root", type=Path, help="SENSORIUM_DATA_DIR to create")
    parser.add_argument("--trial-length", type=int, default=120)
    parser.add_argument("--trials", type=int, default=9,
                        help="labeled trials per mouse (>=7 so every fold "
                             "is populated under trial-index assignment)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from sensorium_tpu import constants

    rng = np.random.default_rng(args.seed)
    length = args.trial_length
    root = args.root / "sensorium_all_2023"
    for mouse in constants.mice:
        num_neurons = constants.mouse2num_neurons[mouse]
        mouse_dir = root / mouse
        for sub in ("data/videos", "data/behavior", "data/pupil_center",
                    "data/responses", "meta/trials", "meta/neurons",
                    "meta/statistics/responses/all"):
            (mouse_dir / sub).mkdir(parents=True, exist_ok=True)

        new_mouse = mouse in constants.new_mice
        tiers = ["train"] * args.trials + (
            ["live_test_main", "final_test_main"] if new_mouse else ["none", "none"]
        )
        np.save(mouse_dir / "meta/trials/tiers.npy", np.array(tiers))
        np.save(mouse_dir / "meta/neurons/unit_ids.npy",
                np.arange(1, num_neurons + 1, dtype=np.int64))
        np.save(mouse_dir / "meta/neurons/cell_motor_coordinates.npy",
                rng.uniform(0, 100, (num_neurons, 3)).astype(np.float32))
        np.save(mouse_dir / "meta/statistics/responses/all/std.npy",
                rng.uniform(0.5, 2.0, (num_neurons,)).astype(np.float32))

        for trial_id, tier in enumerate(tiers):
            if tier == "none":
                continue
            np.save(mouse_dir / f"data/videos/{trial_id}.npy",
                    rng.uniform(0, 255, (36, 64, length)).astype(np.float32))
            np.save(mouse_dir / f"data/behavior/{trial_id}.npy",
                    rng.uniform(0, 5, (2, length)).astype(np.float32))
            np.save(mouse_dir / f"data/pupil_center/{trial_id}.npy",
                    rng.uniform(50, 200, (2, length)).astype(np.float32))
            if tier == "train":
                np.save(mouse_dir / f"data/responses/{trial_id}.npy",
                        rng.gamma(1.5, 1.0, (num_neurons, length)).astype(np.float32))
    print(f"Synthetic dataset written to {root}")


if __name__ == "__main__":
    main()
