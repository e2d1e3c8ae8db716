"""Cross-experiment prediction ensembling.

Capability parity with ``/root/reference/scripts/ensemble.py``: arithmetic
mean of the saved per-trial prediction ``.npy`` files of several
experiments, written under the comma-joined experiment name, then
re-evaluated (folds) or re-submitted (unlabeled splits).  Pure host-side
NumPy — no device work.
"""

from __future__ import annotations

import numpy as np

from sensorium_tpu import constants
from sensorium_tpu.data.mouse_data import get_mouse_data


def ensemble_experiments(experiments: list[str], split: str, dataset: str) -> str:
    """Average saved predictions; returns the ensemble experiment name."""
    ensemble_name = ",".join(experiments)
    split_dir = "out-of-fold" if split == "folds" else split
    splits = constants.folds_splits if split == "folds" else [split]

    for mouse in constants.dataset2mice[dataset]:
        mouse_data = get_mouse_data(mouse=mouse, splits=splits)
        save_dir = constants.predictions_dir / ensemble_name / split_dir / mouse
        save_dir.mkdir(parents=True, exist_ok=True)
        for trial_data in mouse_data["trials"]:
            trial_id = trial_data["trial_id"]
            predictions = [
                np.load(
                    str(
                        constants.predictions_dir
                        / experiment
                        / split_dir
                        / mouse
                        / f"{trial_id}.npy"
                    )
                )
                for experiment in experiments
            ]
            blend = np.mean(predictions, axis=0)
            np.save(str(save_dir / f"{trial_id}.npy"), blend)
    return ensemble_name
