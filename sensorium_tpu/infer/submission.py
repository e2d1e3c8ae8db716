"""Out-of-fold evaluation and competition submission writing.

Output-contract-compatible with ``/root/reference/src/submission.py`` (same
response cut — limit 300 frames, skip first 50, drop the last —, the same
per-neuron precision normalization, the same parquet schema
``mouse, trial_indices, prediction, neuron_ids`` with brotli compression,
and the same split-name mangling ``live_test_main -> live_main``,
``bonus -> test_bonus_ood``), verified field-by-field against the
reference's own pandas/parquet write path in
``tests/test_submission_compat.py``.  The implementation is organized
around a shared saved-prediction iterator and a per-mouse assembly step
instead of the reference's inline loops.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator

import numpy as np

from sensorium_tpu import constants
from sensorium_tpu.data.mouse_data import get_mouse_data
from sensorium_tpu.data.responses import ResponseNormalizer
from sensorium_tpu.engine.metrics import corr


def submission_cut(prediction: np.ndarray) -> np.ndarray:
    """The competition's response cut along the trailing (time) axis.

    Keeps frames [skip_first, min(limit, T) - skip_last) — the evaluation
    server scores this window only (constants.submission_*).
    """
    stop = min(prediction.shape[-1], constants.submission_limit_length)
    stop -= constants.submission_skip_last
    return prediction[..., constants.submission_skip_first : stop]


# Backwards-compatible alias (reference name: src/submission.py:12).
cut_responses_for_submission = submission_cut


def iter_saved_predictions(
    prediction_dir: Path, trials: list[dict]
) -> Iterator[tuple[dict, np.ndarray]]:
    """Yield (trial_data, saved prediction) for each cataloged trial.

    The shared walk under every consumer of saved per-trial ``.npy``
    predictions (OOF evaluation, submission writing, ensembling).
    """
    for trial_data in trials:
        prediction = np.load(str(prediction_dir / f"{trial_data['trial_id']}.npy"))
        yield trial_data, prediction


def _oof_correlation(mouse: str, mouse_prediction_dir: Path) -> float:
    """Mean per-neuron correlation of a mouse's out-of-fold predictions.

    All trials are concatenated on the time axis after the submission cut,
    exactly like the evaluation server scores them.
    """
    mouse_data = get_mouse_data(mouse=mouse, splits=constants.folds_splits)
    pairs = [
        (
            submission_cut(prediction),
            submission_cut(
                np.load(trial_data["response_path"])[..., : trial_data["length"]]
            ),
        )
        for trial_data, prediction in iter_saved_predictions(
            mouse_prediction_dir, mouse_data["trials"]
        )
    ]
    predictions = np.concatenate([p for p, _ in pairs], axis=1)
    targets = np.concatenate([t for _, t in pairs], axis=1)
    return float(corr(predictions, targets, axis=1).mean())


def evaluate_folds_predictions(experiment: str, dataset: str) -> dict:
    """Out-of-fold CV score per mouse + mean; writes evaluate_{dataset}.json."""
    prediction_dir = constants.predictions_dir / experiment / "out-of-fold"
    correlations = {
        mouse: _oof_correlation(mouse, prediction_dir / mouse)
        for mouse in constants.dataset2mice[dataset]
    }
    for mouse, correlation in correlations.items():
        print(f"Mouse {mouse} correlation: {correlation}")
    mean_correlation = float(np.mean(list(correlations.values())))
    print("Mean correlation:", mean_correlation)

    result = {"correlations": correlations, "mean_correlation": mean_correlation}
    with open(prediction_dir / f"evaluate_{dataset}.json", "w") as outfile:
        json.dump(result, outfile, indent=4)
    return result


def _mouse_submission_records(mouse: str, split: str, prediction_dir: Path) -> list:
    """(mouse, trial_id, normalized+cut prediction, neuron_ids) records."""
    normalize = ResponseNormalizer(mouse)
    mouse_data = get_mouse_data(mouse=mouse, splits=[split])
    neuron_ids = mouse_data["neuron_ids"].tolist()
    return [
        (
            mouse,
            trial_data["trial_id"],
            submission_cut(normalize(prediction)).tolist(),
            neuron_ids,
        )
        for trial_data, prediction in iter_saved_predictions(
            prediction_dir / mouse, mouse_data["trials"]
        )
    ]


def submission_split_name(split: str) -> str:
    """The eval server's split naming (src/submission.py:62)."""
    return split.replace("_test_", "_").replace("bonus", "test_bonus_ood")


def make_submission(experiment: str, split: str) -> None:
    """Write ``predictions_{split}.parquet.brotli`` for the five new mice."""
    import pandas as pd

    prediction_dir = constants.predictions_dir / experiment / split
    records = [
        record
        for mouse in constants.new_mice
        for record in _mouse_submission_records(mouse, split, prediction_dir)
    ]
    frame = pd.DataFrame.from_records(
        records, columns=["mouse", "trial_indices", "prediction", "neuron_ids"]
    )
    submission_path = (
        prediction_dir / f"predictions_{submission_split_name(split)}.parquet.brotli"
    )
    frame.to_parquet(submission_path, compression="brotli", engine="pyarrow", index=False)
    print(f"Submission saved to '{submission_path}'")
