"""Ensembling CLI — ``python -m sensorium_tpu.cli.ensemble -e E1,E2 -s SPLIT``.

Flag parity with ``/root/reference/scripts/ensemble.py``: averages the
saved per-trial predictions of several experiments (sorted, comma-joined
result name), then re-evaluates folds or re-writes the submission.
"""

from __future__ import annotations

import argparse

from sensorium_tpu import constants
from sensorium_tpu.infer.ensemble import ensemble_experiments
from sensorium_tpu.infer.submission import evaluate_folds_predictions, make_submission


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("-e", "--experiments", required=True, type=str)
    parser.add_argument(
        "-s", "--split", required=True,
        choices=["folds"] + constants.unlabeled_splits, type=str,
    )
    parser.add_argument("-d", "--dataset", default="new", choices=["new", "old"], type=str)
    return parser.parse_args()


def main():
    args = parse_arguments()
    experiments = sorted(args.experiments.split(","))
    if len(experiments) < 2:
        # Not an assert: under ``python -O`` an assert is stripped and a
        # single-experiment "ensemble" would rewrite its own predictions.
        raise SystemExit(
            "-e expects at least two comma-separated experiments to ensemble"
        )
    experiment_name = ensemble_experiments(experiments, args.split, args.dataset)
    if args.split == "folds":
        evaluate_folds_predictions(experiment_name, args.dataset)
    elif args.dataset == "new":
        make_submission(experiment_name, args.split)


if __name__ == "__main__":
    main()
