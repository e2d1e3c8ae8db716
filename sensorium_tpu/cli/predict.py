"""Inference CLI — ``python -m sensorium_tpu.cli.predict -e EXP -s SPLIT``.

Flag parity with ``/root/reference/scripts/predict.py``: ``-s folds``
produces out-of-fold predictions (one fold model each) and the CV
evaluation JSON; unlabeled splits average all 7 fold models per trial and
(for the new mice) write the competition submission.
"""

from __future__ import annotations

import argparse

from sensorium_tpu import constants
from sensorium_tpu.infer.predictor import Predictor, predict_mouse_split
from sensorium_tpu.infer.submission import evaluate_folds_predictions, make_submission
from sensorium_tpu.utils import get_best_model_path


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("-e", "--experiment", required=True, type=str)
    parser.add_argument(
        "-s", "--split", required=True,
        choices=["folds"] + constants.unlabeled_splits, type=str,
    )
    parser.add_argument("-d", "--dataset", default="new", choices=["new", "old"], type=str)
    parser.add_argument("--device", default=None, type=str,
                        help="'<platform>[:<index>]', e.g. 'tpu:1' or 'cpu' "
                             "(the reference's --device cuda:0, TPU-flavored)")
    parser.add_argument("--chunk-size", default=32, type=int,
                        help="sliding-window anchors per device batch")
    parser.add_argument("--mesh", action="store_true",
                        help="shard each chunk's window forwards over all "
                             "local devices (data-parallel inference)")
    parser.add_argument("--multihost", default=None, type=str, metavar="SPEC",
                        help="fan the trial list out across a jax.distributed "
                             "cluster ('auto' or 'COORD_ADDR,NUM_PROCESSES,"
                             "PROCESS_ID'; run the same command on every "
                             "host): each process predicts its slice of every "
                             "mouse's trials into the shared predictions dir; "
                             "process 0 writes the evaluation/submission after "
                             "a cluster barrier")
    return parser.parse_args()


def select_device(spec: str | None):
    """Resolve '--device <platform>[:<index>]' into a jax.Device (or None).

    Must run before any backend initialization; the platform part pins
    ``jax_platforms`` (env JAX_PLATFORMS alone is unreliable once a TPU
    plugin is installed).
    """
    if not spec:
        return None
    import jax

    platform, _, index = spec.partition(":")
    previous = jax.config.jax_platforms
    try:
        jax.config.update("jax_platforms", platform)
        devices = jax.devices(platform)
    except RuntimeError as exc:
        # Restore the config: a failed probe must not leave a bad platform
        # pinned for the rest of the process (library callers, tests).
        jax.config.update("jax_platforms", previous)
        # jax raises RuntimeError both for an unknown platform name and for
        # a real backend-init failure (e.g. TPU chips held by another
        # process) — don't mislabel the latter as a bad flag; surface the
        # original message so the cause is diagnosable.
        raise SystemExit(
            f"--device {spec!r}: could not initialize platform "
            f"{platform!r}: {exc}\n(unknown platform name, or the backend "
            f"failed to initialize — e.g. TPU chips held by another "
            f"process; see the pin-chips notes in cli/train.py)"
        ) from exc
    try:
        return devices[int(index)] if index else devices[0]
    except (ValueError, IndexError) as exc:
        available = ", ".join(str(d) for d in devices)
        raise SystemExit(
            f"--device {spec!r}: bad device index {index!r} "
            f"(available {platform} devices: {available})"
        ) from exc


def _fold_model_path(experiment: str, fold_split: str):
    model_path = get_best_model_path(constants.experiments_dir / experiment / fold_split)
    if model_path is None:
        raise RuntimeError(f"No checkpoint for {experiment}/{fold_split}")
    print("Model path:", str(model_path))
    return model_path


def predict_folds(
    experiment: str, dataset: str, chunk_size: int = 32, mesh=None,
    trial_shard=None,
) -> None:
    """Out-of-fold predictions: each fold's trials by that fold's model.

    One Predictor per fold (7 checkpoint loads total), reused across mice —
    not one per (mouse, fold) pair.
    """
    print(f"Predict folds: {experiment=}, {dataset=}")
    for fold_split in constants.folds_splits:
        predictor = Predictor(
            _fold_model_path(experiment, fold_split),
            blend_weights="ones", chunk_size=chunk_size, mesh=mesh,
        )
        for mouse in constants.dataset2mice[dataset]:
            mouse_dir = constants.predictions_dir / experiment / "out-of-fold" / mouse
            predict_mouse_split(
                mouse, fold_split, [predictor], mouse_dir, trial_shard=trial_shard
            )


def predict_unlabeled_split(
    experiment: str, split: str, dataset: str, chunk_size: int = 32, mesh=None,
    trial_shard=None,
) -> None:
    """Average all fold models' predictions per unlabeled trial."""
    print(f"Predict unlabeled split: {experiment=}, {split=}, {dataset=}")
    predictors = [
        Predictor(
            _fold_model_path(experiment, fold_split),
            blend_weights="ones", chunk_size=chunk_size, mesh=mesh,
        )
        for fold_split in constants.folds_splits
    ]
    for mouse in constants.dataset2mice[dataset]:
        mouse_dir = constants.predictions_dir / experiment / split / mouse
        predict_mouse_split(
            mouse, split, predictors, mouse_dir, trial_shard=trial_shard
        )


def main():
    import contextlib
    import os

    import jax

    from sensorium_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_arguments()
    if args.device and args.mesh:
        # create_mesh() spans every local device, contradicting a
        # single-device pin; refusing beats silently running on all chips.
        raise SystemExit("--device and --mesh are mutually exclusive")
    if args.multihost and args.mesh:
        # Across hosts the trial list is fanned out, not the mesh
        # (docs/SCALING.md "Inference at scale"); a multi-process mesh is
        # exactly what the Predictor constructor refuses.
        raise SystemExit(
            "--multihost fans trials out across processes; combine it with "
            "per-host default devices, not --mesh"
        )
    # Honor a platform override before any backend initialization — which
    # includes cluster bring-up — like cli/train.py (env JAX_PLATFORMS
    # alone is unreliable once a TPU plugin is installed).  --device pins
    # its own platform in select_device and takes precedence.
    platform = os.environ.get("SENSORIUM_JAX_PLATFORM")
    if platform and not args.device:
        jax.config.update("jax_platforms", platform)
    cpu_devices = os.environ.get("SENSORIUM_CPU_DEVICES")
    if cpu_devices:
        jax.config.update("jax_num_cpu_devices", int(cpu_devices))
    trial_shard = None
    if args.multihost:
        from sensorium_tpu.parallel.multihost import init_from_spec

        init_from_spec(args.multihost)
        trial_shard = (jax.process_index(), jax.process_count())
    device = select_device(args.device)
    mesh = None
    if args.mesh:
        from sensorium_tpu.parallel.mesh import (
            create_hybrid_mesh,
            create_mesh,
            data_extent,
        )

        # Multi-slice hosts get the hybrid topology automatically so chunk
        # batches spread across slices instead of replicating per slice.
        num_slices = len({getattr(d, "slice_index", 0) for d in jax.devices()})
        mesh = create_hybrid_mesh() if num_slices > 1 else create_mesh()
        if args.chunk_size % data_extent(mesh):
            raise SystemExit(
                f"--chunk-size {args.chunk_size} must be a multiple of the "
                f"mesh batch-sharding ways ({data_extent(mesh)} devices)"
            )
    with jax.default_device(device) if device is not None else contextlib.nullcontext():
        if args.split == "folds":
            predict_folds(
                args.experiment, args.dataset, args.chunk_size, mesh=mesh,
                trial_shard=trial_shard,
            )
            if trial_shard is not None:
                # Every host's trial slice must be on (shared) disk before
                # the evaluation reads the full prediction set.
                from sensorium_tpu.parallel.multihost import barrier

                barrier("predict_folds_done")
            if jax.process_index() == 0:
                evaluate_folds_predictions(args.experiment, args.dataset)
        else:
            predict_unlabeled_split(
                args.experiment, args.split, args.dataset, args.chunk_size, mesh=mesh,
                trial_shard=trial_shard,
            )
            if trial_shard is not None:
                from sensorium_tpu.parallel.multihost import barrier

                barrier("predict_split_done")
            if args.dataset == "new" and jax.process_index() == 0:
                make_submission(args.experiment, args.split)


if __name__ == "__main__":
    main()
