"""Synthetic on-disk dataset mirroring the Sensorium 2023 layout.

Builds ``<root>/<mouse>/{data,meta}/...`` trees for all 10 mice with tiny
shapes, so the full pipeline — trial catalog, fold assignment, datasets,
training CLI, predictor, submission writer — runs end-to-end in tests
without the 148 GB real dataset.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from sensorium_tpu import constants

# Small, distinct per-mouse neuron counts exercise the padded readouts.
SYNTH_NUM_NEURONS = [18 + i for i in range(constants.num_mice)]
SYNTH_TRIAL_LENGTH = 60  # > submission_skip_first so the cut keeps frames
SYNTH_VIDEO_SHAPE = (12, 16)  # (H, W) smaller than the canvas to test padding
SYNTH_LABELED_TRIALS = 7  # one per fold under the identity-phash mock
SYNTH_IMAGE_SIZE = (16, 16)


def build_synthetic_dataset(root: Path, seed: int = 0, test_trials: int = 1) -> None:
    """``test_trials``: unlabeled trials PER TEST SPLIT per new mouse (>1
    exercises multi-trial fan-out, e.g. the multihost predict test)."""
    rng = np.random.default_rng(seed)
    height, width = SYNTH_VIDEO_SHAPE
    length = SYNTH_TRIAL_LENGTH

    for mouse_index, mouse in enumerate(constants.mice):
        num_neurons = SYNTH_NUM_NEURONS[mouse_index]
        mouse_dir = root / mouse
        for sub in (
            "data/videos",
            "data/behavior",
            "data/pupil_center",
            "data/responses",
            "meta/trials",
            "meta/neurons",
            "meta/statistics/responses/all",
        ):
            (mouse_dir / sub).mkdir(parents=True, exist_ok=True)

        new_mouse = mouse in constants.new_mice
        # New mice carry unlabeled test trials; old mice have 'none'
        # tiers there (their unlabeled data is refolded by the reference
        # logic, which the tests sidestep by keeping them 'none').
        if new_mouse:
            tiers = (
                ["train"] * SYNTH_LABELED_TRIALS
                + ["live_test_main"] * test_trials
                + ["final_test_main"] * test_trials
            )
        else:
            tiers = ["train"] * SYNTH_LABELED_TRIALS + ["none"] * (2 * test_trials)
        np.save(mouse_dir / "meta" / "trials" / "tiers.npy", np.array(tiers))
        np.save(
            mouse_dir / "meta" / "neurons" / "unit_ids.npy",
            np.arange(1, num_neurons + 1, dtype=np.int64),
        )
        np.save(
            mouse_dir / "meta" / "neurons" / "cell_motor_coordinates.npy",
            rng.uniform(0, 100, (num_neurons, 3)).astype(np.float32),
        )
        # std is (N, 1) in the real dataset — the normalizer's trailing-axis
        # slice relies on that extra axis being size 1.
        np.save(
            mouse_dir / "meta" / "statistics" / "responses" / "all" / "std.npy",
            rng.uniform(0.5, 2.0, (num_neurons, 1)).astype(np.float32),
        )

        for trial_id, tier in enumerate(tiers):
            if tier == "none":
                continue
            video = rng.uniform(0, 255, (height, width, length)).astype(np.float32)
            behavior = rng.uniform(0, 5, (2, length)).astype(np.float32)
            pupil = rng.uniform(50, 200, (2, length)).astype(np.float32)
            np.save(mouse_dir / "data" / "videos" / f"{trial_id}.npy", video)
            np.save(mouse_dir / "data" / "behavior" / f"{trial_id}.npy", behavior)
            np.save(mouse_dir / "data" / "pupil_center" / f"{trial_id}.npy", pupil)
            if tier == "train":
                responses = rng.gamma(1.5, 1.0, (num_neurons, length)).astype(np.float32)
                np.save(mouse_dir / "data" / "responses" / f"{trial_id}.npy", responses)


def tiny_experiment_config() -> dict:
    """A miniature true_batch-style config matched to the synthetic data."""
    return dict(
        image_size=SYNTH_IMAGE_SIZE,
        batch_size=8,
        base_lr=3e-4,
        min_base_lr=3e-6,
        ema_decay=0.9,
        train_epoch_size=40,
        num_epochs=[1, 2],
        stages=["warmup", "train"],
        num_dataloader_workers=2,
        init_weights=True,
        argus_params={
            "nn_module": (
                "dwiseneuro",
                {
                    "readout_outputs": SYNTH_NUM_NEURONS,
                    "in_channels": 5,
                    "core_features": (8, 8),
                    "spatial_strides": (2, 2),
                    "spatial_kernel": 3,
                    "temporal_kernel": 3,
                    "expansion_ratio": 2,
                    "se_reduce_ratio": 4,
                    "cortex_features": (16, 16),
                    "groups": 2,
                    "softplus_beta": 0.07,
                    "drop_rate": 0.2,
                    "drop_path_rate": 0.1,
                    "dtype": "float32",
                    "readout_pad_multiple": 8,
                },
            ),
            "loss": ("mice_poisson", {"log_input": False, "full": False, "eps": 1e-8}),
            "optimizer": ("AdamW", {"lr": 1e-3, "weight_decay": 0.05}),
            "frame_stack": {"size": 4, "step": 2, "position": "last"},
            "inputs_processor": (
                "stack_inputs",
                {"size": SYNTH_IMAGE_SIZE, "pad_fill_value": 0.0},
            ),
            "responses_processor": ("identity", {}),
            "iter_size": 1,
        },
        cutmix={"alpha": 1.0, "prob": 0.5},
    )
