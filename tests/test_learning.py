"""End-to-end learning test: the full training system must actually learn.

Every other test checks mechanics (shapes, parity, loss decreasing on one
batch).  This one builds a synthetic dataset whose responses are a
deterministic function of the stimulus — each neuron fires proportionally
to the mean luminance of one video quadrant in the most recent frames —
trains the tiny model through the real CLI ``train_mouse`` flow (loader,
CutMix off, EMA, schedule, checkpointing), and asserts the held-out
correlation metric rises well above chance.  A broken gradient path,
shuffled targets, off-by-one window indexing, or metric bug all fail this.
"""

from __future__ import annotations

import numpy as np
import pytest

from sensorium_tpu import constants
from sensorium_tpu.data import mouse_data as mouse_data_mod

from tests.synthetic import tiny_experiment_config

TRIAL_LENGTH = 80
VIDEO_SHAPE = (12, 16)
NUM_NEURONS = 8  # 4 quadrants x 2 gains


def build_learnable_dataset(root, seed=0):
    """Responses = per-quadrant mean luminance (plus small noise)."""
    rng = np.random.default_rng(seed)
    height, width = VIDEO_SHAPE
    for mouse in constants.mice:
        mdir = root / mouse
        for sub in ("data/videos", "data/behavior", "data/pupil_center",
                    "data/responses", "meta/trials", "meta/neurons",
                    "meta/statistics/responses/all"):
            (mdir / sub).mkdir(parents=True, exist_ok=True)
        tiers = ["train"] * 7
        np.save(mdir / "meta/trials/tiers.npy", np.array(tiers))
        np.save(mdir / "meta/neurons/unit_ids.npy",
                np.arange(1, NUM_NEURONS + 1, dtype=np.int64))
        np.save(mdir / "meta/neurons/cell_motor_coordinates.npy",
                rng.uniform(0, 100, (NUM_NEURONS, 3)).astype(np.float32))
        np.save(mdir / "meta/statistics/responses/all/std.npy",
                np.ones((NUM_NEURONS, 1), np.float32))
        for trial_id in range(7):
            video = rng.uniform(0, 255, (height, width, TRIAL_LENGTH)).astype(np.float32)
            # Strong per-frame, per-quadrant brightness modulation: each
            # quadrant's luminance fluctuates ~50% frame to frame, so the
            # target carries a high-SNR stimulus-driven signal.
            gain = rng.uniform(0.2, 1.8, (2, 2, TRIAL_LENGTH)).astype(np.float32)
            video[: height // 2, : width // 2] *= gain[0, 0]
            video[: height // 2, width // 2 :] *= gain[0, 1]
            video[height // 2 :, : width // 2] *= gain[1, 0]
            video[height // 2 :, width // 2 :] *= gain[1, 1]
            video = np.clip(video, 0, 255)
            quads = [
                video[: height // 2, : width // 2],
                video[: height // 2, width // 2 :],
                video[height // 2 :, : width // 2],
                video[height // 2 :, width // 2 :],
            ]
            luminance = np.stack([q.mean(axis=(0, 1)) for q in quads])  # (4, T)
            responses = np.concatenate([luminance / 16.0, luminance / 32.0])
            responses = responses + rng.normal(0, 0.05, responses.shape)
            responses = np.maximum(responses, 0.0).astype(np.float32)
            np.save(mdir / f"data/videos/{trial_id}.npy", video)
            np.save(mdir / f"data/behavior/{trial_id}.npy",
                    rng.uniform(0, 5, (2, TRIAL_LENGTH)).astype(np.float32))
            np.save(mdir / f"data/pupil_center/{trial_id}.npy",
                    rng.uniform(50, 200, (2, TRIAL_LENGTH)).astype(np.float32))
            np.save(mdir / f"data/responses/{trial_id}.npy", responses)


@pytest.fixture()
def learnable_env(tmp_path):
    data_root = tmp_path / "sensorium_all_2023"
    build_learnable_dataset(data_root)

    originals = {
        "sensorium_dir": constants.sensorium_dir,
        "experiments_dir": constants.experiments_dir,
        "predictions_dir": constants.predictions_dir,
    }
    constants.sensorium_dir = data_root
    constants.experiments_dir = tmp_path / "experiments"
    constants.predictions_dir = tmp_path / "predictions"

    original_phashes = mouse_data_mod.compute_video_phashes
    mouse_data_mod.compute_video_phashes = lambda mouse: np.arange(7, dtype=np.uint64)
    mouse_data_mod.get_folds_tiers.cache_clear()

    yield tmp_path

    for name, value in originals.items():
        setattr(constants, name, value)
    mouse_data_mod.compute_video_phashes = original_phashes
    mouse_data_mod.get_folds_tiers.cache_clear()


def test_training_learns_held_out_responses(learnable_env):
    from sensorium_tpu.cli.train import train_mouse

    config = tiny_experiment_config()
    nn_name, nn_kwargs = config["argus_params"]["nn_module"]
    config["argus_params"]["nn_module"] = (
        nn_name,
        dict(nn_kwargs, readout_outputs=[NUM_NEURONS] * constants.num_mice),
    )
    config["argus_params"]["optimizer"] = ("AdamW", {"lr": 3e-3, "weight_decay": 0.01})
    config["num_epochs"] = [1, 11]
    config["train_epoch_size"] = 480
    config["batch_size"] = 16
    config.pop("cutmix")  # clean signal: no mixing
    config["ema_decay"] = 0.7  # fast EMA so val sees the learned weights

    save_dir = constants.experiments_dir / "learn" / "fold_0"
    val_splits = ["fold_0"]
    train_splits = sorted(set(constants.folds_splits) - set(val_splits))
    train_mouse(config, save_dir, train_splits, val_splits, seed=0)

    log = (save_dir / "log.csv").read_text().strip().splitlines()
    header = log[0].split(",")
    corr_idx = header.index("val_corr")
    first_corr = float(log[1].split(",")[corr_idx])
    final_corr = float(log[-1].split(",")[corr_idx])
    # Chance level is ~0 (measured |corr| < 0.01 at init); this recipe
    # measured val_corr 0.13 at the final epoch (monotone from 0.002).
    assert final_corr > 0.08, f"val_corr stayed at {final_corr} (start {first_corr})"
    assert final_corr > first_corr + 0.05
