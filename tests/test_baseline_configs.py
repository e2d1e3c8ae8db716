"""The five BASELINE.json scenarios, explicit and end-to-end.

Each test is one ``configs`` entry from ``/root/repo/BASELINE.json`` run on
the synthetic dataset (marker: ``baseline``):

1. DwiseNeuro single-mouse inference on one clip through the predict path;
2. single-fold training on one mouse (core + cortex + 1 readout);
3. all-mice joint training with 10 readouts, EMA, and CutMix;
4. distillation training (distillation_001 semantics: a *smaller-expansion*
   student filled with teacher predictions on other-mice samples);
5. 7-fold ensemble inference + full submission generation.
"""

from __future__ import annotations

import numpy as np
import pytest

from sensorium_tpu import constants
from sensorium_tpu.data import mouse_data as mouse_data_mod
from sensorium_tpu.infer.ensemble import ensemble_experiments
from sensorium_tpu.infer.predictor import Predictor
from sensorium_tpu.utils import get_best_model_path

from tests.synthetic import (
    SYNTH_NUM_NEURONS,
    build_synthetic_dataset,
    tiny_experiment_config,
)

pytestmark = pytest.mark.baseline

EXPERIMENT = "baseline_tb"


@pytest.fixture(scope="module")
def baseline_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("baseline")
    data_root = root / "sensorium_all_2023"
    build_synthetic_dataset(data_root)

    originals = {
        "sensorium_dir": constants.sensorium_dir,
        "experiments_dir": constants.experiments_dir,
        "predictions_dir": constants.predictions_dir,
    }
    constants.sensorium_dir = data_root
    constants.experiments_dir = root / "experiments"
    constants.predictions_dir = root / "predictions"

    original_phashes = mouse_data_mod.compute_video_phashes
    mouse_data_mod.compute_video_phashes = lambda mouse: np.arange(9, dtype=np.uint64)
    mouse_data_mod.get_folds_tiers.cache_clear()

    yield root

    for name, value in originals.items():
        setattr(constants, name, value)
    mouse_data_mod.compute_video_phashes = original_phashes
    mouse_data_mod.get_folds_tiers.cache_clear()


def _short_config() -> dict:
    config = tiny_experiment_config()
    config["num_epochs"] = [1, 1]
    config["train_epoch_size"] = 40
    return config


@pytest.fixture(scope="module")
def seven_fold_experiment(baseline_env):
    """Config 'true_batch' trained on all 7 CV folds (tiny shapes)."""
    from sensorium_tpu.cli.train import train_mouse

    config = _short_config()
    for fold_split in constants.folds_splits:
        val_splits = [fold_split]
        train_splits = sorted(set(constants.folds_splits) - set(val_splits))
        train_mouse(
            config,
            constants.experiments_dir / EXPERIMENT / fold_split,
            train_splits,
            val_splits,
            seed=0,
        )
    return EXPERIMENT


class TestConfig1SingleMouseInference:
    def test_predict_one_clip(self, seven_fold_experiment):
        """BASELINE config 1: one clip through the predict path."""
        model_path = get_best_model_path(
            constants.experiments_dir / seven_fold_experiment / "fold_0"
        )
        predictor = Predictor(model_path, chunk_size=8)
        width = predictor.indexes_generator.width  # minimal single-window clip

        rng = np.random.default_rng(0)
        video = rng.uniform(0, 255, (12, 16, width)).astype(np.float32)
        behavior = rng.uniform(0, 5, (2, width)).astype(np.float32)
        pupil = rng.uniform(50, 200, (2, width)).astype(np.float32)

        prediction = predictor.predict_trial(video, behavior, pupil, mouse_index=0)
        assert prediction.shape == (SYNTH_NUM_NEURONS[0], width)
        assert np.isfinite(prediction).all() and (prediction >= 0).all()


class TestConfig2SingleMouseTraining:
    def test_one_readout_training_step(self, baseline_env):
        """BASELINE config 2: core + cortex + a single readout trains."""
        import jax

        from sensorium_tpu.data.datasets import MouseTrialStore, collate_mice_batch
        from sensorium_tpu.data.indexes import WindowIndexer
        from sensorium_tpu.data.inputs import get_inputs_processor
        from sensorium_tpu.data.responses import get_responses_processor
        from sensorium_tpu.engine.losses import get_loss
        from sensorium_tpu.engine.model import MouseModel
        from sensorium_tpu.engine.steps import make_train_step

        config = _short_config()
        params = dict(config["argus_params"])
        nn_name, nn_kwargs = params["nn_module"]
        nn_kwargs = dict(nn_kwargs, readout_outputs=[SYNTH_NUM_NEURONS[0]])
        params["nn_module"] = (nn_name, nn_kwargs)

        model = MouseModel(params)
        state = model.build_state(seed=0, learning_rate=1e-2)
        step = make_train_step(model.nn_module, model.tx, get_loss(*params["loss"]))

        mouse = constants.mice[0]
        store = MouseTrialStore(
            mouse_data_mod.get_mouse_data(mouse, ["fold_1"]),
            WindowIndexer(**params["frame_stack"]),
            get_inputs_processor(*params["inputs_processor"]),
            get_responses_processor(*params["responses_processor"]),
        )
        anchor = store.indexer.behind
        samples = [
            (0, *store.window_sample(trial_index % len(store.trials), anchor + 2 * trial_index))
            for trial_index in range(4)
        ]
        batch = collate_mice_batch(samples, num_mice=1, max_neurons=SYNTH_NUM_NEURONS[0])

        losses = []
        for _ in range(8):
            state, loss = step(state, batch.inputs, batch.targets, batch.weights)
            losses.append(float(jax.device_get(loss)))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]  # learns the fixed batch


class TestConfig3AllMiceTraining:
    def test_ema_cutmix_checkpoints(self, seven_fold_experiment):
        """BASELINE config 3: joint 10-readout training with EMA + CutMix.

        The seven_fold_experiment fixture trains exactly this recipe
        (tiny_experiment_config carries ema_decay + cutmix over 10 mice);
        assert its observable artifacts.
        """
        fold_dir = constants.experiments_dir / seven_fold_experiment / "fold_0"
        assert get_best_model_path(fold_dir) is not None
        log = (fold_dir / "log.csv").read_text()
        assert "val_corr" in log
        # Per-mouse correlation keys prove all 10 readouts were trained.
        assert all(f"val_corr_mouse_{i}" in log for i in range(constants.num_mice))


class TestConfig4Distillation:
    def test_smaller_student_distills_from_teacher(self, seven_fold_experiment):
        """BASELINE config 4: distillation_001 semantics — the student uses
        a different (smaller-expansion) architecture and fills other-mice
        samples with teacher predictions at ratio 0.36
        (/root/reference/configs/distillation_001.py:32,67-70)."""
        from sensorium_tpu.cli.train import train_mouse

        config = _short_config()
        nn_name, nn_kwargs = config["argus_params"]["nn_module"]
        assert nn_kwargs["expansion_ratio"] == 2
        student_kwargs = dict(nn_kwargs, expansion_ratio=3)  # 7 -> 6 analog
        config["argus_params"]["nn_module"] = (nn_name, student_kwargs)
        config["distill"] = {"experiment": seven_fold_experiment, "ratio": 0.36}

        student_dir = constants.experiments_dir / "baseline_distill" / "fold_0"
        val_splits = ["fold_0"]
        train_splits = sorted(set(constants.folds_splits) - set(val_splits))
        model = train_mouse(config, student_dir, train_splits, val_splits, seed=1)

        assert model.distill_ratio == pytest.approx(0.36)
        assert model.teacher_module is not model.nn_module
        assert get_best_model_path(student_dir) is not None


class TestOldMiceFoldsEvaluation:
    def test_predict_folds_old_dataset(self, seven_fold_experiment):
        """Reference `-d old` flow: old mice's (back-filled) labeled trials
        get out-of-fold predictions and a CV evaluation JSON."""
        from sensorium_tpu.cli.predict import predict_folds
        from sensorium_tpu.infer.submission import evaluate_folds_predictions

        predict_folds(seven_fold_experiment, "old", chunk_size=8)
        result = evaluate_folds_predictions(seven_fold_experiment, "old")

        assert set(result["correlations"]) == set(constants.old_mice)
        assert np.isfinite(result["mean_correlation"])
        assert (
            constants.predictions_dir
            / seven_fold_experiment
            / "out-of-fold"
            / "evaluate_old.json"
        ).exists()
        for mouse in constants.old_mice:
            files = list(
                (
                    constants.predictions_dir
                    / seven_fold_experiment
                    / "out-of-fold"
                    / mouse
                ).glob("*.npy")
            )
            # One labeled trial per fold under the identity-phash mock.
            assert len(files) == 7


class TestConfig5SevenFoldEnsemble:
    def test_unlabeled_seven_fold_average_and_submission(self, seven_fold_experiment):
        """BASELINE config 5: all 7 fold models averaged per unlabeled
        trial, submission written, cross-experiment ensemble averaged."""
        from sensorium_tpu.cli.predict import predict_unlabeled_split
        from sensorium_tpu.infer.submission import make_submission

        from sensorium_tpu.parallel.mesh import create_mesh

        split = "live_test_main"
        # Exercise the CLI's --mesh path: chunk forwards sharded over the
        # virtual 8-device mesh.
        predict_unlabeled_split(
            seven_fold_experiment, split, "new", chunk_size=8, mesh=create_mesh()
        )
        for mouse in constants.new_mice:
            files = list(
                (constants.predictions_dir / seven_fold_experiment / split / mouse).glob(
                    "*.npy"
                )
            )
            assert len(files) == 1  # one live_test_main trial per mouse
            n = SYNTH_NUM_NEURONS[constants.mouse2index[mouse]]
            assert np.load(files[0]).shape[0] == n

        make_submission(seven_fold_experiment, split)
        assert (
            constants.predictions_dir
            / seven_fold_experiment
            / split
            / "predictions_live_main.parquet.brotli"
        ).exists()

        # Cross-experiment ensemble (ensemble.py semantics): mean of two
        # copies equals the original predictions.
        second = f"{seven_fold_experiment}_copy"
        for mouse in constants.new_mice:
            src = constants.predictions_dir / seven_fold_experiment / split / mouse
            dst = constants.predictions_dir / second / split / mouse
            dst.mkdir(parents=True, exist_ok=True)
            for f in src.glob("*.npy"):
                np.save(dst / f.name, np.load(f))
        name = ensemble_experiments([seven_fold_experiment, second], split, "new")
        for mouse in constants.new_mice:
            for f in (
                constants.predictions_dir / seven_fold_experiment / split / mouse
            ).glob("*.npy"):
                np.testing.assert_allclose(
                    np.load(constants.predictions_dir / name / split / mouse / f.name),
                    np.load(f),
                    rtol=1e-6,
                )
