"""End-to-end pipeline tests on a synthetic on-disk dataset: fold catalog,
training CLI flow, checkpointing, sliding-window prediction, out-of-fold
evaluation, submission writing and cross-experiment ensembling."""

import numpy as np
import pytest

from sensorium_tpu import constants
from sensorium_tpu.data import mouse_data as mouse_data_mod
from sensorium_tpu.infer.ensemble import ensemble_experiments
from sensorium_tpu.infer.predictor import Predictor, predict_mouse_split
from sensorium_tpu.infer.submission import (
    cut_responses_for_submission,
    evaluate_folds_predictions,
    make_submission,
)
from sensorium_tpu.utils import get_best_model_path

from tests.synthetic import (
    SYNTH_NUM_NEURONS,
    SYNTH_TRIAL_LENGTH,
    build_synthetic_dataset,
    tiny_experiment_config,
)


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    """Synthetic dataset + redirected constants paths, shared per module."""
    root = tmp_path_factory.mktemp("synth")
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

    # Deterministic fold assignment: phash := trial_id -> fold trial_id % 7.
    original_phashes = mouse_data_mod.compute_video_phashes
    mouse_data_mod.compute_video_phashes = lambda mouse: np.arange(9, dtype=np.uint64)
    mouse_data_mod.get_folds_tiers.cache_clear()

    yield root

    for name, value in originals.items():
        setattr(constants, name, value)
    mouse_data_mod.compute_video_phashes = original_phashes
    mouse_data_mod.get_folds_tiers.cache_clear()


class TestFoldCatalog:
    def test_fold_assignment_and_catalog(self, synth_env):
        tiers = mouse_data_mod.get_folds_tiers(constants.new_mice[0], constants.num_folds)
        assert list(tiers[:7]) == [f"fold_{i}" for i in range(7)]
        assert list(tiers[7:]) == ["live_test_main", "final_test_main"]

        data = mouse_data_mod.get_mouse_data(constants.new_mice[0], ["fold_0", "fold_1"])
        assert data["num_neurons"] == SYNTH_NUM_NEURONS[0]
        assert len(data["trials"]) == 2
        assert data["trials"][0]["length"] == SYNTH_TRIAL_LENGTH
        assert "response_path" in data["trials"][0]

        unlabeled = mouse_data_mod.get_mouse_data(constants.new_mice[0], ["live_test_main"])
        assert len(unlabeled["trials"]) == 1
        assert "response_path" not in unlabeled["trials"][0]


@pytest.fixture(scope="module")
def trained_fold(synth_env):
    """Train one fold of the tiny experiment via the CLI's train_mouse."""
    from sensorium_tpu.cli.train import train_mouse

    config = tiny_experiment_config()
    save_dir = constants.experiments_dir / "tiny_exp" / "fold_0"
    val_splits = ["fold_0"]
    train_splits = sorted(set(constants.folds_splits) - set(val_splits))
    model = train_mouse(config, save_dir, train_splits, val_splits, mesh=None, seed=0)
    return save_dir, model, config


class TestTrainCLI:
    def test_checkpoints_and_logs_written(self, trained_fold):
        save_dir, _, _ = trained_fold
        assert get_best_model_path(save_dir) is not None
        assert (save_dir / "train_state.ckpt").exists()
        assert (save_dir / "log.txt").exists()
        assert (save_dir / "log.csv").exists()
        # Structured observability channel (SURVEY §5): one JSON record per
        # epoch, same metric keys as the CSV contract.
        import json

        records = [
            json.loads(line)
            for line in (save_dir / "log.jsonl").read_text().splitlines()
        ]
        assert records and all("epoch" in r and "stage" in r for r in records)
        assert any("val_corr" in r for r in records)

    def test_resume_skips_completed_stages(self, trained_fold, capsys):
        from sensorium_tpu.cli.train import train_mouse

        save_dir, _, config = trained_fold
        val_splits = ["fold_0"]
        train_splits = sorted(set(constants.folds_splits) - set(val_splits))
        train_mouse(
            config, save_dir, train_splits, val_splits, mesh=None, seed=0, resume=True
        )
        out = capsys.readouterr().out
        assert "Resumed from epoch" in out

    def test_init_from_checkpoint_warm_start(self, trained_fold):
        """config['init_from'] seeds a NEW run with a checkpoint's EMA
        weights (live + EMA trees) while optimizer state stays fresh —
        the fine-tune entry the reference lacks and the backbone of
        tools/learning_parity.py."""
        import jax
        import numpy as np

        from sensorium_tpu.engine import checkpoint as ckpt
        from sensorium_tpu.engine.model import MouseModel

        save_dir, _, config = trained_fold
        ckpt_path = get_best_model_path(save_dir)
        payload = ckpt.load_model_checkpoint(ckpt_path)

        fresh = MouseModel(config["argus_params"])
        fresh.set_ema(0.5)
        fresh.build_state(seed=123, learning_rate=1e-3)
        before = jax.device_get(fresh.state.params)
        fresh.init_from_checkpoint(ckpt_path)

        loaded = jax.device_get(fresh.state.params)
        want = payload["nn_state"]["params"]
        flat_l = jax.tree_util.tree_leaves(loaded)
        flat_w = jax.tree_util.tree_leaves(want)
        flat_b = jax.tree_util.tree_leaves(before)
        assert any(
            not np.array_equal(b, w) for b, w in zip(flat_b, flat_w)
        ), "seed-123 init accidentally equals the checkpoint"
        for got, w in zip(flat_l, flat_w):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(w))
        for got, w in zip(jax.tree_util.tree_leaves(
            jax.device_get(fresh.state.ema_params)
        ), flat_w):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(w))
        # Optimizer state stays fresh (step 0).
        assert int(jax.device_get(fresh.state.step)) == 0

        # Architecture mismatch fails with a clear error, not a tree error.
        other = MouseModel(
            {**config["argus_params"], "nn_module": (
                config["argus_params"]["nn_module"][0],
                {**config["argus_params"]["nn_module"][1], "cortex_features": (8, 8)},
            )}
        )
        other.build_state(seed=0, learning_rate=1e-3)
        with pytest.raises(ValueError, match="architecture mismatch"):
            other.init_from_checkpoint(ckpt_path)

    def test_three_stage_plan_numbers_epochs_cumulatively(self, synth_env, capsys):
        """A stage beyond ['warmup','train'] starts after ALL previous
        stages' epochs: global epoch numbering must not collide and
        --resume must not skip the extra stage wholesale."""
        import json

        from sensorium_tpu.cli.train import train_mouse

        config = tiny_experiment_config()
        config["stages"] = ["warmup", "train", "tune"]
        config["num_epochs"] = [1, 2, 1]
        save_dir = constants.experiments_dir / "three_stage" / "fold_1"
        val_splits = ["fold_1"]
        train_splits = sorted(set(constants.folds_splits) - set(val_splits))
        train_mouse(config, save_dir, train_splits, val_splits, mesh=None, seed=0)
        records = [
            json.loads(line)
            for line in (save_dir / "log.jsonl").read_text().splitlines()
        ]
        assert [(r["stage"], r["epoch"]) for r in records] == [
            ("warmup", 0), ("train", 1), ("train", 2), ("tune", 3),
        ]
        capsys.readouterr()
        # Resume after completion: every stage (incl. tune) reports done.
        train_mouse(
            config, save_dir, train_splits, val_splits, mesh=None, seed=0, resume=True
        )
        out = capsys.readouterr().out
        assert "Resumed from epoch 4" in out
        assert out.count("already completed") == 3


class TestPredictionPipeline:
    def test_sliding_window_blend_matches_sequential(self, trained_fold):
        """The batched device predictor must reproduce the reference's
        sequential stride-1 window blending exactly."""
        save_dir, _, _ = trained_fold
        predictor = Predictor(get_best_model_path(save_dir), chunk_size=16)

        mouse = constants.new_mice[0]
        data = mouse_data_mod.get_mouse_data(mouse, ["fold_0"])
        trial = data["trials"][0]
        length = trial["length"]
        video = np.load(trial["video_path"])[..., :length]
        behavior = np.load(trial["behavior_path"])[..., :length]
        pupil = np.load(trial["pupil_center_path"])[..., :length]

        fast = predictor.predict_trial(video, behavior, pupil, mouse_index=0)

        # Reference-style sequential accumulation (predictors.py:46-54).
        gen = predictor.indexes_generator
        inputs = predictor.inputs_processor(video, behavior, pupil)
        responses = np.zeros((SYNTH_NUM_NEURONS[0], length), np.float32)
        blend = np.zeros(length, np.float32)
        for anchor in range(gen.behind, length - gen.ahead):
            idx = gen.window(anchor)
            pred = predictor.model.predict(inputs[:, idx], mouse_index=0)
            responses[:, idx] += np.asarray(pred)
            blend[idx] += 1.0
        responses /= np.clip(blend, 1.0, None)

        np.testing.assert_allclose(fast, responses, rtol=1e-4, atol=1e-4)

    def test_device_assembly_matches_hoststack(self, trained_fold):
        """The on-device input-stack assembly (compact video+signals
        transfer) must equal the host-assembled (5, T, H, W) fallback."""
        save_dir, _, _ = trained_fold
        predictor = Predictor(get_best_model_path(save_dir), chunk_size=16)

        mouse = constants.new_mice[0]
        data = mouse_data_mod.get_mouse_data(mouse, ["fold_0"])
        trial = data["trials"][0]
        length = trial["length"]
        video = np.load(trial["video_path"])[..., :length]
        behavior = np.load(trial["behavior_path"])[..., :length]
        pupil = np.load(trial["pupil_center_path"])[..., :length]

        device_path = predictor.predict_trial(video, behavior, pupil, mouse_index=0)

        # Force the host-stack fallback by masquerading the processor class.
        class _NotStack:
            def __init__(self, inner):
                self._inner = inner

            def __call__(self, *args):
                return self._inner(*args)

        predictor.inputs_processor = _NotStack(predictor.inputs_processor)
        host_path = predictor.predict_trial(video, behavior, pupil, mouse_index=0)

        np.testing.assert_allclose(device_path, host_path, rtol=1e-5, atol=1e-5)

    def test_folds_evaluate_submission_ensemble(self, trained_fold):
        save_dir, _, _ = trained_fold
        experiment = "tiny_exp"
        predictor = Predictor(get_best_model_path(save_dir), chunk_size=16)

        # Out-of-fold predictions for every mouse's fold_0 trials.
        for mouse in constants.mice:
            mouse_dir = constants.predictions_dir / experiment / "out-of-fold" / mouse
            predict_mouse_split(mouse, "fold_0", [predictor], mouse_dir)
            files = list(mouse_dir.glob("*.npy"))
            assert len(files) == 1  # one fold_0 trial per mouse
            pred = np.load(files[0])
            n = SYNTH_NUM_NEURONS[constants.mouse2index[mouse]]
            assert pred.shape == (n, SYNTH_TRIAL_LENGTH)
            assert np.all(pred >= 0)  # softplus output

        # evaluate_folds_predictions only reads trials that have prediction
        # files; restrict the catalog to fold_0 by monkeypatching splits.
        folds_backup = constants.folds_splits
        constants.folds_splits = ["fold_0"]
        try:
            result = evaluate_folds_predictions(experiment, "new")
        finally:
            constants.folds_splits = folds_backup
        assert set(result["correlations"]) == set(constants.new_mice)
        assert np.isfinite(result["mean_correlation"])
        assert (
            constants.predictions_dir / experiment / "out-of-fold" / "evaluate_new.json"
        ).exists()

        # Unlabeled split -> submission parquet with the renamed split.
        for mouse in constants.new_mice:
            mouse_dir = constants.predictions_dir / experiment / "live_test_main" / mouse
            predict_mouse_split(mouse, "live_test_main", [predictor], mouse_dir)
        make_submission(experiment, "live_test_main")
        submission_path = (
            constants.predictions_dir
            / experiment
            / "live_test_main"
            / "predictions_live_main.parquet.brotli"
        )
        assert submission_path.exists()

        import pandas as pd

        df = pd.read_parquet(submission_path)
        assert list(df.columns) == ["mouse", "trial_indices", "prediction", "neuron_ids"]
        assert len(df) == len(constants.new_mice)
        first = df.iloc[0]
        # Cut: min(300, 40) - 50 first... shorter than skip -> empty check:
        # synthetic trials are 40 frames; the cut keeps [50, 299) so the
        # submission rows carry empty response lists — still valid schema.
        assert isinstance(first["prediction"], (list, np.ndarray))

        # Ensemble of the experiment with itself must equal the original.
        second = "tiny_exp2"
        for mouse in constants.mice:
            src = constants.predictions_dir / experiment / "out-of-fold" / mouse
            dst = constants.predictions_dir / second / "out-of-fold" / mouse
            dst.mkdir(parents=True, exist_ok=True)
            for f in src.glob("*.npy"):
                np.save(dst / f.name, np.load(f))
        folds_backup = constants.folds_splits
        constants.folds_splits = ["fold_0"]
        try:
            name = ensemble_experiments([experiment, second], "folds", "new")
        finally:
            constants.folds_splits = folds_backup
        assert name == f"{experiment},{second}"
        for mouse in constants.new_mice:
            ens_dir = constants.predictions_dir / name / "out-of-fold" / mouse
            orig_dir = constants.predictions_dir / experiment / "out-of-fold" / mouse
            for f in orig_dir.glob("*.npy"):
                np.testing.assert_allclose(
                    np.load(ens_dir / f.name), np.load(f), rtol=1e-6
                )


    def test_multi_predictor_device_blend_matches_host_mean(self, trained_fold):
        """predict_mouse_split blends fold models ON DEVICE with a single
        deferred fetch per trial; the saved blend must equal the host-side
        np.mean of the individual predict_trial results (the reference's
        predict.py:49 semantics)."""
        from sensorium_tpu.data.mouse_data import get_mouse_data
        from sensorium_tpu.infer.predictor import _load_trial_arrays

        save_dir, _, _ = trained_fold
        path = get_best_model_path(save_dir)
        # Same checkpoint, different window-blend weights -> two genuinely
        # different predictors, so the mean differs from both.
        p1 = Predictor(path, chunk_size=16, blend_weights="ones")
        p2 = Predictor(path, chunk_size=16, blend_weights="linear")

        mouse = constants.mice[0]
        mouse_dir = constants.predictions_dir / "blend_exp" / "out-of-fold" / mouse
        # Same-signature predictors must share the staged trial upload:
        # exactly ONE stage_trial call per trial across both predictors.
        stage_calls = []
        orig_stage = Predictor.stage_trial
        try:
            Predictor.stage_trial = lambda self, *a, **k: (
                stage_calls.append(1),
                orig_stage(self, *a, **k),
            )[1]
            predict_mouse_split(mouse, "fold_0", [p1, p2], mouse_dir)
        finally:
            Predictor.stage_trial = orig_stage
        assert len(stage_calls) == 1
        files = sorted(mouse_dir.glob("*.npy"))
        assert len(files) == 1
        saved = np.load(files[0])

        trial = get_mouse_data(mouse=mouse, splits=["fold_0"])["trials"][0]
        video, behavior, pupil = _load_trial_arrays(trial)
        mi = constants.mouse2index[mouse]
        r1 = p1.predict_trial(video, behavior, pupil, mi)
        r2 = p2.predict_trial(video, behavior, pupil, mi)
        assert not np.allclose(r1, r2)  # the two predictors truly differ
        np.testing.assert_allclose(saved, np.mean([r1, r2], axis=0), rtol=1e-6, atol=1e-6)


class TestDistillationPipeline:
    def test_distill_training_from_teacher_checkpoint(self, trained_fold):
        """Full distillation flow: resolve the teacher fold checkpoint,
        inject its predictions and train a student (distillation_001
        semantics, reference scripts/train.py:58-66)."""
        from sensorium_tpu.cli.train import train_mouse

        save_dir, _, _ = trained_fold
        config = tiny_experiment_config()
        config["num_epochs"] = [1, 1]
        config["distill"] = {"experiment": "tiny_exp", "ratio": 0.36}
        student_dir = constants.experiments_dir / "tiny_distill" / "fold_0"
        val_splits = ["fold_0"]
        train_splits = sorted(set(constants.folds_splits) - set(val_splits))
        model = train_mouse(config, student_dir, train_splits, val_splits, seed=1)
        assert model.distill_ratio == pytest.approx(0.36)
        assert get_best_model_path(student_dir) is not None


class TestAugmentationsHook:
    def test_per_sample_augmentation_applied(self, synth_env):
        """The train dataset's augmentation hook (reference
        src/datasets.py:118-122) transforms inputs before mixing."""
        from sensorium_tpu.data.datasets import TrainMiceDataset
        from sensorium_tpu.data.indexes import WindowIndexer
        from sensorium_tpu.data.inputs import get_inputs_processor
        from sensorium_tpu.data.responses import get_responses_processor

        config = tiny_experiment_config()["argus_params"]
        mice_data = [
            mouse_data_mod.get_mouse_data(m, ["fold_1"]) for m in constants.mice
        ]
        common = dict(
            indexer=WindowIndexer(**config["frame_stack"]),
            inputs_processor=get_inputs_processor(*config["inputs_processor"]),
            responses_processor=get_responses_processor(*config["responses_processor"]),
            mouse_epoch_size=2,
            seed=3,
        )
        plain = TrainMiceDataset(mice_data, **common)
        augmented = TrainMiceDataset(
            mice_data, augmentations=lambda inputs, rng: inputs * 2.0, **common
        )
        _, base_inputs, base_target = plain.get(0, epoch=0)
        _, aug_inputs, aug_target = augmented.get(0, epoch=0)
        np.testing.assert_allclose(aug_inputs, base_inputs * 2.0, rtol=1e-6)
        np.testing.assert_allclose(aug_target, base_target, rtol=1e-6)


class TestSubmissionCut:
    def test_cut_parity(self):
        x = np.arange(400, dtype=np.float32)[None].repeat(3, axis=0)
        cut = cut_responses_for_submission(x)
        # [:300] -> [50:] -> [:-1] = frames 50..298
        assert cut.shape == (3, 249)
        assert cut[0, 0] == 50 and cut[0, -1] == 298
