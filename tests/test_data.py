"""Unit tests of the host-side data pipeline (indexes, inputs, responses,
mixers, phash) against hand-computed values and reference semantics."""

import numpy as np
import pytest

from sensorium_tpu.data.indexes import WindowIndexer
from sensorium_tpu.data.inputs import StackInputsProcessor, get_inputs_processor
from sensorium_tpu.data.mixers import CutMix, Mixup, sample_bbox
from sensorium_tpu.data.phash import frame_phash, pack_bits, video_phash
from sensorium_tpu.data.responses import get_responses_processor


class TestWindowIndexer:
    def test_production_config(self):
        # size=16, step=2, last -> behind 30, ahead 0, width 31
        indexer = WindowIndexer(size=16, step=2, position="last")
        assert (indexer.behind, indexer.ahead, indexer.width) == (30, 0, 31)
        window = indexer.window(30)
        assert window.tolist() == list(range(0, 31, 2))
        assert len(window) == 16

    def test_positions(self):
        first = WindowIndexer(4, 1, "first")
        assert first.window(0).tolist() == [0, 1, 2, 3]
        middle = WindowIndexer(4, 1, "middle")
        assert middle.window(2).tolist() == [0, 1, 2, 3]
        with pytest.raises(ValueError):
            WindowIndexer(4, 1, "nope")

    def test_windows_vectorized(self):
        indexer = WindowIndexer(size=3, step=2, position="last")
        batch = indexer.windows(np.array([4, 7]))
        assert batch.tolist() == [[0, 2, 4], [3, 5, 7]]

    def test_valid_anchors_and_clip(self):
        indexer = WindowIndexer(size=16, step=2, position="last")
        anchors = indexer.valid_anchors(100)
        assert anchors[0] == 30 and anchors[-1] == 99
        assert indexer.clip_anchor(5, 100) == 30
        assert indexer.clip_anchor(150, 100) == 99
        assert indexer.clip_anchor(40, 100, save_zone=15) == 45


class TestStackInputs:
    def test_layout_and_padding(self):
        proc = StackInputsProcessor(size=(64, 64), pad_fill_value=0.0)
        frames = np.arange(36 * 64 * 4, dtype=np.float32).reshape(36, 64, 4)
        behavior = np.stack([np.full(4, 2.0), np.full(4, 3.0)]).astype(np.float32)
        pupil = np.stack([np.full(4, 4.0), np.full(4, 5.0)]).astype(np.float32)
        out = proc(frames, behavior, pupil)
        assert out.shape == (5, 4, 64, 64)
        # Video centered: 36 rows in 64 -> start 14; 64 cols fill all.
        assert np.all(out[0, :, :14] == 0) and np.all(out[0, :, 50:] == 0)
        np.testing.assert_array_equal(out[0, 2, 14:50, :], frames[:, :, 2])
        assert np.all(out[1] == 2.0) and np.all(out[2] == 3.0)
        assert np.all(out[3] == 4.0) and np.all(out[4] == 5.0)

    def test_registry(self):
        proc = get_inputs_processor("stack_inputs", {"size": (64, 64)})
        assert isinstance(proc, StackInputsProcessor)
        with pytest.raises(KeyError):
            get_inputs_processor("nope", {})


class TestResponses:
    def test_identity_relu(self):
        proc = get_responses_processor("identity", {})
        out = proc(np.array([[-1.0, 2.0], [3.0, -4.0]]))
        np.testing.assert_array_equal(out, [[0.0, 2.0], [3.0, 0.0]])
        assert out.dtype == np.float32

    def test_indexing_and_last(self):
        resp = np.arange(12, dtype=np.float32).reshape(3, 4)
        out = get_responses_processor("indexing", {"index": [1, 2]})(resp)
        np.testing.assert_array_equal(out, resp[:, [1, 2]])
        out = get_responses_processor("last", {})(resp)
        np.testing.assert_array_equal(out, resp[:, -1])


class TestMixers:
    def test_mixup_interpolates(self):
        rng = np.random.default_rng(0)
        mixer = Mixup(alpha=0.4, prob=1.0)
        a = (np.zeros((5, 2, 4, 4)), np.zeros((3, 2)))
        b = (np.ones((5, 2, 4, 4)), np.ones((3, 2)))
        inputs, target = mixer(a, b, rng)
        lam = inputs[0, 0, 0, 0]
        assert 0 <= lam <= 1
        assert np.allclose(inputs, lam) and np.allclose(target, lam)

    def test_cutmix_area_weighting(self):
        rng = np.random.default_rng(1)
        mixer = CutMix(alpha=1.0, prob=1.0)
        a = (np.zeros((5, 2, 8, 8), np.float32), np.zeros((3, 2), np.float32))
        b = (np.ones((5, 2, 8, 8), np.float32), np.ones((3, 2), np.float32))
        inputs, target = mixer(a, b, rng)
        pasted_fraction = inputs[0, 0].mean()
        np.testing.assert_allclose(target, pasted_fraction, rtol=1e-6)
        # original sample untouched
        assert a[0].sum() == 0

    def test_bbox_in_bounds(self):
        rng = np.random.default_rng(2)
        for _ in range(50):
            lam = rng.random()
            x1, y1, x2, y2 = sample_bbox(16, 24, lam, rng)
            assert 0 <= x1 <= x2 <= 24 and 0 <= y1 <= y2 <= 16

    def test_probability_gate(self):
        rng = np.random.default_rng(3)
        always = CutMix(prob=1.0)
        never = CutMix(prob=0.0)
        assert all(always.use(rng) for _ in range(10))
        assert not any(never.use(rng) for _ in range(10))


class TestPhash:
    def test_pack_bits_msb_first(self):
        assert pack_bits(np.array([1, 0, 1])) == 0b101
        assert pack_bits(np.zeros(64, dtype=bool)) == 0

    def test_identical_frames_same_hash(self):
        rng = np.random.default_rng(4)
        frame = rng.integers(0, 255, size=(36, 64)).astype(np.float64)
        assert frame_phash(frame) == frame_phash(frame.copy())
        assert frame_phash(frame) != frame_phash(frame.T[:36, :36])

    def test_video_phash_group_property(self):
        rng = np.random.default_rng(5)
        video = rng.integers(0, 255, size=(36, 64, 40)).astype(np.float64)
        h1 = video_phash(video)
        h2 = video_phash(video.copy())
        assert h1 == h2
        assert 0 <= h1 < 2**64

    def test_video_phash_ignores_nan_tail(self):
        rng = np.random.default_rng(6)
        video = rng.integers(0, 255, size=(36, 64, 40)).astype(np.float64)
        padded = np.concatenate([video, np.full((36, 64, 10), np.nan)], axis=-1)
        assert video_phash(video) == video_phash(padded)


class TestGuardRails:
    def test_oversized_frame_raises_clearly(self):
        from sensorium_tpu.data.inputs import StackInputsProcessor

        proc = StackInputsProcessor(size=(16, 16))
        frames = np.zeros((20, 30, 4), np.float32)  # 20x30 frame > 16x16 canvas
        with pytest.raises(ValueError, match="exceeds the model canvas"):
            proc(frames, np.zeros((2, 4), np.float32), np.zeros((2, 4), np.float32))

    def test_short_trials_rejected_at_construction(self, tmp_path):
        from sensorium_tpu.data.datasets import TrainMiceDataset
        from sensorium_tpu.data.indexes import WindowIndexer
        from sensorium_tpu.data.inputs import get_inputs_processor
        from sensorium_tpu.data.responses import get_responses_processor
        from sensorium_tpu import constants

        def fake_mouse_data(mouse, length):
            video = tmp_path / f"{mouse}_v.npy"
            np.save(video, np.zeros((4, 4, length), np.float32))
            return {
                "mouse": mouse,
                "splits": ["fold_0"],
                "num_neurons": 3,
                "trials": [{
                    "trial_id": 0, "length": length,
                    "video_path": str(video), "behavior_path": str(video),
                    "pupil_center_path": str(video), "response_path": str(video),
                }],
            }

        indexer = WindowIndexer(size=4, step=2)  # width 7
        mice_data = [fake_mouse_data(m, length=5) for m in constants.mice]
        with pytest.raises(ValueError, match="no trial of at least 7"):
            TrainMiceDataset(
                mice_data, indexer,
                get_inputs_processor("stack_inputs", {"size": (8, 8)}),
                get_responses_processor("identity", {}),
                mouse_epoch_size=4,
            )

    def test_fold_cache_tracks_assignment_env(self, tmp_path, monkeypatch):
        from sensorium_tpu import constants
        from sensorium_tpu.data import mouse_data as mouse_data_mod

        mouse = constants.new_mice[0]
        root = tmp_path / "sensorium_all_2023"
        (root / mouse / "meta" / "trials").mkdir(parents=True)
        np.save(root / mouse / "meta" / "trials" / "tiers.npy",
                np.array(["train"] * 3))
        monkeypatch.setattr(constants, "sensorium_dir", root)
        mouse_data_mod.get_folds_tiers.cache_clear()
        monkeypatch.setattr(
            mouse_data_mod, "compute_video_phashes",
            lambda m: np.array([5, 5, 5], np.uint64),
        )

        phash_tiers = mouse_data_mod.get_folds_tiers(mouse, 7)
        assert list(phash_tiers) == ["fold_5"] * 3
        # The cached array is read-only: one caller mutating it would
        # poison fold assignment for the rest of the process.
        with pytest.raises(ValueError):
            phash_tiers[0] = "train"
        # Flipping the env must NOT be served from the stale cache entry.
        monkeypatch.setenv("SENSORIUM_FOLD_ASSIGNMENT", "trial")
        trial_tiers = mouse_data_mod.get_folds_tiers(mouse, 7)
        assert list(trial_tiers) == ["fold_0", "fold_1", "fold_2"]
        mouse_data_mod.get_folds_tiers.cache_clear()
