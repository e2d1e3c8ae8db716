"""Unit tests for the small host-side helpers (reference src/utils.py) and
the threaded loader's ordering/determinism contracts."""

from __future__ import annotations

import numpy as np
import pytest

from sensorium_tpu.utils import get_best_model_path, get_length_without_nan, get_lr


class TestGetLr:
    def test_reference_scaling(self):
        """base 3e-4 at batch 32 -> 2.4e-3 (reference utils.py:18, README:149)."""
        assert get_lr(3e-4, 32) == pytest.approx(2.4e-3)
        assert get_lr(1e-3, 4) == pytest.approx(1e-3)


class TestBestModelPath:
    def test_picks_highest_score(self, tmp_path):
        for name in ("model-001-0.100000.ckpt", "model-002-0.250000.ckpt",
                     "model-003-0.030000.ckpt"):
            (tmp_path / name).touch()
        assert get_best_model_path(tmp_path).name == "model-002-0.250000.ckpt"

    def test_less_is_better_mode(self, tmp_path):
        for name in ("model-001-0.900000.ckpt", "model-002-0.100000.ckpt"):
            (tmp_path / name).touch()
        path, score = get_best_model_path(tmp_path, return_score=True, more_better=False)
        assert path.name == "model-002-0.100000.ckpt"
        assert score == pytest.approx(0.1)

    def test_reference_pth_names_supported(self, tmp_path):
        (tmp_path / "model-017-0.292511.pth").touch()
        assert get_best_model_path(tmp_path).suffix == ".pth"

    def test_ignores_unscored_files(self, tmp_path):
        (tmp_path / "train_state.ckpt").touch()
        (tmp_path / "notes.txt").touch()
        assert get_best_model_path(tmp_path) is None
        path, score = get_best_model_path(tmp_path, return_score=True)
        assert path is None and score == -np.inf

    def test_empty_dir(self, tmp_path):
        assert get_best_model_path(tmp_path) is None


class TestLengthWithoutNan:
    def test_trims_at_first_nan(self):
        arr = np.array([1.0, 2.0, np.nan, 4.0, np.nan])
        assert get_length_without_nan(arr) == 2

    def test_no_nan(self):
        assert get_length_without_nan(np.arange(5.0)) == 5

    def test_leading_nan(self):
        assert get_length_without_nan(np.array([np.nan, 1.0])) == 0


class TestLoaderContracts:
    def _dataset(self):
        class Tiny:
            num_mice = 2
            max_neurons = 3

            def __len__(self):
                return 10

            def get(self, index, epoch=0):
                rng = np.random.default_rng((7, epoch, index))
                return (
                    index % 2,
                    np.full((5, 2, 4, 4), float(index), np.float32),
                    rng.uniform(0, 1, (3, 2)).astype(np.float32),
                )

        return Tiny()

    def test_shuffle_is_epoch_deterministic(self):
        from sensorium_tpu.data.loader import MiceDataLoader

        loader = MiceDataLoader(self._dataset(), batch_size=4, shuffle=True, seed=3)
        loader.set_epoch(2)
        first = [batch.inputs[:, 0, 0, 0, 0].tolist() for batch in loader]
        second = [batch.inputs[:, 0, 0, 0, 0].tolist() for batch in loader]
        assert first == second
        loader.set_epoch(3)
        third = [batch.inputs[:, 0, 0, 0, 0].tolist() for batch in loader]
        assert third != first

    def test_drop_last_and_batch_order(self):
        from sensorium_tpu.data.loader import MiceDataLoader

        loader = MiceDataLoader(self._dataset(), batch_size=4, drop_last=True)
        batches = list(loader)
        assert len(loader) == 2 and len(batches) == 2
        # Unshuffled order is the index order.
        np.testing.assert_allclose(batches[0].inputs[:, 0, 0, 0, 0], [0, 1, 2, 3])

        full = list(MiceDataLoader(self._dataset(), batch_size=4))
        assert [len(b) for b in full] == [4, 4, 2]

    def test_worker_exception_propagates(self):
        from sensorium_tpu.data.loader import MiceDataLoader

        class Exploding:
            num_mice = 1
            max_neurons = 1

            def __len__(self):
                return 4

            def get(self, index, epoch=0):
                raise RuntimeError("corrupted trial file")

        with pytest.raises(RuntimeError, match="corrupted trial"):
            list(MiceDataLoader(Exploding(), batch_size=2))


class TestPredictDeviceFlag:
    def test_select_device(self):
        from sensorium_tpu.cli.predict import select_device

        assert select_device(None) is None
        assert select_device("") is None
        dev = select_device("cpu")
        assert dev.platform == "cpu" and dev.id == 0
        dev1 = select_device("cpu:1")
        assert dev1.platform == "cpu" and dev1.id == 1

    def test_select_device_malformed_specs(self):
        from sensorium_tpu.cli.predict import select_device

        with pytest.raises(SystemExit, match="bad device index"):
            select_device("cpu:x")
        with pytest.raises(SystemExit, match="bad device index"):
            select_device("cpu:99")
        # Backend failures keep the original jax message (a real TPU-init
        # failure must not be mislabeled as an unknown platform name).
        with pytest.raises(SystemExit, match="could not initialize"):
            select_device("nosuchplatform")


def test_best_model_path_honors_negative_scores(tmp_path):
    """'model-003--0.500000.ckpt' is val_corr -0.5 (Checkpoint formats
    {val_corr:.6f} after the epoch's own dash); ranking by |score| would
    load a worse-than-zero model as best (CV-smoke runs produce these)."""
    from sensorium_tpu.utils import get_best_model_path

    for name in ("model-003--0.500000.ckpt", "model-004-0.100000.ckpt"):
        (tmp_path / name).write_bytes(b"x")
    best, score = get_best_model_path(tmp_path, return_score=True)
    assert best.name == "model-004-0.100000.ckpt"
    assert score == 0.1


class TestBenchChildModeResult:
    """bench.py --all child-outcome parsing: a failing mode's diagnostic
    must survive into the combined artifact (a --infer-mesh child reports
    its error in the stdout JSON line and exits 1 with an EMPTY stderr —
    recording only stderr produced {"error": ""} snapshots)."""

    @pytest.fixture(scope="class")
    def child_mode_result(self):
        import importlib.util
        import sys
        from pathlib import Path

        if "sensorium_bench" not in sys.modules:
            path = Path(__file__).resolve().parent.parent / "bench.py"
            spec = importlib.util.spec_from_file_location("sensorium_bench", path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            sys.modules["sensorium_bench"] = mod
        return sys.modules["sensorium_bench"].child_mode_result

    def test_success_parses_last_json_line(self, child_mode_result):
        out = 'warning noise\n{"metric": "m", "value": 1.5}\n'
        assert child_mode_result(0, out, "") == {"metric": "m", "value": 1.5}

    def test_failure_keeps_stdout_json_when_stderr_empty(self, child_mode_result):
        out = '{"metric": "m", "value": null, "detail": {"error": "parity"}}\n'
        res = child_mode_result(1, out, "")
        assert res["child_json"]["detail"]["error"] == "parity"

    def test_failure_with_no_output_names_rc(self, child_mode_result):
        assert child_mode_result(3, "", "") == {"error": "rc=3, no stderr"}

    def test_whitespace_stderr_still_names_rc(self, child_mode_result):
        # A lone newline on stderr must not defeat the no-output fallback.
        assert child_mode_result(3, "", "\n") == {"error": "rc=3, no stderr"}

    def test_whitespace_stderr_with_child_json_names_rc(self, child_mode_result):
        # r4 advisor: whitespace stderr + a found child JSON line used to
        # store {"error": "\n"} — the rc fallback must fire regardless.
        res = child_mode_result(1, '{"metric": "m", "value": null}\n', "\n")
        assert res["error"] == "rc=1, no stderr"
        assert res["child_json"] == {"metric": "m", "value": None}

    def test_success_with_garbled_output(self, child_mode_result):
        assert "unparseable" in child_mode_result(0, "not json", "")["error"]
