"""Serving export (StableHLO artifacts, ``infer/export.py`` + CLI).

Pins the TPU-native serving story: checkpoint -> ahead-of-time lowered
artifact -> loadable with bare jax (no model code) -> numerically
identical to the live model's forward, at any batch size.
"""

import json

import numpy as np
import pytest

from sensorium_tpu.engine.model import MouseModel, load_model
from sensorium_tpu.infer.export import (
    check_artifact,
    export_forward,
    export_model_file,
    load_exported,
    save_exported,
)

from tests.test_engine import tiny_params


@pytest.fixture(scope="module")
def model():
    m = MouseModel(tiny_params())
    m.set_ema(0.9)
    m.build_state(seed=0, learning_rate=1e-3)
    return m


@pytest.fixture(scope="module")
def ckpt_path(model, tmp_path_factory):
    path = tmp_path_factory.mktemp("export") / "model-001-0.100000.ckpt"
    model.save(path)
    return path


def _inputs(batch):
    rng = np.random.default_rng(batch)
    return rng.uniform(0, 255, (batch, 5, 4, 16, 16)).astype(np.float32)


class TestExportForward:
    def test_single_mouse_artifact_matches_live_model(self, model, tmp_path):
        data = export_forward(model, mouse_index=1, platforms=("cpu",))
        path = save_exported(tmp_path / "m1.stablehlo", data)
        exported = load_exported(path)

        x = _inputs(2)
        got = np.asarray(exported.call(x))
        expected = np.asarray(model.predict(x, mouse_index=1))
        assert got.shape == (2, 7, 4)
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)

    def test_symbolic_batch_serves_multiple_sizes(self, model, tmp_path):
        data = export_forward(model, mouse_index=0, platforms=("cpu",))
        exported = load_exported(save_exported(tmp_path / "m0.stablehlo", data))
        for batch in (1, 3):
            out = np.asarray(exported.call(_inputs(batch)))
            assert out.shape == (batch, 5, 4)
            assert np.isfinite(out).all()

    def test_all_mice_artifact(self, model, tmp_path):
        data = export_forward(model, platforms=("cpu",))
        exported = load_exported(save_exported(tmp_path / "all.stablehlo", data))
        x = _inputs(2)
        got = np.asarray(exported.call(x))
        expected = np.asarray(model.predict(x))
        assert got.shape == (2, 2, 7, 4)  # (M, b, N_max, T)
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)


class TestExportModelFile:
    def test_checkpoint_to_artifact_roundtrip(self, ckpt_path):
        summary = export_model_file(ckpt_path, mouse_index=1, platforms=("cpu",))
        assert summary["platforms"] == ["cpu"]
        assert summary["bytes"] > 0
        check = check_artifact(summary["artifact"], batch=2)
        assert check["finite"]
        assert check["output_shape"] == [2, 7, 4]
        # Softplus outputs are strictly positive.
        assert check["min"] > 0.0

        # Identical numbers to a freshly loaded model.
        exported = load_exported(summary["artifact"])
        restored = load_model(ckpt_path)
        x = _inputs(2)
        np.testing.assert_allclose(
            np.asarray(exported.call(x)),
            np.asarray(restored.predict(x, mouse_index=1)),
            rtol=2e-5,
            atol=1e-6,
        )

    def test_cli_main(self, ckpt_path, tmp_path, monkeypatch, capsys):
        from sensorium_tpu.cli import export as export_cli

        out = tmp_path / "artifact.stablehlo"
        monkeypatch.setattr(
            "sys.argv",
            [
                "export",
                "-m", str(ckpt_path),
                "-o", str(out),
                "--mouse", "0",
                "--platforms", "cpu",
                "--check",
            ],
        )
        export_cli.main()
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["artifact"] == str(out)
        assert out.exists()
        assert summary["check"]["finite"]

    def test_cli_rejects_bad_mouse(self, ckpt_path, monkeypatch):
        from sensorium_tpu.cli import export as export_cli

        monkeypatch.setattr(
            "sys.argv", ["export", "-m", str(ckpt_path), "--mouse", "one"]
        )
        with pytest.raises(SystemExit, match="integer"):
            export_cli.main()
