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
    export_trial,
    load_exported,
    save_exported,
)
from sensorium_tpu.infer.predictor import Predictor

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

    def test_bf16_model_traced_on_tpu_host_runs_on_cpu(self, tmp_path, monkeypatch):
        """A multi-platform export must not bake the tracing host's dot
        lowering into the artifact: a bf16 model exported on a TPU host
        with "cpu" in its platform list used to carry BF16xBF16=F32
        grouped dots that XLA:CPU cannot execute (DotThunk limitation)."""
        import jax

        params = tiny_params()
        params["nn_module"][1]["dtype"] = "bfloat16"
        m = MouseModel(params)
        m.build_state(seed=0)

        # Simulate tracing on a TPU host: accum_dtype keys off the ambient
        # backend, which is the bug under test.
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        data = export_forward(m, mouse_index=0, platforms=("cpu",))
        monkeypatch.undo()

        exported = load_exported(save_exported(tmp_path / "bf16.stablehlo", data))
        x = _inputs(2)
        got = np.asarray(exported.call(x))  # raises DotThunk error pre-fix
        expected = np.asarray(m.predict(x, mouse_index=0))
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)

    def test_symbolic_batch_serves_multiple_sizes(self, model, tmp_path):
        data = export_forward(model, mouse_index=0, platforms=("cpu",))
        exported = load_exported(save_exported(tmp_path / "m0.stablehlo", data))
        for batch in (1, 3):
            out = np.asarray(exported.call(_inputs(batch)))
            assert out.shape == (batch, 5, 4)
            assert np.isfinite(out).all()

    def test_non_square_canvas_spec_matches_live_model(self, tmp_path):
        # StackInputsProcessor.size is (width, height) — the exported spec
        # must be (b, C, T, H, W) like the live model, not transposed.
        params = tiny_params()
        params["inputs_processor"] = (
            "stack_inputs", {"size": (12, 16), "pad_fill_value": 0.0}
        )
        m = MouseModel(params)
        m.set_ema(0.9)
        m.build_state(seed=0, learning_rate=1e-3)

        exported = load_exported(
            save_exported(
                tmp_path / "ns.stablehlo",
                export_forward(m, mouse_index=1, platforms=("cpu",)),
            )
        )
        assert [str(d) for d in exported.in_avals[0].shape] == \
            ["b", "5", "4", "16", "12"]
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 255, (2, 5, 4, 16, 12)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(exported.call(x)),
            np.asarray(m.predict(x, mouse_index=1)),
            rtol=2e-5,
            atol=1e-6,
        )

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


def _trial_arrays(length, src_hw=(12, 16), seed=0):
    rng = np.random.default_rng(seed)
    video = rng.uniform(0, 255, (*src_hw, length)).astype(np.float32)
    behavior = rng.uniform(0, 10, (2, length)).astype(np.float32)
    pupil_center = rng.uniform(0, 10, (2, length)).astype(np.float32)
    return video, behavior, pupil_center


class TestExportTrial:
    """Whole-trial artifact (symbolic time axis) vs the live Predictor."""

    CHUNK, BUCKET = 8, 16

    @pytest.fixture(scope="class")
    def predictor(self, ckpt_path):
        return Predictor(
            ckpt_path, chunk_size=self.CHUNK, length_bucket=self.BUCKET
        )

    @pytest.fixture(scope="class")
    def artifact(self, predictor, tmp_path_factory):
        data = export_trial(
            predictor, mouse_index=1, src_hw=(12, 16), platforms=("cpu",)
        )
        path = tmp_path_factory.mktemp("trial") / "m1.trial.stablehlo"
        return load_exported(save_exported(path, data))

    def _call(self, artifact, video, behavior, pupil_center, length):
        padded = -(-length // self.BUCKET) * self.BUCKET
        tpad = padded - length
        planes = np.ascontiguousarray(np.transpose(video, (2, 0, 1)))
        out = np.asarray(
            artifact.call(
                np.pad(planes, ((0, tpad), (0, 0), (0, 0))),
                np.pad(behavior, ((0, 0), (0, tpad))),
                np.pad(pupil_center, ((0, 0), (0, tpad))),
                np.int32(length),
            )
        )
        return out[:, :length]

    @pytest.mark.parametrize("length", [37, 48, 61])
    def test_matches_live_predictor_across_buckets(
        self, predictor, artifact, length
    ):
        video, behavior, pupil_center = _trial_arrays(length, seed=length)
        want = predictor.predict_trial(video, behavior, pupil_center, 1)
        got = self._call(artifact, video, behavior, pupil_center, length)
        assert got.shape == want.shape
        # fp32 reduction-order noise only (different XLA schedules).
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-4)

    def test_short_trial_is_zeros(self, predictor, artifact):
        # Shorter than one window: zero valid anchors; the reference loop
        # runs zero iterations and the clipped blend denominator yields 0s.
        width = predictor.indexes_generator.width
        video, behavior, pupil_center = _trial_arrays(width - 2)
        got = self._call(artifact, video, behavior, pupil_center, width - 2)
        np.testing.assert_array_equal(got, 0.0)

    def test_mesh_sharded_artifact_matches_unsharded(
        self, ckpt_path, predictor, tmp_path
    ):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        from sensorium_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(num_data=4)
        sharded = Predictor(
            ckpt_path, chunk_size=self.CHUNK, length_bucket=self.BUCKET, mesh=mesh
        )
        artifact = load_exported(
            save_exported(
                tmp_path / "mesh.trial.stablehlo",
                export_trial(
                    sharded, mouse_index=1, src_hw=(12, 16), platforms=("cpu",)
                ),
            )
        )
        assert artifact.nr_devices == 4

        length = 37
        video, behavior, pupil_center = _trial_arrays(length, seed=7)
        want = predictor.predict_trial(video, behavior, pupil_center, 1)

        padded = -(-length // self.BUCKET) * self.BUCKET
        tpad = padded - length
        planes = np.ascontiguousarray(np.transpose(video, (2, 0, 1)))
        rep = NamedSharding(mesh, PartitionSpec())
        args = [
            jax.device_put(a, rep)
            for a in (
                np.pad(planes, ((0, tpad), (0, 0), (0, 0))),
                np.pad(behavior, ((0, 0), (0, tpad))),
                np.pad(pupil_center, ((0, 0), (0, tpad))),
                np.int32(length),
            )
        ]
        got = np.asarray(artifact.call(*args))[:, :length]
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-4)

    def test_hybrid_mesh_artifact_matches_unsharded(
        self, ckpt_path, predictor, tmp_path
    ):
        """export_trial on a (replica, data, model) hybrid mesh must shard
        window chunks over BOTH batch axes (mesh.data_axes), matching the
        live predictor's _jit_kwargs — not hardcode 'data'."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        from sensorium_tpu.parallel.mesh import create_hybrid_mesh

        mesh = create_hybrid_mesh(num_slices=2, num_data=2, num_model=2)
        sharded = Predictor(
            ckpt_path, chunk_size=self.CHUNK, length_bucket=self.BUCKET, mesh=mesh
        )
        artifact = load_exported(
            save_exported(
                tmp_path / "hybrid.trial.stablehlo",
                export_trial(
                    sharded, mouse_index=1, src_hw=(12, 16), platforms=("cpu",)
                ),
            )
        )
        assert artifact.nr_devices == 8

        length = 37
        video, behavior, pupil_center = _trial_arrays(length, seed=11)
        want = predictor.predict_trial(video, behavior, pupil_center, 1)

        padded = -(-length // self.BUCKET) * self.BUCKET
        tpad = padded - length
        planes = np.ascontiguousarray(np.transpose(video, (2, 0, 1)))
        rep = NamedSharding(mesh, PartitionSpec())
        args = [
            jax.device_put(a, rep)
            for a in (
                np.pad(planes, ((0, tpad), (0, 0), (0, 0))),
                np.pad(behavior, ((0, 0), (0, tpad))),
                np.pad(pupil_center, ((0, 0), (0, tpad))),
                np.int32(length),
            )
        ]
        got = np.asarray(artifact.call(*args))[:, :length]
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-4)

    def test_cli_trial_flow(self, ckpt_path, tmp_path, monkeypatch, capsys):
        from sensorium_tpu.cli import export as export_cli

        out = tmp_path / "trial.stablehlo"
        monkeypatch.setattr(
            "sys.argv",
            [
                "export", "-m", str(ckpt_path), "-o", str(out),
                "--mouse", "1", "--trial", "--src-hw", "12,16",
                "--chunk", str(self.CHUNK), "--bucket", str(self.BUCKET),
                "--platforms", "cpu", "--check",
            ],
        )
        export_cli.main()
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["trial"] is True
        assert out.exists()
        assert summary["check"]["finite"]
        # length scalar = padded time axis -> real predictions, not zeros.
        assert summary["check"]["output_shape"] == [7, self.BUCKET]

    def test_cli_trial_requires_mouse(self, ckpt_path, monkeypatch):
        from sensorium_tpu.cli import export as export_cli

        monkeypatch.setattr(
            "sys.argv", ["export", "-m", str(ckpt_path), "--trial"]
        )
        with pytest.raises(SystemExit, match="--mouse"):
            export_cli.main()

    def test_cli_mesh_trial_flow(self, ckpt_path, tmp_path, monkeypatch, capsys):
        from sensorium_tpu.cli import export as export_cli

        out = tmp_path / "mesh.stablehlo"
        monkeypatch.setattr(
            "sys.argv",
            [
                "export", "-m", str(ckpt_path), "-o", str(out),
                "--mouse", "1", "--trial", "--src-hw", "12,16",
                "--chunk", str(self.CHUNK), "--bucket", str(self.BUCKET),
                "--mesh-data", "4", "--platforms", "cpu", "--check",
            ],
        )
        export_cli.main()
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["check"]["finite"]
        assert summary["nr_devices"] == 4
        assert load_exported(out).nr_devices == 4

    def test_mesh_data_device_count_and_sign_validated(self, ckpt_path, tmp_path):
        from sensorium_tpu.infer.export import export_model_file

        with pytest.raises(ValueError, match="local devices"):
            export_model_file(
                ckpt_path, out_path=tmp_path / "x.stablehlo", mouse_index=0,
                trial=True, src_hw=(12, 16), chunk_size=self.CHUNK,
                length_bucket=self.BUCKET, mesh_data=1024, platforms=("cpu",),
            )
        with pytest.raises(ValueError, match=">= 2"):
            export_model_file(
                ckpt_path, out_path=tmp_path / "x.stablehlo", mouse_index=0,
                trial=True, src_hw=(12, 16), chunk_size=self.CHUNK,
                length_bucket=self.BUCKET, mesh_data=-4, platforms=("cpu",),
            )
        # mesh_data=1 is rejected like the CLI does — not silently treated
        # as "no mesh" while the error text documents 1 as invalid.
        with pytest.raises(ValueError, match=">= 2"):
            export_model_file(
                ckpt_path, out_path=tmp_path / "x.stablehlo", mouse_index=0,
                trial=True, src_hw=(12, 16), chunk_size=self.CHUNK,
                length_bucket=self.BUCKET, mesh_data=1, platforms=("cpu",),
            )
        # The Python API must reject mesh_data on non-trial exports too
        # (the CLI guards it separately); silently writing a single-device
        # artifact would be a deploy-time surprise.
        with pytest.raises(ValueError, match="trial exports only"):
            export_model_file(
                ckpt_path, out_path=tmp_path / "x.stablehlo", mouse_index=0,
                mesh_data=4, platforms=("cpu",),
            )

    @pytest.mark.parametrize(
        "flags, match",
        [
            (["--chunk", "0"], "positive"),
            (["--bucket", "-16"], "positive"),
            (["--bucket", "60", "--chunk", "32"], "multiple"),
            (["--chunk", "8", "--bucket", "16", "--mesh-data", "3"], "mesh-data"),
            (["--chunk", "8", "--bucket", "16", "--mesh-data", "1"], ">= 2"),
            (["--chunk", "8", "--bucket", "16", "--mesh-data", "-4"], ">= 2"),
        ],
    )
    def test_cli_rejects_bad_chunk_bucket(
        self, ckpt_path, monkeypatch, flags, match
    ):
        from sensorium_tpu.cli import export as export_cli

        monkeypatch.setattr(
            "sys.argv",
            ["export", "-m", str(ckpt_path), "--trial", "--mouse", "0", *flags],
        )
        with pytest.raises(SystemExit, match=match):
            export_cli.main()

    def test_bucket_chunk_divisibility_enforced(self, ckpt_path):
        with pytest.raises(ValueError, match="multiple of chunk_size"):
            export_trial(
                Predictor(ckpt_path, chunk_size=6, length_bucket=16),
                mouse_index=0,
                platforms=("cpu",),
            )
