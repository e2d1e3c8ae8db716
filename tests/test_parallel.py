"""Multi-device sharding tests on the virtual 8-device CPU mesh:
batch-DP training parity with single-device execution (GSPMD sync-BN),
tensor-parallel parameter sharding, and the driver dry-run path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sensorium_tpu.data.datasets import MiceBatch
from sensorium_tpu.engine import MouseModel
from sensorium_tpu.parallel.mesh import (
    batch_sharding,
    create_hybrid_mesh,
    create_mesh,
    data_extent,
    replicate_tree,
)

from tests.test_engine import random_batch, tiny_params


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return create_mesh(num_data=4, num_model=2)


class TestMeshSetup:
    def test_mesh_shape(self, mesh):
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    def test_batch_sharding_partitions_leading_axis(self, mesh):
        x = np.zeros((8, 3), np.float32)
        sharded = jax.device_put(x, batch_sharding(mesh))
        assert len(sharded.sharding.device_set) == 8 or len(
            sharded.sharding.device_set
        ) == 4  # data axis only
        # Each data-axis shard holds 8/4 = 2 rows.
        shard_shapes = {s.data.shape for s in sharded.addressable_shards}
        assert shard_shapes == {(2, 3)}

    def test_shard_batch_replicates_scalars(self, mesh):
        """Documented contract: 0-d arrays pass through replicated (a
        rank-1 PartitionSpec cannot apply to a scalar)."""
        from sensorium_tpu.parallel.mesh import shard_batch

        batch = np.zeros((8, 3), np.float32)
        scalar = np.float32(0.5)
        sb, ss = shard_batch(mesh, batch, scalar)
        assert {s.data.shape for s in sb.addressable_shards} == {(2, 3)}
        assert ss.shape == () and float(ss) == 0.5
        assert all(s.data.shape == () for s in ss.addressable_shards)
        # Plain Python numbers (no .ndim attribute) must replicate too —
        # the motivating case is a float loss weight.
        _, spy = shard_batch(mesh, batch, 0.5)
        assert spy.shape == () and float(spy) == 0.5

    def test_shard_batch_multiprocess_branch_handles_python_scalars(
        self, mesh, monkeypatch
    ):
        """The jax.distributed branch builds arrays via
        make_array_from_callback, which needs .shape/__getitem__ — plain
        Python scalars must be np-normalized first (make_array_from_callback
        itself is process-count agnostic, so the branch is testable by
        forcing process_count)."""
        import jax

        from sensorium_tpu.parallel.mesh import shard_batch

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        batch = np.arange(24, dtype=np.float32).reshape(8, 3)
        sb, ss = shard_batch(mesh, batch, 0.5)
        assert ss.shape == () and float(ss) == 0.5
        np.testing.assert_array_equal(np.asarray(sb), batch)


class TestDataParallelParity:
    def test_sharded_step_matches_single_device(self, mesh):
        """Batch-sharded jit must produce the same loss and updated params
        as unsharded execution — this is exactly the sync-BN guarantee
        (BN moments reduce over the GLOBAL batch under GSPMD)."""
        rng = np.random.default_rng(0)
        batch = random_batch(rng, batch=8)

        # SGD: the update is linear in the gradient, so reduction-order
        # noise stays tiny.  (Adam's first step is sign(g), which amplifies
        # 1e-8 reassociation noise on near-zero gradients into +-lr flips.)
        params = tiny_params()
        params["optimizer"] = ("SGD", {"lr": 1e-3})

        single = MouseModel(params)
        single.build_state(seed=0, learning_rate=1e-3)
        loss_single = float(single.train_step(batch))

        sharded = MouseModel(params, mesh=mesh)
        sharded.build_state(seed=0, learning_rate=1e-3)
        loss_sharded = float(sharded.train_step(batch))

        assert loss_single == pytest.approx(loss_sharded, rel=1e-5)
        # Parameters after the step agree (optimizer ran on matching grads).
        # Depthwise kernels sit immediately before BatchNorm, which drives
        # their true gradient to ~0 through cancellation of O(1e3) summands
        # — different reduction orders then legitimately disagree at f32,
        # so those two weights get an absolute (cancellation-scale * lr)
        # tolerance instead of a relative one.
        p_single = jax.device_get(single.state.params)
        p_sharded = jax.device_get(sharded.state.params)
        flat_s, tree = jax.tree_util.tree_flatten_with_path(p_single)
        flat_m, _ = jax.tree_util.tree_flatten(p_sharded)
        for (path, a), b in zip(flat_s, flat_m):
            name = jax.tree_util.keystr(path)
            if "dw_kernel" in name:
                np.testing.assert_allclose(a, b, atol=5e-4)
            else:
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_bn_stats_see_global_batch(self, mesh):
        """BN running means must match between sharded and single-device
        runs — per-device BN would diverge on a heterogeneous batch."""
        rng = np.random.default_rng(1)
        batch = random_batch(rng, batch=8)
        # Make per-device sub-batches statistically different.
        batch.inputs[:4] *= 3.0

        single = MouseModel(tiny_params())
        single.build_state(seed=0, learning_rate=0.0)
        single.train_step(batch)

        sharded = MouseModel(tiny_params(), mesh=mesh)
        sharded.build_state(seed=0, learning_rate=0.0)
        sharded.train_step(batch)

        bn_single = jax.device_get(single.state.batch_stats)
        bn_sharded = jax.device_get(sharded.state.batch_stats)
        flat_s, _ = jax.tree_util.tree_flatten(bn_single)
        flat_m, _ = jax.tree_util.tree_flatten(bn_sharded)
        for a, b in zip(flat_s, flat_m):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def _model_axis_shards(value):
    """Distinct shard shapes of a (possibly) model-axis-sharded array."""
    return {s.data.shape for s in value.addressable_shards}


class TestTensorParallel:
    def test_build_state_shards_readout_over_model_axis(self, mesh):
        """A (data, model) mesh means DP+TP out of the box: build_state must
        TP-place the dominant parameter mass (params, EMA, optimizer
        moments) without the caller touching shard_params."""
        model = MouseModel(tiny_params(), mesh=mesh)
        model.set_ema(0.9)
        model.build_state(seed=0, learning_rate=1e-3)
        assert model.tensor_parallel

        kernel = model.state.params["readout_kernel"]
        full = kernel.shape
        half = (full[0], full[1], full[2], full[3] // 2)
        # Padded-output axis split over the 2-way model axis, in the live
        # params, the EMA copy, AND the AdamW moments.
        assert _model_axis_shards(kernel) == {half}
        assert _model_axis_shards(model.state.ema_params["readout_kernel"]) == {half}
        moments = [
            value
            for path, value in jax.tree_util.tree_flatten_with_path(
                model.state.opt_state
            )[0]
            if "readout_kernel" in jax.tree_util.keystr(path)
            and value.shape == full
        ]
        assert moments and all(_model_axis_shards(m) == {half} for m in moments)

        # The forward matches a replicated single-device model bit-for-bit
        # shape-wise and numerically to reassociation noise.
        rng = np.random.default_rng(2)
        batch = random_batch(rng, batch=8)
        plain = MouseModel(tiny_params())
        plain.build_state(seed=0, learning_rate=1e-3)
        expected = plain.predict(batch.inputs, mouse_index=1)
        actual = model.predict(batch.inputs, mouse_index=1)
        np.testing.assert_allclose(
            np.asarray(actual), np.asarray(expected), rtol=1e-4, atol=1e-5
        )

    def test_tp_train_step_runs_and_keeps_placement(self, mesh):
        model = MouseModel(tiny_params(), mesh=mesh)
        model.set_ema(0.9)
        model.build_state(seed=0, learning_rate=1e-3)
        rng = np.random.default_rng(3)
        batch = random_batch(rng, batch=8)
        loss1 = float(model.train_step(batch))
        loss2 = float(model.train_step(batch))
        assert np.isfinite(loss1) and np.isfinite(loss2)
        kernel = model.state.params["readout_kernel"]
        full = kernel.shape
        assert _model_axis_shards(kernel) == {
            (full[0], full[1], full[2], full[3] // 2)
        }

    def test_tp_train_step_matches_single_device_numerics(self, mesh):
        """A {data:4, model:2} train step must produce the SAME math as
        single-device execution — not just run and keep placement.  From
        identical initial state over identical batches, two composed steps
        (SGD+momentum so the update stays linear in the gradient; EMA on)
        must agree on per-step losses and on EVERY state tree: params, BN
        statistics, EMA params/stats, and optimizer momentum.  A wrong
        ``param_sharding_rules`` entry or a dropped collective in the
        TP-sharded readout einsum would surface here as a numeric
        divergence (VERDICT r2 weak-spot 1)."""
        params = tiny_params()
        params["optimizer"] = ("SGD", {"lr": 1e-3, "momentum": 0.9})
        rng = np.random.default_rng(11)
        batches = [random_batch(rng, batch=8) for _ in range(2)]

        single = MouseModel(params)
        single.set_ema(0.9)
        single.build_state(seed=0, learning_rate=1e-3)
        losses_single = [float(single.train_step(b)) for b in batches]

        sharded = MouseModel(params, mesh=mesh)
        sharded.set_ema(0.9)
        sharded.build_state(seed=0, learning_rate=1e-3)
        assert sharded.tensor_parallel
        losses_sharded = [float(sharded.train_step(b)) for b in batches]

        np.testing.assert_allclose(losses_sharded, losses_single, rtol=1e-5)
        # Tolerances: 2-3x the measured CPU-mesh drift.  Depthwise kernels
        # sit immediately before BatchNorm, so their TRUE gradient cancels
        # to ~0 across O(1e3) summands — reduction order legitimately
        # leaves O(1) noise in the raw gradient (hence the momentum trace)
        # and lr-scaled noise in the kernels themselves; BN statistics
        # downstream of those kernels inherit proportional drift.  All
        # real-gradient tensors agree tightly.
        for label, tree_s, tree_m, rtol, atol in [
            ("params", single.state.params, sharded.state.params, 1e-4, 1e-4),
            (
                "batch_stats",
                single.state.batch_stats,
                sharded.state.batch_stats,
                1e-3,
                1e-3,
            ),
            ("ema_params", single.state.ema_params, sharded.state.ema_params, 1e-4, 1e-4),
            (
                "ema_batch_stats",
                single.state.ema_batch_stats,
                sharded.state.ema_batch_stats,
                1e-3,
                1e-3,
            ),
            # The momentum trace is a RAW-gradient-scale quantity: by step
            # 2 it inherits activation drift from the (legitimately) moved
            # dw kernels, so its bound is gradient-scale, not param-scale
            # — a dropped collective would still miss it by orders.
            ("opt_state", single.state.opt_state, sharded.state.opt_state, 5e-2, 2e-2),
        ]:
            flat_s = jax.tree_util.tree_flatten_with_path(jax.device_get(tree_s))[0]
            flat_m = dict(
                jax.tree_util.tree_flatten_with_path(jax.device_get(tree_m))[0]
            )
            assert flat_s and len(flat_s) == len(flat_m), label
            for path, a in flat_s:
                b = flat_m[path]
                name = f"{label}{jax.tree_util.keystr(path)}"
                if a.dtype.kind in "iu":  # step counters
                    np.testing.assert_array_equal(a, b, err_msg=name)
                elif "dw_kernel" in name:
                    # Was 5.0/5e-3 pre-r05 — loose enough to mask the
                    # partitioner wgrad bug (TestDwWgradPartitioning).
                    # With the shard_map wgrad the measured dw divergence
                    # is reduction-noise (~5e-6); keep 100x margin.
                    leaf_atol = 5e-3 if label == "opt_state" else 5e-4
                    np.testing.assert_allclose(a, b, atol=leaf_atol, err_msg=name)
                else:
                    np.testing.assert_allclose(
                        a, b, rtol=rtol, atol=atol, err_msg=name
                    )

        # And the models remain functionally identical: EMA-weight predict
        # (what checkpoints/serving use) agrees on a fresh batch.
        probe = random_batch(np.random.default_rng(12), batch=8).inputs
        np.testing.assert_allclose(
            np.asarray(sharded.predict(probe, mouse_index=1)),
            np.asarray(single.predict(probe, mouse_index=1)),
            rtol=5e-3,  # observed 1.6e-3: EMA dw-kernel drift through softplus
            atol=1e-3,
        )

    def test_tp_resume_restores_placement(self, mesh, tmp_path):
        """load_train_state returns host leaves; the model must re-place
        them on the mesh (TP included) before training continues."""
        model = MouseModel(tiny_params(), mesh=mesh)
        model.set_ema(0.9)
        model.build_state(seed=0, learning_rate=1e-3)
        rng = np.random.default_rng(4)
        batch = random_batch(rng, batch=8)
        model.train_step(batch)
        path = tmp_path / "train_state.ckpt"
        model.save_train_state(path, extra={"epoch": 0})

        resumed = MouseModel(tiny_params(), mesh=mesh)
        resumed.set_ema(0.9)
        resumed.build_state(seed=1, learning_rate=1e-3)
        extra = resumed.load_train_state(path)
        assert extra["epoch"] == 0
        kernel = resumed.state.params["readout_kernel"]
        full = kernel.shape
        assert _model_axis_shards(kernel) == {
            (full[0], full[1], full[2], full[3] // 2)
        }
        loss = float(resumed.train_step(batch))
        assert np.isfinite(loss)


class TestHybridMesh:
    """Multi-slice ``(replica, data, model)`` topology on the virtual mesh.

    On real metal the ``replica`` axis crosses DCN between ICI slices
    (``mesh_utils.create_hybrid_device_mesh``); logically it is one more
    batch-sharding axis, so a hybrid train step must reproduce single-device
    math exactly like the flat-DP test above."""

    @pytest.fixture(scope="class")
    def hybrid(self):
        return create_hybrid_mesh(num_slices=2, num_data=2, num_model=2)

    def test_mesh_shape_and_extent(self, hybrid):
        assert dict(hybrid.shape) == {"replica": 2, "data": 2, "model": 2}
        assert data_extent(hybrid) == 4
        flat = create_mesh(num_data=4, num_model=2)
        assert data_extent(flat) == 4

    def test_batch_shards_over_replica_and_data(self, hybrid):
        x = np.zeros((8, 3), np.float32)
        sharded = jax.device_put(x, batch_sharding(hybrid))
        # 8 rows over replica*data = 4 ways -> 2-row shards.
        assert {s.data.shape for s in sharded.addressable_shards} == {(2, 3)}

    def test_hybrid_train_step_matches_single_device(self, hybrid):
        """DP over {replica:2, data:2} with TP {model:2}: same losses, BN
        stats seeing the GLOBAL batch, params matching an unsharded run."""
        params = tiny_params()
        params["optimizer"] = ("SGD", {"lr": 1e-3})
        rng = np.random.default_rng(21)
        batch = random_batch(rng, batch=8)
        batch.inputs[:4] *= 3.0  # per-shard statistics must differ

        single = MouseModel(params)
        single.build_state(seed=0, learning_rate=1e-3)
        loss_single = float(single.train_step(batch))

        sharded = MouseModel(params, mesh=hybrid)
        sharded.set_ema(0.9)
        sharded.build_state(seed=0, learning_rate=1e-3)
        assert sharded.tensor_parallel  # model axis applies on hybrid meshes
        loss_sharded = float(sharded.train_step(batch))

        assert loss_single == pytest.approx(loss_sharded, rel=1e-5)
        for tree_s, tree_m, atol_dw in [
            (single.state.params, sharded.state.params, 5e-4),
            (single.state.batch_stats, sharded.state.batch_stats, 1e-3),
        ]:
            flat_s = jax.tree_util.tree_flatten_with_path(jax.device_get(tree_s))[0]
            flat_m = dict(
                jax.tree_util.tree_flatten_with_path(jax.device_get(tree_m))[0]
            )
            for path, a in flat_s:
                name = jax.tree_util.keystr(path)
                if "dw_kernel" in name:  # pre-BN cancellation noise, see above
                    np.testing.assert_allclose(a, flat_m[path], atol=atol_dw, err_msg=name)
                else:
                    np.testing.assert_allclose(
                        a, flat_m[path], rtol=1e-4, atol=1e-4, err_msg=name
                    )

    def test_hybrid_ragged_val_batch_pads_to_joint_extent(self, hybrid):
        rng = np.random.default_rng(22)
        batch = random_batch(rng, batch=6)  # 6 % 4 != 0
        model = MouseModel(tiny_params(), mesh=hybrid)
        model.build_state(seed=0, learning_rate=1e-3)
        _, prediction, *_ = model.val_step(batch)
        assert prediction.shape[1] == 8  # padded to replica*data

    def test_hybrid_tp_placement(self, hybrid):
        model = MouseModel(tiny_params(), mesh=hybrid)
        model.build_state(seed=0, learning_rate=1e-3)
        kernel = model.state.params["readout_kernel"]
        full = kernel.shape
        assert _model_axis_shards(kernel) == {
            (full[0], full[1], full[2], full[3] // 2)
        }

    def test_nonfactoring_devices_raise(self):
        """Silently training on a device subset is never intended."""
        with pytest.raises(ValueError, match="factor|covers"):
            create_hybrid_mesh(num_slices=2, num_model=2, devices=jax.devices()[:6])
        with pytest.raises(ValueError, match="covers"):
            create_hybrid_mesh(num_slices=2, num_data=1, num_model=2)  # 4 of 8

    def test_hybrid_predictor_shards_chunks_across_replica(self, hybrid, tmp_path):
        """Chunk batches must spread over replica AND data axes — and match
        the single-device blend bit-for-bit at f32 tolerance."""
        from sensorium_tpu.infer.predictor import Predictor

        model = MouseModel(tiny_params())
        model.build_state(seed=0, learning_rate=1e-3)
        path = tmp_path / "model-001-0.100000.ckpt"
        model.save(path)

        rng = np.random.default_rng(41)
        length = 24
        video = rng.uniform(0, 255, (12, 16, length)).astype(np.float32)
        behavior = rng.uniform(0, 5, (2, length)).astype(np.float32)
        pupil = rng.uniform(50, 200, (2, length)).astype(np.float32)

        plain = Predictor(path, chunk_size=8).predict_trial(
            video, behavior, pupil, mouse_index=1
        )
        sharded = Predictor(path, chunk_size=8, mesh=hybrid).predict_trial(
            video, behavior, pupil, mouse_index=1
        )
        np.testing.assert_allclose(sharded, plain, rtol=1e-5, atol=1e-6)
        # chunk_size must divide replica*data (4), not just data (2).
        with pytest.raises(ValueError, match="batch-sharding ways"):
            Predictor(path, chunk_size=6, mesh=hybrid)


class TestShardedCheckpoint:
    """Orbax-backed resume state: per-process shard writes, mesh-placed
    restore.  The msgpack path gathers the full state to host (impossible
    for non-addressable multi-host-TP arrays); the ``.orbax`` route must
    roundtrip a TP-sharded state with placement intact and identical
    continued-training behavior."""

    def test_tp_state_orbax_roundtrip_preserves_placement_and_math(
        self, mesh, tmp_path
    ):
        model = MouseModel(tiny_params(), mesh=mesh)
        model.set_ema(0.9)
        model.build_state(seed=0, learning_rate=1e-3)
        rng = np.random.default_rng(31)
        batch = random_batch(rng, batch=8)
        model.train_step(batch)
        # ".orbax" suffix dispatches to the sharded backend.
        model.save_train_state(tmp_path / "train_state.orbax", extra={"epoch": 2})

        resumed = MouseModel(tiny_params(), mesh=mesh)
        resumed.set_ema(0.9)
        resumed.build_state(seed=9, learning_rate=1e-3)
        extra = resumed.load_train_state(tmp_path / "train_state.orbax")
        assert extra["epoch"] == 2
        assert int(jax.device_get(resumed.state.step)) == 1

        # Restore lands directly on the mesh: TP half-shards intact.
        kernel = resumed.state.params["readout_kernel"]
        full = kernel.shape
        assert _model_axis_shards(kernel) == {
            (full[0], full[1], full[2], full[3] // 2)
        }
        # Restored values identical to the saved state.
        for tree_a, tree_b in [
            (model.state.params, resumed.state.params),
            (model.state.ema_params, resumed.state.ema_params),
            (model.state.batch_stats, resumed.state.batch_stats),
        ]:
            flat_a = jax.tree_util.tree_leaves(jax.device_get(tree_a))
            flat_b = jax.tree_util.tree_leaves(jax.device_get(tree_b))
            for a, b in zip(flat_a, flat_b):
                np.testing.assert_array_equal(a, b)

        # Continued training is bit-for-bit the same executable + state.
        next_a = float(model.train_step(batch))
        next_b = float(resumed.train_step(batch))
        assert next_a == pytest.approx(next_b, rel=1e-6)


class TestShardedPredictor:
    def test_mesh_predictor_matches_single_device(self, mesh, tmp_path):
        """Chunk batches sharded over the data axis blend identically."""
        from sensorium_tpu.infer.predictor import Predictor

        model = MouseModel(tiny_params())
        model.build_state(seed=0, learning_rate=1e-3)
        path = tmp_path / "model-001-0.100000.ckpt"
        model.save(path)

        rng = np.random.default_rng(4)
        length = 24
        video = rng.uniform(0, 255, (12, 16, length)).astype(np.float32)
        behavior = rng.uniform(0, 5, (2, length)).astype(np.float32)
        pupil = rng.uniform(50, 200, (2, length)).astype(np.float32)

        plain = Predictor(path, chunk_size=8).predict_trial(
            video, behavior, pupil, mouse_index=1
        )
        sharded = Predictor(path, chunk_size=8, mesh=mesh).predict_trial(
            video, behavior, pupil, mouse_index=1
        )
        np.testing.assert_allclose(sharded, plain, rtol=1e-5, atol=1e-6)

    def test_predictor_rejects_nonpositive_chunking(self, tmp_path):
        """Constructor-time errors, not a ZeroDivisionError deep in
        predict_trial_device (matches the export CLI's validation)."""
        from sensorium_tpu.infer.predictor import Predictor

        model = MouseModel(tiny_params())
        model.build_state(seed=0, learning_rate=1e-3)
        path = tmp_path / "model-001-0.100000.ckpt"
        model.save(path)
        with pytest.raises(ValueError, match="positive"):
            Predictor(path, chunk_size=0)
        with pytest.raises(ValueError, match="positive"):
            Predictor(path, chunk_size=8, length_bucket=0)


class TestDryrun:
    def test_dryrun_multichip(self, capsys):
        import __graft_entry__ as graft

        # The toy smoke: proves the sharding machinery quickly. The driver
        # runs the default flagship=True path (real true_batch_001 model).
        graft.dryrun_multichip(8, flagship=False)
        assert "ok" in capsys.readouterr().out

    def test_dryrun_multichip_hybrid(self, capsys, monkeypatch):
        """SENSORIUM_DRYRUN_SLICES=2 runs the multi-slice (replica, data,
        model) topology through the same entry point, incl. the sharded ==
        unsharded loss cross-check."""
        import __graft_entry__ as graft

        monkeypatch.setenv("SENSORIUM_DRYRUN_SLICES", "2")
        graft.dryrun_multichip(8, flagship=False)
        out = capsys.readouterr().out
        assert "ok" in out and "'replica': 2" in out


class TestRaggedBatches:
    """Mesh + non-divisible batch sizes (engine/model._pad_batch_to_mesh)."""

    def test_ragged_val_batch_padded_and_exact(self, mesh):
        """A val batch that does not divide the data axis is zero-weight
        padded; loss and metric stats must equal the unsharded run."""
        rng = np.random.default_rng(1)
        batch = random_batch(rng, batch=6)  # 6 % 4 != 0

        params = tiny_params()
        single = MouseModel(params)
        single.build_state(seed=0, learning_rate=1e-3)
        loss_single, pred_single, *_ = single.val_step(batch)

        sharded = MouseModel(params, mesh=mesh)
        sharded.build_state(seed=0, learning_rate=1e-3)
        loss_sharded, pred_sharded, targets_dev, weights_dev = sharded.val_step(batch)

        assert pred_sharded.shape[1] == 8  # padded to the data axis
        np.testing.assert_allclose(
            float(loss_sharded), float(loss_single), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(pred_sharded)[:, :6], np.asarray(pred_single), rtol=1e-4, atol=1e-5
        )

        from sensorium_tpu.engine.metrics import batch_corr_stats

        counts, sums = jax.jit(batch_corr_stats)(
            pred_sharded, targets_dev, weights_dev
        )
        ref_counts, ref_sums = jax.jit(batch_corr_stats)(
            pred_single, jnp.asarray(batch.targets), jnp.asarray(batch.weights)
        )
        np.testing.assert_allclose(np.asarray(counts), np.asarray(ref_counts))
        np.testing.assert_allclose(
            np.asarray(sums), np.asarray(ref_sums), rtol=1e-4, atol=1e-3
        )

    def test_ragged_train_batch_rejected(self, mesh):
        """Padding a TRAIN batch would alter BN statistics -> loud error."""
        rng = np.random.default_rng(2)
        batch = random_batch(rng, batch=6)
        model = MouseModel(tiny_params(), mesh=mesh)
        model.build_state(seed=0, learning_rate=1e-3)
        with pytest.raises(ValueError, match="drop_last"):
            model.train_step(batch)


class TestMeshFactoring:
    """create_mesh must not silently train on a subset of the machine."""

    def test_auto_data_must_cover_all_devices(self):
        # 8 devices, num_model=3: auto num_data floors to 2 -> a 6-chip
        # mesh would silently run at 75% of the machine.
        with pytest.raises(ValueError, match="does not fit"):
            create_mesh(num_model=3)

    def test_explicit_subset_is_allowed(self):
        # The export CLI deliberately lowers k-device programs on larger
        # hosts (infer/export.py mesh_data).
        mesh = create_mesh(num_data=4)
        assert mesh.shape == {"data": 4, "model": 1}

    def test_oversubscription_is_an_error(self):
        with pytest.raises(ValueError, match="does not fit"):
            create_mesh(num_data=16, num_model=2)


class TestDwWgradPartitioning:
    """Regression pins for the jax-0.9.0 partitioner bug this round's
    flagship numeric cross-check exposed (MULTICHIP_NUMERIC_r05.json):
    the built-in grouped-conv WEIGHT gradient (a ``batch_group_count``
    conv) comes back multiplied by the extent of mesh axes the operands
    are not even sharded over — exactly 2x on this {data:4, model:2} mesh
    (4x on the driver's data=2/model=4 mesh; GSPMD and Shardy alike).
    The engine declares its mesh via ``dw_sharded_mesh`` so the dw custom
    VJP computes the wgrad in a shard_map manual region (per-shard XLA
    wgrad + explicit psum over the batch axes)."""

    CASES = None

    @staticmethod
    def cases():
        from sensorium_tpu.ops.conv import (
            depthwise_conv_spatial,
            depthwise_conv_temporal,
        )

        rng = np.random.default_rng(0)
        return rng, [
            ("spatial s1", lambda w, xx: depthwise_conv_spatial(xx, w, 1),
             rng.normal(size=(3, 3, 8)).astype(np.float32)),
            ("spatial s2", lambda w, xx: depthwise_conv_spatial(xx, w, 2),
             rng.normal(size=(3, 3, 8)).astype(np.float32)),
            ("temporal", lambda w, xx: depthwise_conv_temporal(xx, w),
             rng.normal(size=(3, 8)).astype(np.float32)),
        ]

    def test_dw_wgrad_correct_on_2d_mesh_with_declared_mesh(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec
        from sensorium_tpu.ops.conv import dw_sharded_mesh

        rng, cases = self.cases()
        x = rng.normal(size=(4, 4, 8, 8, 8)).astype(np.float32)
        for name, op, w in cases:
            def f(w_, x_, op=op):
                return jnp.sum(jnp.square(op(w_, x_)))

            g_single = np.asarray(jax.jit(jax.grad(f))(jnp.asarray(w), jnp.asarray(x)))
            xs = jax.device_put(x, NamedSharding(mesh, PartitionSpec("data")))
            ws = jax.device_put(w, NamedSharding(mesh, PartitionSpec()))
            with dw_sharded_mesh(mesh, ("data",)):
                # fresh jit: the trace must happen under the declaration,
                # exactly as make_train_step arranges for the engine.
                g_sharded = np.asarray(jax.jit(jax.grad(f))(ws, xs))
            scale = np.abs(g_single).max()
            np.testing.assert_allclose(
                g_sharded, g_single, atol=2e-5 * max(scale, 1.0), rtol=1e-5,
                err_msg=f"{name}: sharded dw wgrad diverges (scale {scale:.3g})",
            )

    def test_builtin_wgrad_bug_still_present(self, mesh):
        """Canary for the UPSTREAM bug: WITHOUT the mesh declaration the
        built-in wgrad is off by exactly the model-axis extent (2x here).
        When a jax upgrade makes this test fail, the workaround in
        ops/conv.py can be retired — do that deliberately, don't just
        delete this test."""
        from jax.sharding import NamedSharding, PartitionSpec
        from sensorium_tpu.ops.conv import _dw_spatial_raw

        rng, _ = self.cases()
        x = rng.normal(size=(4, 4, 8, 8, 8)).astype(np.float32)
        w = rng.normal(size=(3, 3, 8)).astype(np.float32)

        def f(w_, x_):
            return jnp.sum(jnp.square(_dw_spatial_raw(x_, w_, 1)))

        g_single = np.asarray(jax.jit(jax.grad(f))(jnp.asarray(w), jnp.asarray(x)))
        xs = jax.device_put(x, NamedSharding(mesh, PartitionSpec("data")))
        ws = jax.device_put(w, NamedSharding(mesh, PartitionSpec()))
        g_sharded = np.asarray(jax.jit(jax.grad(f))(ws, xs))
        np.testing.assert_allclose(g_sharded, 2.0 * g_single, rtol=1e-4)
