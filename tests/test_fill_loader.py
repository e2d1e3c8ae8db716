"""Zero-copy loader path: workers fill collated batch rows in place.

The fast path (``dataset.fill_into`` + ``MiceDataLoader``'s preallocated
batches + the fused native ``fill_sample`` kernel) must be bit-identical
to the reference-semantics ``get`` + ``collate_mice_batch`` path — same
RNG stream, same CutMix arithmetic, same ReLU clamping.
"""

from __future__ import annotations

import numpy as np
import pytest

from sensorium_tpu import constants
from sensorium_tpu.data import mouse_data as mouse_data_mod
from sensorium_tpu.data import native
from sensorium_tpu.data.datasets import (
    TrainMiceDataset,
    ValMiceDataset,
    collate_mice_batch,
)
from sensorium_tpu.data.indexes import WindowIndexer
from sensorium_tpu.data.inputs import get_inputs_processor
from sensorium_tpu.data.loader import MiceDataLoader
from sensorium_tpu.data.mixers import CutMix, Mixup
from sensorium_tpu.data.responses import get_responses_processor

LENGTH = 90
SIZE = (24, 24)  # (width, height) canvas
FRAMES = 8


@pytest.fixture(scope="module")
def mice_data(tmp_path_factory):
    """Tiny dataset; responses include NEGATIVE values so the fused
    gather+ReLU path is actually exercised (gamma-only data would make the
    clamp a no-op)."""
    root = tmp_path_factory.mktemp("fill_synth")
    rng = np.random.default_rng(7)
    for mouse_index, mouse in enumerate(constants.mice):
        mdir = root / mouse
        for sub in (
            "data/videos", "data/behavior", "data/pupil_center",
            "data/responses", "meta/trials", "meta/neurons",
        ):
            (mdir / sub).mkdir(parents=True)
        n = 30 + mouse_index
        np.save(mdir / "meta/trials/tiers.npy", np.array(["train"] * 3))
        np.save(mdir / "meta/neurons/unit_ids.npy", np.arange(1, n + 1, dtype=np.int64))
        np.save(
            mdir / "meta/neurons/cell_motor_coordinates.npy",
            rng.uniform(0, 100, (n, 3)).astype(np.float32),
        )
        for t in range(3):
            np.save(mdir / f"data/videos/{t}.npy",
                    rng.uniform(0, 255, (18, 24, LENGTH)).astype(np.float32))
            np.save(mdir / f"data/behavior/{t}.npy",
                    rng.uniform(0, 5, (2, LENGTH)).astype(np.float32))
            np.save(mdir / f"data/pupil_center/{t}.npy",
                    rng.uniform(50, 200, (2, LENGTH)).astype(np.float32))
            np.save(mdir / f"data/responses/{t}.npy",
                    (rng.gamma(1.5, 1.0, (n, LENGTH)) - 0.7).astype(np.float32))
    old = constants.sensorium_dir
    constants.sensorium_dir = root
    mouse_data_mod.get_folds_tiers.cache_clear()
    try:
        yield [
            mouse_data_mod.get_mouse_data(m, tuple(constants.folds_splits))
            for m in constants.mice
        ]
    finally:
        constants.sensorium_dir = old
        mouse_data_mod.get_folds_tiers.cache_clear()


def _train_dataset(mice_data, **kwargs):
    defaults = dict(
        indexer=WindowIndexer(FRAMES, 2, "last"),
        inputs_processor=get_inputs_processor(
            "stack_inputs", {"size": SIZE, "pad_fill_value": 0.0}
        ),
        responses_processor=get_responses_processor("identity", {}),
        mouse_epoch_size=8,
        seed=11,
    )
    defaults.update(kwargs)
    return TrainMiceDataset(mice_data, **defaults)


def _fill_batch(ds, indexes, epoch):
    input_shape, target_shape = ds.row_shapes
    inputs = np.empty((len(indexes),) + input_shape, np.float32)
    targets = np.zeros((len(indexes),) + target_shape, np.float32)
    weights = np.zeros((len(indexes), ds.num_mice), np.float32)
    for row, i in enumerate(indexes):
        weights[row, ds.fill_into(i, epoch, inputs[row], targets[row])] = 1.0
    return inputs, targets, weights


class TestFillIntoParity:
    def test_train_with_cutmix_bit_identical(self, mice_data):
        ds = _train_dataset(mice_data, mixer=CutMix(alpha=1.0, prob=0.5))
        indexes = list(range(len(ds)))
        ref = collate_mice_batch(
            [ds.get(i, 3) for i in indexes], ds.num_mice, ds.max_neurons
        )
        inputs, targets, weights = _fill_batch(ds, indexes, 3)
        np.testing.assert_array_equal(ref.inputs, inputs)
        np.testing.assert_array_equal(ref.targets, targets)
        np.testing.assert_array_equal(ref.weights, weights)

    def test_relu_clamp_applied(self, mice_data):
        ds = _train_dataset(mice_data)
        inputs, targets, _ = _fill_batch(ds, list(range(16)), 0)
        assert targets.min() == 0.0  # negatives clamped AND padding zero

    def test_val_bit_identical(self, mice_data):
        ds = ValMiceDataset(
            mice_data,
            WindowIndexer(FRAMES, 2, "last"),
            get_inputs_processor("stack_inputs", {"size": SIZE, "pad_fill_value": 0.0}),
            get_responses_processor("identity", {}),
        )
        indexes = list(range(len(ds)))
        ref = collate_mice_batch(
            [ds.get(i) for i in indexes], ds.num_mice, ds.max_neurons
        )
        inputs, targets, weights = _fill_batch(ds, indexes, 0)
        np.testing.assert_array_equal(ref.inputs, inputs)
        np.testing.assert_array_equal(ref.targets, targets)
        np.testing.assert_array_equal(ref.weights, weights)

    def test_native_off_still_identical(self, mice_data, monkeypatch):
        monkeypatch.setenv("SENSORIUM_NATIVE", "0")
        native.reset()
        try:
            ds = _train_dataset(mice_data, mixer=CutMix(alpha=1.0, prob=0.5))
            indexes = list(range(0, len(ds), 3))
            ref = collate_mice_batch(
                [ds.get(i, 1) for i in indexes], ds.num_mice, ds.max_neurons
            )
            inputs, targets, weights = _fill_batch(ds, indexes, 1)
            np.testing.assert_array_equal(ref.inputs, inputs)
            np.testing.assert_array_equal(ref.targets, targets)
        finally:
            monkeypatch.delenv("SENSORIUM_NATIVE")
            native.reset()


class TestLoaderUsesFillPath:
    def test_loader_batches_identical_across_paths(self, mice_data):
        ds = _train_dataset(mice_data, mixer=CutMix(alpha=1.0, prob=0.5))

        class ForceCollate:
            """row_shapes None -> loader falls back to get+collate."""

            def __init__(self, inner):
                self._inner = inner

            def __getattr__(self, name):
                return getattr(self._inner, name)

            def __len__(self):
                return len(self._inner)

            @property
            def row_shapes(self):
                return None

        fast = list(MiceDataLoader(ds, batch_size=16, num_threads=2))
        slow = list(MiceDataLoader(ForceCollate(ds), batch_size=16, num_threads=2))
        assert len(fast) == len(slow) > 0
        for a, b in zip(fast, slow):
            np.testing.assert_array_equal(a.inputs, b.inputs)
            np.testing.assert_array_equal(a.targets, b.targets)
            np.testing.assert_array_equal(a.weights, b.weights)

    def test_row_shapes_gating(self, mice_data):
        assert _train_dataset(mice_data).row_shapes == (
            (5, FRAMES, SIZE[1], SIZE[0]),
            (max(30 + i for i in range(10)), FRAMES),
        )
        # Per-sample augmentation hooks disable the zero-copy path.
        assert (
            _train_dataset(mice_data, augmentations=lambda x, rng: x).row_shapes
            is None
        )
        # Non-(N, S) response processors disable it too.
        assert (
            _train_dataset(
                mice_data, responses_processor=get_responses_processor("last", {})
            ).row_shapes
            is None
        )


class TestMixIntoParity:
    def _samples(self):
        rng = np.random.default_rng(0)
        mk = lambda: (
            rng.uniform(0, 255, (5, 4, 8, 8)).astype(np.float32),
            rng.uniform(-1, 3, (12, 4)).astype(np.float32),
        )
        return mk(), mk()

    @pytest.mark.parametrize("mixer", [CutMix(alpha=1.0, prob=1.0), Mixup(alpha=0.4, prob=1.0)])
    def test_matches_call(self, mixer):
        (i1, t1), (i2, t2) = self._samples()
        ref_i, ref_t = mixer((i1.copy(), t1.copy()), (i2.copy(), t2.copy()),
                             np.random.default_rng(42))
        mi, mt = i1.copy(), t1.copy()
        mixer.mix_into((mi, mt), (i2.copy(), t2.copy()), np.random.default_rng(42))
        np.testing.assert_array_equal(np.asarray(ref_i, np.float32), mi)
        np.testing.assert_array_equal(np.asarray(ref_t, np.float32), mt)


def test_fill_into_unlabeled_trial_fails_loudly(mice_data):
    """The fill path serves train/val only, where every trial is labeled.
    A trial without responses must raise (matching the allocating path's
    loud collate crash) — silently skipping the write would hand
    uninitialized mixer scratch to training as targets."""
    ds = _train_dataset(mice_data)
    store = ds.stores[0]
    removed = store.trials[0].pop("response_path")
    store._filler_cache.clear()  # cached filler was built with responses
    try:
        input_shape, target_shape = ds.row_shapes
        inp = np.empty(input_shape, np.float32)
        tgt = np.zeros(target_shape, np.float32)
        with pytest.raises(ValueError, match="no responses"):
            store.window_sample_into(
                0, store.indexer.behind, inp, tgt[: store.num_neurons]
            )
    finally:
        store.trials[0]["response_path"] = removed
        store._filler_cache.clear()


def test_resolve_workers_affinity_clamp_and_env_override(monkeypatch):
    """Worker count is bounded by the cgroup/affinity limit, and an
    explicit SENSORIUM_LOADER_THREADS bypasses the clamp (deliberate
    oversubscription for cold-cache, page-fault-bound epochs)."""
    import os

    from sensorium_tpu.data.loader import resolve_workers

    monkeypatch.delenv("SENSORIUM_LOADER_THREADS", raising=False)
    usable = len(os.sched_getaffinity(0))
    assert resolve_workers(1) == 1
    assert resolve_workers(10_000) == max(1, usable)
    monkeypatch.setenv("SENSORIUM_LOADER_THREADS", "16")
    assert resolve_workers(16) == 16
    # The env VALUE is the worker count, not a mere presence flag — it
    # must override the configured count too (CLAUDE.md documents it as
    # "loader worker count").
    monkeypatch.setenv("SENSORIUM_LOADER_THREADS", "32")
    assert resolve_workers(8) == 32


class TestNativeFillKernels:
    def test_gather_rows_relu_into(self):
        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(1)
        src = rng.normal(size=(40, 60)).astype(np.float32)
        idx = np.arange(10, 26, 2, dtype=np.int64)
        out = np.empty((40, 8), np.float32)
        assert native.gather_rows_relu_into(src, idx, out)
        np.testing.assert_array_equal(out, np.maximum(src[:, idx], 0.0))

    def test_gather_rows_relu_propagates_nan(self):
        """NaN responses must propagate exactly as np.maximum/torch.relu do
        (NaN in, NaN out) — the native kernel must not silently zero them,
        or the same seed would yield different targets depending on whether
        the C++ library loaded, and NaN corruption would be masked."""
        if not native.available():
            pytest.skip("native library unavailable")
        src = np.array(
            [[np.nan, -1.0, 2.0, np.nan], [0.5, np.nan, -3.0, 0.0]], np.float32
        )
        idx = np.arange(4, dtype=np.int64)
        out = np.empty((2, 4), np.float32)
        assert native.gather_rows_relu_into(src, idx, out)
        np.testing.assert_array_equal(out, np.maximum(src[:, idx], 0.0))

    def test_filler_coerces_index_dtype(self):
        """fill() must marshal non-int64/non-contiguous indexes like every
        other native wrapper instead of reinterpreting the raw buffer."""
        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(7)
        video = rng.uniform(0, 255, (18, 24, 50)).astype(np.float32)
        behavior = rng.uniform(0, 5, (2, 50)).astype(np.float32)
        pupil = rng.uniform(50, 200, (2, 50)).astype(np.float32)
        resp = rng.normal(size=(15, 50)).astype(np.float32)
        filler = native.make_trial_filler(video, behavior, pupil, resp, (24, 24))
        assert filler is not None
        idx64 = np.arange(5, 21, 2, dtype=np.int64)
        ref_input = np.empty((5, 8, 24, 24), np.float32)
        ref_target = np.empty((15, 8), np.float32)
        filler(idx64, 0.0, ref_input, ref_target)
        from sensorium_tpu.data.inputs import StackInputsProcessor

        proc = StackInputsProcessor(size=(24, 24), pad_fill_value=0.0)
        # int32 indexes and a non-contiguous (negative-stride view) int64
        # array: both must produce the same sample as the processors.
        for bad_idx in (idx64.astype(np.int32), np.arange(42, 4, -2)[::-1][2:10]):
            input_out = np.empty_like(ref_input)
            target_out = np.empty_like(ref_target)
            filler(bad_idx, 0.0, input_out, target_out)
            sel = np.ascontiguousarray(bad_idx, np.int64)
            expected = proc(video[..., sel], behavior[..., sel], pupil[..., sel])
            np.testing.assert_array_equal(input_out, np.asarray(expected, np.float32))
            np.testing.assert_array_equal(target_out, np.maximum(resp[:, sel], 0.0))

    def test_make_trial_filler_matches_processors(self):
        if not native.available():
            pytest.skip("native library unavailable")
        from sensorium_tpu.data.inputs import StackInputsProcessor

        rng = np.random.default_rng(2)
        video = rng.uniform(0, 255, (18, 24, 50)).astype(np.float32)
        behavior = rng.uniform(0, 5, (2, 50)).astype(np.float32)
        pupil = rng.uniform(50, 200, (2, 50)).astype(np.float32)
        resp = rng.normal(size=(15, 50)).astype(np.float32)
        filler = native.make_trial_filler(video, behavior, pupil, resp, (24, 24))
        assert filler is not None
        idx = np.arange(5, 21, 2, dtype=np.int64)
        input_out = np.empty((5, 8, 24, 24), np.float32)
        target_out = np.empty((15, 8), np.float32)
        filler(idx, 0.0, input_out, target_out)
        proc = StackInputsProcessor(size=(24, 24), pad_fill_value=0.0)
        expected = proc(video[..., idx], behavior[..., idx], pupil[..., idx])
        np.testing.assert_array_equal(input_out, np.asarray(expected, np.float32))
        np.testing.assert_array_equal(target_out, np.maximum(resp[:, idx], 0.0))

    def test_make_trial_filler_rejects_oversized_frame(self):
        if not native.available():
            pytest.skip("native library unavailable")
        video = np.zeros((30, 30, 40), np.float32)
        sig = np.zeros((2, 40), np.float32)
        assert native.make_trial_filler(video, sig, sig, None, (24, 24)) is None

    def test_make_trial_filler_rejects_wrong_signal_rows(self):
        """The C kernel reads exactly 2 rows of behavior/pupil; other row
        counts must route to the NumPy path (which fails loudly)."""
        if not native.available():
            pytest.skip("native library unavailable")
        video = np.zeros((18, 24, 40), np.float32)
        ok = np.zeros((2, 40), np.float32)
        one_row = np.zeros((1, 40), np.float32)
        assert native.make_trial_filler(video, one_row, ok, None, (24, 24)) is None
        assert native.make_trial_filler(video, ok, one_row, None, (24, 24)) is None
        assert (
            native.assemble_stack_input(video, one_row, ok, np.arange(4), (24, 24))
            is None
        )

    def test_fill_guards_fail_loudly(self):
        """The fused fill path must raise (like the NumPy paths do) rather
        than let the C kernel read or write out of bounds silently."""
        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(3)
        video = rng.uniform(0, 255, (18, 24, 50)).astype(np.float32)
        behavior = rng.uniform(0, 5, (2, 50)).astype(np.float32)
        pupil = rng.uniform(50, 200, (2, 50)).astype(np.float32)
        resp = rng.normal(size=(15, 50)).astype(np.float32)
        filler = native.make_trial_filler(video, behavior, pupil, resp, (24, 24))
        assert filler is not None
        input_out = np.empty((5, 4, 24, 24), np.float32)
        target_out = np.empty((15, 4), np.float32)

        # Window index past the shortest source time axis.
        with pytest.raises(IndexError, match="out of range"):
            filler(np.array([0, 1, 2, 50]), 0.0, input_out, target_out)
        # Negative index (the C kernel has no wraparound semantics).
        with pytest.raises(IndexError, match="out of range"):
            filler(np.array([-1, 0, 1, 2]), 0.0, input_out, target_out)
        # Target rows disagreeing with the responses file (the
        # truncated-download / meta-mismatch corruption case).
        with pytest.raises(ValueError, match="target_out"):
            filler(np.arange(4), 0.0, input_out, np.empty((14, 4), np.float32))
        # Wrong input canvas.
        with pytest.raises(ValueError, match="input_out"):
            filler(np.arange(4), 0.0, np.empty((5, 4, 16, 16), np.float32), target_out)

        # A shorter responses file tightens the shared index limit.
        short_resp = rng.normal(size=(15, 30)).astype(np.float32)
        short_filler = native.make_trial_filler(
            video, behavior, pupil, short_resp, (24, 24)
        )
        assert short_filler is not None
        with pytest.raises(IndexError, match="out of range"):
            short_filler(np.array([0, 1, 2, 35]), 0.0, input_out, target_out)

    def test_gather_oob_indexes_fall_back_loudly(self):
        if not native.available():
            pytest.skip("native library unavailable")
        src = np.zeros((3, 10), np.float32)
        with pytest.raises(IndexError):
            native.gather_rows(src, np.array([0, 12]))
        out = np.empty((3, 2), np.float32)
        assert not native.gather_rows_relu_into(src, np.array([0, 12]), out)
