"""Host-side datasets feeding the TPU training/validation loops.

Capability parity with ``/root/reference/src/datasets.py`` (random-window
training samples, deterministic non-overlapping validation windows, the
10-mouse concatenation with per-sample mouse weights), redesigned for a
JAX/TPU pipeline:

* trial ``.npy`` files are opened once with ``mmap_mode="r"`` and windows
  are gathered by fancy-indexing the memory map — the reference re-reads
  the whole file for every sample (``datasets.py:37-51``);
* batches use a compact structure-of-arrays format: instead of 10 mostly
  zero per-mouse target tensors, a batch carries one zero-padded target
  array ``(B, max_neurons, T)`` plus a one-hot ``(B, num_mice)`` weight
  matrix.  Downstream loss/metrics mask by weight, which is numerically
  identical to the reference format;
* randomness is driven by explicit ``np.random.Generator`` seeds derived
  from ``(base_seed, epoch, sample_index)``, so runs are reproducible
  (the reference deliberately seeds from wall-clock time).
"""

from __future__ import annotations

import threading as _threading
from dataclasses import dataclass

import numpy as np

from sensorium_tpu import constants
from sensorium_tpu.data.indexes import WindowIndexer
from sensorium_tpu.data.inputs import InputsProcessor
from sensorium_tpu.data.mixers import Mixer
from sensorium_tpu.data.responses import ResponsesProcessor


@dataclass
class MiceBatch:
    """One collated batch in compact (padded) form."""

    inputs: np.ndarray  # (B, 5, T, H, W) float32
    targets: np.ndarray  # (B, max_neurons, T) float32, zero-padded per mouse
    weights: np.ndarray  # (B, num_mice) float32, one-hot by sample's mouse

    def __len__(self) -> int:
        return self.inputs.shape[0]


class MouseTrialStore:
    """Memory-mapped access to one mouse's trials with window gathering."""

    def __init__(
        self,
        mouse_data: dict,
        indexer: WindowIndexer,
        inputs_processor: InputsProcessor,
        responses_processor: ResponsesProcessor,
    ):
        self.mouse_data = mouse_data
        self.mouse = mouse_data["mouse"]
        self.mouse_index = constants.mouse2index[self.mouse]
        self.num_neurons = mouse_data["num_neurons"]
        self.indexer = indexer
        self.inputs_processor = inputs_processor
        self.responses_processor = responses_processor
        self.trials = mouse_data["trials"]
        self.trial_lengths = [t["length"] for t in self.trials]
        self._mmap_cache: dict[str, np.ndarray] = {}
        self._filler_cache: dict[int, object] = {}

    def _array(self, path: str) -> np.ndarray:
        arr = self._mmap_cache.get(path)
        if arr is None:
            arr = np.load(path, mmap_mode="r")
            self._mmap_cache[path] = arr
        return arr

    def gather(self, trial_index: int, frame_indexes: np.ndarray, key: str) -> np.ndarray:
        arr = self._array(self.trials[trial_index][key])
        if arr.ndim == 2 and arr.dtype == np.float32:
            from sensorium_tpu.data import native

            return native.gather_rows(arr, frame_indexes)
        return np.asarray(arr[..., frame_indexes])

    def window_sample(
        self, trial_index: int, anchor: int, with_responses: bool = True
    ) -> tuple[np.ndarray, np.ndarray | None]:
        """Assemble (input, target) for the window anchored at ``anchor``.

        The fused native path (C++ gather + canvas assembly, see
        ``native/sensorium_host.cpp``) is used when the input processor and
        array dtypes allow it; otherwise the NumPy processors run.
        """
        frame_indexes = self.indexer.window(anchor)
        inputs = self._native_input(trial_index, frame_indexes)
        if inputs is None:
            frames = self.gather(trial_index, frame_indexes, "video_path")
            behavior = self.gather(trial_index, frame_indexes, "behavior_path")
            pupil_center = self.gather(trial_index, frame_indexes, "pupil_center_path")
            inputs = self.inputs_processor(frames, behavior, pupil_center)
        target = None
        if with_responses and "response_path" in self.trials[trial_index]:
            responses = self.gather(trial_index, frame_indexes, "response_path")
            target = self.responses_processor(responses)
        return inputs, target

    def _native_input(self, trial_index: int, frame_indexes: np.ndarray, out=None):
        from sensorium_tpu.data import native
        from sensorium_tpu.data.inputs import StackInputsProcessor

        proc = self.inputs_processor
        if type(proc) is not StackInputsProcessor:
            return None
        trial = self.trials[trial_index]
        return native.assemble_stack_input(
            self._array(trial["video_path"]),
            self._f32_array(trial["behavior_path"]),
            self._f32_array(trial["pupil_center_path"]),
            frame_indexes,
            proc.size,
            proc.pad_fill_value,
            out=out,
        )

    def _f32_array(self, path: str) -> np.ndarray:
        """Small per-trial signal arrays, converted to f32 once and cached
        (the per-sample ``np.asarray`` conversion showed up in profiles)."""
        key = ("f32", path)
        arr = self._mmap_cache.get(key)
        if arr is None:
            arr = np.ascontiguousarray(self._array(path), np.float32)
            self._mmap_cache[key] = arr
        return arr

    def _trial_filler(self, trial_index: int):
        """One-native-call-per-sample filler, validated+marshalled once per
        trial (None when the processor/layout combination is unsupported)."""
        filler = self._filler_cache.get(trial_index, False)
        if filler is not False:
            return filler
        from sensorium_tpu.data import native
        from sensorium_tpu.data.inputs import StackInputsProcessor
        from sensorium_tpu.data.responses import IdentityResponsesProcessor

        filler = None
        proc = self.inputs_processor
        trial = self.trials[trial_index]
        if (
            type(proc) is StackInputsProcessor
            and type(self.responses_processor) is IdentityResponsesProcessor
        ):
            responses = (
                self._array(trial["response_path"])
                if "response_path" in trial
                else None
            )
            filler = native.make_trial_filler(
                self._array(trial["video_path"]),
                self._f32_array(trial["behavior_path"]),
                self._f32_array(trial["pupil_center_path"]),
                responses,
                proc.size,
            )
        self._filler_cache[trial_index] = filler
        return filler

    def window_sample_into(
        self, trial_index: int, anchor: int, input_out: np.ndarray, target_out: np.ndarray
    ) -> None:
        """``window_sample`` writing straight into collated batch rows.

        ``input_out``: (5, S, H, W) row view; ``target_out``: the row's
        first ``num_neurons`` rows of the zero-padded (N_max, S) target.
        Falls back internally to the allocating path when the fused native
        kernels cannot handle the processor/array layout.  Consumes no RNG.
        """
        from sensorium_tpu.data import native
        from sensorium_tpu.data.responses import IdentityResponsesProcessor

        frame_indexes = self.indexer.window(anchor)
        # The fill paths are train/val only, where every trial is labeled
        # (prediction uses window_sample(with_responses=False)).  An
        # unlabeled trial here must fail loudly: the allocating get() path
        # would crash in collate on target=None, and silently skipping the
        # write would hand uninitialized scratch (or stale zeros) to the
        # mixer as training targets.
        if "response_path" not in self.trials[trial_index]:
            raise ValueError(
                f"trial {trial_index} has no responses; the zero-copy fill "
                "path requires labeled trials (train/val splits only)"
            )
        filler = self._trial_filler(trial_index)
        if filler is not None:
            filler(
                frame_indexes,
                self.inputs_processor.pad_fill_value,
                input_out,
                target_out,
            )
            return
        if self._native_input(trial_index, frame_indexes, out=input_out) is None:
            frames = self.gather(trial_index, frame_indexes, "video_path")
            behavior = self.gather(trial_index, frame_indexes, "behavior_path")
            pupil_center = self.gather(trial_index, frame_indexes, "pupil_center_path")
            input_out[...] = self.inputs_processor(frames, behavior, pupil_center)

        trial = self.trials[trial_index]
        responses = self._array(trial["response_path"])
        fused = (
            type(self.responses_processor) is IdentityResponsesProcessor
            and responses.ndim == 2
            and responses.dtype == np.float32
        )
        if fused and native.gather_rows_relu_into(responses, frame_indexes, target_out):
            return
        if fused:
            np.take(responses, frame_indexes, axis=-1, out=target_out)
            np.maximum(target_out, 0.0, out=target_out)
            return
        target_out[...] = self.responses_processor(
            self.gather(trial_index, frame_indexes, "response_path")
        )


def _row_shapes(stores, max_neurons: int, augmentations=None):
    """(input_shape, target_shape) for the zero-copy loader path, or None
    when row geometry cannot be known upfront (non-stack input processors,
    non-(N, S) response processors, per-sample augmentation hooks)."""
    from sensorium_tpu.data.inputs import StackInputsProcessor
    from sensorium_tpu.data.responses import IdentityResponsesProcessor

    store = stores[0]
    proc = store.inputs_processor
    if augmentations is not None or type(proc) is not StackInputsProcessor:
        return None
    if type(store.responses_processor) is not IdentityResponsesProcessor:
        return None
    s = store.indexer.size
    width, height = proc.size
    return (5, s, height, width), (max_neurons, s)


class TrainMiceDataset:
    """Random-window training sampler over all mice.

    Index space is ``num_mice * mouse_epoch_size``; index -> mouse by
    block (samples [m*E, (m+1)*E) belong to mouse m).  Each sample draws a
    random trial and a random valid anchor, optionally mixed (CutMix) with
    the following sample of the same mouse.
    """

    def __init__(
        self,
        mice_data: list[dict],
        indexer: WindowIndexer,
        inputs_processor: InputsProcessor,
        responses_processor: ResponsesProcessor,
        mouse_epoch_size: int,
        mixer: Mixer | None = None,
        seed: int = 0,
        augmentations=None,
    ):
        if [constants.mouse2index[d["mouse"]] for d in mice_data] != constants.mice_indexes:
            # ValueError, not assert (-O-proof): misordered mice would
            # silently pair every readout with the wrong neuron data
            # (reference asserts the same canonical order, datasets.py:163).
            raise ValueError("mice_data must be all 10 mice in canonical constants.mice order")
        self.stores = [
            MouseTrialStore(d, indexer, inputs_processor, responses_processor) for d in mice_data
        ]
        self.num_mice = len(self.stores)
        self.max_neurons = max(s.num_neurons for s in self.stores)
        self.mouse_epoch_size = mouse_epoch_size
        self.mixer = mixer
        self.seed = seed
        # Thread-local partner buffers for the zero-copy mixer path: the
        # CutMix partner is a full extra sample; drawing it into reused
        # scratch (instead of the allocating _draw) keeps the mixed-sample
        # cost close to the unmixed one.
        self._scratch = _threading.local()
        # Per-sample input augmentation hook, ``(inputs, rng) -> inputs``
        # (reference: the ``augmentations`` nn.Module applied in
        # TrainMouseVideoDataset.get_sample_tensors, src/datasets.py:118-122
        # — unused by the production configs but part of the API surface).
        # Applied to mixer partners too, like the reference.
        self.augmentations = augmentations
        # Trials shorter than one raw window have no valid anchor; sampling
        # one would crash mid-epoch inside a loader thread (the reference
        # has the same latent crash, src/datasets.py:107-116 — real trials
        # are never that short, but corrupt/truncated files should fail
        # loudly at construction, not randomly at epoch N).
        self._valid_trials = []
        for store, data in zip(self.stores, mice_data):
            valid = np.flatnonzero(np.asarray(store.trial_lengths) >= indexer.width)
            if len(valid) == 0:
                raise ValueError(
                    f"Mouse '{data['mouse']}' has no trial of at least "
                    f"{indexer.width} raw frames in splits {data['splits']}"
                )
            self._valid_trials.append(valid)

    def __len__(self) -> int:
        return constants.num_mice * self.mouse_epoch_size

    def _draw(self, mouse_index: int, rng: np.random.Generator):
        store = self.stores[mouse_index]
        valid = self._valid_trials[mouse_index]
        trial_index = int(valid[rng.integers(len(valid))])
        length = store.trial_lengths[trial_index]
        anchor = int(rng.integers(store.indexer.behind, length - store.indexer.ahead))
        inputs, target = store.window_sample(trial_index, anchor)
        if self.augmentations is not None:
            inputs = self.augmentations(inputs, rng)
        return inputs, target

    def get(self, index: int, epoch: int = 0) -> tuple[int, np.ndarray, np.ndarray]:
        """Returns (mouse_index, input, target)."""
        mouse_index = index // self.mouse_epoch_size
        store = self.stores[mouse_index]
        rng = np.random.default_rng((self.seed, epoch, index))
        inputs, target = self._draw(mouse_index, rng)
        if self.mixer is not None and self.mixer.use(rng):
            partner_rng = np.random.default_rng((self.seed, epoch, index, 1))
            partner = self._draw(mouse_index, partner_rng)
            inputs, target = self.mixer((inputs, target), partner, rng)
        return mouse_index, inputs, target

    @property
    def row_shapes(self):
        return _row_shapes(self.stores, self.max_neurons, self.augmentations)

    def fill_into(
        self, index: int, epoch: int, input_out: np.ndarray, target_out: np.ndarray
    ) -> int:
        """Zero-copy ``get``: write the sample straight into collated batch
        rows; returns the mouse index.  Produces bit-identical samples to
        ``get`` + collate (same RNG stream: the draw, ``mixer.use`` and the
        mixer's own draws happen in the same order; ``mix_into`` mixes the
        partner into the row views in place)."""
        mouse_index = index // self.mouse_epoch_size
        store = self.stores[mouse_index]
        target_view = target_out[: store.num_neurons]
        rng = np.random.default_rng((self.seed, epoch, index))
        valid = self._valid_trials[mouse_index]
        trial_index = int(valid[rng.integers(len(valid))])
        length = store.trial_lengths[trial_index]
        anchor = int(rng.integers(store.indexer.behind, length - store.indexer.ahead))
        store.window_sample_into(trial_index, anchor, input_out, target_view)
        if self.mixer is not None and self.mixer.use(rng):
            partner_rng = np.random.default_rng((self.seed, epoch, index, 1))
            partner = self._draw_scratch(mouse_index, partner_rng, input_out.shape)
            self.mixer.mix_into((input_out, target_view), partner, rng)
        return mouse_index

    def _draw_scratch(self, mouse_index: int, rng, input_shape):
        """``_draw`` into reused thread-local buffers (zero allocations).

        Consumes the RNG identically to ``_draw`` (two ``integers`` calls);
        only valid on the zero-copy path (``row_shapes`` not None), which
        also guarantees ``augmentations is None``.
        """
        scratch = self._scratch
        if getattr(scratch, "input", None) is None or scratch.input.shape != input_shape:
            scratch.input = np.empty(input_shape, np.float32)
            scratch.target = np.empty((self.max_neurons, input_shape[1]), np.float32)
        store = self.stores[mouse_index]
        valid = self._valid_trials[mouse_index]
        trial_index = int(valid[rng.integers(len(valid))])
        length = store.trial_lengths[trial_index]
        anchor = int(rng.integers(store.indexer.behind, length - store.indexer.ahead))
        target_view = scratch.target[: store.num_neurons]
        store.window_sample_into(trial_index, anchor, scratch.input, target_view)
        return scratch.input, target_view


class ValMiceDataset:
    """Deterministic non-overlapping validation windows over all mice."""

    def __init__(
        self,
        mice_data: list[dict],
        indexer: WindowIndexer,
        inputs_processor: InputsProcessor,
        responses_processor: ResponsesProcessor,
    ):
        if [constants.mouse2index[d["mouse"]] for d in mice_data] != constants.mice_indexes:
            # ValueError, not assert (-O-proof): misordered mice would
            # silently pair every readout with the wrong neuron data
            # (reference asserts the same canonical order, datasets.py:163).
            raise ValueError("mice_data must be all 10 mice in canonical constants.mice order")
        self.stores = [
            MouseTrialStore(d, indexer, inputs_processor, responses_processor) for d in mice_data
        ]
        self.num_mice = len(self.stores)
        self.max_neurons = max(s.num_neurons for s in self.stores)
        # Flat index -> (mouse, trial, window_position)
        self._samples: list[tuple[int, int, int]] = []
        width = indexer.width
        for mouse_index, store in enumerate(self.stores):
            for trial_index, length in enumerate(store.trial_lengths):
                for position in range(length // width):
                    self._samples.append((mouse_index, trial_index, position))
        self.width = width

    def __len__(self) -> int:
        return len(self._samples)

    def get(self, index: int, epoch: int = 0) -> tuple[int, np.ndarray, np.ndarray]:
        mouse_index, trial_index, position = self._samples[index]
        store = self.stores[mouse_index]
        anchor = store.indexer.behind + position * self.width
        inputs, target = store.window_sample(trial_index, anchor)
        return mouse_index, inputs, target

    @property
    def row_shapes(self):
        return _row_shapes(self.stores, self.max_neurons)

    def fill_into(
        self, index: int, epoch: int, input_out: np.ndarray, target_out: np.ndarray
    ) -> int:
        mouse_index, trial_index, position = self._samples[index]
        store = self.stores[mouse_index]
        anchor = store.indexer.behind + position * self.width
        store.window_sample_into(
            trial_index, anchor, input_out, target_out[: store.num_neurons]
        )
        return mouse_index


def collate_mice_batch(
    samples: list[tuple[int, np.ndarray, np.ndarray]],
    num_mice: int | None = None,
    max_neurons: int | None = None,
) -> MiceBatch:
    """Collate (mouse_index, input, target) triples into a padded MiceBatch.

    Padding sizes default to the competition constants but are derived from
    the dataset by the loader, so synthetic/small datasets collate to their
    own (model-matching) padded width.
    """
    num_mice = constants.num_mice if num_mice is None else num_mice
    max_neurons = constants.max_num_neurons if max_neurons is None else max_neurons
    batch = len(samples)
    first_input = samples[0][1]
    inputs = np.empty((batch,) + first_input.shape, dtype=np.float32)
    time_shape = samples[0][2].shape[1:]  # () or (T,)
    targets = np.zeros((batch, max_neurons) + time_shape, dtype=np.float32)
    weights = np.zeros((batch, num_mice), dtype=np.float32)
    for row, (mouse_index, sample_input, sample_target) in enumerate(samples):
        inputs[row] = sample_input
        targets[row, : sample_target.shape[0]] = sample_target
        weights[row, mouse_index] = 1.0
    return MiceBatch(inputs=inputs, targets=targets, weights=weights)
