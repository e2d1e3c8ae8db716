"""Sliding-window trial inference.

Capability parity with ``/root/reference/src/predictors.py`` — predict a
full trial by blending overlapping 16-frame windows at every valid anchor
(stride 1), with "ones" or "linear" per-window blend weights — redesigned
for TPU throughput:

* the reference runs T-30 sequential batch-1 forwards per trial
  (predictors.py:46-53); here anchors are batched into fixed-size chunks,
  each chunk's windows gathered **on device** from the trial tensor (one
  host->device transfer per trial instead of 16x-overlapping copies), and
  the model runs at batch ``chunk_size`` with one readout;
* the 5-channel input stack is assembled **on device**: channels 1-4 are
  per-frame scalars broadcast to full planes (inputs.py:32-33), so the
  host transfers only the compact video + (2, T) signals — ~9x fewer
  bytes over PCIe than shipping the assembled (5, T, H, W) stack;
* the whole trial — window gather, chunked forwards (``lax.scan``), and
  the overlap/blend scatter-accumulation — is ONE jitted call; only the
  final blended (N, T) response crosses back to host;
* chunk size and trial length are bucketed so every trial reuses one of a
  handful of compiled executables (XLA static shapes);
* blend math matches the reference exactly (numerator unweighted, the
  denominator accumulates the per-position blend weights,
  predictors.py:50-54), verified by the sequential-parity test.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sensorium_tpu import constants
from sensorium_tpu.data.indexes import WindowIndexer
from sensorium_tpu.data.inputs import StackInputsProcessor, get_inputs_processor
from sensorium_tpu.engine.model import load_model


def get_blend_weights(name: str, size: int) -> np.ndarray:
    if name == "ones":
        return np.ones(size, dtype=np.float32)
    if name == "linear":
        return np.linspace(0, 1, num=size, dtype=np.float32)
    raise ValueError(f"Blend weights '{name}' is not supported")


def _round_up(value: int, multiple: int) -> int:
    return (value + multiple - 1) // multiple * multiple


class StagedTrial(NamedTuple):
    """One trial's device-resident inputs + window plan (Predictor.stage_trial).

    Shareable across predictors with equal ``stage_signature()`` — the
    weights live in each predictor, not here.  ``windows is None`` marks a
    trial shorter than one window (run_staged returns zeros)."""

    length: int
    hoststack: bool
    trial_args: tuple
    windows: "jax.Array | None"
    valid: "jax.Array | None"


def assemble_trial_stack(video, behavior, pupil_center, height, width, fill):
    """Device-side 5-channel input assembly from compact trial arrays.

    ``video``: (Tp, sh, sw); ``behavior``/``pupil_center``: (2, Tp) →
    (5, Tp, H, W).  Same semantics as the host ``StackInputsProcessor``
    (reference ``src/inputs.py:26-33``): the video is centered on the
    canvas, the four scalar signals broadcast to full planes.  Shared by
    the jitted trial predictor and the AOT trial export
    (``infer/export.py``).
    """
    padded_len, src_h, src_w = video.shape
    h0 = (height - src_h) // 2
    w0 = (width - src_w) // 2
    ch0 = jnp.pad(
        video,
        ((0, 0), (h0, height - src_h - h0), (w0, width - src_w - w0)),
        constant_values=fill,
    )[None]  # (1, Tp, H, W)
    planes = jnp.concatenate([behavior, pupil_center], axis=0)
    return jnp.concatenate(
        [ch0, jnp.broadcast_to(planes[:, :, None, None], (4, padded_len, height, width))],
        axis=0,
    )


class Predictor:
    """Load a checkpoint and predict whole trials with window blending."""

    def __init__(
        self,
        model_path: Path | str,
        blend_weights: str = "ones",
        chunk_size: int = 32,
        length_bucket: int = 64,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — the chunk batch is
        sharded over its ``data`` axis (weights replicated), so each chunk's
        ``chunk_size`` window forwards spread across the mesh devices
        (SURVEY §5 long-context lever: shard the sliding-window loop).
        ``chunk_size`` must then be a multiple of the data-axis size.
        """
        self.mesh = mesh
        self.model = load_model(model_path, mesh=mesh)
        params = self.model.params
        self.inputs_processor = get_inputs_processor(*params["inputs_processor"])
        frame_stack = params["frame_stack"]
        # Real errors, not asserts: under ``python -O`` asserts are
        # stripped and an incompatible checkpoint would silently predict
        # with wrong window offsets (same hazard cli/ensemble.py guards).
        if frame_stack["position"] != "last":
            raise ValueError(
                f"predictor requires frame_stack position 'last' (the "
                f"production contract, predictors.py:38-44); checkpoint has "
                f"{frame_stack['position']!r}"
            )
        if params["responses_processor"][0] != "identity":
            raise ValueError(
                f"predictor emits raw responses (responses_processor "
                f"'identity'); checkpoint has "
                f"{params['responses_processor'][0]!r}"
            )
        if chunk_size <= 0 or length_bucket <= 0:
            raise ValueError(
                f"chunk_size and length_bucket must be positive, got "
                f"{chunk_size} / {length_bucket}"
            )
        self.indexes_generator = WindowIndexer(frame_stack["size"], frame_stack["step"])
        self.blend_weights = get_blend_weights(blend_weights, frame_stack["size"])
        if mesh is not None:
            import jax

            from sensorium_tpu.parallel.mesh import data_extent

            if chunk_size % data_extent(mesh):
                raise ValueError(
                    f"chunk_size {chunk_size} must be a multiple of the mesh "
                    f"batch-sharding ways ({data_extent(mesh)})"
                )
            if jax.process_count() > 1:
                # Trial inputs are committed with plain device_put, which a
                # multi-process mesh (non-addressable devices) rejects.  The
                # supported multihost inference pattern is one single-host
                # predictor per host over that host's own trials (folds and
                # trials are embarrassingly parallel) — see docs/SCALING.md.
                raise NotImplementedError(
                    "mesh-sharded prediction spans a single process; run one "
                    "Predictor per host instead of one mesh across hosts"
                )
        self.chunk_size = chunk_size
        self.length_bucket = length_bucket
        self._window_fns: dict[int, callable] = {}

    def _scan_windows(self, trial_inputs, params, batch_stats, windows, valid, mouse_index):
        """Chunked window forwards + blend scatter over an assembled trial.

        trial_inputs: (5, Tp, H, W); windows: (chunks, C, S) frame indexes;
        valid: (chunks, C) 1/0 rows (tail padding).
        """
        model = self.model.nn_module
        num_neurons = model.readout_outputs[mouse_index]
        blend = jnp.asarray(self.blend_weights)  # (S,)
        padded_len = trial_inputs.shape[1]

        def body(carry, chunk):
            resp_acc, blend_acc = carry
            w, ok = chunk  # (C, S), (C,)
            gathered = jnp.take(trial_inputs, w, axis=1)  # (5, C, S, H, W)
            batch = jnp.transpose(gathered, (1, 0, 2, 3, 4))
            pred = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                mouse_index=mouse_index,
                train=False,
            ).astype(jnp.float32)  # (C, N, S)
            pred = pred * ok[:, None, None]
            flat = w.reshape(-1)  # (C*S,)
            updates = jnp.transpose(pred, (1, 0, 2)).reshape(num_neurons, -1)
            resp_acc = resp_acc.at[:, flat].add(updates)
            blend_acc = blend_acc.at[flat].add(
                (blend[None, :] * ok[:, None]).reshape(-1)
            )
            return (resp_acc, blend_acc), None

        init = (
            jnp.zeros((num_neurons, padded_len), jnp.float32),
            jnp.zeros((padded_len,), jnp.float32),
        )
        (resp_acc, blend_acc), _ = jax.lax.scan(body, init, (windows, valid))
        return resp_acc / jnp.clip(blend_acc, 1.0, None)

    def _jit_kwargs(self, num_trial_args: int):
        if self.mesh is None:
            return {}
        from jax.sharding import NamedSharding, PartitionSpec

        from sensorium_tpu.parallel.mesh import data_axes

        rep = NamedSharding(self.mesh, PartitionSpec())
        # Chunk batches shard over ALL data-like axes (incl. the hybrid
        # mesh's ``replica``) — otherwise every slice would redundantly
        # recompute identical window forwards.
        chunked = NamedSharding(self.mesh, PartitionSpec(None, data_axes(self.mesh)))
        # Weights keep whatever placement load_model gave them — replicated
        # on a pure data mesh, TP-sharded over the ``model`` axis on a
        # (data, model) mesh (parallel/mesh.py shard_state).
        state = self.model.state
        param_shardings = jax.tree.map(lambda x: x.sharding, state.eval_params)
        stats_shardings = jax.tree.map(lambda x: x.sharding, state.eval_batch_stats)
        return dict(
            in_shardings=(param_shardings, stats_shardings)
            + (rep,) * num_trial_args
            + (chunked, chunked),
            out_shardings=rep,
        )

    def _trial_fn(self, mouse_index: int):
        """Jitted full-trial prediction with on-device input assembly.

        Takes the compact trial arrays (video planes + behavior + pupil
        center) and builds the (5, Tp, H, W) stack on device — the
        broadcast channels never cross the host-device link.
        """
        if mouse_index not in self._window_fns:
            width, height = self.inputs_processor.size
            fill = self.inputs_processor.pad_fill_value

            @functools.partial(jax.jit, **self._jit_kwargs(num_trial_args=3))
            def run(params, batch_stats, video, behavior, pupil_center, windows, valid):
                # video: (Tp, sh, sw); behavior / pupil_center: (2, Tp).
                trial_inputs = assemble_trial_stack(
                    video, behavior, pupil_center, height, width, fill
                )
                return self._scan_windows(
                    trial_inputs, params, batch_stats, windows, valid, mouse_index
                )

            self._window_fns[mouse_index] = run
        return self._window_fns[mouse_index]

    def _trial_fn_hoststack(self, mouse_index: int):
        """Jitted full-trial prediction from a host-assembled (5,T,H,W) stack
        (fallback for non-``stack_inputs`` processors; oversized frames also
        route here so they hit ``StackInputsProcessor``'s clear canvas-size
        ValueError instead of a device-assembly shape error)."""
        key = ("hoststack", mouse_index)
        if key not in self._window_fns:

            @functools.partial(jax.jit, **self._jit_kwargs(num_trial_args=1))
            def run(params, batch_stats, trial_inputs, windows, valid):
                return self._scan_windows(
                    trial_inputs, params, batch_stats, windows, valid, mouse_index
                )

            self._window_fns[key] = run
        return self._window_fns[key]

    def predict_trial(
        self,
        video: np.ndarray,
        behavior: np.ndarray,
        pupil_center: np.ndarray,
        mouse_index: int,
    ) -> np.ndarray:
        return np.asarray(
            self.predict_trial_device(video, behavior, pupil_center, mouse_index)
        )

    def predict_trial_device(
        self,
        video: np.ndarray,
        behavior: np.ndarray,
        pupil_center: np.ndarray,
        mouse_index: int,
    ) -> jax.Array:
        """``predict_trial`` but the (N, T) result stays on device —
        callers that post-process on device (or only need a sync) avoid
        the device->host transfer."""
        return self.run_staged(
            self.stage_trial(video, behavior, pupil_center), mouse_index
        )

    def stage_signature(self):
        """Key deciding whether two predictors can share a staged trial.

        Staging depends only on the input-processor geometry, the window
        plan, the bucketing knobs and the mesh — NOT on weights or blend
        weights, so the 7 fold models of one experiment (cli/predict.py
        builds them with identical kwargs) share a signature."""
        ip = self.inputs_processor
        gen = self.indexes_generator
        return (
            type(ip),
            getattr(ip, "size", None),
            getattr(ip, "pad_fill_value", None),
            (gen.size, gen.step, gen.position),
            self.chunk_size,
            self.length_bucket,
            self.mesh,
        )

    def stage_trial(
        self, video: np.ndarray, behavior: np.ndarray, pupil_center: np.ndarray
    ) -> "StagedTrial":
        """Upload one trial's compact arrays + window plan ONCE.

        The unlabeled flow forwards the SAME trial through 7 fold models
        (reference predict.py:44-48); per-predictor staging would cross
        the host->device link 7 times per video.  Predictors with equal
        ``stage_signature()`` can all ``run_staged`` the result."""
        length = video.shape[-1]
        gen = self.indexes_generator
        anchors = gen.valid_anchors(length)
        if len(anchors) == 0:
            # Trial shorter than one window: the reference's loop runs zero
            # iterations and the blend denominator clips to 1 -> zeros
            # (run_staged returns the zeros).
            return StagedTrial(length, False, (), None, None)
        windows = gen.windows(anchors).astype(np.int32)  # (A, S)

        # Bucket the time axis AND the anchor count so XLA executables are
        # reused across trials of similar length (the anchor padding is
        # derived from the bucketed length, keeping one executable per
        # bucket rather than per exact trial length).
        padded_len = _round_up(length, self.length_bucket)
        chunk = self.chunk_size
        max_anchors = len(gen.valid_anchors(padded_len))
        padded_anchors = _round_up(max_anchors, chunk)
        pad_rows = padded_anchors - windows.shape[0]
        valid = np.zeros(padded_anchors, np.float32)
        valid[: windows.shape[0]] = 1.0
        if pad_rows:
            # Repeats of the last REAL window: in-range gathers, zero weight.
            windows = np.concatenate(
                [windows, np.repeat(windows[-1:], pad_rows, axis=0)], axis=0
            )

        device_assembly = isinstance(self.inputs_processor, StackInputsProcessor)
        if device_assembly:
            width, height = self.inputs_processor.size
            device_assembly = video.shape[0] <= height and video.shape[1] <= width
        if device_assembly:
            # Compact transfer: (Tp, sh, sw) video planes + (2, Tp) signals;
            # the broadcast channels are built on device (_trial_fn).
            tpad = padded_len - length
            planes = np.ascontiguousarray(
                np.transpose(video, (2, 0, 1)), dtype=np.float32
            )
            trial_args = (
                jax.device_put(np.pad(planes, ((0, tpad), (0, 0), (0, 0)))),
                jax.device_put(np.pad(behavior.astype(np.float32), ((0, 0), (0, tpad)))),
                jax.device_put(np.pad(pupil_center.astype(np.float32), ((0, 0), (0, tpad)))),
            )
        else:
            inputs = np.asarray(
                self.inputs_processor(video, behavior, pupil_center), np.float32
            )  # (5, T, H, W)
            if padded_len > inputs.shape[1]:
                inputs = np.pad(
                    inputs, ((0, 0), (0, padded_len - inputs.shape[1]), (0, 0), (0, 0))
                )
            trial_args = (jax.device_put(inputs),)

        return StagedTrial(
            length,
            not device_assembly,
            trial_args,
            jnp.asarray(windows.reshape(-1, chunk, windows.shape[-1])),
            jnp.asarray(valid.reshape(-1, chunk)),
        )

    def run_staged(self, staged: "StagedTrial", mouse_index: int) -> jax.Array:
        """Window forwards + blend over an already-staged trial."""
        if staged.windows is None:
            num_neurons = self.model.nn_module.readout_outputs[mouse_index]
            return jnp.zeros((num_neurons, staged.length), jnp.float32)
        run = (
            self._trial_fn_hoststack(mouse_index)
            if staged.hoststack
            else self._trial_fn(mouse_index)
        )
        variables = self.model.state
        responses = run(
            variables.eval_params,
            variables.eval_batch_stats,
            *staged.trial_args,
            staged.windows,
            staged.valid,
        )
        return responses[:, : staged.length]

    def predict_trial_data(self, trial_data: dict, mouse_index: int) -> np.ndarray:
        """Predict from a trial-catalog entry (predict.py:24-36 parity)."""
        video, behavior, pupil_center = _load_trial_arrays(trial_data)
        return self.predict_trial(video, behavior, pupil_center, mouse_index)


def _load_trial_arrays(trial_data: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load (video, behavior, pupil_center) cut to the trial length —
    the one place the trial-file layout is known (predict.py:24-29)."""
    length = trial_data["length"]
    return (
        np.load(trial_data["video_path"])[..., :length],
        np.load(trial_data["behavior_path"])[..., :length],
        np.load(trial_data["pupil_center_path"])[..., :length],
    )


def predict_mouse_split(
    mouse: str,
    split: str,
    predictors: list[Predictor],
    save_dir: Path,
    trial_shard: tuple[int, int] | None = None,
) -> None:
    """Blend several predictors (fold models) over one mouse's split trials.

    ``trial_shard=(i, n)`` predicts only every n-th trial starting at i —
    the multi-host fan-out unit (docs/SCALING.md "Inference at scale":
    trials are embarrassingly parallel, so hosts split the trial list
    rather than stretching one mesh across processes; each trial's
    ``.npy`` is written by exactly one host, into the shared dir).

    The trial arrays are loaded from disk ONCE per trial and shared by all
    predictors (the unlabeled flow blends 7 fold models — per-predictor
    loading would re-read every multi-MB video 7 times).

    The fold blend is computed ON DEVICE (one (N, T) fetch per trial
    instead of one per fold model — 7x fewer device->host bytes in the
    unlabeled flow, reference predict.py:44-50), the staged trial upload
    is shared by all same-signature predictors (7x fewer host->device
    bytes), and each trial's fetch is
    deferred by one trial: jax's async dispatch computes trial t while the
    host saves trial t-1, so upload/compute/fetch pipeline instead of
    serializing on a per-trial round-trip (bench.py --infer
    pipelined_window_forwards_per_sec measures this cadence).
    """
    from sensorium_tpu.data.mouse_data import get_mouse_data

    if not predictors:
        raise ValueError("predictors must be non-empty")
    mouse_index = constants.mouse2index[mouse]
    mouse_data = get_mouse_data(mouse=mouse, splits=[split])
    save_dir.mkdir(parents=True, exist_ok=True)
    # Fold models built with identical kwargs share trial staging: one
    # upload of the multi-MB video per trial instead of one per predictor.
    lead = predictors[0]
    shared_staging = all(
        p.stage_signature() == lead.stage_signature() for p in predictors[1:]
    )
    trials = mouse_data["trials"]
    if trial_shard is not None:
        index, count = trial_shard
        trials = trials[index::count]
    pending: tuple[Path, jax.Array | np.ndarray] | None = None
    for trial_data in trials:
        video, behavior, pupil_center = _load_trial_arrays(trial_data)
        if shared_staging:
            staged = lead.stage_trial(video, behavior, pupil_center)
            responses = [p.run_staged(staged, mouse_index) for p in predictors]
            blend = (
                responses[0]
                if len(responses) == 1
                else jnp.mean(jnp.stack(responses), axis=0)
            )
        else:
            # Heterogeneous predictors (different meshes, or mesh vs None)
            # may hold outputs committed to incompatible device sets —
            # jnp.stack across those raises.  Blend on host instead (the
            # pre-r4 behavior); only the shared-signature fast path keeps
            # the on-device blend + deferred fetch.
            blend = np.mean(
                [
                    np.asarray(
                        p.predict_trial_device(video, behavior, pupil_center, mouse_index)
                    )
                    for p in predictors
                ],
                axis=0,
            )
        if pending is not None:
            np.save(str(pending[0]), np.asarray(pending[1]))
        pending = (save_dir / f"{trial_data['trial_id']}.npy", blend)
    if pending is not None:
        np.save(str(pending[0]), np.asarray(pending[1]))
