"""Ahead-of-time serving export of trained models (StableHLO).

The reference serves its published weights by rebuilding the torch module
in Python and looping eager batch-1 forwards
(``/root/reference/src/predictors.py:23-55``, ``README.md:303-335``) —
serving requires the full training codebase.  The TPU-native serving
artifact is different in kind: the eval-mode forward is lowered ahead of
time with ``jax.export``, the trained weights baked into the program as
constants, and the result serialized as a *versioned StableHLO program*.

Properties of the artifact:

* loadable from ANY JAX process whose backend is in its platform list —
  no sensorium_tpu code, checkpoint file, or config needed at serving
  time (``load_exported(path).call(inputs)``);
* the batch dimension is symbolic, so one artifact serves every batch
  size with one compile per size, exactly like a jitted function;
* multi-platform: one file lowers for both ``tpu`` and ``cpu`` by
  default, so the same artifact runs on a TPU pod and in a CPU canary;
* forward-compatible: jax.export's serialization calendar guarantees
  loadability by newer jax releases.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export
from jax.sharding import NamedSharding, PartitionSpec

from sensorium_tpu.ops.conv import portable_dots
from sensorium_tpu.parallel import mesh as mesh_lib

EXPORT_SUFFIX = ".stablehlo"


def _dot_lowering_for(platforms):
    """CPU-executable bf16 dot lowering whenever the artifact targets cpu.

    The ambient-backend heuristic in ``ops.conv.accum_dtype`` is wrong for
    multi-platform exports (a TPU-host trace would bake BF16xBF16=F32
    grouped dots that XLA:CPU cannot run); ``portable_dots`` pins the
    trace-time choice to the artifact's declared platform list instead.
    """
    return portable_dots() if "cpu" in platforms else contextlib.nullcontext()


def export_forward(
    model,
    mouse_index: int | None = None,
    frames: int | None = None,
    height: int | None = None,
    width: int | None = None,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
) -> jax_export.Exported:
    """Lower the eval-mode forward of a ``MouseModel`` to StableHLO.

    ``mouse_index=None`` exports the all-mice forward
    ``(b, C, T, H, W) -> (M, b, N_max, T)``; an int exports that mouse's
    head ``(b, C, T, H, W) -> (b, N_m, T)``.  The batch dim ``b`` is
    symbolic.  ``frames``/``height``/``width`` default to the model
    config's frame-stack size and input-processor canvas.  Returns the
    ``Exported`` object; ``save_exported`` serializes it.
    """
    nn = model.nn_module
    # Bake host copies of the eval (EMA) weights into the program.
    variables = jax.device_get(
        {
            "params": model.state.eval_params,
            "batch_stats": model.state.eval_batch_stats,
        }
    )

    if frames is None:
        frames = int(model.params["frame_stack"]["size"])
    if height is None or width is None:
        proc_kwargs = model.params["inputs_processor"][1]
        # StackInputsProcessor's size is (width, height) — inputs.py:33.
        canvas_w, canvas_h = proc_kwargs["size"]
        height = height if height is not None else int(canvas_h)
        width = width if width is not None else int(canvas_w)

    def forward(inputs):
        return nn.apply(
            variables, inputs, mouse_index=mouse_index, train=False
        ).astype(jnp.float32)

    (batch,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct(
        (batch, nn.in_channels, frames, height, width), jnp.float32
    )
    with _dot_lowering_for(platforms):
        return jax_export.export(jax.jit(forward), platforms=tuple(platforms))(spec)


def export_trial(
    predictor,
    mouse_index: int,
    src_hw: tuple[int, int] = (36, 64),
    platforms: tuple[str, ...] = ("tpu", "cpu"),
) -> jax_export.Exported:
    """Lower whole-trial sliding-window inference to StableHLO.

    Where :func:`export_forward` exports one 16-frame window forward, this
    exports the predictor's ENTIRE trial program — on-device 5-channel
    assembly, stride-1 window gather, chunked ``lax.scan`` forwards, and
    the overlap-blend scatter (reference semantics:
    ``/root/reference/src/predictors.py:36-55``) — as one artifact with a
    *symbolic* time axis.  The artifact signature is::

        (video (Tp, sh, sw) f32, behavior (2, Tp) f32,
         pupil_center (2, Tp) f32, length () i32) -> (N, Tp) f32

    where ``Tp = length_bucket * k`` is any multiple of the predictor's
    length bucket ≥ the true trial ``length`` (callers zero-pad the time
    axis and slice the result to ``[:, :length]``).  Windows/blend masks
    are derived *inside* the program from ``length``, so serving needs no
    model code and no host-side window logic.  ``src_hw`` fixes the raw
    video frame size (competition geometry 36x64); frames are centered on
    the model canvas exactly like ``StackInputsProcessor``.

    A ``Predictor(mesh=...)`` exports a *multi-device* serving artifact:
    each chunk's window forwards are sharded over the mesh's ``data``
    axis (GSPMD inserts the collectives), inputs/outputs stay replicated,
    and the artifact must be loaded on the same device count.
    """
    from sensorium_tpu.infer.predictor import assemble_trial_stack

    model = predictor.model
    nn = model.nn_module
    gen = predictor.indexes_generator
    chunk = predictor.chunk_size
    bucket = predictor.length_bucket
    if chunk < 1 or bucket < 1:
        raise ValueError(
            f"chunk_size ({chunk}) and length_bucket ({bucket}) must be positive"
        )
    if bucket % chunk:
        raise ValueError(
            f"length_bucket {bucket} must be a multiple of chunk_size "
            f"{chunk} for a symbolic-length export"
        )
    proc = predictor.inputs_processor
    width, height = proc.size
    fill = proc.pad_fill_value
    src_h, src_w = src_hw
    if src_h > height or src_w > width:
        raise ValueError(
            f"src_hw {src_hw} exceeds the model canvas ({height}x{width})"
        )
    params, batch_stats = jax.device_get(
        (model.state.eval_params, model.state.eval_batch_stats)
    )

    # chunk % data-axis divisibility is enforced by Predictor.__init__
    # (the only way a mesh reaches here), so it is not re-checked.
    mesh = predictor.mesh

    def run(video, behavior, pupil_center, length):
        padded_len = video.shape[0]
        trial_inputs = assemble_trial_stack(
            video, behavior, pupil_center, height, width, fill
        )
        # One anchor per padded frame; rows past the true anchor range
        # carry zero weight (same blend math as Predictor.predict_trial,
        # which pads with repeated windows instead — both contribute 0).
        anchors = gen.behind + jnp.arange(padded_len, dtype=jnp.int32)
        valid = (anchors < length - gen.ahead).astype(jnp.float32)
        offsets = jnp.arange(
            -gen.behind, gen.ahead + 1, gen.step, dtype=jnp.int32
        )
        windows = jnp.clip(anchors[:, None] + offsets[None, :], 0, padded_len - 1)
        windows = windows.reshape(-1, chunk, gen.size)
        valid = valid.reshape(-1, chunk)
        if mesh is not None:
            # Spread each chunk's window forwards over ALL data-like axes —
            # same layout as the live sharded predictor (_jit_kwargs).  A
            # hybrid (replica, data, model) mesh must shard over both
            # batch axes, or every replica slice would redundantly
            # recompute identical window forwards.
            batch_axes = mesh_lib.data_axes(mesh)
            windows = jax.lax.with_sharding_constraint(
                windows, NamedSharding(mesh, PartitionSpec(None, batch_axes, None))
            )
            valid = jax.lax.with_sharding_constraint(
                valid, NamedSharding(mesh, PartitionSpec(None, batch_axes))
            )
        return predictor._scan_windows(
            trial_inputs, params, batch_stats, windows, valid, mouse_index
        )

    jit_kwargs = {}
    if mesh is not None:
        rep = NamedSharding(mesh, PartitionSpec())
        jit_kwargs = dict(in_shardings=(rep,) * 4, out_shardings=rep)

    (k,) = jax_export.symbolic_shape("k")
    padded = bucket * k
    specs = (
        jax.ShapeDtypeStruct((padded, src_h, src_w), jnp.float32),
        jax.ShapeDtypeStruct((2, padded), jnp.float32),
        jax.ShapeDtypeStruct((2, padded), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    with _dot_lowering_for(platforms):
        return jax_export.export(
            jax.jit(run, **jit_kwargs), platforms=tuple(platforms)
        )(*specs)


def save_exported(path: Path | str, data) -> Path:
    """Atomic write of an artifact (``Exported`` or already-serialized bytes)."""
    if not isinstance(data, (bytes, bytearray)):
        data = data.serialize()
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)
    return path


def load_exported(path: Path | str):
    """Deserialize an exported artifact; run it with ``.call(inputs)``.

    This needs only jax — no model code or checkpoint — on any backend in
    ``.platforms``.
    """
    return jax_export.deserialize(Path(path).read_bytes())


def export_model_file(
    model_path: Path | str,
    out_path: Path | str | None = None,
    mouse_index: int | None = None,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
    trial: bool = False,
    src_hw: tuple[int, int] = (36, 64),
    chunk_size: int = 32,
    length_bucket: int = 64,
    blend_weights: str = "ones",
    mesh_data: int = 0,
) -> dict:
    """Checkpoint file -> serving artifact file.  Returns a summary dict.

    ``trial=False`` exports the window forward (:func:`export_forward`);
    ``trial=True`` exports the whole-trial sliding-window program
    (:func:`export_trial`, requires ``mouse_index``).  ``mesh_data >= 2``
    exports a multi-device trial artifact sharded over an N-way ``data``
    mesh (requires N local devices now and at serving time); 0 or 1 means
    a single-device artifact, negatives raise.
    """
    from sensorium_tpu.engine.model import load_model

    model_path = Path(model_path)
    if mesh_data < 0 or mesh_data == 1:
        # 1 is rejected (not treated as no-mesh) so the API agrees with the
        # CLI and a caller expecting a 1-device mesh artifact hears about it.
        raise ValueError(f"mesh_data must be 0 (no mesh) or >= 2, got {mesh_data}")
    if mesh_data > 1 and not trial:
        raise ValueError(
            "mesh_data applies to trial exports only (trial=True); the "
            "window-forward artifact is single-device"
        )
    if trial:
        if mouse_index is None:
            raise ValueError("trial export requires a mouse_index")
        from sensorium_tpu.infer.predictor import Predictor

        mesh = None
        if mesh_data:
            if len(jax.devices()) < mesh_data:
                raise ValueError(
                    f"mesh_data={mesh_data} needs {mesh_data} local devices "
                    f"to lower the sharded program; only "
                    f"{len(jax.devices())} are visible on this host"
                )
            from sensorium_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(num_data=mesh_data)
        predictor = Predictor(
            model_path,
            blend_weights=blend_weights,
            chunk_size=chunk_size,
            length_bucket=length_bucket,
            mesh=mesh,
        )
        exported = export_trial(
            predictor, mouse_index, src_hw=src_hw, platforms=platforms
        )
        kind = f".mouse{mouse_index}.trial"
    else:
        model = load_model(model_path)
        exported = export_forward(
            model, mouse_index=mouse_index, platforms=platforms
        )
        kind = "" if mouse_index is None else f".mouse{mouse_index}"
    if out_path is None:
        out_path = model_path.with_suffix(kind + EXPORT_SUFFIX)
    data = exported.serialize()
    save_exported(out_path, data)
    return {
        "artifact": str(out_path),
        "bytes": len(data),
        "platforms": list(exported.platforms),
        "mouse_index": mouse_index,
        "trial": trial,
        "nr_devices": getattr(exported, "nr_devices", 1),
        "input_shapes": [[str(d) for d in a.shape] for a in exported.in_avals],
        "output_shape": [str(d) for d in exported.out_avals[0].shape],
    }


def _resolve_dim(dim, value: int) -> int:
    """Concretize one aval dimension: digits stay, every symbolic variable
    in a dim expression (``b``, ``64*k``, ...) is substituted with
    ``value``."""
    import re

    text = str(dim)
    if text.isdigit():
        return int(text)
    if len(text) > 64 or "**" in text or not re.fullmatch(r"[\w\s()*+-]+", text):
        raise ValueError(f"unsupported symbolic dim {text!r}")
    names = {name: value for name in re.findall(r"[A-Za-z_]\w*", text)}
    return int(eval(text, {"__builtins__": {}}, names))  # noqa: S307


def check_artifact(path: Path | str, batch: int = 1) -> dict:
    """Smoke-run an artifact on the current backend with a zeros batch.

    Handles both artifact layouts this module produces: the window
    forward (one array input, symbolic batch -> ``batch``) and the trial
    program (three arrays + a scalar length, symbolic time -> ``batch``
    buckets; the length is set to the padded time axis).  Returns output
    stats; raises if the backend is not in the artifact's platform list
    or shapes fail to resolve.
    """
    exported = load_exported(path)
    args = []
    lead_dim = None
    for aval in exported.in_avals:
        shape = tuple(_resolve_dim(d, batch) for d in aval.shape)
        if shape == () and np.issubdtype(aval.dtype, np.integer):
            # The trial artifact's true-length scalar: use the padded length.
            args.append(np.asarray(lead_dim if lead_dim else batch, aval.dtype))
            continue
        if lead_dim is None and shape:
            lead_dim = shape[0]
        args.append(np.zeros(shape, aval.dtype))
    nr_devices = getattr(exported, "nr_devices", 1)
    if nr_devices > 1:
        # Multi-device artifact: replicate the (replicated-spec) inputs
        # over the first nr_devices local devices.
        devices = jax.devices()
        if len(devices) < nr_devices:
            raise ValueError(
                f"artifact was exported for {nr_devices} devices; only "
                f"{len(devices)} are visible on this host"
            )
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(devices[:nr_devices]), ("data",))
        rep = NamedSharding(mesh, PartitionSpec())
        args = [jax.device_put(a, rep) for a in args]
    out = np.asarray(exported.call(*args))
    return {
        "input_shape": list(np.shape(args[0])),
        "output_shape": list(out.shape),
        "finite": bool(np.isfinite(out).all()),
        "min": float(out.min()),
        "max": float(out.max()),
    }
