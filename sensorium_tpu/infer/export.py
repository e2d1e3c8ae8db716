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

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

EXPORT_SUFFIX = ".stablehlo"


def export_forward(
    model,
    mouse_index: int | None = None,
    frames: int | None = None,
    height: int | None = None,
    width: int | None = None,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
) -> bytes:
    """Serialize the eval-mode forward of a ``MouseModel`` to StableHLO.

    ``mouse_index=None`` exports the all-mice forward
    ``(b, C, T, H, W) -> (M, b, N_max, T)``; an int exports that mouse's
    head ``(b, C, T, H, W) -> (b, N_m, T)``.  The batch dim ``b`` is
    symbolic.  ``frames``/``height``/``width`` default to the model
    config's frame-stack size and input-processor canvas.
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
        size = proc_kwargs["size"]
        height = height if height is not None else int(size[0])
        width = width if width is not None else int(size[1])

    def forward(inputs):
        return nn.apply(
            variables, inputs, mouse_index=mouse_index, train=False
        ).astype(jnp.float32)

    (batch,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct(
        (batch, nn.in_channels, frames, height, width), jnp.float32
    )
    exported = jax_export.export(jax.jit(forward), platforms=tuple(platforms))(spec)
    return exported.serialize()


def save_exported(path: Path | str, data: bytes) -> Path:
    """Atomic write of a serialized artifact."""
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
) -> dict:
    """Checkpoint file -> serving artifact file.  Returns a summary dict."""
    from sensorium_tpu.engine.model import load_model

    model_path = Path(model_path)
    model = load_model(model_path)
    data = export_forward(model, mouse_index=mouse_index, platforms=platforms)
    if out_path is None:
        suffix = "" if mouse_index is None else f".mouse{mouse_index}"
        out_path = model_path.with_suffix(suffix + EXPORT_SUFFIX)
    save_exported(out_path, data)
    exported = jax_export.deserialize(data)
    return {
        "artifact": str(out_path),
        "bytes": len(data),
        "platforms": list(exported.platforms),
        "mouse_index": mouse_index,
        "input_shape": [str(d) for d in exported.in_avals[0].shape],
        "output_shape": [str(d) for d in exported.out_avals[0].shape],
    }


def check_artifact(path: Path | str, batch: int = 1) -> dict:
    """Smoke-run an artifact on the current backend with a zeros batch.

    Returns output stats; raises if the backend is not in the artifact's
    platform list or shapes fail to resolve.
    """
    exported = load_exported(path)
    # Symbolic dims (the batch) print as names; concrete dims as digits.
    shape = tuple(
        int(d) if str(d).isdigit() else batch for d in exported.in_avals[0].shape
    )
    out = exported.call(np.zeros(shape, np.float32))
    out = np.asarray(out)
    return {
        "input_shape": list(shape),
        "output_shape": list(out.shape),
        "finite": bool(np.isfinite(out).all()),
        "min": float(out.min()),
        "max": float(out.max()),
    }
