"""Model registry keyed by the config names used in experiment files."""

from __future__ import annotations

from sensorium_tpu.models.dwiseneuro import DwiseNeuro

_NN_MODULES = {
    "dwiseneuro": DwiseNeuro,
}


def get_nn_module(name: str, module_params: dict):
    if name not in _NN_MODULES:
        raise KeyError(f"Unknown nn module '{name}'")
    params = dict(module_params)
    for key in ("readout_outputs", "core_features", "spatial_strides", "cortex_features"):
        if key in params:
            params[key] = tuple(params[key])
    # remat_blocks may be an int (first-k) or a block-index sequence; JSON
    # roundtrips sequences as lists, and flax module fields must be hashable.
    if isinstance(params.get("remat_blocks"), list):
        params["remat_blocks"] = tuple(params["remat_blocks"])
    if isinstance(params.get("dtype"), str):
        import jax.numpy as jnp

        params["dtype"] = jnp.dtype(params["dtype"])
    return _NN_MODULES[name](**params)
