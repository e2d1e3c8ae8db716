"""Device-mesh and sharding helpers.

The reference is single-GPU (``device: "cuda:0"`` — SURVEY.md §2.11); the
TPU framework scales through a ``jax.sharding.Mesh`` instead:

* ``data`` axis — batch-sharded data parallelism (default over a v5e-8
  slice).  Parameters are replicated; GSPMD turns every global-batch
  reduction (BN moments, loss, gradients) into ICI collectives, so
  "true batch" BN semantics (global batch 32) survive sharding;
* ``model`` axis — optional tensor parallelism: the cortex channel dims
  and the stacked per-mouse readout ``(M, G, C/G, P)`` shard over it.

The helpers below are layout policy in one place, so the engine and the
benchmarks do not hand-roll shardings.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def create_mesh(
    num_data: int | None = None, num_model: int = 1, devices=None
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    auto_data = num_data is None
    if auto_data:
        num_data = len(devices) // num_model
    # Same contract as create_hybrid_mesh: a non-factoring AUTO mesh (e.g.
    # num_model=3 on 8 chips) must be a loud error, not a silent 6-chip
    # mesh training at 75% of the machine.  An EXPLICIT smaller num_data
    # is a deliberate subset (the export CLI lowers k-device programs on
    # larger hosts); asking for more than exists is always an error.
    if num_data * num_model > len(devices) or (
        auto_data and num_data * num_model != len(devices)
    ):
        raise ValueError(
            f"mesh {num_data}x{num_model} (data x model) does not fit the "
            f"{len(devices)} available devices; pick factors of the slice"
        )
    devices = np.asarray(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(devices, axis_names=("data", "model"))


def create_hybrid_mesh(
    num_slices: int | None = None,
    num_data: int | None = None,
    num_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(replica, data, model)`` mesh spanning multiple ICI slices.

    Multi-slice (multi-pod-slice) topologies connect chips WITHIN a slice by
    ICI and slices to each other by DCN — orders of magnitude apart in
    bandwidth.  The layout policy here keeps every high-traffic collective on
    ICI: ``data`` (per-step gradient/BN psums) and ``model`` (per-layer TP
    collectives) are intra-slice axes, while ``replica`` — crossing DCN —
    only carries the once-per-step gradient all-reduce between slices, which
    GSPMD lowers hierarchically (reduce-scatter on ICI, small all-reduce on
    DCN, all-gather on ICI).

    On real multi-slice metal, ``mesh_utils.create_hybrid_device_mesh``
    orders devices so the outer axis truly maps to slice boundaries
    (``slice_index``); elsewhere (CPU tests, single slice) a slice-major
    reshape provides the same logical mesh.

    ``num_slices=None`` auto-detects from device ``slice_index`` attributes
    (1 when absent).  Batch-DP shards over ``replica`` AND ``data`` jointly
    (see ``data_axes``); parameters replicate across ``replica``.
    """
    if devices is None:
        devices = jax.devices()
    if num_slices is None:
        num_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if len(devices) % (num_slices * num_model):
        raise ValueError(
            f"{len(devices)} devices do not factor into "
            f"slices={num_slices} x model={num_model} (per-slice device "
            f"count {len(devices) / num_slices:g} must be a multiple of "
            f"num_model)"
        )
    if num_data is None:
        num_data = len(devices) // (num_slices * num_model)
    shape = (num_slices, num_data, num_model)
    n = num_slices * num_data * num_model
    if n != len(devices):
        # Silently training on a subset of the machine is never intended.
        raise ValueError(
            f"mesh {shape} covers {n} devices but {len(devices)} are present"
        )
    if any(hasattr(d, "slice_index") for d in devices):
        # Real multi-slice metal: device order must follow slice granules so
        # the outer axis truly crosses DCN.  A failure here is a genuine
        # topology/config error — propagate it, never fall back to an
        # enumeration-order reshape that would silently route the per-step
        # data-axis collectives over DCN.
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            (1, num_data, num_model), (num_slices, 1, 1), devices=devices
        )
    else:
        # No slice_index granules (CPU tests / single slice): slice-major
        # reshape yields the identical logical mesh.
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(np.asarray(dev_array).reshape(shape), axis_names=("replica", "data", "model"))


def data_axes(mesh: Mesh) -> tuple[str, ...]:
    """The mesh axes the batch dimension shards over."""
    return tuple(ax for ax in ("replica", "data") if ax in mesh.axis_names)


def data_extent(mesh: Mesh) -> int:
    """Total batch-sharding ways (product of the data-like axis sizes)."""
    extent = 1
    for ax in data_axes(mesh):
        extent *= mesh.shape[ax]
    return extent


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data-like mesh axes."""
    return NamedSharding(mesh, PartitionSpec(data_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh: Mesh | None, *arrays):
    """Device-put arrays batch-sharded (replicated scalars pass through).

    Multi-process (``jax.distributed``) meshes: every process must pass the
    identical GLOBAL batch (the seeded datasets/loaders are deterministic,
    so all hosts compute the same arrays); each process then contributes
    only the shards living on its local devices.
    """
    if mesh is None:
        return jax.device_put(arrays)
    sharding = batch_sharding(mesh)
    rep = replicated(mesh)

    def _sharding_for(a):
        # A rank-1 PartitionSpec cannot apply to a 0-d value — scalars
        # (e.g. a loss weight) replicate instead, as documented above.
        # np.ndim covers plain Python numbers too (no .ndim attribute).
        return rep if np.ndim(a) == 0 else sharding

    if jax.process_count() > 1:
        # np.asarray first: make_array_from_callback needs .shape and
        # __getitem__, which plain Python scalars lack (a 0-d np array
        # indexes fine with the replicated sharding's empty index).
        np_arrays = tuple(np.asarray(a) for a in arrays)
        return tuple(
            jax.make_array_from_callback(
                a.shape, _sharding_for(a), lambda idx, a=a: a[idx]
            )
            for a in np_arrays
        )
    return tuple(jax.device_put(a, _sharding_for(a)) for a in arrays)


def replicate_tree(mesh: Mesh | None, tree):
    if mesh is None:
        return tree
    return jax.device_put(tree, replicated(mesh))


def param_sharding_rules(mesh: Mesh):
    """PartitionSpec rules for tensor-parallel parameter layout.

    Shards the dominant parameter mass — the stacked readout kernel
    ``(M, G, C/G, P)`` on its padded-output axis and the cortex grouped-conv
    kernels ``(G, Cin/G, Cout/G)`` on their output axis — over ``model``.
    Everything else is replicated.  Used by ``shard_params``.
    """

    def spec_for(path: tuple[str, ...], value) -> PartitionSpec:
        name = "/".join(path)
        if "readout_kernel" in name:
            return PartitionSpec(None, None, None, "model")
        if "readout_bias" in name:
            return PartitionSpec(None, None, "model")
        if "cortex" in name and name.endswith("kernel") and value.ndim == 3:
            return PartitionSpec(None, None, "model")
        return PartitionSpec()

    return spec_for


def shard_params(mesh: Mesh | None, params, tensor_parallel: bool = False):
    """Place a parameter tree on the mesh (replicated or TP-sharded)."""
    if mesh is None:
        return params
    if not tensor_parallel or mesh.shape.get("model", 1) == 1:
        return jax.device_put(params, replicated(mesh))
    spec_for = param_sharding_rules(mesh)

    def place(path, value):
        path_names = tuple(getattr(p, "key", str(p)) for p in path)
        return jax.device_put(value, NamedSharding(mesh, spec_for(path_names, value)))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_state(mesh: Mesh | None, state, tensor_parallel: bool = False):
    """Place a ``TrainState`` on the mesh.

    Replicated by default (batch DP).  With ``tensor_parallel`` every
    parameter-shaped tree — live params, EMA params, and the optimizer
    moments (which mirror the param tree, so ``param_sharding_rules``
    matches their leaf paths too) — shards its readout/cortex mass over
    the ``model`` axis; BN statistics, step and RNG stay replicated.
    ``mesh=None`` passes the state through untouched.
    """
    if mesh is None:
        return state
    if not tensor_parallel or mesh.shape.get("model", 1) == 1:
        return jax.device_put(state, replicated(mesh))

    def tp(tree):
        return shard_params(mesh, tree, tensor_parallel=True)

    return state.replace(
        step=jax.device_put(state.step, replicated(mesh)),
        params=tp(state.params),
        batch_stats=replicate_tree(mesh, state.batch_stats),
        opt_state=tp(state.opt_state),
        ema_params=tp(state.ema_params),
        ema_batch_stats=replicate_tree(mesh, state.ema_batch_stats),
        rng=jax.device_put(state.rng, replicated(mesh)),
    )
