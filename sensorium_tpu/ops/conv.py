"""Convolution primitives, lowered the TPU way.

The DwiseNeuro core factorizes every 3-D conv into pointwise (1x1x1),
spatial depthwise (1,k,k), and temporal depthwise (k,1,1) pieces
(reference: ``/root/reference/src/models/dwiseneuro.py:89-123``).  On TPU:

* pointwise convs are plain matmuls over the channel (lane) axis — they go
  straight to the MXU via ``dot_general``;
* depthwise convs carry negligible FLOPs and are HBM-bandwidth-bound.
  FIVE lowerings were measured on TPU v5e at the flagship training shapes
  (tools/dwbench.py; block1 fwd chain ms): XLA grouped 3-D conv **6.1**
  (default), true-2D conv over (B*T) batch 8.2, XLA-fused shifted
  multiply-adds 10.0, Pallas tap kernels 8.5 (ops/pallas_dw.py, opt-in via
  SENSORIUM_DW_IMPL=pallas), Pallas with fused BN+SiLU prologue 12.1
  (ops/pallas_fused.py).  The XLA conv emitter wins at every block shape
  AND runs near the realized roofline: the round-2 train-step trace
  (docs/PERF.md "Per-op realized bandwidth") clocks the fused
  spatial-dw+BN-stats op at 593 GB/s of logical bytes — 87% of the best
  bandwidth observed anywhere in the step (680 GB/s) — so there is no
  meaningful dw-conv codegen headroom left; an earlier ~30-50%-of-roofline
  estimate here was measured before XLA's stats/epilogue fusion landed in
  the step and is retracted;
* grouped 1x1 convs (cortex / readouts) are block-diagonal matmuls,
  expressed as an einsum with an explicit group axis.

All tensors are channels-last: 3-D data is (B, T, H, W, C), 1-D data is
(B, T, C).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp

# Trace-time flag: lower bf16 dots so every platform of a multi-platform
# export can execute them (see ``portable_dots``).  A ContextVar so an
# in-flight export on one thread cannot leak the portable lowering into
# jit traces happening concurrently on other threads.
_PORTABLE_DOTS = contextvars.ContextVar("sensorium_portable_dots", default=False)


@contextlib.contextmanager
def portable_dots():
    """Trace bf16 dots in a form every export platform can execute.

    ``accum_dtype`` normally keys off the *ambient* backend, which is wrong
    for ``jax.export`` artifacts that declare several platforms: a program
    traced on a TPU host with ``platforms=("tpu", "cpu")`` would bake
    BF16xBF16=F32 dots that XLA:CPU cannot execute (grouped/batched dots
    hit the DotThunk limitation).  Inside this context bf16 dots lower
    portably instead: castback sites (``pointwise``/``grouped_pointwise``,
    which round to bf16 immediately) use operand-dtype accumulation, and
    f32-consuming sites (the readout einsums) upcast their bf16 operands —
    bit-equivalent math either way, since bf16 embeds exactly in f32 and
    the MXU accumulates in f32 regardless.

    NOTE: only wrap *fresh* traces (as ``jax.export.export`` does).  Any
    unrelated ``jax.jit`` function first traced while this context is
    active would cache the portable lowering for the process lifetime.
    """
    token = _PORTABLE_DOTS.set(True)
    try:
        yield
    finally:
        _PORTABLE_DOTS.reset(token)


def _portable_backend(x: jax.Array) -> bool:
    return x.dtype == jnp.bfloat16 and (
        _PORTABLE_DOTS.get() or jax.default_backend() == "cpu"
    )


def accum_dtype(x: jax.Array):
    """MXU dots accumulate bf16 operands in fp32 (``preferred_element_type``).

    The CPU backend (tests, virtual-mesh dryruns) cannot *execute* mixed
    bf16-operand batched/grouped dots with F32 accumulation (XLA:CPU
    DotThunk limitation), so there we fall back to operand-dtype
    accumulation — XLA:CPU upcasts bf16 internally anyway, and every
    caller immediately casts the result back to the operand dtype, so the
    fallback is numerics-neutral.  ``portable_dots`` forces it at trace
    time for multi-platform exports.
    """
    if _portable_backend(x):
        return None
    # promote, don't pin: f32 for bf16/f32 operands (the production
    # policy), but f64 operands keep f64 accumulation so float64
    # diagnostics (e.g. semantic-gradient comparisons vs torch.double)
    # measure the math, not a hidden downcast.
    return jnp.promote_types(jnp.float32, x.dtype)


def einsum_f32(spec: str, *operands: jax.Array) -> jax.Array:
    """Einsum whose f32 accumulation survives every backend.

    For dots whose f32 result is CONSUMED at full precision (the readout
    logits feeding softplus), operand-dtype fallback would change the
    numbers.  Instead, where BF16xBF16=F32 grouped dots cannot execute
    (XLA:CPU, portable exports), the bf16 operands are upcast to f32 —
    bit-equivalent: bf16 embeds exactly in f32, multiplies of
    bf16-representable values are exact in f32, and the accumulation is
    f32 either way.
    """
    x = operands[0]
    acc = jnp.promote_types(jnp.float32, x.dtype)
    if _portable_backend(x):
        return jnp.einsum(spec, *(o.astype(acc) for o in operands))
    return jnp.einsum(spec, *operands, preferred_element_type=acc)


def pointwise(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """1x1 conv over the trailing channel axis: (..., Cin) @ (Cin, Cout).

    Accumulation policy comes from ``accum_dtype`` alone (no per-call
    override): one authoritative path keeps the CPU/export fallback
    semantics in a single place.
    """
    return jax.lax.dot_general(
        x,
        kernel,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=accum_dtype(x),
    ).astype(x.dtype)


def grouped_pointwise(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Grouped 1x1 conv as a block-diagonal matmul.

    x: (..., Cin), kernel: (G, Cin // G, Cout // G)  ->  (..., Cout)
    Group g of the output reads only group g of the input.
    """
    groups, cin_g, cout_g = kernel.shape
    xg = x.reshape(x.shape[:-1] + (groups, cin_g))
    yg = jnp.einsum("...gc,gcd->...gd", xg, kernel, preferred_element_type=accum_dtype(x))
    return yg.reshape(x.shape[:-1] + (groups * cout_g,)).astype(x.dtype)


def _dw_implementation() -> str:
    """Depthwise-conv backend: 'xla' by default, 'pallas' opt-in.

    Measured on TPU v5e at the flagship training shapes (batch-32 fwd+bwd,
    see bench.py): the XLA grouped-conv lowering sustains ~98 clips/s vs
    ~49 clips/s for the Pallas kernels — XLA fuses the surrounding
    BN/SiLU elementwise work into the conv while the Pallas path pays for
    the parity-split materialization and per-slab grid overhead.  The
    measured winner is the default; override with SENSORIUM_DW_IMPL=
    pallas|xla (tests force interpret-mode pallas on CPU to validate the
    kernels without hardware).
    """
    import os

    return os.environ.get("SENSORIUM_DW_IMPL", "xla")


# Channels-last (B, T, H, W, C) data; grouped kernel (kt, kh, kw, 1, C).
_DW_DIMENSION_NUMBERS = jax.lax.ConvDimensionNumbers(
    lhs_spec=(0, 4, 1, 2, 3),  # N, C, (T, H, W)
    rhs_spec=(4, 3, 0, 1, 2),  # O, I, (T, H, W)
    out_spec=(0, 4, 1, 2, 3),
)


def _dw_spatial_raw(x: jax.Array, kernel: jax.Array, stride: int) -> jax.Array:
    k = kernel.shape[0]
    pad = k // 2
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        kernel.reshape(1, k, k, 1, c).astype(x.dtype),
        window_strides=(1, stride, stride),
        padding=((0, 0), (pad, pad), (pad, pad)),
        dimension_numbers=_DW_DIMENSION_NUMBERS,
        feature_group_count=c,
        # No preferred_element_type=f32: the conv transpose (VJP) rule
        # requires uniform operand dtypes, and XLA TPU conv lowering
        # already accumulates bf16 operands in fp32 internally.
    )


# The mesh whose data axes the dw-conv WEIGHT gradient must psum over.
# jax 0.9.0's partitioner (GSPMD and Shardy alike) computes the wgrad of a
# ``feature_group_count`` conv — a ``batch_group_count`` conv — WRONG on
# multi-axis meshes: the result comes back multiplied by the extent of
# mesh axes the operands are not even sharded over (measured exactly 4x on
# a (data=2, model=4) mesh; repro pinned in tests/test_parallel.py
# ``TestDwWgradPartitioning``).  The engine's train step declares its mesh
# here (``dw_sharded_mesh``), and the custom VJP below then computes the
# wgrad inside a shard_map MANUAL region — per-shard XLA wgrad conv (same
# fused kernel as single-device) + an explicit psum over the batch axes —
# bypassing the partitioner entirely.  ContextVar: trace-time scoping,
# concurrent traces can't leak each other's mesh.
_DW_WGRAD_MESH = contextvars.ContextVar("sensorium_dw_wgrad_mesh", default=None)


@contextlib.contextmanager
def dw_sharded_mesh(mesh, batch_axes: tuple[str, ...]):
    """Trace-time declaration: inputs of dw convs are batch-sharded over
    ``batch_axes`` of ``mesh``.  Wrap TRACES of training steps that run on
    a multi-axis mesh (the engine does this automatically)."""
    token = _DW_WGRAD_MESH.set((mesh, tuple(batch_axes)))
    try:
        yield
    finally:
        _DW_WGRAD_MESH.reset(token)


def _kernel_transpose(raw_fn, kernel, g):
    """XLA's own fused wgrad conv via the linearity of conv in the kernel
    (linear_transpose, not jax.vjp — vjp would re-EXECUTE the forward just
    to build residuals: +1 conv and +113 MB over the flagship HBM budget,
    measured)."""
    (dw,) = jax.linear_transpose(
        raw_fn, jax.ShapeDtypeStruct(kernel.shape, kernel.dtype)
    )(g)
    return dw


def _dw_wgrad(raw_in_kernel, x_ndim, kernel, x, g):
    """Depthwise kernel gradient, partitioner-bug-safe (see _DW_WGRAD_MESH).

    ``raw_in_kernel(x, kernel)`` must be the raw conv, linear in kernel.
    """
    ctx = _DW_WGRAD_MESH.get()
    if ctx is None or len(ctx[0].shape) < 2:
        # Single-device / single-axis meshes: the built-in wgrad is correct.
        return _kernel_transpose(lambda kk: raw_in_kernel(x, kk), kernel, g)
    mesh, batch_axes = ctx
    from jax.sharding import PartitionSpec
    from jax.experimental.shard_map import shard_map

    batched = PartitionSpec(batch_axes, *([None] * (x_ndim - 1)))

    def local_wgrad(xl, gl):
        dw = _kernel_transpose(lambda kk: raw_in_kernel(xl, kk), kernel, gl)
        return jax.lax.psum(dw, batch_axes)

    return shard_map(
        local_wgrad,
        mesh=mesh,
        in_specs=(batched, batched),
        out_specs=PartitionSpec(),
        check_rep=False,
    )(x, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw_spatial(x: jax.Array, kernel: jax.Array, stride: int) -> jax.Array:
    return _dw_spatial_raw(x, kernel, stride)


def _dw_spatial_fwd(x, kernel, stride):
    return _dw_spatial_raw(x, kernel, stride), (x, kernel)


def _dw_spatial_bwd(stride, residuals, g):
    x, kernel = residuals
    # dx through the conv's own transpose: its input-gradient partitioning
    # is correct (only the WEIGHT gradient over-reduces).
    (dx,) = jax.linear_transpose(
        lambda x_: _dw_spatial_raw(x_, kernel, stride),
        jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(g)
    dw = _dw_wgrad(
        lambda xx, kk: _dw_spatial_raw(xx, kk, stride), x.ndim, kernel, x, g
    )
    return dx, dw


_dw_spatial.defvjp(_dw_spatial_fwd, _dw_spatial_bwd)


def depthwise_conv_spatial(x: jax.Array, kernel: jax.Array, stride: int = 1) -> jax.Array:
    """Depthwise (1, k, k) conv over (H, W) with 'same' torch padding.

    x: (B, T, H, W, C), kernel: (k, k, C).  Output spatial size is
    floor((S + 2*(k//2) - k)/stride) + 1, matching torch Conv3d.

    Forward: one ``conv_general_dilated`` with ``feature_group_count=C``.
    Backward: custom VJP — the conv's own transpose for dx, an explicit
    tap-reduce for dw (the partitioner's built-in wgrad is WRONG on
    multi-axis meshes; see ``_dw_spatial_wgrad``).  (An unrolled
    shifted-add FORWARD was also measured and rejected: its transpose
    materializes k*k separately-padded copies of the expanded activation,
    which blows HBM at the training batch size.)
    """
    if _dw_implementation() == "pallas":
        from sensorium_tpu.ops.pallas_dw import dw_spatial

        return dw_spatial(x, kernel.astype(x.dtype), stride)
    return _dw_spatial(x, kernel, stride)


def _dw_temporal_raw(x: jax.Array, kernel: jax.Array) -> jax.Array:
    k = kernel.shape[0]
    pad = k // 2
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        kernel.reshape(k, 1, 1, 1, c).astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=((pad, pad), (0, 0), (0, 0)),
        dimension_numbers=_DW_DIMENSION_NUMBERS,
        feature_group_count=c,
    )


@jax.custom_vjp
def _dw_temporal(x: jax.Array, kernel: jax.Array) -> jax.Array:
    return _dw_temporal_raw(x, kernel)


def _dw_temporal_fwd(x, kernel):
    return _dw_temporal_raw(x, kernel), (x, kernel)


def _dw_temporal_bwd(residuals, g):
    x, kernel = residuals
    (dx,) = jax.linear_transpose(
        lambda x_: _dw_temporal_raw(x_, kernel),
        jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(g)
    dw = _dw_wgrad(_dw_temporal_raw, x.ndim, kernel, x, g)
    return dx, dw


_dw_temporal.defvjp(_dw_temporal_fwd, _dw_temporal_bwd)


def depthwise_conv_temporal(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise (k, 1, 1) conv over T with 'same' torch padding.

    x: (B, T, H, W, C), kernel: (k, C).  Backward mirrors
    ``depthwise_conv_spatial``: conv transpose for dx, explicit tap-reduce
    for dw (partitioner wgrad bug — see ``_dw_spatial_wgrad``).
    """
    if _dw_implementation() == "pallas":
        from sensorium_tpu.ops.pallas_dw import dw_temporal

        return dw_temporal(x, kernel.astype(x.dtype))
    return _dw_temporal(x, kernel)
