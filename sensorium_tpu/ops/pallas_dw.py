"""Pallas TPU kernels for the depthwise convolutions of the DwiseNeuro core.

The (2+1)D factorized depthwise convs (reference:
``/root/reference/src/models/dwiseneuro.py:89-123``) carry almost no FLOPs.
These kernels stream each (batch, frame) slab HBM -> VMEM once and apply
the k (or k*k) taps as VPU multiply-adds.

Measured verdict (TPU v5e, flagship batch-32 training step, bench.py):
the XLA ``conv_general_dilated`` lowering wins (~98 vs ~49 clips/s) —
XLA fuses the adjacent BN/SiLU elementwise work into the conv, while this
path pays for the stride-2 parity-split materialization and per-slab grid
overhead.  The kernels are kept as a correct, parity-tested alternative
(``SENSORIUM_DW_IMPL=pallas``) and as the substrate for future fused
(conv+BN+SiLU) epilogues.

Layout: channels-last ``(B, T, H, W, C)``; C rides the 128-wide lane axis.

Gradients are custom VJPs built from the same kernels:
* d/dx of a stride-s conv is the stride-1 conv of the (interior-dilated,
  edge-padded) cotangent with the flipped taps — so the forward kernel is
  reused for the backward data pass (one materialized buffer, unlike the
  unrolled shifted-add formulation whose transpose pads k*k copies);
* d/dw accumulates tap-by-tap reductions over the grid, sequentially into
  a (k*k, C) output block that stays resident in VMEM across grid steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Set to True (e.g. from tests) to run all kernels in interpreter mode.
INTERPRET = False

# Channel tile for the spatial kernels: C rides the 128-wide lane axis, and
# tiling the grid over channel blocks keeps each slab's VMEM working set
# (input block + fp32 accumulator + output block, double-buffered) under the
# ~16 MB scoped-vmem limit at the flagship's widest block (448 channels at
# 64x64 -> 22 MB untiled).  Channels are independent in a depthwise conv, so
# boundary-padding lanes (for C % 128 != 0) never mix into real lanes.
_CHANNEL_TILE = 128


def _ct(c: int) -> tuple[int, int]:
    """(tile, num_tiles) for a channel count."""
    tile = min(c, _CHANNEL_TILE)
    return tile, -(-c // tile)


# --------------------------------------------------------------- spatial fwd


def _dw_spatial_kernel(x_ref, w_ref, out_ref, *, k: int):
    """One (b, t) slab: stride-1 valid conv of (Hp, Wp, C) with (k, k, C).

    The W (sublane) shifts are hoisted: k shifted copies are materialized
    once, then the H taps index the (untiled) H axis for free — k sublane
    rotations total instead of k*k.
    """
    x = x_ref[0]  # (Hp, Wp, C)
    hp, c = x.shape[0], x.shape[-1]
    oh, ow = out_ref.shape[1], out_ref.shape[2]
    cols = [
        jax.lax.slice(x, (0, dj, 0), (hp, dj + ow, c)).astype(jnp.float32)
        for dj in range(k)
    ]
    acc = jnp.zeros((oh, ow, c), jnp.float32)
    for di in range(k):
        for dj in range(k):
            tap = jax.lax.slice(cols[dj], (di, 0, 0), (di + oh, ow, c))
            acc = acc + tap * w_ref[di, dj].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _dw_spatial_s2_kernel(x_ref, w_ref, out_ref, *, k: int):
    """Stride-2 valid conv on a parity-decomposed slab.

    Mosaic cannot lower strided vector slices, so stride 2 is rewritten as
    four stride-1 convs over the even/odd row/column planes:
      y[i,j] = sum_{r,s} sum_{a,b} w[2a+r, 2b+s] * P[r,s][i+a, j+b].
    x_ref block: (1, 4, Hh, Wh, C) with plane index (r * 2 + s).
    """
    x = x_ref[0]  # (4, Hh, Wh, C)
    hh, c = x.shape[1], x.shape[-1]
    oh, ow = out_ref.shape[1], out_ref.shape[2]
    acc = jnp.zeros((oh, ow, c), jnp.float32)
    for r in range(2):
        for s in range(2):
            plane = x[r * 2 + s]
            for b in range((k - s + 1) // 2):
                # One sublane shift per (parity, b); H taps are free.
                col = jax.lax.slice(plane, (0, b, 0), (hh, b + ow, c)).astype(
                    jnp.float32
                )
                for a in range((k - r + 1) // 2):
                    tap = jax.lax.slice(col, (a, 0, 0), (a + oh, ow, c))
                    acc = acc + tap * w_ref[2 * a + r, 2 * b + s].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _parity_split(xp: jax.Array) -> jax.Array:
    """(N, Hp, Wp, C) -> (N, 4, ceil(Hp/2), ceil(Wp/2), C) even/odd planes."""
    n, hp, wp, c = xp.shape
    hh, wh = (hp + 1) // 2, (wp + 1) // 2
    xp = jnp.pad(xp, ((0, 0), (0, 2 * hh - hp), (0, 2 * wh - wp), (0, 0)))
    xp = xp.reshape(n, hh, 2, wh, 2, c)
    xp = jnp.transpose(xp, (0, 2, 4, 1, 3, 5))  # (N, 2, 2, Hh, Wh, C)
    return xp.reshape(n, 4, hh, wh, c)


def _dw_spatial_fwd(x: jax.Array, kernel: jax.Array, stride: int) -> jax.Array:
    """x (B, T, H, W, C), kernel (k, k, C) -> (B, T, OH, OW, C)."""
    if stride not in (1, 2):
        raise NotImplementedError(f"stride {stride} not supported")
    k = kernel.shape[0]
    pad = k // 2
    b, t, h, w, c = x.shape
    oh = (h + 2 * pad - k) // stride + 1
    ow = (w + 2 * pad - k) // stride + 1
    n = b * t
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)))
    xp = xp.reshape(n, h + 2 * pad, w + 2 * pad, c)

    ct, nct = _ct(c)
    if stride == 1:
        out = pl.pallas_call(
            functools.partial(_dw_spatial_kernel, k=k),
            grid=(nct, n),
            in_specs=[
                pl.BlockSpec(
                    (1, h + 2 * pad, w + 2 * pad, ct),
                    lambda j, i: (i, 0, 0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((k, k, ct), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, oh, ow, ct), lambda j, i: (i, 0, 0, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
            interpret=INTERPRET,
        )(xp, kernel)
        return out.reshape(b, t, oh, ow, c)

    planes = _parity_split(xp)
    hh, wh = planes.shape[2], planes.shape[3]
    out = pl.pallas_call(
        functools.partial(_dw_spatial_s2_kernel, k=k),
        grid=(nct, n),
        in_specs=[
            pl.BlockSpec(
                (1, 4, hh, wh, ct), lambda j, i: (i, 0, 0, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((k, k, ct), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, oh, ow, ct), lambda j, i: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        interpret=INTERPRET,
    )(planes, kernel)
    return out.reshape(b, t, oh, ow, c)


# ---------------------------------------------------------------- spatial dw


def _dw_spatial_dw_kernel(x_ref, dy_ref, dw_ref, *, k: int):
    """Stride-1 dL/dw accumulation: dw[di,dj] += sum(tap * dy) per slab.

    Grid is (channel_tiles, slabs) with slabs innermost, so each channel
    tile's (k*k, ct) output block stays VMEM-resident across its slab loop.
    """

    @pl.when(pl.program_id(1) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    x = x_ref[0]  # (Hp, Wp, C)
    hp, c = x.shape[0], x.shape[-1]
    dy = dy_ref[0].astype(jnp.float32)  # (OH, OW, C)
    oh, ow = dy.shape[0], dy.shape[1]
    for dj in range(k):
        col = jax.lax.slice(x, (0, dj, 0), (hp, dj + ow, c)).astype(jnp.float32)
        for di in range(k):
            tap = jax.lax.slice(col, (di, 0, 0), (di + oh, ow, c))
            dw_ref[di * k + dj] += jnp.sum(tap * dy, axis=(0, 1))


def _dw_spatial_dw_s2_kernel(x_ref, dy_ref, dw_ref, *, k: int):
    """Stride-2 dL/dw on parity planes (x_ref block (1, 4, Hh, Wh, C))."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    x = x_ref[0]  # (4, Hh, Wh, C)
    hh, c = x.shape[1], x.shape[-1]
    dy = dy_ref[0].astype(jnp.float32)  # (OH, OW, C)
    oh, ow = dy.shape[0], dy.shape[1]
    for dj in range(k):
        b, s = dj // 2, dj % 2
        for r in range(2):
            plane = x[r * 2 + s]
            col = jax.lax.slice(plane, (0, b, 0), (hh, b + ow, c)).astype(jnp.float32)
            for a in range((k - r + 1) // 2):
                di = 2 * a + r
                tap = jax.lax.slice(col, (a, 0, 0), (a + oh, ow, c))
                dw_ref[di * k + dj] += jnp.sum(tap * dy, axis=(0, 1))


def _dw_spatial_grad_w(x, dy, k: int, stride: int):
    pad = k // 2
    b, t, h, w, c = x.shape
    oh, ow = dy.shape[2], dy.shape[3]
    n = b * t
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)))
    xp = xp.reshape(n, h + 2 * pad, w + 2 * pad, c)
    dyf = dy.reshape(n, oh, ow, c)

    ct, nct = _ct(c)
    if stride == 1:
        dw = pl.pallas_call(
            functools.partial(_dw_spatial_dw_kernel, k=k),
            grid=(nct, n),
            in_specs=[
                pl.BlockSpec(
                    (1, h + 2 * pad, w + 2 * pad, ct),
                    lambda j, i: (i, 0, 0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, oh, ow, ct), lambda j, i: (i, 0, 0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec((k * k, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k * k, c), jnp.float32),
            interpret=INTERPRET,
        )(xp, dyf)
        return dw.reshape(k, k, c)

    planes = _parity_split(xp)
    hh, wh = planes.shape[2], planes.shape[3]
    dw = pl.pallas_call(
        functools.partial(_dw_spatial_dw_s2_kernel, k=k),
        grid=(nct, n),
        in_specs=[
            pl.BlockSpec(
                (1, 4, hh, wh, ct), lambda j, i: (i, 0, 0, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, oh, ow, ct), lambda j, i: (i, 0, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((k * k, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * k, c), jnp.float32),
        interpret=INTERPRET,
    )(planes, dyf)
    return dw.reshape(k, k, c)


# ------------------------------------------------------------ spatial custom


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_spatial(x: jax.Array, kernel: jax.Array, stride: int = 1) -> jax.Array:
    """Depthwise (1, k, k) conv, 'same' torch padding, Pallas-fused."""
    return _dw_spatial_fwd(x, kernel, stride)


def _dw_spatial_vjp_fwd(x, kernel, stride):
    return _dw_spatial_fwd(x, kernel, stride), (x, kernel)


def _dw_spatial_vjp_bwd(stride, residuals, dy):
    x, kernel = residuals
    k = kernel.shape[0]
    pad = k // 2
    h, w = x.shape[2], x.shape[3]

    # dL/dx: stride-1 conv of the dilated cotangent with the flipped taps.
    if stride > 1:
        dyd = jnp.zeros(
            dy.shape[:2]
            + ((dy.shape[2] - 1) * stride + 1, (dy.shape[3] - 1) * stride + 1)
            + dy.shape[4:],
            dy.dtype,
        )
        dyd = dyd.at[:, :, ::stride, ::stride].set(dy)
    else:
        dyd = dy
    # Valid conv with the flipped kernel after edge-padding the dilated
    # cotangent: left pad (k-1-pad); right pad sized so the valid output is
    # exactly (h, w) — tail rows the strided forward never touched then get
    # their (zero) gradient from the zero padding itself.
    left = k - 1 - pad
    right_h = h + k - 1 - dyd.shape[2] - left
    right_w = w + k - 1 - dyd.shape[3] - left
    dyp = jnp.pad(
        dyd, ((0, 0), (0, 0), (left, right_h), (left, right_w), (0, 0))
    )
    flipped = kernel[::-1, ::-1]
    dx = _dw_spatial_valid(dyp, flipped)

    dw = _dw_spatial_grad_w(x, dy, k, stride).astype(kernel.dtype)
    return dx.astype(x.dtype), dw


def _dw_spatial_valid(xp: jax.Array, kernel: jax.Array) -> jax.Array:
    """Stride-1 VALID conv of an already-padded (B, T, Hp, Wp, C) input."""
    k = kernel.shape[0]
    b, t, hp, wp, c = xp.shape
    oh, ow = hp - k + 1, wp - k + 1
    n = b * t
    ct, nct = _ct(c)
    out = pl.pallas_call(
        functools.partial(_dw_spatial_kernel, k=k),
        grid=(nct, n),
        in_specs=[
            pl.BlockSpec(
                (1, hp, wp, ct), lambda j, i: (i, 0, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((k, k, ct), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, oh, ow, ct), lambda j, i: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), xp.dtype),
        interpret=INTERPRET,
    )(xp.reshape(n, hp, wp, c), kernel)
    return out.reshape(b, t, oh, ow, c)


dw_spatial.defvjp(_dw_spatial_vjp_fwd, _dw_spatial_vjp_bwd)


# -------------------------------------------------------------- temporal fwd


def _dw_temporal_kernel(x_ref, w_ref, out_ref, *, k: int):
    """One (b, h) slab: valid temporal conv of (Tp, W, C) with (k, C)."""
    x = x_ref[0, :, 0].astype(jnp.float32)  # (Tp, W, C)
    t_out = out_ref.shape[1]
    acc = jnp.zeros((t_out,) + x.shape[1:], jnp.float32)
    for dt in range(k):
        tap = jax.lax.slice(x, (dt, 0, 0), (dt + t_out, x.shape[1], x.shape[2]))
        acc = acc + tap * w_ref[dt].astype(jnp.float32)
    out_ref[0, :, 0] = acc.astype(out_ref.dtype)


def _dw_temporal_fwd(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """x (B, T, H, W, C), kernel (k, C) -> same shape ('same' padding)."""
    k = kernel.shape[0]
    if k % 2 == 0:
        # Even k with (k//2, k//2) torch padding yields T+1 output frames
        # (what the XLA lowering returns); this kernel's T-sized output —
        # and the flipped-tap dL/dx identity in the VJP — hold for odd k
        # only.  Same opt-in-backend contract as the stride guards.
        raise NotImplementedError(
            "Pallas dw_temporal supports odd temporal kernels only; "
            "use the XLA path (SENSORIUM_DW_IMPL=xla) for even kernels"
        )
    pad = k // 2
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_dw_temporal_kernel, k=k),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(
                (1, t + 2 * pad, 1, w, c),
                lambda i, j: (i, 0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((k, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, 1, w, c), lambda i, j: (i, 0, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=INTERPRET,
    )(xp, kernel)
    return out


def _dw_temporal_dw_kernel(x_ref, dy_ref, dw_ref, *, k: int):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    x = x_ref[0, :, 0].astype(jnp.float32)  # (Tp, W, C)
    dy = dy_ref[0, :, 0].astype(jnp.float32)  # (T, W, C)
    t_out = dy.shape[0]
    for dt in range(k):
        tap = jax.lax.slice(x, (dt, 0, 0), (dt + t_out, x.shape[1], x.shape[2]))
        dw_ref[dt] += jnp.sum(tap * dy, axis=(0, 1))


def _dw_temporal_grad_w(x, dy, k: int):
    pad = k // 2
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    dw = pl.pallas_call(
        functools.partial(_dw_temporal_dw_kernel, k=k),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(
                (1, t + 2 * pad, 1, w, c),
                lambda i, j: (i, 0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t, 1, w, c), lambda i, j: (i, 0, j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((k, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, c), jnp.float32),
        interpret=INTERPRET,
    )(xp, dy)
    return dw


@jax.custom_vjp
def dw_temporal(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise (k, 1, 1) conv, 'same' torch padding, Pallas-fused."""
    return _dw_temporal_fwd(x, kernel)


def _dw_temporal_vjp_fwd(x, kernel):
    return _dw_temporal_fwd(x, kernel), (x, kernel)


def _dw_temporal_vjp_bwd(residuals, dy):
    x, kernel = residuals
    # Stride 1, odd k, same padding: dL/dx is the same conv with flipped taps.
    dx = _dw_temporal_fwd(dy, kernel[::-1])
    dw = _dw_temporal_grad_w(x, dy, kernel.shape[0]).astype(kernel.dtype)
    return dx.astype(x.dtype), dw


dw_temporal.defvjp(_dw_temporal_vjp_fwd, _dw_temporal_vjp_bwd)
