"""Fused BN-apply + SiLU + depthwise-conv Pallas kernels (forward).

The DwiseNeuro block chain ``BN -> SiLU -> depthwise conv`` round-trips the
x7-expanded activation through HBM between the normalize and the conv
(reference chain: ``/root/reference/src/models/dwiseneuro.py:89-123``).
These kernels apply the normalize+SiLU as an elementwise *prologue* inside
the conv's VMEM tile, so the normalized activation never touches HBM:
2 passes (read raw, write conv output) instead of 4-5.

The prologue takes the BN affine in folded form — ``scale = gamma *
rsqrt(var + eps)``, ``shift = beta - mean * scale`` — so train mode (batch
stats) and eval mode (running stats) use the same kernel.

An optional *epilogue* accumulates per-channel ``sum`` / ``sum_sq`` of the
raw conv output across the grid, producing exactly the moments the next
BatchNorm needs — the stats pass over the conv output also disappears.

Layout/tiling follow ``ops/pallas_dw.py``: channels-last ``(B, T, H, W,
C)``, channel-tiled grid to respect scoped VMEM, multiple (b, t) slabs per
grid step to amortize grid overhead.

Measured verdict (tools/dwbench.py, TPU v5e, flagship shapes): the fused
kernel LOSES to the unfused XLA chain (e.g. block1 12.1 ms vs 6.3 ms;
block0 stride-2 39.6 vs 13.3) despite halving HBM passes on paper.  The
loss is structural for this formulation: the (W, C) VMEM tile pads W=34
to the 16-sublane granularity (~40% wasted lanes on every vector op),
stride 2 pays an extra parity-split materialization, and the per-tap
vector work runs on the VPU while XLA's conv emitter uses its internal
layout.  Hoisting the sublane shifts (k copies instead of k*k) measured
neutral — Mosaic already CSEs them.  Kept as a correct, parity-tested
substrate; the production path stays on the XLA lowering (ops/conv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sensorium_tpu.ops.pallas_dw import _ct, _parity_split

# Mirror of pallas_dw.INTERPRET for CPU testing.
INTERPRET = False

# Max (b, t) slabs per grid step (amortizes grid overhead) and the VMEM
# budget the block-size chooser targets (scoped limit is ~16 MB; leave room
# for double buffering, which the estimate already counts at 2x in/out).
_SLAB_TILE = 8
_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_slab(n: int, per_slab_bytes: int) -> int:
    """Largest slab <= _SLAB_TILE dividing n within the VMEM budget."""
    slab = max(1, min(_SLAB_TILE, _VMEM_BUDGET // max(per_slab_bytes, 1)))
    while n % slab:
        slab -= 1
    return slab


def _silu(x):
    return x * jax.lax.logistic(x)


def _fused_spatial_kernel(x_ref, scale_ref, shift_ref, w_ref, out_ref, *, k: int):
    """silu(x * scale + shift) convolved stride-1 over (H, W), 'same' pad.

    The input block is zero-padded by k//2; padded positions are masked to
    zero AFTER the prologue (silu(0*scale+shift) != 0 in general — an
    iota-based mask is the only formulation correct for scale == 0).
    W (sublane) shifts are hoisted out of the tap loop; H taps index the
    untiled H axis for free.
    """
    pad = k // 2
    x = x_ref[...].astype(jnp.float32)  # (S, Hp, Wp, C)
    x = _silu(x * scale_ref[0].astype(jnp.float32) + shift_ref[0].astype(jnp.float32))
    s_dim, hp, wp, c = x.shape
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    interior = (row >= pad) & (row < hp - pad) & (col >= pad) & (col < wp - pad)
    x = jnp.where(interior, x, 0.0)
    oh, ow = out_ref.shape[1], out_ref.shape[2]
    cols = [
        jax.lax.slice(x, (0, 0, dj, 0), (s_dim, hp, dj + ow, c)) for dj in range(k)
    ]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for di in range(k):
        for dj in range(k):
            tap = jax.lax.slice(cols[dj], (0, di, 0, 0), (s_dim, di + oh, ow, c))
            acc = acc + tap * w_ref[di, dj].astype(jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def _fused_spatial_s2_kernel(
    x_ref, scale_ref, shift_ref, w_ref, out_ref, *, k: int, hp: int, wp: int
):
    """Stride-2 via parity planes (see pallas_dw._dw_spatial_s2_kernel).

    ``hp``/``wp`` are the pre-evenness padded extents; plane (r, s) position
    (a, b) maps to original (2a + r, 2b + s), masked to the interior after
    the prologue (see the stride-1 kernel).
    """
    pad = k // 2
    x = x_ref[...].astype(jnp.float32)  # (S, 4, Hh, Wh, C)
    x = _silu(x * scale_ref[0].astype(jnp.float32) + shift_ref[0].astype(jnp.float32))
    s_dim, _, hh, wh, c = x.shape
    oh, ow = out_ref.shape[1], out_ref.shape[2]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for r in range(2):
        for s in range(2):
            plane = x[:, r * 2 + s]
            row = 2 * jax.lax.broadcasted_iota(jnp.int32, plane.shape, 1) + r
            col = 2 * jax.lax.broadcasted_iota(jnp.int32, plane.shape, 2) + s
            interior = (
                (row >= pad) & (row < hp - pad) & (col >= pad) & (col < wp - pad)
            )
            plane = jnp.where(interior, plane, 0.0)
            for b in range((k - s + 1) // 2):
                col_slab = jax.lax.slice(plane, (0, 0, b, 0), (s_dim, hh, b + ow, c))
                for a in range((k - r + 1) // 2):
                    tap = jax.lax.slice(col_slab, (0, a, 0, 0), (s_dim, a + oh, ow, c))
                    acc = acc + tap * w_ref[2 * a + r, 2 * b + s].astype(jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def fused_bn_silu_dw_spatial(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    kernel: jax.Array,
    stride: int = 1,
) -> jax.Array:
    """``dw_conv(silu(x * scale + shift))`` with torch 'same' padding.

    x: (B, T, H, W, C) raw (pre-BN); scale/shift: (C,) folded BN affine;
    kernel: (k, k, C).  Forward only (inference path / microbenchmarks) —
    the training path additionally needs the VJP (pending measurement).
    """
    if stride not in (1, 2):
        raise NotImplementedError(f"stride {stride} not supported")
    k = kernel.shape[0]
    pad = k // 2
    b, t, h, w, c = x.shape
    oh = (h + 2 * pad - k) // stride + 1
    ow = (w + 2 * pad - k) // stride + 1
    n = b * t
    ct, nct = _ct(c)
    itemsize = jnp.dtype(x.dtype).itemsize
    in_elems = (h + 2 * pad + (h + 2 * pad) % 2) * (w + 2 * pad + (w + 2 * pad) % 2)
    # 2x in (double buffer) + 2x out + fp32 accumulator + fp32 prologue tile.
    per_slab = ct * (2 * in_elems * itemsize + oh * ow * (2 * itemsize + 4) + in_elems * 4)
    slab = _pick_slab(n, per_slab)
    scale = scale.astype(jnp.float32)
    shift = shift.astype(jnp.float32)

    # Plain zero padding: the kernels mask padded positions to zero AFTER
    # the affine+SiLU prologue (silu(0*scale+shift) != 0 in general, and no
    # per-channel input fill value exists when scale == 0).
    hp, wp = h + 2 * pad, w + 2 * pad
    # Stride 2 parity-splits the slab into even/odd planes; pre-pad to even.
    ph = hp % 2 if stride == 2 else 0
    pw = wp % 2 if stride == 2 else 0
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad + ph), (pad, pad + pw), (0, 0)))
    xp = xp.reshape(n, hp + ph, wp + pw, c)
    scale2d = scale.reshape(1, c)
    shift2d = shift.reshape(1, c)

    if stride == 1:
        out = pl.pallas_call(
            functools.partial(_fused_spatial_kernel, k=k),
            grid=(nct, n // slab),
            in_specs=[
                pl.BlockSpec(
                    (slab, hp, wp, ct),
                    lambda j, i: (i, 0, 0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, k, ct), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (slab, oh, ow, ct), lambda j, i: (i, 0, 0, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
            interpret=INTERPRET,
        )(xp, scale2d, shift2d, kernel)
        return out.reshape(b, t, oh, ow, c)

    planes = _parity_split(xp)
    hh, wh = planes.shape[2], planes.shape[3]
    out = pl.pallas_call(
        functools.partial(_fused_spatial_s2_kernel, k=k, hp=hp, wp=wp),
        grid=(nct, n // slab),
        in_specs=[
            pl.BlockSpec(
                (slab, 4, hh, wh, ct),
                lambda j, i: (i, 0, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, ct), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (slab, oh, ow, ct), lambda j, i: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        interpret=INTERPRET,
    )(planes, scale2d, shift2d, kernel)
    return out.reshape(b, t, oh, ow, c)
