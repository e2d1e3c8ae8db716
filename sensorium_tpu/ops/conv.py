"""Convolution primitives, lowered the TPU way.

The DwiseNeuro core factorizes every 3-D conv into pointwise (1x1x1),
spatial depthwise (1,k,k), and temporal depthwise (k,1,1) pieces
(reference: ``/root/reference/src/models/dwiseneuro.py:89-123``).  On TPU:

* pointwise convs are plain matmuls over the channel (lane) axis — they go
  straight to the MXU via ``dot_general``;
* depthwise convs carry negligible FLOPs but, lowered naively
  (``conv_general_dilated`` with ``feature_group_count=C``), stall the MXU.
  Here they are expressed as k (or k*k) shifted multiply-adds on the VPU,
  which XLA fuses with the surrounding BN/activation elementwise work, so
  the op is HBM-bandwidth-bound instead of MXU-bound;
* grouped 1x1 convs (cortex / readouts) are block-diagonal matmuls,
  expressed as an einsum with an explicit group axis.

All tensors are channels-last: 3-D data is (B, T, H, W, C), 1-D data is
(B, T, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pointwise(x: jax.Array, kernel: jax.Array, preferred_dtype=jnp.float32) -> jax.Array:
    """1x1 conv over the trailing channel axis: (..., Cin) @ (Cin, Cout)."""
    return jax.lax.dot_general(
        x,
        kernel,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=preferred_dtype,
    ).astype(x.dtype)


def grouped_pointwise(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Grouped 1x1 conv as a block-diagonal matmul.

    x: (..., Cin), kernel: (G, Cin // G, Cout // G)  ->  (..., Cout)
    Group g of the output reads only group g of the input.
    """
    groups, cin_g, cout_g = kernel.shape
    xg = x.reshape(x.shape[:-1] + (groups, cin_g))
    yg = jnp.einsum("...gc,gcd->...gd", xg, kernel, preferred_element_type=jnp.float32)
    return yg.reshape(x.shape[:-1] + (groups * cout_g,)).astype(x.dtype)


def depthwise_conv_spatial(x: jax.Array, kernel: jax.Array, stride: int = 1) -> jax.Array:
    """Depthwise (1, k, k) conv over (H, W) with 'same' torch padding.

    x: (B, T, H, W, C), kernel: (k, k, C).  Output spatial size is
    floor((S + 2*(k//2) - k)/stride) + 1, matching torch Conv3d.

    Lowered as k*k shifted multiply-adds (VPU) rather than a grouped conv.
    """
    k = kernel.shape[0]
    pad = k // 2
    b, t, h, w, c = x.shape
    out_h = (h + 2 * pad - k) // stride + 1
    out_w = (w + 2 * pad - k) // stride + 1
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = jnp.zeros((b, t, out_h, out_w, c), jnp.float32)
    for di in range(k):
        for dj in range(k):
            window = jax.lax.slice(
                xp,
                (0, 0, di, dj, 0),
                (b, t, di + (out_h - 1) * stride + 1, dj + (out_w - 1) * stride + 1, c),
                (1, 1, stride, stride, 1),
            )
            acc = acc + window.astype(jnp.float32) * kernel[di, dj].astype(jnp.float32)
    return acc.astype(x.dtype)


def depthwise_conv_temporal(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise (k, 1, 1) conv over T with 'same' torch padding.

    x: (B, T, H, W, C), kernel: (k, C).
    """
    k = kernel.shape[0]
    pad = k // 2
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    acc = jnp.zeros(x.shape, jnp.float32)
    for dt in range(k):
        window = jax.lax.slice(xp, (0, dt, 0, 0, 0), (b, dt + t, h, w, c))
        acc = acc + window.astype(jnp.float32) * kernel[dt].astype(jnp.float32)
    return acc.astype(x.dtype)
