"""Microbenchmark: depthwise-conv lowerings at flagship block shapes.

Compares, per core-block shape of the true_batch_001 DwiseNeuro:
  chain   — silu(affine(x)) as XLA elementwise + XLA grouped conv (the
            production default path, jitted as one function)
  pallas  — the plain Pallas depthwise kernel after the same XLA prologue
  fused   — the Pallas kernel with the affine+SiLU prologue fused in

Run on real TPU: PYTHONPATH=. python tools/dwbench.py
Prints one JSON line per (shape, impl) with milliseconds per call.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from sensorium_tpu.ops import conv
from sensorium_tpu.ops.pallas_dw import dw_spatial
from sensorium_tpu.ops.pallas_fused import fused_bn_silu_dw_spatial

# (B, T, H, W, C, stride) for the flagship core blocks (expanded channels).
SHAPES = [
    ("block0", (32, 16, 64, 64, 448, 2)),
    ("block1-3", (32, 16, 32, 32, 448, 1)),
    ("block4", (32, 16, 32, 32, 448, 2)),
    ("block5-6", (32, 16, 16, 16, 896, 1)),
    ("block7", (32, 16, 16, 16, 896, 2)),
    ("block8", (32, 16, 8, 8, 1792, 1)),
]
K = 3
ITERS = 30


def _sync(out) -> float:
    """Drain device work fetching only a scalar (tunnel-safe)."""
    return float(jax.device_get(jnp.mean(out.astype(jnp.float32))))


def timed(fn, *args) -> float:
    out = fn(*args)
    _sync(out)  # compile + hard sync
    start = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - start) / ITERS * 1e3


TEMPORAL_SHAPES = [
    ("t-block0-3", (32, 16, 32, 32, 448)),
    ("t-block4-6", (32, 16, 16, 16, 896)),
    ("t-block7-8", (32, 16, 8, 8, 1792)),
]
TEMPORAL_K = 5


def bench_temporal(rng):
    """Temporal (k,1,1) dw conv: XLA vs Pallas (T shifts ride an untiled
    axis, so the Pallas kernel pays no slice rotations here)."""
    from sensorium_tpu.ops.pallas_dw import dw_temporal

    for name, (b, t, h, w, c) in TEMPORAL_SHAPES:
        x = jnp.asarray(rng.normal(0, 1, (b, t, h, w, c)), jnp.bfloat16)
        scale = jnp.asarray(rng.normal(1, 0.2, (c,)), jnp.float32)
        shift = jnp.asarray(rng.normal(0, 0.2, (c,)), jnp.float32)
        taps = jnp.asarray(rng.normal(0, 0.5, (TEMPORAL_K, c)), jnp.bfloat16)

        @jax.jit
        def chain_t(x, scale, shift, taps):
            y = jax.nn.silu(x.astype(jnp.float32) * scale + shift).astype(x.dtype)
            return conv.depthwise_conv_temporal(y, taps)

        @jax.jit
        def pallas_t(x, scale, shift, taps):
            y = jax.nn.silu(x.astype(jnp.float32) * scale + shift).astype(x.dtype)
            return dw_temporal(y, taps)

        for impl, fn in (("chain", chain_t), ("pallas", pallas_t)):
            try:
                ms = timed(fn, x, scale, shift, taps)
                print(json.dumps({"shape": name, "impl": impl, "ms": round(ms, 3)}))
            except Exception as exc:  # noqa: BLE001
                print(json.dumps({"shape": name, "impl": impl, "error": str(exc)[:160]}))


def main():
    import os

    os.environ.setdefault("SENSORIUM_DW_IMPL", "xla")
    rng = np.random.default_rng(0)
    bench_temporal(rng)
    for name, (b, t, h, w, c, stride) in SHAPES:
        x = jnp.asarray(rng.normal(0, 1, (b, t, h, w, c)), jnp.bfloat16)
        scale = jnp.asarray(rng.normal(1, 0.2, (c,)), jnp.float32)
        shift = jnp.asarray(rng.normal(0, 0.2, (c,)), jnp.float32)
        taps = jnp.asarray(rng.normal(0, 0.5, (K, K, c)), jnp.bfloat16)

        @jax.jit
        def chain(x, scale, shift, taps, stride=stride):
            y = jax.nn.silu(x.astype(jnp.float32) * scale + shift).astype(x.dtype)
            return conv.depthwise_conv_spatial(y, taps, stride=stride)

        @jax.jit
        def plain_pallas(x, scale, shift, taps, stride=stride):
            y = jax.nn.silu(x.astype(jnp.float32) * scale + shift).astype(x.dtype)
            return dw_spatial(y, taps, stride)

        @jax.jit
        def fused(x, scale, shift, taps, stride=stride):
            return fused_bn_silu_dw_spatial(x, scale, shift, taps, stride)

        @jax.jit
        def chain2d(x, scale, shift, taps, stride=stride):
            """Same chain but as a true 2D conv over (B*T, H, W, C)."""
            y = jax.nn.silu(x.astype(jnp.float32) * scale + shift).astype(x.dtype)
            bb, tt, hh, ww, cc = y.shape
            y = y.reshape(bb * tt, hh, ww, cc)
            pad = K // 2
            out = jax.lax.conv_general_dilated(
                y,
                taps.reshape(K, K, 1, cc),
                window_strides=(stride, stride),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=cc,
            )
            return out.reshape(bb, tt, out.shape[1], out.shape[2], cc)

        @jax.jit
        def chainshift(x, scale, shift, taps, stride=stride):
            """Chain with the conv as XLA-fused shifted multiply-adds."""
            y = jax.nn.silu(x.astype(jnp.float32) * scale + shift).astype(x.dtype)
            pad = K // 2
            yp = jnp.pad(y, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)))
            hh, ww = y.shape[2], y.shape[3]
            oh = (hh + 2 * pad - K) // stride + 1
            ow = (ww + 2 * pad - K) // stride + 1
            acc = jnp.zeros(y.shape[:2] + (oh, ow, y.shape[-1]), jnp.float32)
            for di in range(K):
                for dj in range(K):
                    tap = jax.lax.slice(
                        yp,
                        (0, 0, di, dj, 0),
                        (y.shape[0], y.shape[1], di + (oh - 1) * stride + 1,
                         dj + (ow - 1) * stride + 1, y.shape[-1]),
                        (1, 1, stride, stride, 1),
                    )
                    acc = acc + tap.astype(jnp.float32) * taps[di, dj].astype(jnp.float32)
            return acc.astype(x.dtype)

        for impl, fn in (
            ("chain", chain),
            ("chain2d", chain2d),
            ("chainshift", chainshift),
            ("pallas", plain_pallas),
            ("fused", fused),
        ):
            try:
                ms = timed(fn, x, scale, shift, taps)
                print(json.dumps({"shape": name, "impl": impl, "ms": round(ms, 3)}))
            except Exception as exc:  # noqa: BLE001 — report and continue
                print(json.dumps({"shape": name, "impl": impl, "error": str(exc)[:160]}))


if __name__ == "__main__":
    main()
