"""Parity of the fused BN-apply+SiLU+depthwise kernels (interpret mode)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sensorium_tpu.ops.pallas_fused as fused
from sensorium_tpu.ops import conv


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fused, "INTERPRET", True)


def reference_chain(x, scale, shift, kernel, stride):
    y = jax.nn.silu(x.astype(jnp.float32) * scale + shift).astype(x.dtype)
    return conv.depthwise_conv_spatial(y, kernel, stride=stride)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("shape", [(2, 3, 8, 8, 16), (1, 2, 9, 7, 8)])
def test_fused_spatial_matches_chain(stride, shape, monkeypatch):
    monkeypatch.setenv("SENSORIUM_DW_IMPL", "xla")
    rng = np.random.default_rng(0)
    b, t, h, w, c = shape
    k = 3
    x = rng.normal(0, 1, shape).astype(np.float32)
    scale = rng.normal(1, 0.2, (c,)).astype(np.float32)
    shift = rng.normal(0, 0.2, (c,)).astype(np.float32)
    kernel = rng.normal(0, 0.5, (k, k, c)).astype(np.float32)

    got = fused.fused_bn_silu_dw_spatial(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift), jnp.asarray(kernel), stride
    )
    want = reference_chain(jnp.asarray(x), scale, shift, jnp.asarray(kernel), stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_padding_masked_after_prologue(monkeypatch):
    """Border behavior must match padding the *activated* tensor with 0."""
    monkeypatch.setenv("SENSORIUM_DW_IMPL", "xla")
    rng = np.random.default_rng(1)
    c = 8
    x = rng.normal(0, 1, (1, 1, 5, 5, c)).astype(np.float32)
    scale = np.full((c,), 2.0, np.float32)
    shift = np.full((c,), 3.0, np.float32)  # silu(0*2+3) != 0 -> mask matters
    kernel = rng.normal(0, 0.5, (3, 3, c)).astype(np.float32)
    got = fused.fused_bn_silu_dw_spatial(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift), jnp.asarray(kernel), 1
    )
    want = reference_chain(jnp.asarray(x), scale, shift, jnp.asarray(kernel), 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_zero_scale_channels(stride, monkeypatch):
    """Dead-BN channels (gamma == 0) must still pad-to-zero correctly."""
    monkeypatch.setenv("SENSORIUM_DW_IMPL", "xla")
    rng = np.random.default_rng(2)
    c = 8
    x = rng.normal(0, 1, (1, 2, 6, 7, c)).astype(np.float32)
    scale = np.zeros((c,), np.float32)
    scale[: c // 2] = 1.5  # half dead, half live
    shift = np.full((c,), 1.0, np.float32)  # silu(shift) != 0 on dead lanes
    kernel = rng.normal(0, 0.5, (3, 3, c)).astype(np.float32)
    got = fused.fused_bn_silu_dw_spatial(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift), jnp.asarray(kernel), stride
    )
    want = reference_chain(jnp.asarray(x), scale, shift, jnp.asarray(kernel), stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
