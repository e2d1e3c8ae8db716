"""Pallas depthwise-conv kernels: forward + custom-VJP parity against the
XLA lowering, run in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sensorium_tpu.ops import conv as conv_mod
from sensorium_tpu.ops import pallas_dw


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_dw, "INTERPRET", True)
    monkeypatch.setenv("SENSORIUM_DW_IMPL", "xla")  # keep conv_mod on XLA


def xla_spatial(x, w, stride):
    return conv_mod.depthwise_conv_spatial(x, w, stride)


def xla_temporal(x, w):
    return conv_mod.depthwise_conv_temporal(x, w)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("hw", [(8, 8), (9, 11)])
def test_spatial_forward_parity(stride, hw):
    rng = np.random.default_rng(0)
    h, w = hw
    x = jnp.asarray(rng.normal(size=(2, 3, h, w, 8)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(3, 3, 8)), jnp.float32)
    expected = xla_spatial(x, kern, stride)
    actual = pallas_dw.dw_spatial(x, kern, stride)
    assert actual.shape == expected.shape
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_spatial_gradients(stride):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 2, 8, 8, 8)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(3, 3, 8)), jnp.float32)

    def loss_pallas(x, k):
        y = pallas_dw.dw_spatial(x, k, stride)
        return jnp.sum(y * jnp.cos(y))

    def loss_xla(x, k):
        y = xla_spatial(x, k, stride)
        return jnp.sum(y * jnp.cos(y))

    gx_p, gk_p = jax.grad(loss_pallas, argnums=(0, 1))(x, kern)
    gx_x, gk_x = jax.grad(loss_xla, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_x), atol=1e-4)


@pytest.mark.parametrize("k", [3, 5])
def test_temporal_forward_parity(k):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 6, 4, 5, 8)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(k, 8)), jnp.float32)
    expected = xla_temporal(x, kern)
    actual = pallas_dw.dw_temporal(x, kern)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=1e-5)


def test_temporal_gradients():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 5, 3, 4, 8)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)

    def loss_pallas(x, k):
        return jnp.sum(jnp.square(pallas_dw.dw_temporal(x, k)))

    def loss_xla(x, k):
        return jnp.sum(jnp.square(xla_temporal(x, k)))

    gx_p, gk_p = jax.grad(loss_pallas, argnums=(0, 1))(x, kern)
    gx_x, gk_x = jax.grad(loss_xla, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_x), atol=1e-4)


def test_model_forward_with_pallas(monkeypatch):
    """Whole DwiseNeuro forward matches between XLA and Pallas backends."""
    from sensorium_tpu.models.registry import get_nn_module

    module_params = {
        "readout_outputs": [5, 7],
        "core_features": (8, 8),
        "spatial_strides": (2, 2),
        "cortex_features": (16, 16),
        "groups": 2,
        "expansion_ratio": 2,
        "se_reduce_ratio": 4,
        "dtype": "float32",
        "readout_pad_multiple": 8,
    }
    model = get_nn_module("dwiseneuro", module_params)
    x = np.random.default_rng(0).uniform(0, 255, (2, 5, 4, 16, 16)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
        train=False,
    )

    monkeypatch.setenv("SENSORIUM_DW_IMPL", "xla")
    expected = model.apply(variables, x, mouse_index=0, train=False)
    monkeypatch.setenv("SENSORIUM_DW_IMPL", "pallas")
    actual = model.apply(variables, x, mouse_index=0, train=False)
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=1e-4, atol=5e-4
    )


def test_even_temporal_kernel_is_rejected():
    """Even k with (k//2, k//2) torch padding yields T+1 frames (the XLA
    lowering's output); the Pallas kernel's T-sized output and flipped-tap
    VJP identity hold for odd k only — it must refuse, not diverge."""
    x = jnp.zeros((1, 4, 2, 8, 8), jnp.float32)
    kernel = jnp.zeros((4, 8), jnp.float32)
    with pytest.raises(NotImplementedError, match="odd"):
        pallas_dw.dw_temporal(x, kernel)
