"""Unit tests of TPU ops against PyTorch reference semantics (torch CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sensorium_tpu.ops.conv import (
    depthwise_conv_spatial,
    depthwise_conv_temporal,
    grouped_pointwise,
    pointwise,
)
from sensorium_tpu.ops.norm import BatchNorm
from sensorium_tpu.ops.pe import position_encoding_3d
from sensorium_tpu.ops.shuffle import channel_shuffle
from sensorium_tpu.ops.stochastic import channel_dropout, drop_path

RNG = np.random.default_rng(0)


def test_pointwise_matches_conv3d_1x1x1():
    x = RNG.normal(size=(2, 4, 6, 6, 5)).astype(np.float32)  # (B,T,H,W,C)
    w = RNG.normal(size=(5, 7)).astype(np.float32)
    got = pointwise(jnp.asarray(x), jnp.asarray(w))
    conv = torch.nn.Conv3d(5, 7, 1, bias=False)
    conv.weight.data = torch.from_numpy(w.T[:, :, None, None, None].copy())
    with torch.no_grad():
        expected = conv(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), expected.numpy(), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("size", [8, 9])
def test_depthwise_spatial_matches_torch(stride, size):
    c, k = 6, 3
    x = RNG.normal(size=(2, 3, size, size, c)).astype(np.float32)
    w = RNG.normal(size=(k, k, c)).astype(np.float32)
    got = depthwise_conv_spatial(jnp.asarray(x), jnp.asarray(w), stride=stride)
    conv = torch.nn.Conv3d(
        c, c, (1, k, k), stride=(1, stride, stride), padding=(0, k // 2, k // 2),
        groups=c, bias=False,
    )
    conv.weight.data = torch.from_numpy(w.transpose(2, 0, 1)[:, None, None].copy())
    with torch.no_grad():
        expected = conv(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), expected.numpy(), rtol=1e-5, atol=1e-5
    )


def test_depthwise_temporal_matches_torch():
    c, k = 6, 5
    x = RNG.normal(size=(2, 7, 4, 4, c)).astype(np.float32)
    w = RNG.normal(size=(k, c)).astype(np.float32)
    got = depthwise_conv_temporal(jnp.asarray(x), jnp.asarray(w))
    conv = torch.nn.Conv3d(c, c, (k, 1, 1), padding=(k // 2, 0, 0), groups=c, bias=False)
    conv.weight.data = torch.from_numpy(w.T[:, None, :, None, None].copy())
    with torch.no_grad():
        expected = conv(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), expected.numpy(), rtol=1e-5, atol=1e-5
    )


def test_grouped_pointwise_matches_conv1d():
    groups, cin, cout, t = 2, 6, 8, 5
    x = RNG.normal(size=(3, t, cin)).astype(np.float32)
    w = RNG.normal(size=(cout, cin // groups, 1)).astype(np.float32)
    kernel = w[:, :, 0].reshape(groups, cout // groups, cin // groups).transpose(0, 2, 1)
    got = grouped_pointwise(jnp.asarray(x), jnp.asarray(kernel))
    conv = torch.nn.Conv1d(cin, cout, 1, groups=groups, bias=False)
    conv.weight.data = torch.from_numpy(w)
    with torch.no_grad():
        expected = conv(torch.from_numpy(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), expected.numpy(), rtol=1e-5, atol=1e-5
    )


def test_channel_shuffle_matches_torch_view_transpose():
    groups, c, t = 2, 8, 3
    x = RNG.normal(size=(2, t, c)).astype(np.float32)
    got = channel_shuffle(jnp.asarray(x), groups)
    xt = torch.from_numpy(x.transpose(0, 2, 1))  # (B, C, T)
    b = xt.shape[0]
    expected = xt.view(b, groups, c // groups, t).transpose(1, 2).reshape(b, c, t)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), expected.numpy(), rtol=0, atol=0
    )


@pytest.mark.parametrize("train", [True, False])
def test_batchnorm_matches_torch(train):
    c = 6
    x = (RNG.normal(size=(4, 5, c)) * 3 + 1).astype(np.float32)
    bn = BatchNorm(c)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # Non-trivial starting state.
    scale = RNG.normal(size=(c,)).astype(np.float32)
    bias = RNG.normal(size=(c,)).astype(np.float32)
    mean0 = RNG.normal(size=(c,)).astype(np.float32)
    var0 = np.abs(RNG.normal(size=(c,))).astype(np.float32) + 0.5
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(mean0), "var": jnp.asarray(var0)},
    }

    tbn = torch.nn.BatchNorm1d(c)
    tbn.weight.data = torch.from_numpy(scale)
    tbn.bias.data = torch.from_numpy(bias)
    tbn.running_mean.data = torch.from_numpy(mean0.copy())
    tbn.running_var.data = torch.from_numpy(var0.copy())
    tbn.train(train)
    with torch.no_grad():
        expected = tbn(torch.from_numpy(x.transpose(0, 2, 1)))

    got, mutated = bn.apply(variables, jnp.asarray(x), train=train, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), expected.numpy(), rtol=1e-5, atol=1e-5
    )
    if train:
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]),
            tbn.running_mean.numpy(),
            rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["var"]),
            tbn.running_var.numpy(),
            rtol=1e-5,
            atol=1e-6,
        )


def test_batchnorm_variance_survives_large_mean():
    """The shifted one-pass variance must not catastrophically cancel when
    |mean|/std is large (post-conv activations on real 0-255 video reach
    mean/std ~30+).  The naive E[x^2]-E[x]^2 loses ~1e-3 relative accuracy
    at mean/std=80 in fp32; the running-mean shift restores ~1e-7
    (docs/PERF.md 'the 0.02 question', engineering fallout)."""
    c = 4
    x = (RNG.normal(size=(8, 50, c)) * 0.5 + 40).astype(np.float32)
    truth = x.astype(np.float64).reshape(-1, c).var(axis=0, ddof=1)

    bn = BatchNorm(c)
    warm_mean = x.reshape(-1, c).mean(axis=0) + RNG.normal(size=(c,)).astype(np.float32) * 0.05
    var0 = np.ones(c, np.float32)
    variables = {
        "params": {"scale": jnp.ones(c), "bias": jnp.zeros(c)},
        "batch_stats": {"mean": jnp.asarray(warm_mean, jnp.float32), "var": jnp.asarray(var0)},
    }
    _, mutated = bn.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    # Recover the unbiased batch var from the torch momentum update.
    got = (np.asarray(mutated["batch_stats"]["var"]) - 0.9 * var0) / 0.1
    rel = np.abs(got - truth) / truth
    assert rel.max() < 1e-5, f"shifted variance lost precision: rel={rel.max():.2e}"


def test_position_encoding_channel_budget():
    # C=64 -> 22 channels per axis; table truncated to 64 channels.
    pe = position_encoding_3d(64, 4, 6, 6)
    assert pe.shape == (4, 6, 6, 64)
    # First 22 channels vary along T only.
    assert np.allclose(pe[:, 0, 0, :22], pe[:, 3, 5, :22])
    # Channels 22..43 vary along H only.
    assert np.allclose(pe[0, :, 0, 22:44], pe[3, :, 5, 22:44])
    # sin(0) = 0 and cos(0) = 1 at the origin for the T block.
    assert np.allclose(pe[0, 0, 0, :11], 0.0)
    assert np.allclose(pe[0, 0, 0, 11:22], 1.0)


def test_drop_path_keeps_expectation():
    x = jnp.ones((512, 3, 3))
    y = drop_path(x, 0.25, jax.random.PRNGKey(0))
    kept = np.asarray(y[:, 0, 0])
    # Each sample is either 0 or 1/keep.
    close_to_zero = np.isclose(kept, 0.0)
    close_to_scaled = np.isclose(kept, 1 / 0.75, rtol=1e-5)
    assert np.all(close_to_zero | close_to_scaled)
    assert close_to_zero.any() and close_to_scaled.any()
    assert abs(kept.mean() - 1.0) < 0.1


def test_channel_dropout_zeroes_whole_channels():
    x = jnp.ones((4, 6, 32))
    y = np.asarray(channel_dropout(x, 0.5, jax.random.PRNGKey(1)))
    # A dropped channel is zero across the whole temporal axis.
    per_channel = y.sum(axis=1)
    for b in range(4):
        for c in range(32):
            col = y[b, :, c]
            assert np.all(col == 0) or np.all(col == col[0])
    assert (per_channel == 0).any()


def test_einsum_f32_portable_mode_is_bit_equivalent():
    """The portable lowering of f32-consuming bf16 dots (upcast operands)
    must produce f32 results bit-equal to preferred_element_type=f32 —
    bf16 embeds exactly in f32, so only the lowering changes, not the
    math.  Pins the export-artifact numerics claim in ops/conv.py."""
    from sensorium_tpu.ops.conv import einsum_f32, portable_dots

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(3, 4, 2, 8)), jnp.bfloat16)  # (B,T,G,C/G)
    k = jnp.asarray(rng.normal(size=(2, 8, 5)), jnp.bfloat16)  # (G,C/G,P)

    base = einsum_f32("btgc,gcp->btgp", x, k)
    with portable_dots():
        portable = einsum_f32("btgc,gcp->btgp", x, k)

    assert base.dtype == portable.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(portable), np.asarray(base), rtol=1e-6, atol=1e-7
    )
