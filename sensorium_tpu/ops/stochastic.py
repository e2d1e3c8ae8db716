"""Stochastic regularizers: stochastic depth (DropPath) and channel dropout.

Train-only; both take an explicit PRNG key (JAX functional RNG discipline
replaces torch's global RNG state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def drop_path(
    x: jax.Array, rate: float, key: jax.Array, scale_by_keep: bool = True
) -> jax.Array:
    """Stochastic depth: zero the whole residual branch per sample.

    Keeps each sample's branch with probability ``1 - rate``; surviving
    branches are rescaled by 1/keep so expectations match at eval.
    """
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, mask_shape).astype(x.dtype)
    if scale_by_keep:
        mask = mask / keep
    return x * mask


def channel_dropout(x: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    """Dropout1d: zero entire channels per sample (channels-last layout).

    For x of shape (B, ..., C) the mask is (B, 1, ..., 1, C): a dropped
    channel is zeroed across all middle (e.g. temporal) axes of that
    sample, matching torch's ``nn.Dropout1d`` on (B, C, T).
    """
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    mask = jax.random.bernoulli(key, keep, mask_shape).astype(x.dtype)
    return x * mask / keep
