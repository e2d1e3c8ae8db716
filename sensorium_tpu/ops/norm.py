"""Batch normalization with PyTorch-exact training semantics.

The reference model normalizes after every convolution (including the
parameter-free shortcuts), and its "true batch" training recipe depends on
BN statistics computed over the *global* batch of 32.  This module:

* computes batch statistics in float32 regardless of the compute dtype
  (mirrors torch AMP, where BN runs in fp32);
* updates running_var with the *unbiased* batch variance but normalizes
  with the biased one (torch semantics; flax's BatchNorm uses biased for
  both, which would drift from the reference);
* uses torch's momentum convention: ``running = (1 - m) * running + m * batch``;
* is sync-BN by construction under ``jax.jit`` over a sharded mesh: the
  reductions are over global (logical) axes, so GSPMD inserts the
  cross-replica collectives automatically.  For ``shard_map`` use, pass
  ``axis_name`` to pmean the moments explicitly.

Channels are the last axis (TPU lane dimension).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        reduce_axes = tuple(range(x.ndim - 1))
        running_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        running_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        # Stats in fp32 for bf16/f32 compute (torch-AMP semantics); promoted
        # for f64 inputs so float64 diagnostics measure real f64 math.
        stats_dtype = jnp.promote_types(jnp.float32, x.dtype)
        if train:
            x32 = x.astype(stats_dtype)
            # SHIFTED one-pass variance: E[(x-c)^2] - (E[x]-c)^2 with
            # c = running_mean (a constant w.r.t. differentiation).  The
            # naive one-pass E[x^2] - E[x]^2 catastrophically cancels in
            # fp32 whenever |mean|/std is large (post-conv activations
            # reach mean/std ~30 on real data): the variance — and every
            # gradient flowing through the normalization — loses ~1e-4
            # relative precision per BN layer, a persistent state-correlated
            # bias that measurably shifts 12-epoch training trajectories
            # (LEARNING_PARITY_r05.json; torch's two-pass E[(x-mu)^2] keeps
            # ~1e-7).  Shifting by the running mean restores two-pass
            # accuracy (the residual error scales with ((mu-c)/std)^2,
            # tiny once stats warm up) while keeping the single fused
            # read of x: the subtract+square fuses into the reduce, so no
            # f32 temporary materializes (the variadic one-pass lax.reduce
            # A/B'd on v5e DID materialize the square -> +3.7 GB OOM; the
            # standalone two-reduce form compiles to a single pass).
            shift = jax.lax.stop_gradient(running_mean.value)
            mean = jnp.mean(x32, axis=reduce_axes)
            mean_csq = jnp.mean(jnp.square(x32 - shift), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_csq = jax.lax.pmean(mean_csq, self.axis_name)
            var = mean_csq - jnp.square(mean - shift)

            count = 1
            for axis in reduce_axes:
                count *= x.shape[axis]
            if self.axis_name is not None:
                count *= jax.lax.axis_size(self.axis_name)
            unbiased_var = var * (count / max(count - 1, 1))

            if not self.is_initializing():
                running_mean.value = (1 - self.momentum) * running_mean.value + self.momentum * mean
                running_var.value = (
                    1 - self.momentum
                ) * running_var.value + self.momentum * unbiased_var
        else:
            mean = running_mean.value
            var = running_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        # Single fused multiply-add per element in fp32, cast once at the end.
        y = x.astype(stats_dtype) * inv + (bias - mean * inv)
        return y.astype(self.dtype)
