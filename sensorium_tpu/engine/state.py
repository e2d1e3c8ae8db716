"""Training state pytree.

The reference scatters training state across mutable objects (nn.Module
parameters, BN buffers, torch optimizer state, a deep-copied EMA module,
argus engine counters).  Here the entire state is one immutable pytree
threaded through the jitted train step — the XLA-native shape for state
that must live on device, shard over a mesh, and checkpoint atomically.

Unlike the reference (which only saves EMA weights, so mid-training resume
is impossible — SURVEY.md §5), this state carries everything needed to
resume: optimizer moments, step counter and RNG key included.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array  # global iteration counter (drives the LR schedule)
    params: Any  # model parameters (fp32 master copy)
    batch_stats: Any  # BN running statistics (fp32)
    opt_state: Any  # optax optimizer state
    ema_params: Any  # EMA of params (decay 0 disables: trees stay None)
    ema_batch_stats: Any  # EMA of BN statistics
    rng: jax.Array  # PRNG key folded per step for dropout/droppath

    @property
    def eval_params(self):
        """Weights used for validation/prediction: EMA if enabled."""
        return self.params if self.ema_params is None else self.ema_params

    @property
    def eval_batch_stats(self):
        return self.batch_stats if self.ema_batch_stats is None else self.ema_batch_stats
