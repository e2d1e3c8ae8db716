"""Exponential moving average of the full model variable tree.

Capability parity with ``/root/reference/src/ema.py`` (``ModelEma``): the
average runs over *everything* in the model state — parameters and BN
running statistics alike — with ``ema = decay * ema + (1 - decay) * value``.

TPU-first design: instead of a mutable deep copy of an nn.Module, the EMA
is a pure pytree transform executed inside the jitted train step, so the
update fuses with the optimizer step and costs one extra HBM read/write of
the parameter tree (no host sync, no extra dispatch).
"""

from __future__ import annotations

import jax


def ema_update(ema_tree, value_tree, decay: float):
    """One EMA step over arbitrary pytrees (params + batch_stats)."""
    return jax.tree_util.tree_map(
        lambda e, v: e * decay + v.astype(e.dtype) * (1.0 - decay), ema_tree, value_tree
    )

