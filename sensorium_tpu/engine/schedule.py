"""Learning-rate schedules matching the reference training recipe.

The reference drives LR through argus callbacks (scripts/train.py:114-134):

* warmup stage: ``LambdaLR(lambda x: x / num_iterations)`` stepped per
  iteration — linear ramp 0 -> peak over the warmup stage;
* train stage: torch ``CosineAnnealingLR(T_max=num_iterations,
  eta_min=min_lr)`` stepped per iteration — half-cosine peak -> min.

Here both stages become one optax schedule over the global iteration
counter, so the whole LR plan is a trace-time function of the optimizer
step (no host-side callback mutation).
"""

from __future__ import annotations

import math

import optax


def cosine_annealing(peak_lr: float, min_lr: float, num_iterations: int):
    """torch.optim.lr_scheduler.CosineAnnealingLR's closed form.

    lr(t) = min + (peak - min) / 2 * (1 + cos(pi * t / T_max)).
    """

    def schedule(count):
        import jax.numpy as jnp

        t = jnp.minimum(count, num_iterations)
        return min_lr + (peak_lr - min_lr) * 0.5 * (1.0 + jnp.cos(math.pi * t / num_iterations))

    return schedule


def warmup_cosine(
    peak_lr: float, min_lr: float, warmup_iterations: int, train_iterations: int
):
    """Linear 0->peak over the warmup stage, then cosine peak->min.

    Matches argus ``LambdaLR(x / N)`` (lr == 0 at iteration 0) followed by
    ``CosineAnnealingLR`` starting from the peak.
    """
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, peak_lr, warmup_iterations),
            cosine_annealing(peak_lr, min_lr, train_iterations),
        ],
        boundaries=[warmup_iterations],
    )
