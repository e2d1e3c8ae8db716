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


def warmup_then(peak_lr: float, warmup_iterations: int, train_schedule):
    """Linear 0->peak warmup stage, then an arbitrary train-stage schedule.

    The warmup matches argus ``LambdaLR(x / N)`` (lr == 0 at iteration 0,
    scripts/train.py:123); ``train_schedule`` sees a counter restarting at
    0, exactly like the reference swapping schedulers between stages.
    """
    if warmup_iterations <= 0:
        return train_schedule
    return optax.join_schedules(
        [optax.linear_schedule(0.0, peak_lr, warmup_iterations), train_schedule],
        boundaries=[warmup_iterations],
    )


def warmup_cosine(
    peak_lr: float, min_lr: float, warmup_iterations: int, train_iterations: int
):
    """Linear 0->peak over the warmup stage, then cosine peak->min.

    Matches argus ``LambdaLR(x / N)`` (lr == 0 at iteration 0) followed by
    ``CosineAnnealingLR`` starting from the peak.
    """
    return warmup_then(
        peak_lr, warmup_iterations, cosine_annealing(peak_lr, min_lr, train_iterations)
    )


# --------------------------------------------------------------------------
# torch.optim.lr_scheduler registry
#
# The reference's training library (argus) lets a config drive any torch
# scheduler via callbacks (the shipped recipes use LambdaLR warmup +
# CosineAnnealingLR, scripts/train.py:122-134).  The same names are exposed
# here as closed-form functions of the global iteration counter — trace-time
# math, no host-side callback mutation — each pinned step-for-step against
# the torch scheduler in ``tests/test_engine.py::TestSchedulerRegistry``.
# ``count`` is the number of completed iterations, i.e. the value read
# *before* ``scheduler.step()`` at torch iteration ``count``.
# --------------------------------------------------------------------------


def _step_lr(base_lr, *, step_size: int, gamma: float = 0.1):
    def schedule(count):
        import jax.numpy as jnp

        return base_lr * gamma ** jnp.floor_divide(count, step_size)

    return schedule


def _multi_step_lr(base_lr, *, milestones, gamma: float = 0.1):
    ms = tuple(sorted(int(m) for m in milestones))

    def schedule(count):
        import jax.numpy as jnp

        hits = sum(jnp.where(count >= m, 1, 0) for m in ms)
        return base_lr * gamma ** hits

    return schedule


def _exponential_lr(base_lr, *, gamma: float):
    def schedule(count):
        return base_lr * gamma ** count

    return schedule


def _linear_lr(base_lr, *, start_factor: float = 1.0 / 3,
               end_factor: float = 1.0, total_iters: int = 5):
    def schedule(count):
        import jax.numpy as jnp

        frac = jnp.minimum(count, total_iters) / total_iters
        return base_lr * (start_factor + (end_factor - start_factor) * frac)

    return schedule


def _constant_lr(base_lr, *, factor: float = 1.0 / 3, total_iters: int = 5):
    def schedule(count):
        import jax.numpy as jnp

        return base_lr * jnp.where(count < total_iters, factor, 1.0)

    return schedule


def _polynomial_lr(base_lr, *, total_iters: int = 5, power: float = 1.0):
    def schedule(count):
        import jax.numpy as jnp

        frac = jnp.minimum(count, total_iters) / total_iters
        return base_lr * (1.0 - frac) ** power

    return schedule


def _cosine_annealing_lr(base_lr, *, T_max: int, eta_min: float = 0.0):
    return cosine_annealing(base_lr, eta_min, T_max)


def _cosine_warm_restarts(base_lr, *, T_0: int, T_mult: int = 1,
                          eta_min: float = 0.0):
    """torch CosineAnnealingWarmRestarts stepped once per iteration.

    Cycle ``n`` spans ``T_0 * T_mult**n`` iterations; within a cycle,
    lr = eta_min + (base - eta_min)/2 * (1 + cos(pi * T_cur / T_i)).
    """
    if T_mult < 1:
        raise ValueError("T_mult must be >= 1")

    def schedule(count):
        import jax.numpy as jnp

        t = jnp.asarray(count, jnp.float32)
        if T_mult == 1:
            t_cur = jnp.mod(t, T_0)
            t_i = float(T_0)
        else:
            # Geometric cycle index, then a boundary correction: float log
            # can land one short of the true cycle at exact restarts.
            n = jnp.floor(
                jnp.log(t * (T_mult - 1) / T_0 + 1.0) / math.log(T_mult)
            )
            start = T_0 * (T_mult ** n - 1.0) / (T_mult - 1.0)
            t_i = T_0 * T_mult ** n
            bump = jnp.where(t - start >= t_i, 1.0, 0.0)
            n = n + bump
            start = T_0 * (T_mult ** n - 1.0) / (T_mult - 1.0)
            t_i = T_0 * T_mult ** n
            t_cur = t - start
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(math.pi * t_cur / t_i)
        )

    return schedule


def _one_cycle_lr(base_lr, *, max_lr: float | None = None,
                  total_steps: int | None = None, pct_start: float = 0.3,
                  anneal_strategy: str = "cos", div_factor: float = 25.0,
                  final_div_factor: float = 1e4):
    """torch OneCycleLR (three_phase=False) as a closed form.

    ``max_lr`` defaults to the config's base lr.  initial = max/div_factor,
    floor = initial/final_div_factor; phase 1 anneals initial->max over
    ``pct_start * total_steps - 1`` steps, phase 2 max->floor over the rest
    (pytorch/torch/optim/lr_scheduler.py OneCycleLR._anneal_func).
    """
    if total_steps is None:
        raise ValueError("OneCycleLR requires total_steps")
    if anneal_strategy not in ("cos", "linear"):
        raise ValueError(f"anneal_strategy must be cos/linear, got {anneal_strategy!r}")
    max_lr = base_lr if max_lr is None else max_lr
    initial_lr = max_lr / div_factor
    floor_lr = initial_lr / final_div_factor
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps) - 1.0

    def _anneal(start, end, pct):
        import jax.numpy as jnp

        if anneal_strategy == "cos":
            return end + (start - end) * 0.5 * (1.0 + jnp.cos(math.pi * pct))
        return (end - start) * pct + start

    def schedule(count):
        import jax.numpy as jnp

        t = jnp.minimum(jnp.asarray(count, jnp.float32), down_end)
        pct_up = jnp.clip(t / up_end, 0.0, 1.0)
        pct_down = jnp.clip((t - up_end) / (down_end - up_end), 0.0, 1.0)
        return jnp.where(
            t <= up_end,
            _anneal(initial_lr, max_lr, pct_up),
            _anneal(max_lr, floor_lr, pct_down),
        )

    return schedule


_SCHEDULERS = {
    "StepLR": _step_lr,
    "MultiStepLR": _multi_step_lr,
    "ExponentialLR": _exponential_lr,
    "LinearLR": _linear_lr,
    "ConstantLR": _constant_lr,
    "PolynomialLR": _polynomial_lr,
    "CosineAnnealingLR": _cosine_annealing_lr,
    "CosineAnnealingWarmRestarts": _cosine_warm_restarts,
    "OneCycleLR": _one_cycle_lr,
}


def get_scheduler(name: str, base_lr: float, scheduler_params: dict):
    """Build a named train-stage schedule (a function of the iteration count).

    Config surface: ``"lr_scheduler": ("StepLR", {"step_size": ..., ...})``
    — same tuple shape as the optimizer registry.  Parameter values equal to
    the string ``"train_iters"`` are substituted by the CLI with the computed
    train-stage iteration count, mirroring how the reference computes
    ``T_max=num_iterations`` at runtime (scripts/train.py:130-134).
    """
    if name not in _SCHEDULERS:
        raise KeyError(
            f"Unknown lr scheduler '{name}' (have {sorted(_SCHEDULERS)})"
        )
    return _SCHEDULERS[name](base_lr, **scheduler_params)


def build_stage_schedule(
    peak_lr: float,
    min_lr: float,
    warmup_iterations: int,
    train_iterations: int,
    scheduler_spec=None,
):
    """The full LR plan for a config's stage list.

    Default (no ``"lr_scheduler"`` key): the reference recipe — LambdaLR
    warmup + CosineAnnealingLR (scripts/train.py:122-134).  With a spec
    ``("Name", {...})``, the named registry scheduler replaces the cosine
    train stage; parameter values equal to the string ``"train_iters"``
    resolve to the computed stage length (the reference computes
    ``T_max=num_iterations`` the same way at runtime).
    """
    if scheduler_spec is None:
        return warmup_cosine(peak_lr, min_lr, warmup_iterations, train_iterations)
    name, params = scheduler_spec
    params = {
        k: (train_iterations if v == "train_iters" else v)
        for k, v in dict(params).items()
    }
    return warmup_then(
        peak_lr, warmup_iterations, get_scheduler(name, peak_lr, params)
    )
