"""Training losses.

Capability parity with ``/root/reference/src/losses.py`` (``MicePoissonLoss``)
and the distillation target injection of
``/root/reference/src/argus_models.py:31-41``, reformulated for the compact
padded batch layout used on TPU:

* predictions come as one zero-padded ``(M, B, N_max, T)`` array (all-mice
  forward), targets as the sample's own-mouse ``(B, N_max, T)`` array and a
  ``(B, M)`` weight matrix (one-hot for real samples);
* the reference's Python-side masking / in-place distillation writes become
  ``jnp.where`` selects, so the whole loss is one fused XLA reduction;
* padded neuron rows carry prediction == target == 0 and therefore
  contribute exactly 0 to the Poisson sum, so no explicit neuron mask is
  needed (softplus output is sliced/padded with true zeros by the model).

Semantics check against torch ``nn.PoissonNLLLoss(log_input=False,
full=False, eps=1e-8, reduction="none")``: elementwise loss is
``pred - target * log(pred + eps)``; the reference normalizes the mouse
weight matrix to sum 1, multiplies each sample's elementwise-summed loss by
its weight, and sums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def poisson_nll(
    prediction: jax.Array,
    target: jax.Array,
    eps: float = 1e-8,
    log_input: bool = False,
    full: bool = False,
) -> jax.Array:
    """Elementwise Poisson NLL matching ``torch.nn.PoissonNLLLoss`` semantics.

    ``log_input=True`` treats the prediction as a log-rate
    (``exp(pred) - target * pred``; eps unused, as in torch);
    ``log_input=False`` as a rate (``pred - target * log(pred + eps)``).
    ``full=True`` adds the Stirling approximation term only where
    ``target > 1`` (torch masks it the same way).
    """
    if log_input:
        elem = jnp.exp(prediction) - target * prediction
    else:
        elem = prediction - target * jnp.log(prediction + eps)
    if full:
        # Computed on a safe value so target <= 1 rows (incl. 0) cannot
        # produce nan/inf that poison the where-select.
        safe = jnp.where(target > 1.0, target, 2.0)
        stirling = safe * jnp.log(safe) - safe + 0.5 * jnp.log(2.0 * jnp.pi * safe)
        elem = elem + jnp.where(target > 1.0, stirling, 0.0)
    return elem


def _broadcast_target(target: jax.Array, prediction: jax.Array) -> jax.Array:
    """Accept either the compact (B, N, T) own-mouse target or a dense
    (M, B, N, T) per-mouse target (the distillation-injected form)."""
    return target if target.ndim == prediction.ndim else target[None]


def mice_poisson_loss(
    prediction: jax.Array,  # (M, B, N_max, T) float32, zero-padded rows
    target: jax.Array,  # (B, N_max, T) or dense (M, B, N_max, T) float32
    weights: jax.Array,  # (B, M) float32, nonzero only at the own mouse
    eps: float = 1e-8,
    log_input: bool = False,
    full: bool = False,
    neuron_mask: jax.Array | None = None,  # (M, N_max), 1 at real neurons
) -> jax.Array:
    """Weighted multi-mouse Poisson NLL (reference: losses.py:5-21).

    Each (batch, mouse) cell's elementwise loss sum is scaled by the
    normalized weight; zero-weight cells contribute nothing (their gradient
    is exactly zero because the weight multiplies the loss).

    For ``log_input=False`` padded rows (prediction == target == 0)
    contribute exactly 0 with no mask; ``log_input=True`` makes a padded
    element worth ``exp(0) = 1``, so that path requires ``neuron_mask``
    (``get_loss`` threads it from the model's readout_outputs).

    Zero-weight cells are masked by SELECTION, not multiplication: the
    reference indexes ``input_tensor[mask]`` before the loss runs
    (losses.py:17-20) and never evaluates unsupervised cells.  Those
    cells receive no gradient, so their predictions drift over training;
    with ``log_input=True`` a drifted log-rate > ~88.7 overflows
    ``exp`` to inf and ``inf * 0-weight`` would poison the whole loss
    (and, through the vjp of ``exp``, every shared-weight gradient).

    The prediction is zeroed going IN (both paths): the input-side
    ``where`` transposes to an EXACT-0 cotangent at masked cells, which
    is the only form that survives a NaN prediction — a per-cell guard
    after the reduction leaves the vjp multiplying the zero cotangent by
    a NaN partial (``0 * NaN = NaN``), poisoning every shared-trunk
    gradient (pinned by ``test_engine.py
    test_production_poisson_is_immune_to_masked_nonfinite``).  A NaN
    there requires f32 overflow of opposite-sign partial sums in a
    masked readout's matmul — catastrophic divergence — but the exact-0
    semantics is the reference's and the select is measured perf-neutral
    at flagship shape (within the ±1% run band, 2026-08-20 A/B — the
    r02->r03 eval regression was the shortcut lowering pin, docs/PERF.md
    "shortcut lowering, revisited", NOT these selects).  The per-cell
    guard after the reduction stays: with a zeroed input the
    ``log_input=False`` elementwise term is ``0 - t*log(eps)`` — finite
    but nonzero — and selecting per (mouse, batch) cell is cheaper than
    a second (M, B, N, T) select.

    Bit-identical to the weight-multiply form whenever everything is
    finite.
    """
    weights = weights / jnp.sum(weights)
    active_mb = weights.T != 0.0  # (M, B)
    prediction = jnp.where(active_mb[:, :, None, None], prediction, 0.0)
    elem = poisson_nll(
        prediction, _broadcast_target(target, prediction), eps, log_input, full
    )  # (M, B, N, T)
    if neuron_mask is not None:
        elem = elem * neuron_mask[:, None, :, None]
    per_cell = jnp.sum(elem, axis=(2, 3))  # (M, B)
    per_cell = jnp.where(active_mb, per_cell, 0.0)
    return jnp.sum(per_cell * weights.T)


def inject_distill_targets(
    target: jax.Array,  # (B, N_max, T) float32
    weights: jax.Array,  # (B, M) float32
    teacher_prediction: jax.Array,  # (M, B, N_max, T) float32, no gradient
    distill_ratio: float,
) -> tuple[jax.Array, jax.Array]:
    """Teacher-target injection as pure arrays (argus_models.py:31-41).

    Mirrors the reference's ``add_distill_predictions``, which mutates the
    batch BEFORE the configured loss runs: every (batch, mouse) cell with
    weight 0 gets the teacher's prediction as its target and weight
    ``ratio / (1 - ratio) * sum(weights) / #distilled``.  The loss then
    normalizes the weight matrix to sum 1, so the distilled cells carry
    exactly ``distill_ratio`` of the total loss mass.  Returns the dense
    ``(M, B, N_max, T)`` target and the filled ``(B, M)`` weights, to be
    fed to whichever loss the config names.
    """
    active = weights != 0.0  # (B, M)
    num_distilled = jnp.sum(~active)
    distill_weight = (
        distill_ratio / (1.0 - distill_ratio) * jnp.sum(weights) / num_distilled
    )
    full_weights = jnp.where(active, weights, distill_weight)  # (B, M)
    active_mb = active.T[:, :, None, None]  # (M, B, 1, 1)
    full_target = jnp.where(active_mb, target[None], teacher_prediction)
    return full_target, full_weights


def mice_poisson_distill_loss(
    prediction: jax.Array,  # (M, B, N_max, T) float32
    target: jax.Array,  # (B, N_max, T) float32
    weights: jax.Array,  # (B, M) float32
    teacher_prediction: jax.Array,  # (M, B, N_max, T) float32, no gradient
    distill_ratio: float,
    eps: float = 1e-8,
) -> jax.Array:
    """Poisson NLL with teacher predictions filling zero-weight cells
    (``inject_distill_targets`` composed with ``mice_poisson_loss``)."""
    full_target, full_weights = inject_distill_targets(
        target, weights, teacher_prediction, distill_ratio
    )
    return mice_poisson_loss(prediction, full_target, full_weights, eps=eps)


def _weighted_mice_reduce(elem_fn):
    """Lift an elementwise loss into the mice-batch weighting skeleton.

    The reference registers every stock torch loss alongside
    ``mice_poisson`` (argus_models.py:17-20); no shipped config uses them,
    but configs may name them.  Stock losses here consume the same padded
    mice batch as ``mice_poisson`` — elementwise loss, per-(mouse, batch)
    sum, normalized-weight reduce — so swapping the loss name in a config
    is well-defined.
    """

    def loss(prediction, target, weights, **kwargs):
        w = weights / jnp.sum(weights)
        # Same selection masking as mice_poisson_loss: unsupervised cells
        # drift without gradient, so never evaluate the loss on them.  The
        # input-side where is required here for vjp safety (e.g. MSE's
        # d/dp = 2(p - t) is inf at a drifted inf prediction; a zero
        # cotangent times inf is NaN); the output guard then only needs
        # per-cell size.  These registry losses are breadth, not the
        # production hot path — mice_poisson_loss carries the lean form.
        active_mb = w.T != 0.0  # (M, B)
        prediction = jnp.where(active_mb[:, :, None, None], prediction, 0.0)
        elem = elem_fn(prediction, _broadcast_target(target, prediction), **kwargs)
        per_cell = jnp.sum(elem, axis=(2, 3))  # (M, B)
        per_cell = jnp.where(active_mb, per_cell, 0.0)
        return jnp.sum(per_cell * w.T)

    return loss


def _l1(pred, target):
    return jnp.abs(pred - target)


def _mse(pred, target):
    return jnp.square(pred - target)


def _smooth_l1(pred, target, beta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def _huber(pred, target, delta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.where(d < delta, 0.5 * d * d, delta * (d - 0.5 * delta))


_LOSSES = {
    "mice_poisson": mice_poisson_loss,
    # Stock-loss breadth (torch registry names, argus_models.py:17-20).
    "PoissonNLLLoss": mice_poisson_loss,
    "L1Loss": _weighted_mice_reduce(_l1),
    "MSELoss": _weighted_mice_reduce(_mse),
    "SmoothL1Loss": _weighted_mice_reduce(_smooth_l1),
    "HuberLoss": _weighted_mice_reduce(_huber),
}

# Which optional config kwargs each loss accepts (name -> cast).
_POISSON_KWARGS = {"eps": float, "log_input": bool, "full": bool}
_LOSS_KWARGS = {
    "mice_poisson": _POISSON_KWARGS,
    "PoissonNLLLoss": _POISSON_KWARGS,
    "SmoothL1Loss": {"beta": float},
    "HuberLoss": {"delta": float},
}


def get_loss(name: str, loss_params: dict, neuron_mask=None):
    """Registry keyed by the config names of the reference (losses.py:5).

    ``neuron_mask`` is the model's (M, N_max) real-neuron mask; the engine
    threads it so the ``log_input=True`` Poisson form stays exact under
    the padded batch layout (see ``mice_poisson_loss``).

    Default semantics match what each name means in the reference:
    ``mice_poisson`` is ``MicePoissonLoss`` whose ``log_input`` defaults to
    False (losses.py:6), while the stock ``PoissonNLLLoss`` name is
    ``torch.nn.PoissonNLLLoss`` whose ``log_input`` defaults to True.
    """
    if name not in _LOSSES:
        raise KeyError(f"Unknown loss '{name}'")
    base = _LOSSES[name]
    kwargs = {
        key: cast(loss_params[key])
        for key, cast in _LOSS_KWARGS.get(name, {}).items()
        if key in loss_params
    }
    if name in ("mice_poisson", "PoissonNLLLoss"):
        kwargs.setdefault("log_input", name == "PoissonNLLLoss")
        if kwargs["log_input"]:
            if neuron_mask is None:
                raise ValueError(
                    "log_input=True requires the model's neuron mask: padded "
                    "readout rows would each contribute exp(0) = 1 otherwise "
                    "(get_loss(neuron_mask=...), built from readout_outputs)"
                )
            kwargs["neuron_mask"] = jnp.asarray(neuron_mask, jnp.float32)
    def loss_fn(prediction, target, weights):
        return base(prediction, target, weights, **kwargs)

    return loss_fn
