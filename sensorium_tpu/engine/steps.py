"""Jitted train / validation steps.

Functional equivalents of ``MouseModel.train_step`` / ``val_step``
(``/root/reference/src/argus_models.py:43-99``), as pure functions of a
``TrainState`` so the whole update — teacher forward, model forward over
all readouts, Poisson loss, backward, AdamW update, EMA update, BN-stat
update — compiles to a single XLA executable:

* gradient accumulation (``iter_size``) is a ``lax.scan`` over microbatch
  chunks (reference: ``deep_chunk`` loop, argus_models.py:48-56), carrying
  BN statistics chunk-to-chunk exactly like sequential torch forwards;
* mixed precision is bf16 compute inside the model with fp32 master
  params — no GradScaler (bf16 keeps fp32's exponent range);
* under a sharded mesh the batch axis is partitioned and every batch
  reduction (BN moments, loss, gradients) becomes a cross-replica
  collective inserted by GSPMD — sync-BN and gradient all-reduce for free.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from sensorium_tpu.engine.ema import ema_update
from sensorium_tpu.engine.losses import inject_distill_targets
from sensorium_tpu.engine.state import TrainState


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    ema_decay: float = 0.0,
    iter_size: int = 1,
    distill_ratio: float = 0.0,
    teacher_model=None,
    donate: bool = True,
    mesh=None,
):
    """Build the jitted train step.

    Returns ``step(state, inputs, targets, weights[, teacher_vars])``
    -> ``(new_state, loss)``.  ``teacher_vars`` is a dict with keys
    ``params`` / ``batch_stats`` when distillation is enabled.
    ``mesh``: the device mesh the step will run on (None = single device);
    multi-axis meshes are declared to the depthwise-conv custom VJP so its
    weight gradient sidesteps the jax-0.9.0 partitioner bug
    (ops/conv.py ``dw_sharded_mesh``).
    """
    use_ema = ema_decay > 0.0
    use_distill = distill_ratio > 0.0 and teacher_model is not None

    if mesh is not None and len(mesh.shape) >= 2:
        from sensorium_tpu.ops.conv import dw_sharded_mesh
        from sensorium_tpu.parallel.mesh import data_axes

        def trace_ctx():
            return dw_sharded_mesh(mesh, data_axes(mesh))
    else:
        def trace_ctx():
            return contextlib.nullcontext()

    def microbatch_update(params, batch_stats, rng, inputs, targets, weights, teacher_vars):
        def compute_loss(p):
            prediction, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                inputs,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            prediction = prediction.astype(jnp.float32)
            if use_distill:
                teacher_pred = teacher_model.apply(
                    {
                        "params": teacher_vars["params"],
                        "batch_stats": teacher_vars["batch_stats"],
                    },
                    inputs,
                    train=False,
                )
                teacher_pred = jax.lax.stop_gradient(teacher_pred.astype(jnp.float32))
                # Reference order (argus_models.py:50-52): inject teacher
                # targets into the batch, THEN apply the configured loss.
                full_targets, full_weights = inject_distill_targets(
                    targets, weights, teacher_pred, distill_ratio
                )
                loss = loss_fn(prediction, full_targets, full_weights)
            else:
                loss = loss_fn(prediction, targets, weights)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(compute_loss, has_aux=True)(params)
        return loss, new_stats, grads

    def step(state: TrainState, inputs, targets, weights, teacher_vars=None):
        # contextvar scope at TRACE time: the whole body (incl. the VJP
        # rules built by value_and_grad) traces under the declared mesh.
        with trace_ctx():
            return _step_body(state, inputs, targets, weights, teacher_vars)

    def _step_body(state: TrainState, inputs, targets, weights, teacher_vars=None):
        rng, step_rng = jax.random.split(state.rng)

        if iter_size == 1:
            loss, batch_stats, grads = microbatch_update(
                state.params, state.batch_stats, step_rng, inputs, targets, weights, teacher_vars
            )
        else:
            # Chunk the leading batch axis; average grads, sum the per-chunk
            # (already /iter_size-scaled) losses like the reference
            # (argus_models.py:53-56 scales each chunk's loss by 1/iter_size).
            # Unlike the reference's deep_chunk (which allows uneven torch
            # chunks like 11/11/10), the static-shape lax.scan requires the
            # batch to divide evenly — fail with a clear message instead of
            # an opaque reshape trace error (documented in MIGRATION.md).
            if inputs.shape[0] % iter_size:
                raise ValueError(
                    f"batch_size {inputs.shape[0]} is not divisible by "
                    f"iter_size {iter_size}: gradient-accumulation microbatches "
                    "are equal-size lax.scan chunks on TPU (static shapes); "
                    "pick batch_size % iter_size == 0"
                )

            def reshape(x):
                chunk = x.shape[0] // iter_size
                return x.reshape((iter_size, chunk) + x.shape[1:])

            chunks = jax.tree_util.tree_map(reshape, (inputs, targets, weights))
            rngs = jax.random.split(step_rng, iter_size)

            def body(carry, chunk_and_rng):
                batch_stats, grads_acc, loss_acc = carry
                (c_inputs, c_targets, c_weights), c_rng = chunk_and_rng
                loss, batch_stats, grads = microbatch_update(
                    state.params, batch_stats, c_rng, c_inputs, c_targets, c_weights, teacher_vars
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                return (batch_stats, grads_acc, loss_acc + loss / iter_size), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (batch_stats, grads, loss), _ = jax.lax.scan(
                body, (state.batch_stats, zero_grads, jnp.float32(0.0)), (chunks, rngs)
            )
            grads = jax.tree_util.tree_map(lambda g: g / iter_size, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        if use_ema:
            ema_params = ema_update(state.ema_params, params, ema_decay)
            ema_batch_stats = ema_update(state.ema_batch_stats, batch_stats, ema_decay)
        else:
            ema_params = state.ema_params
            ema_batch_stats = state.ema_batch_stats

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            ema_params=ema_params,
            ema_batch_stats=ema_batch_stats,
            rng=rng,
        )
        return new_state, loss

    if use_distill:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    # Drop the teacher argument from the jitted signature.
    no_teacher = lambda state, i, t, w: step(state, i, t, w, None)  # noqa: E731
    return jax.jit(no_teacher, donate_argnums=(0,) if donate else ())


def make_val_step(model, loss_fn: Callable):
    """Jitted validation step on the EMA weights (argus_models.py:73-87).

    Returns ``(loss, prediction)``; the prediction crosses to host for the
    correlation metric.
    """

    @jax.jit
    def step(params, batch_stats, inputs, targets, weights):
        prediction = model.apply(
            {"params": params, "batch_stats": batch_stats}, inputs, train=False
        )
        prediction = prediction.astype(jnp.float32)
        loss = loss_fn(prediction, targets, weights)
        return loss, prediction

    return step


def make_predict_step(model, mouse_index: int | None = None):
    """Jitted inference forward (argus_models.py:89-99)."""

    @functools.partial(jax.jit, static_argnames=("train",))
    def step(params: Any, batch_stats: Any, inputs, train: bool = False):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            inputs,
            mouse_index=mouse_index,
            train=False,
        ).astype(jnp.float32)

    return step
