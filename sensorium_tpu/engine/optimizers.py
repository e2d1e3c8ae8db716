"""Optimizer registry keyed by the config names used in experiment files.

The reference resolves ``"optimizer": ("AdamW", {...})`` against torch.optim
through argus' registry (any torch optimizer by class name); here the same
names map to optax transformations with torch-matching *update math*, not
just matching names — eps placement, accumulator init, coupled-vs-decoupled
weight decay and momentum order all follow torch (each entry is pinned
step-for-step in ``tests/test_engine.py::TestOptimizerParity``).
"""

from __future__ import annotations

from typing import Callable

import optax


def _adamw(learning_rate, *, weight_decay=1e-2, betas=(0.9, 0.999), eps=1e-8):
    return optax.adamw(
        learning_rate, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    )


def _adam(learning_rate, *, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    if weight_decay:
        # torch Adam couples L2 into the gradient.
        return optax.chain(
            optax.add_decayed_weights(weight_decay), optax.adam(learning_rate, *betas, eps)
        )
    return optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)


def _sgd(learning_rate, *, momentum=0.0, weight_decay=0.0, nesterov=False):
    transforms = []
    if weight_decay:
        transforms.append(optax.add_decayed_weights(weight_decay))
    transforms.append(
        optax.sgd(learning_rate, momentum=momentum or None, nesterov=nesterov)
    )
    return optax.chain(*transforms)


def _coupled_l2(weight_decay, inner):
    """torch couples L2 into the gradient for every non-W optimizer."""
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), inner)
    return inner


def _rmsprop(
    learning_rate,
    *,
    alpha=0.99,
    eps=1e-8,
    weight_decay=0.0,
    momentum=0.0,
    centered=False,
):
    # torch keeps eps OUTSIDE the sqrt and starts the square average at 0
    # (optax defaults differ on both); momentum accumulates the scaled
    # update before the lr multiply, exactly optax's trace.
    return _coupled_l2(
        weight_decay,
        optax.rmsprop(
            learning_rate,
            decay=alpha,
            eps=eps,
            initial_scale=0.0,
            eps_in_sqrt=False,
            centered=centered,
            momentum=momentum or None,
        ),
    )


def _adagrad(learning_rate, *, lr_decay=0.0, weight_decay=0.0,
             initial_accumulator_value=0.0, eps=1e-10):
    if lr_decay:
        raise NotImplementedError("Adagrad lr_decay is not supported")
    return _coupled_l2(
        weight_decay,
        optax.adagrad(
            learning_rate, initial_accumulator_value=initial_accumulator_value, eps=eps
        ),
    )


def _adamax(learning_rate, *, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    return _coupled_l2(
        weight_decay, optax.adamax(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    )


def _radam(learning_rate, *, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    return _coupled_l2(
        weight_decay, optax.radam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    )


def _scale_by_torch_nadam(b1, b2, eps, momentum_decay):
    """torch.optim.NAdam's update math as an optax transform.

    optax's ``nadam`` follows Dozat's paper; torch additionally anneals the
    momentum coefficient, ``mu_t = b1 * (1 - 0.5 * 0.96**(t * psi))``, and
    divides the two Nesterov terms by the running ``mu`` products
    (pytorch/torch/optim/nadam.py).  Reproduced here so the config name
    "NAdam" means the same trajectory it does under argus/torch.
    """
    import jax
    import jax.numpy as jnp

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {
            "count": jnp.zeros((), jnp.int32),
            "mu_product": jnp.ones((), jnp.float32),
            "exp_avg": zeros,
            "exp_avg_sq": jax.tree_util.tree_map(jnp.zeros_like, params),
        }

    def update(updates, state, params=None):
        del params
        t = state["count"] + 1
        tf = t.astype(jnp.float32)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (tf * momentum_decay))
        mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((tf + 1.0) * momentum_decay))
        mu_product = state["mu_product"] * mu_t
        exp_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state["exp_avg"], updates
        )
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state["exp_avg_sq"], updates
        )
        bias2 = 1.0 - b2**tf

        def step(g, m, v):
            denom = jnp.sqrt(v / bias2) + eps
            return (
                -(1.0 - mu_t) / (1.0 - mu_product) * g / denom
                - mu_next / (1.0 - mu_product * mu_next) * m / denom
            )

        new_updates = jax.tree_util.tree_map(step, updates, exp_avg, exp_avg_sq)
        return new_updates, {
            "count": t,
            "mu_product": mu_product,
            "exp_avg": exp_avg,
            "exp_avg_sq": exp_avg_sq,
        }

    return optax.GradientTransformation(init, update)


def _nadam(learning_rate, *, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
           momentum_decay=4e-3):
    return _coupled_l2(
        weight_decay,
        optax.chain(
            _scale_by_torch_nadam(betas[0], betas[1], eps, momentum_decay),
            # NOTE sign: the transform already negates, so scale by +lr.
            optax.scale_by_learning_rate(learning_rate, flip_sign=False),
        ),
    )


def clip_grad_norm(max_norm: float) -> "optax.GradientTransformation":
    """``torch.nn.utils.clip_grad_norm_`` as an optax transform.

    torch scales every gradient by ``max_norm / (global_l2_norm + 1e-6)``,
    clamped to at most 1 (pytorch/torch/nn/utils/clip_grad.py) — note the
    1e-6 in the denominator, which ``optax.clip_by_global_norm`` omits.
    Chained BEFORE the optimizer when the config sets ``"grad_clip"``, so
    the clip sees raw gradients exactly as torch's pre-``optimizer.step()``
    call does.
    """
    import jax
    import jax.numpy as jnp

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (g_norm + 1e-6))
        return jax.tree_util.tree_map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init, update)


_OPTIMIZERS: dict[str, Callable] = {
    "AdamW": _adamw,
    "Adam": _adam,
    "SGD": _sgd,
    "RMSprop": _rmsprop,
    "Adagrad": _adagrad,
    "Adamax": _adamax,
    "RAdam": _radam,
    "NAdam": _nadam,
}


def get_optimizer(name: str, optimizer_params: dict, learning_rate=None):
    """Build an optax transformation.

    ``learning_rate`` (a float or an optax schedule) overrides the config's
    static ``lr`` — the training engine passes the warmup+cosine schedule
    here while configs keep the reference's ``{"lr": peak}`` shape.
    """
    if name not in _OPTIMIZERS:
        raise KeyError(f"Unknown optimizer '{name}'")
    kwargs = dict(optimizer_params)
    lr = kwargs.pop("lr", None)
    if learning_rate is None:
        learning_rate = lr
    if learning_rate is None:
        raise ValueError("No learning rate given")
    return _OPTIMIZERS[name](learning_rate, **kwargs)
