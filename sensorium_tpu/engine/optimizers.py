"""Optimizer registry keyed by the config names used in experiment files.

The reference resolves ``"optimizer": ("AdamW", {...})`` against torch.optim
through argus' registry; here the same names map to optax transformations
with torch-matching defaults (betas (0.9, 0.999), eps 1e-8, decoupled
weight decay).
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


_OPTIMIZERS: dict[str, Callable] = {
    "AdamW": _adamw,
    "Adam": _adam,
    "SGD": _sgd,
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
