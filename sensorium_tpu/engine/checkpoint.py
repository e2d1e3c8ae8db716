"""Checkpoint serialization.

Keeps the reference's checkpoint *contract* (EmaCheckpoint, ema.py:61-73):
a model checkpoint is ``{model_name, params, nn_state}`` where ``params``
is the full argus-style config dict and ``nn_state`` holds the **EMA**
weights; files are named ``model-{epoch:03d}-{val_corr:.6f}.ckpt`` so
``get_best_model_path`` can parse the score (utils.py:22-43).

TPU-first differences:
* weights are a flax variable pytree ``{"params": ..., "batch_stats": ...}``
  serialized with msgpack (no pickle, no torch);
* a separate *training state* checkpoint (``save_train_state``) captures
  optimizer moments, step counter and RNG — enabling mid-training resume,
  which the reference cannot do (SURVEY.md §5);
* writes are atomic (tmp file + rename) so preemption never leaves a
  truncated checkpoint.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

MODEL_CHECKPOINT_VERSION = 1


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _atomic_write(path: Path, payload: bytes) -> None:
    tmp_path = path.with_name(path.name + ".tmp")
    with open(tmp_path, "wb") as handle:
        handle.write(payload)
        handle.flush()
        os.fsync(handle.fileno())
    os.replace(tmp_path, path)


def save_model_checkpoint(path, argus_params: dict, nn_state: dict, model_name="MouseModel"):
    """Serialize an inference checkpoint (EMA weights + config)."""
    payload = {
        "version": MODEL_CHECKPOINT_VERSION,
        "model_name": model_name,
        # JSON round-trip normalizes tuples to lists and rejects non-plain data.
        "params": json.loads(json.dumps(argus_params)),
        "nn_state": _to_host(nn_state),
    }
    _atomic_write(Path(path), serialization.msgpack_serialize(payload))


def load_model_checkpoint(path) -> dict[str, Any]:
    with open(path, "rb") as handle:
        payload = serialization.msgpack_restore(handle.read())
    if payload.get("version") != MODEL_CHECKPOINT_VERSION:
        raise ValueError(f"Unsupported checkpoint version in {path}")
    return payload


def save_train_state(path, state, argus_params: dict, extra: dict | None = None):
    """Serialize the full training state for resume (params + opt + RNG)."""
    payload = {
        "version": MODEL_CHECKPOINT_VERSION,
        "params": json.loads(json.dumps(argus_params)),
        "state": _to_host(serialization.to_state_dict(state)),
        "extra": extra or {},
    }
    _atomic_write(Path(path), serialization.msgpack_serialize(payload))


def load_train_state(path, state_template):
    """Restore a training state into the structure of ``state_template``."""
    with open(path, "rb") as handle:
        payload = serialization.msgpack_restore(handle.read())
    state = serialization.from_state_dict(state_template, payload["state"])
    return state, payload.get("extra", {})
