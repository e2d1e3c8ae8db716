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
import threading
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

MODEL_CHECKPOINT_VERSION = 1


def _to_host(tree):
    # Enqueue every device->host DMA before blocking on any of them, so the
    # leaves transfer concurrently instead of serially.
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class _AsyncWriter:
    """One in-flight background checkpoint write.

    The device->host fetch always happens on the caller's thread (the train
    step donates its state buffers, so a deferred fetch would race buffer
    invalidation); only serialization + the fsync'd atomic write — the
    host-side half of a multi-GB save — moves off the training loop.  At
    most one write is in flight: starting the next save (or any load) joins
    the previous one first, preserving write ordering.
    """

    def __init__(self):
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None
        self._lock = threading.Lock()

    def _drain_locked(self) -> BaseException | None:
        """Join the in-flight write and collect its error (lock held)."""
        thread, self._thread = self._thread, None
        if thread is not None:
            thread.join()
        error, self._error = self._error, None
        return error

    def wait(self) -> None:
        """Block until the in-flight write (if any) completes; re-raise its error."""
        with self._lock:
            error = self._drain_locked()
        if error is not None:
            raise error

    def submit(self, path: Path, serialize) -> None:
        def run():
            try:
                _atomic_write(path, serialize())
            except BaseException as exc:  # surfaced on the next wait()
                self._error = exc

        # Drain + replace under ONE lock hold: a wait()-then-lock sequence
        # would let two concurrent submitters both see "no in-flight write"
        # and race, orphaning one thread (its error never surfaced) and
        # breaking the one-in-flight ordering guarantee.
        with self._lock:
            error = self._drain_locked()
            if error is None:
                self._thread = threading.Thread(
                    target=run, name=f"ckpt-write-{path.name}", daemon=True
                )
                self._thread.start()
        if error is not None:
            raise error


_writer = _AsyncWriter()


def flush_pending_saves() -> None:
    """Join any in-flight background checkpoint write (no-op when idle).

    Call before process exit and before reading back a just-written file.
    Raises the background write's exception, if it failed.
    """
    _writer.wait()


def _atomic_write(path: Path, payload: bytes) -> None:
    tmp_path = path.with_name(path.name + ".tmp")
    with open(tmp_path, "wb") as handle:
        handle.write(payload)
        handle.flush()
        os.fsync(handle.fileno())
    os.replace(tmp_path, path)


def save_model_checkpoint(
    path, argus_params: dict, nn_state: dict, model_name="MouseModel",
    background: bool = False,
):
    """Serialize an inference checkpoint (EMA weights + config).

    ``background=True`` moves serialization + the fsync'd write off the
    calling thread (the device->host fetch stays synchronous — see
    ``_AsyncWriter``); training resumes while the previous epoch's
    checkpoint is still hitting disk.
    """
    payload = {
        "version": MODEL_CHECKPOINT_VERSION,
        "model_name": model_name,
        # JSON round-trip normalizes tuples to lists and rejects non-plain data.
        "params": json.loads(json.dumps(argus_params)),
        "nn_state": _to_host(nn_state),
    }
    if background:
        _writer.submit(Path(path), lambda: serialization.msgpack_serialize(payload))
    else:
        _writer.wait()
        _atomic_write(Path(path), serialization.msgpack_serialize(payload))


def load_model_checkpoint(path) -> dict[str, Any]:
    flush_pending_saves()
    with open(path, "rb") as handle:
        payload = serialization.msgpack_restore(handle.read())
    if payload.get("version") != MODEL_CHECKPOINT_VERSION:
        raise ValueError(f"Unsupported checkpoint version in {path}")
    return payload


def save_train_state(
    path, state, argus_params: dict, extra: dict | None = None,
    background: bool = False,
):
    """Serialize the full training state for resume (params + opt + RNG)."""
    payload = {
        "version": MODEL_CHECKPOINT_VERSION,
        "params": json.loads(json.dumps(argus_params)),
        "state": _to_host(serialization.to_state_dict(state)),
        "extra": extra or {},
    }
    if background:
        _writer.submit(Path(path), lambda: serialization.msgpack_serialize(payload))
    else:
        _writer.wait()
        _atomic_write(Path(path), serialization.msgpack_serialize(payload))


def load_train_state(path, state_template):
    """Restore a training state into the structure of ``state_template``."""
    flush_pending_saves()
    with open(path, "rb") as handle:
        payload = serialization.msgpack_restore(handle.read())
    state = serialization.from_state_dict(state_template, payload["state"])
    return state, payload.get("extra", {})


# ---------------------------------------------------------------- sharded
# Orbax/tensorstore-backed train-state checkpoints for sharded scale.
#
# The msgpack path above gathers the full state to one host — fine while
# every array is process-addressable (single host, or multi-host pure-DP
# where parameters are replicated), impossible once parameters shard
# ACROSS processes (multi-host tensor parallelism): ``device_get`` of a
# non-addressable global array raises.  Orbax writes each process's shards
# straight from device to the (shared) checkpoint directory and restores
# with the template's shardings — state never gathers anywhere, and resume
# places arrays directly back on the mesh.


def save_train_state_sharded(dir_path, state, argus_params: dict, extra: dict | None = None):
    """Write a sharded resume checkpoint: ``<dir>/state`` (orbax) + meta.json."""
    import orbax.checkpoint as ocp

    flush_pending_saves()
    dir_path = Path(dir_path)
    dir_path.mkdir(parents=True, exist_ok=True)
    checkpointer = ocp.StandardCheckpointer()
    try:
        checkpointer.save((dir_path / "state").resolve(), state, force=True)
    finally:
        checkpointer.close()
    if jax.process_index() == 0:
        meta = {
            "version": MODEL_CHECKPOINT_VERSION,
            "params": json.loads(json.dumps(argus_params)),
            "extra": extra or {},
        }
        _atomic_write(dir_path / "meta.json", json.dumps(meta).encode())


def load_train_state_sharded(dir_path, state_template):
    """Restore ``<dir>`` into the template's structure AND shardings.

    Unlike the msgpack path (host leaves, re-placed by the caller), the
    restored arrays land directly on the template's mesh placement.
    """
    import orbax.checkpoint as ocp

    dir_path = Path(dir_path)
    meta = json.loads((dir_path / "meta.json").read_text())
    if meta.get("version") != MODEL_CHECKPOINT_VERSION:
        raise ValueError(f"Unsupported checkpoint version in {dir_path}")
    checkpointer = ocp.StandardCheckpointer()
    try:
        state = checkpointer.restore((dir_path / "state").resolve(), state_template)
    finally:
        checkpointer.close()
    return state, meta.get("extra", {})
