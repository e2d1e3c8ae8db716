"""Tracing / profiling / numerical-sanitizer utilities.

The reference has no observability tooling (SURVEY.md §5 — its only timing
aid is tqdm and a sleep between folds).  This module provides the TPU
equivalents:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  Perfetto/TensorBoard trace of device execution;
* ``annotate(name)`` — named trace span (shows up inside the profile);
* ``Stopwatch`` — wall-clock section timing with device synchronization
  (``device_get`` of a scalar — ``block_until_ready`` alone can return
  early under remote-execution tunnels);
* ``debug_nans(enable)`` — the sanitizer story: jit purity makes data races
  structural non-issues on TPU, so the remaining failure class is
  numerical; this flips ``jax_debug_nans`` so the first NaN-producing op
  raises with a traceback.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span annotation inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


def sync(tree=None) -> None:
    """Drain outstanding device work.

    Fetches one scalar from the tree (or a fresh trivial computation) —
    a hard synchronization point that works through remote tunnels.
    """
    if tree is None:
        np.asarray(jax.device_get(jax.numpy.zeros(())))
        return
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        leaf = leaves[-1]
        # ONE scalar, never the whole leaf: a flagship readout kernel is
        # ~660 MB, which is ~a minute through the ~11 MB/s axon tunnel —
        # fetched on section entry AND exit it would swamp the timing.
        if getattr(leaf, "ndim", 0):
            leaf = leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf
        np.asarray(jax.device_get(leaf))


class Stopwatch:
    """Accumulating section timer with device synchronization."""

    def __init__(self):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, tree=None):
        sync(tree)
        start = time.perf_counter()
        yield
        sync(tree)
        elapsed = time.perf_counter() - start
        self.times[name] = self.times.get(name, 0.0) + elapsed
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, float]:
        return {
            name: self.times[name] / max(self.counts[name], 1) for name in self.times
        }


def debug_nans(enable: bool = True) -> None:
    """Toggle the NaN sanitizer: the first NaN produced under jit raises."""
    jax.config.update("jax_debug_nans", enable)
