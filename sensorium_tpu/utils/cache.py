"""Persistent XLA compilation cache.

The flagship model compiles in minutes (train step ~40-70 s, plus init);
enabling JAX's persistent compilation cache makes every CLI/bench process
after the first reuse the serialized executables.  Opt out with
SENSORIUM_JAX_CACHE=0; point elsewhere with SENSORIUM_JAX_CACHE=<dir>.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache() -> str | None:
    """Idempotently enable the persistent compile cache; returns its dir."""
    setting = os.environ.get("SENSORIUM_JAX_CACHE", "")
    if setting == "0":
        return None
    cache_dir = setting or str(Path.home() / ".cache" / "sensorium_tpu" / "xla")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — older jax without these knobs
        return None
    return cache_dir
