"""Test configuration: run JAX on a virtual 8-device CPU backend.

Multi-chip sharding (pjit / shard_map collectives, sync-BN) is exercised
without TPU hardware via JAX's host-platform device-count override — the
standard fake-backend trick.

Note: installed pytest plugins (jaxtyping et al.) import jax before this
conftest runs, so environment variables are already baked into jax.config
defaults — we must use jax.config.update, which works as long as no
backend has been initialized yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: the flagship-shape parity/import tests spend
# most of their minutes in XLA:CPU compiles that are identical run to run
# (the CLI subprocesses spawned by tests already use the same cache).
from sensorium_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
