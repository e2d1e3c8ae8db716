"""Multi-process (multi-host) cluster bring-up shared by the CLIs.

``jax.distributed`` initialization from a CLI spec — ``auto`` (TPU pod
metadata) or ``COORD_ADDR,NUM_PROCESSES,PROCESS_ID``.  Must run before any
backend initialization.  Used by ``cli/train.py --multihost`` (global-batch
data-parallel training) and ``cli/predict.py --multihost`` (embarrassingly
parallel trial fan-out, docs/SCALING.md "Inference at scale").
"""

from __future__ import annotations

import jax


def init_from_spec(spec: str) -> None:
    """``jax.distributed.initialize`` from ``auto`` or ``COORD,N,ID``."""
    if spec == "auto":
        jax.distributed.initialize()
    else:
        coordinator, num_processes, process_id = spec.rsplit(",", 2)
        jax.distributed.initialize(
            coordinator,
            num_processes=int(num_processes),
            process_id=int(process_id),
        )
    print(
        f"Multihost: process {jax.process_index()}/{jax.process_count()}, "
        f"{len(jax.devices())} global devices"
    )


def barrier(name: str) -> None:
    """Block until every process reaches this point (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
