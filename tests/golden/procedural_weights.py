"""Deterministic procedural weights for large golden-parity fixtures.

The flagship ``true_batch_001`` DwiseNeuro has ~182M parameters; committing
two full state dicts (pre/post forward) would cost ~1.5 GB.  Instead both
sides of the parity test regenerate the weights from the *names and shapes*
of the torch state dict with a per-key seeded ``np.random.Generator``:

* the generator (``generate_golden.py --flagship``, torch side) fills the
  reference model's state dict procedurally before capturing activations;
* the parity test (JAX side) rebuilds the identical torch-keyed dict from
  the key/shape table stored in the fixture and feeds it through
  ``convert_torch_state_dict``.

Fill rules depend only on (key suffix, ndim), so both sides agree without
sharing torch:

  running_mean        -> N(0, 0.05)          nontrivial eval-path stats
  running_var         -> U(0.5, 1.5)
  1-dim ``weight``    -> U(0.8, 1.2)         BatchNorm scale (no Linear
                                             layers exist in the model)
  ``bias``            -> N(0, 0.05)
  >=3-dim ``weight``  -> N(0, sqrt(2/fan_in)) conv kernels,
                                             fan_in = prod(shape[1:])
"""

from __future__ import annotations

import zlib

import numpy as np


def fill_value(key: str, shape: tuple[int, ...]) -> np.ndarray | None:
    # Deterministic module-computed buffers (the reference PE's `inv_freq`,
    # dwiseneuro.py:156-161) keep their own values: return None to skip.
    if key.endswith("inv_freq"):
        return None
    rng = np.random.default_rng(zlib.crc32(key.encode("utf-8")))
    if key.endswith("running_mean"):
        return rng.normal(0.0, 0.05, shape).astype(np.float32)
    if key.endswith("running_var"):
        return rng.uniform(0.5, 1.5, shape).astype(np.float32)
    if key.endswith("weight") and len(shape) == 1:
        return rng.uniform(0.8, 1.2, shape).astype(np.float32)
    if key.endswith("bias"):
        return rng.normal(0.0, 0.05, shape).astype(np.float32)
    if key.endswith("weight"):
        fan_in = int(np.prod(shape[1:]))
        scale = np.sqrt(2.0 / max(fan_in, 1))
        return rng.normal(0.0, scale, shape).astype(np.float32)
    raise ValueError(f"No fill rule for state-dict key {key!r} shape {shape}")


def fill_state(meta: dict[str, tuple[int, ...]]) -> dict[str, np.ndarray]:
    filled = {}
    for key, shape in meta.items():
        value = fill_value(key, tuple(shape))
        if value is not None:
            filled[key] = value
    return filled
