"""Channel shuffle for grouped convolutions (ShuffleNet-style).

After a grouped 1x1 conv, interleave channels across groups so information
mixes between groups in the next layer.  With input channel j laid out as
group-major (g * (C/G) + k), output channel index is k * G + g — the exact
permutation of the reference's view/transpose/reshape
(``/root/reference/src/models/dwiseneuro.py:212-219``), applied here on the
trailing (lane) axis.
"""

from __future__ import annotations

import jax


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    if groups <= 1:
        return x
    *lead, channels = x.shape
    x = x.reshape(*lead, groups, channels // groups)
    x = x.swapaxes(-1, -2)
    return x.reshape(*lead, channels)
