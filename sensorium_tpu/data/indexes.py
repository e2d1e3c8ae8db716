"""Strided frame-window indexing.

A model step consumes ``size`` frames sampled every ``step`` raw frames
around an anchor frame.  The anchor can sit at the first, middle, or last
position of the window (the production configs use ``last``: the model sees
only past frames).  Capability parity with the reference
``IndexesGenerator`` (``/root/reference/src/indexes.py``), but vectorized:
windows for many anchors are produced as one ``(num_anchors, size)`` int
array so the batched TPU predictor can gather hundreds of sliding windows
in a single device op.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass(frozen=True)
class WindowIndexer:
    size: int
    step: int
    position: str = "last"
    behind: int = field(init=False)
    ahead: int = field(init=False)
    width: int = field(init=False)

    def __post_init__(self):
        if self.position == "first":
            behind, ahead = 0, self.size - 1
        elif self.position == "middle":
            behind = self.size // 2
            ahead = self.size - behind - 1
        elif self.position == "last":
            behind, ahead = self.size - 1, 0
        else:
            raise ValueError("position must be one of 'first', 'middle', 'last'")
        object.__setattr__(self, "behind", behind * self.step)
        object.__setattr__(self, "ahead", ahead * self.step)
        object.__setattr__(self, "width", self.behind + self.ahead + 1)

    def window(self, anchor: int) -> np.ndarray:
        """Frame indexes of the window anchored at ``anchor`` — shape (size,)."""
        return np.arange(anchor - self.behind, anchor + self.ahead + 1, self.step)

    def windows(self, anchors: np.ndarray) -> np.ndarray:
        """Vectorized windows for many anchors — shape (len(anchors), size)."""
        anchors = np.asarray(anchors, dtype=np.int64)
        offsets = np.arange(-self.behind, self.ahead + 1, self.step, dtype=np.int64)
        return anchors[:, None] + offsets[None, :]

    def valid_anchors(self, length: int) -> np.ndarray:
        """All anchors whose window fits inside a trial of ``length`` frames."""
        return np.arange(self.behind, length - self.ahead, dtype=np.int64)

    def clip_anchor(self, anchor: int, length: int, save_zone: int = 0) -> int:
        """Clamp an anchor so its window (plus save zone) stays in bounds."""
        low = self.behind + save_zone
        high = length - self.ahead - save_zone - 1
        return int(min(max(anchor, low), high))
