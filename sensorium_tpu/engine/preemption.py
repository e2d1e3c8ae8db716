"""Preemption handling for TPU-VM training.

The reference has no failure story at all — a killed fold is simply rerun
from scratch (SURVEY.md §5).  TPU VMs are routinely preempted with a
SIGTERM warning; this module turns that warning into a clean exit:

* ``PreemptionHandler`` installs signal handlers (SIGTERM by default) that
  set a flag instead of killing the process;
* ``MouseModel.fit`` polls the flag between training steps; when set, it
  saves the full train state (optimizer moments, EMA, RNG, step) through
  the atomic checkpoint writer and raises ``TrainingPreempted``;
* ``cli/train.py --resume`` then restarts the interrupted epoch — the
  explicit ``(seed, epoch, index)`` RNG discipline of the data pipeline
  makes the replayed epoch deterministic.
"""

from __future__ import annotations

import signal
from types import FrameType


class TrainingPreempted(Exception):
    """Raised by the fit loop after state was saved on a preemption signal."""

    def __init__(self, save_path):
        super().__init__(f"training preempted; train state saved to '{save_path}'")
        self.save_path = save_path


class PreemptionHandler:
    """Context manager that latches preemption signals into a flag."""

    def __init__(self, signals: tuple[int, ...] = (signal.SIGTERM,)):
        self.signals = signals
        self.triggered = False
        self._previous: dict[int, object] = {}

    def _on_signal(self, signum: int, frame: FrameType | None) -> None:
        self.triggered = True

    def __enter__(self) -> "PreemptionHandler":
        self.triggered = False
        for sig in self.signals:
            try:
                self._previous[sig] = signal.signal(sig, self._on_signal)
            except ValueError:
                # Not the main thread (e.g. under a test runner) — poll-only.
                pass
        return self

    def __exit__(self, *exc_info) -> None:
        for sig, previous in self._previous.items():
            signal.signal(sig, previous)
        self._previous.clear()
