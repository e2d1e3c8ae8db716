"""Training callbacks.

Argus-equivalent callback surface (the reference's fit loop wires
``LoggingToFile``, ``LoggingToCSV`` and ``Checkpoint``/``EmaCheckpoint``
— scripts/train.py:114-134).  LR scheduling callbacks are intentionally
absent: the LR plan is an optax schedule baked into the jitted optimizer
(see ``sensorium_tpu.engine.schedule``), not host-side mutation.
"""

from __future__ import annotations

import csv
import logging
import sys
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


@dataclass
class EngineState:
    """What callbacks observe at epoch boundaries."""

    model: Any
    stage: str = "train"
    epoch: int = 0
    global_epoch: int = 0
    metrics: dict[str, float] = field(default_factory=dict)
    logger: logging.Logger = field(default_factory=lambda: logging.getLogger("sensorium"))
    stopped: bool = False


class Callback:
    def epoch_start(self, state: EngineState) -> None:  # pragma: no cover - hook
        pass

    def epoch_complete(self, state: EngineState) -> None:  # pragma: no cover - hook
        pass

    def fit_complete(self, state: EngineState) -> None:  # pragma: no cover - hook
        """Called once when fit() ends — normally, preempted, or on error."""
        pass


def build_logger(log_path: Path | None = None, append: bool = True) -> logging.Logger:
    """Idempotently wire the shared 'sensorium' logger.

    Never clears existing handlers: the logger is process-global, and a
    second model construction (a distillation teacher, a Predictor) must
    not silently drop a ``log.txt`` handler another component installed.
    Each handler is added only if an equivalent one is not already there.
    """
    logger = logging.getLogger("sensorium")
    logger.setLevel(logging.INFO)
    formatter = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    if not any(
        type(h) is logging.StreamHandler and getattr(h, "stream", None) is sys.stdout
        for h in logger.handlers
    ):
        stream = logging.StreamHandler(sys.stdout)
        stream.setFormatter(formatter)
        logger.addHandler(stream)
    if log_path is not None and not any(
        isinstance(h, logging.FileHandler)
        and Path(getattr(h, "baseFilename", "")) == Path(log_path).resolve()
        for h in logger.handlers
    ):
        handler = logging.FileHandler(log_path, mode="a" if append else "w")
        handler.setFormatter(formatter)
        logger.addHandler(handler)
    return logger


class LoggingToFile(Callback):
    """Mirror epoch metrics into ``log.txt`` (argus LoggingToFile parity)."""

    def __init__(self, file_path, append: bool = True):
        self.file_path = Path(file_path)
        self.append = append
        self._handler: logging.FileHandler | None = None

    def epoch_start(self, state: EngineState) -> None:
        self.file_path.parent.mkdir(parents=True, exist_ok=True)
        if not any(
            isinstance(h, logging.FileHandler)
            and Path(getattr(h, "baseFilename", "")) == self.file_path.resolve()
            for h in state.logger.handlers
        ):
            handler = logging.FileHandler(self.file_path, mode="a" if self.append else "w")
            handler.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
            state.logger.addHandler(handler)
            self._handler = handler

    def fit_complete(self, state: EngineState) -> None:
        # The 'sensorium' logger is process-global: leaving this handler
        # attached would mirror every LATER fold/stage's lines into this
        # fold's log.txt (and leak the fd).  epoch_start re-attaches on the
        # next stage, so detaching here is safe for multi-stage fits.
        # Only the handler THIS callback attached is removed — a same-path
        # handler installed by another component via build_logger(log_path)
        # is never silently dropped (build_logger's documented guarantee).
        if self._handler is not None:
            state.logger.removeHandler(self._handler)
            self._handler.close()
            self._handler = None


class LoggingToCSV(Callback):
    """Append one metrics row per epoch to ``log.csv``.

    Columns are kept aligned with the file's header even when the metric
    set drifts (a resumed run adding a metric, a stage without val_*
    keys): appending reuses the existing header, filling absent keys with
    "", and a row introducing NEW keys rewrites the file once with the
    union header — values never land under the wrong column.
    """

    def __init__(self, file_path, append: bool = True):
        self.file_path = Path(file_path)
        self.append = append
        self._initialized = False
        self._fieldnames: list[str] | None = None

    def epoch_complete(self, state: EngineState) -> None:
        self.file_path.parent.mkdir(parents=True, exist_ok=True)
        row = {"epoch": state.global_epoch, "stage": state.stage, **state.metrics}
        use_existing = self.file_path.exists() and (self.append or self._initialized)
        if self._fieldnames is None:
            self._fieldnames = []
            if use_existing:
                with open(self.file_path, newline="") as handle:
                    self._fieldnames = list(csv.DictReader(handle).fieldnames or [])
        new_keys = [key for key in row if key not in self._fieldnames]
        if new_keys:
            self._fieldnames = self._fieldnames + new_keys
            old_rows: list[dict] = []
            if use_existing:
                with open(self.file_path, newline="") as handle:
                    old_rows = list(csv.DictReader(handle))
            with open(self.file_path, "w", newline="") as handle:
                writer = csv.DictWriter(handle, fieldnames=self._fieldnames, restval="")
                writer.writeheader()
                writer.writerows(old_rows)
                writer.writerow(row)
        else:
            with open(self.file_path, "a", newline="") as handle:
                csv.DictWriter(handle, fieldnames=self._fieldnames, restval="").writerow(row)
        self._initialized = True


class LoggingToJSONL(Callback):
    """Append one structured JSON record per epoch to ``log.jsonl``.

    The machine-readable observability channel SURVEY.md §5 plans alongside
    the reference's human-readable ``log.txt``/``log.csv`` contract
    (scripts/train.py:116-117): same metric keys as the CSV row, plus a
    wall-clock timestamp, so dashboards and scripts can tail training
    without parsing log lines.  Records are written with ``flush`` +
    line-buffered appends, so a concurrent reader never sees a torn line.
    """

    def __init__(self, file_path, append: bool = True):
        self.file_path = Path(file_path)
        self._initialized = False
        self.append = append

    def epoch_complete(self, state: EngineState) -> None:
        import json

        self.file_path.parent.mkdir(parents=True, exist_ok=True)
        record = {
            "time": time.time(),
            "epoch": state.global_epoch,
            "stage": state.stage,
            **{k: float(v) for k, v in state.metrics.items()},
        }
        mode = "a" if (self.append or self._initialized) else "w"
        with open(self.file_path, mode) as handle:
            handle.write(json.dumps(record) + "\n")
            handle.flush()
        self._initialized = True


class Checkpoint(Callback):
    """Best-k checkpointing with the reference's filename/score contract.

    Saves the model's EMA weights (EmaCheckpoint semantics, ema.py:61-73)
    as ``model-{epoch:03d}-{<monitor>:.6f}.ckpt`` and keeps only the
    ``max_saves`` best by the monitored metric.
    """

    def __init__(
        self,
        save_dir,
        file_format: str = "model-{epoch:03d}-{val_corr:.6f}.ckpt",
        max_saves: int = 1,
        monitor: str = "val_corr",
        better: str = "max",
        save_train_state: bool = True,
        background: bool = False,
        train_state_name: str = "train_state.ckpt",
        save_model: bool = True,
    ):
        # Same contract as EarlyStopping: anything else ("Max", "maximize")
        # would silently sort ascending and keep the WORST checkpoints.
        if better not in ("min", "max", "auto"):
            raise ValueError(f"better must be min/max/auto, got {better!r}")
        if better == "auto":
            better = "min" if "loss" in monitor else "max"
        self.save_dir = Path(save_dir)
        self.file_format = file_format
        self.max_saves = max_saves
        self.monitor = monitor
        self.better = better
        self.save_train_state = save_train_state
        # "train_state.orbax" routes resume state to the sharded backend
        # (see MouseModel.save_train_state dispatch).
        self.train_state_name = train_state_name
        # save_model=False: resume-state only.  Used on non-primary hosts
        # when the resume state is sharded (an orbax save is a COLLECTIVE —
        # every process must join it) while the inference checkpoint stays
        # process-0's job.
        self.save_model = save_model
        # background=True: serialization + disk writes run off-thread so the
        # next epoch starts while the checkpoint is still hitting disk (the
        # weights are host-fetched synchronously — see engine.checkpoint).
        self.background = background
        self._saved: list[tuple[float, Path]] = []

    def epoch_complete(self, state: EngineState) -> None:
        if self.monitor not in state.metrics:
            return
        score = float(state.metrics[self.monitor])
        self.save_dir.mkdir(parents=True, exist_ok=True)
        fields = {"epoch": state.global_epoch, self.monitor: score, **state.metrics}
        file_path = self.save_dir / self.file_format.format(**fields)
        if self.save_model:
            state.model.save(file_path, background=self.background)
            state.logger.info(f"Model saved to '{file_path}'")
        if self.save_train_state:
            state.model.save_train_state(
                self.save_dir / self.train_state_name,
                extra={"epoch": state.global_epoch, self.monitor: score},
                background=self.background,
            )

        if not self.save_model:
            return
        self._saved.append((score, file_path))
        reverse = self.better == "max"
        self._saved.sort(key=lambda item: item[0], reverse=reverse)
        while len(self._saved) > self.max_saves:
            _, worst_path = self._saved.pop()
            if self.background and worst_path == file_path:
                # The epoch's own save turned out to be the worst: its
                # background write may still be in flight — join it before
                # unlinking, or the atomic rename would resurrect the file.
                from sensorium_tpu.engine.checkpoint import flush_pending_saves

                flush_pending_saves()
            worst_path.unlink(missing_ok=True)
            state.logger.info(f"Model removed '{worst_path}'")


class EarlyStopping(Callback):
    """Stop fitting after ``patience`` epochs without improvement.

    Capability parity with ``argus.callbacks.EarlyStopping`` (an engine
    feature of the reference's training library, available to any config
    even though the shipped recipes run fixed epoch counts).  ``better``:
    ``"min"``, ``"max"`` or ``"auto"`` (min for loss-like monitors, max
    otherwise — argus' inference rule).  Sets ``EngineState.stopped``,
    which the fit loop honors at the epoch boundary.
    """

    def __init__(self, monitor: str = "val_loss", patience: int = 1,
                 better: str = "auto"):
        if better not in ("min", "max", "auto"):
            raise ValueError(f"better must be min/max/auto, got {better!r}")
        if better == "auto":
            better = "min" if "loss" in monitor else "max"
        self.monitor = monitor
        self.patience = patience
        self.better = better
        self.best: float | None = None
        self.wait = 0

    def epoch_complete(self, state: EngineState) -> None:
        if self.monitor not in state.metrics:
            return
        score = float(state.metrics[self.monitor])
        improved = (
            self.best is None
            or (self.better == "max" and score > self.best)
            or (self.better == "min" and score < self.best)
        )
        if improved:
            self.best = score
            self.wait = 0
            return
        self.wait += 1
        # argus/Keras semantics: stop once `patience` consecutive epochs
        # have passed without improvement (wait >= patience, not >).
        if self.wait >= self.patience:
            state.stopped = True
            state.logger.info(
                f"Early stopping: no {self.monitor} improvement over "
                f"{self.best:.6g} for {self.wait} epochs (patience {self.patience})"
            )


class Timer(Callback):
    """Per-epoch wall-clock + throughput logging (profiling aid the

    reference lacks — SURVEY.md §5 tracing row)."""

    def __init__(self):
        self._start = 0.0

    def epoch_start(self, state: EngineState) -> None:
        self._start = time.perf_counter()

    def epoch_complete(self, state: EngineState) -> None:
        state.metrics["epoch_time"] = round(time.perf_counter() - self._start, 3)
