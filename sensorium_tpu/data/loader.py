"""Threaded prefetching batch loader.

Replaces the reference's ``torch.utils.data.DataLoader`` with 8 worker
processes (``/root/reference/scripts/train.py:101-112``): here samples are
gathered from memory-mapped arrays by a thread pool (NumPy and the native
kernels release the GIL), written **directly into the collated batch
rows** (zero-copy path: no per-sample arrays, no collate pass — workers
call ``dataset.fill_into(index, epoch, input_row, target_row)``), and a
small queue keeps batches ready ahead of the device so TPU steps never
wait on the host.  Datasets that cannot expose fixed row geometry
(``row_shapes is None``) fall back to the allocating get+collate path.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from sensorium_tpu.data.datasets import MiceBatch, collate_mice_batch


def resolve_workers(num_threads: int) -> int:
    """Worker-thread count the loader will actually run.

    More threads than *usable* cores only adds GIL/queue contention, so the
    request is bounded by the cgroup/affinity limit (not ``os.cpu_count()``,
    which reports the host core count inside a cpuset-restricted
    container).  ``SENSORIUM_LOADER_THREADS=N`` overrides both the
    configured count and the clamp: deliberate oversubscription helps
    cold-cache epochs where threads block in page faults without holding
    the GIL.
    """
    override = os.environ.get("SENSORIUM_LOADER_THREADS")
    if override:
        try:
            return max(1, int(override))
        except ValueError:
            raise ValueError(
                f"SENSORIUM_LOADER_THREADS must be an integer, got {override!r}"
            ) from None
    try:
        usable = len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        usable = os.cpu_count() or num_threads
    return max(1, min(num_threads, usable))


class MiceDataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        num_threads: int = 8,
        drop_last: bool = False,
        prefetch: int = 3,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = num_threads
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
        return order

    def __iter__(self):
        order = self._index_order()
        num_batches = len(self)
        out_queue: queue.Queue = queue.Queue(maxsize=self.prefetch)
        epoch = self.epoch
        stop = threading.Event()

        row_shapes = getattr(self.dataset, "row_shapes", None)
        num_mice = getattr(self.dataset, "num_mice", None)
        workers = resolve_workers(self.num_threads)

        def make_batch_fill(pool, batch_indexes):
            input_shape, target_shape = row_shapes
            b = len(batch_indexes)
            inputs = np.empty((b,) + input_shape, np.float32)
            targets = np.zeros((b,) + target_shape, np.float32)
            weights = np.zeros((b, num_mice), np.float32)

            def fill_rows(rows):
                for row, i in rows:
                    mouse = self.dataset.fill_into(
                        int(i), epoch, inputs[row], targets[row]
                    )
                    weights[row, mouse] = 1.0

            # One contiguous row-chunk per worker, not one task per row:
            # ThreadPoolExecutor ignores ``chunksize``, and 32 single-row
            # tasks mean 32 GIL-handoff/queue round-trips per batch — pure
            # overhead once threads outnumber cores (the measured 4/8-thread
            # sag in the bench.py --loader sweep).  Consume the iterator so
            # worker exceptions surface here.
            rows = list(enumerate(batch_indexes))
            chunk = -(-len(rows) // workers)  # ceil division
            for _ in pool.map(
                fill_rows, [rows[i : i + chunk] for i in range(0, len(rows), chunk)]
            ):
                pass
            return MiceBatch(inputs=inputs, targets=targets, weights=weights)

        def make_batch_collate(pool, batch_indexes):
            samples = list(
                pool.map(lambda i: self.dataset.get(int(i), epoch), batch_indexes)
            )
            return collate_mice_batch(
                samples,
                num_mice=num_mice,
                max_neurons=getattr(self.dataset, "max_neurons", None),
            )

        make_batch = make_batch_collate if row_shapes is None else make_batch_fill

        def produce():
            try:
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    for b in range(num_batches):
                        if stop.is_set():
                            return
                        batch_indexes = order[b * self.batch_size : (b + 1) * self.batch_size]
                        out_queue.put(make_batch(pool, batch_indexes))
                out_queue.put(None)
            except BaseException as exc:  # surface worker errors to the consumer
                out_queue.put(exc)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_queue.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer is never blocked on a full queue.
            while producer.is_alive():
                try:
                    out_queue.get_nowait()
                except queue.Empty:
                    producer.join(timeout=0.1)


__all__ = ["MiceDataLoader", "MiceBatch", "resolve_workers"]
