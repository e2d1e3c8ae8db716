"""Threaded prefetching batch loader.

Replaces the reference's ``torch.utils.data.DataLoader`` with 8 worker
processes (``/root/reference/scripts/train.py:101-112``): here samples are
gathered from memory-mapped arrays by a thread pool (NumPy releases the GIL
for the copies), collated into pinned host batches, and a small queue keeps
batches ready ahead of the device so TPU steps never wait on the host.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from sensorium_tpu.data.datasets import MiceBatch, collate_mice_batch


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

        def produce():
            try:
                with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
                    for b in range(num_batches):
                        if stop.is_set():
                            return
                        batch_indexes = order[b * self.batch_size : (b + 1) * self.batch_size]
                        samples = list(
                            pool.map(lambda i: self.dataset.get(int(i), epoch), batch_indexes)
                        )
                        out_queue.put(
                            collate_mice_batch(
                                samples,
                                num_mice=getattr(self.dataset, "num_mice", None),
                                max_neurons=getattr(self.dataset, "max_neurons", None),
                            )
                        )
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


__all__ = ["MiceDataLoader", "MiceBatch"]
