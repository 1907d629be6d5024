"""Threaded prefetching data loader.

Replaces torch ``DataLoader(num_workers, prefetch_factor,
DistributedSampler)`` (reference src/core/utils.py:193-233):

* a thread pool decodes/augments samples (cv2 + numpy release the GIL);
* per-process sharding: each JAX process iterates only its slice of the
  global index stream (multi-host input sharding, SURVEY.md §2.8);
* batches are handed to an optional ``device_put`` callback while the
  next batch is being assembled — double-buffered H2D transfers.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch_factor: int = 2,
        drop_last: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        device_put: Optional[Callable] = None,
    ):
        if batch_size % num_shards:
            raise ValueError("global batch_size must divide by num_shards")
        self.dataset = dataset
        self.global_batch = batch_size
        self.local_batch = batch_size // num_shards
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch_factor)
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.device_put = device_put
        self._epoch = 0
        self._skip = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _collate(self, samples) -> dict:
        """Stack per-sample tuples into a batch dict. Subclasses override
        this (only) to batch other sample layouts — the producer/consumer
        machinery in ``__iter__`` (error propagation, abandonment, stop
        handling) is shared."""
        return {
            "lr": np.stack([s[0] for s in samples]),
            "hr": np.stack([s[1] for s in samples]),
        }

    def skip_next(self, n_batches: int):
        """Skip the first ``n_batches`` of the NEXT iteration only —
        step-granular resume: the shuffle order is a pure function of
        (seed, epoch), so skipping k batches reproduces exactly the
        stream a run that checkpointed after k batches would continue
        with."""
        self._skip = int(n_batches)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch
        return (n + self.global_batch - 1) // self.global_batch

    def _index_stream(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng((self.seed, self._epoch)).permutation(n)
        usable = (n // self.global_batch) * self.global_batch if self.drop_last else n
        skip, self._skip = self._skip, 0  # consume a pending skip_next
        for k, b0 in enumerate(range(0, usable, self.global_batch)):
            if k < skip:
                continue
            idx = order[b0 : b0 + self.global_batch]
            if len(idx) < self.global_batch:
                # tail batch (drop_last=False): wrap-pad so every shard's
                # slice stays full and equal-sized (DistributedSampler's
                # padding convention)
                idx = np.concatenate(
                    [idx, order[: self.global_batch - len(idx)]]
                )
            # this process's contiguous slice of the global batch
            lo = self.shard_index * self.local_batch
            yield idx[lo : lo + self.local_batch]

    def __iter__(self) -> Iterator:
        batches = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        error: list = []

        def _put(item) -> bool:
            """Bounded put that re-checks ``stop`` so an abandoned
            consumer never leaves the producer blocked on a full queue."""
            while not stop.is_set():
                try:
                    batches.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx in self._index_stream():
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, idx))
                        batch = self._collate(samples)
                        if self.device_put is not None:
                            batch = self.device_put(batch)
                        if not _put(batch):
                            return
            except Exception as e:  # surfaced to the consumer, not a hang
                error.append(e)
            finally:
                _put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = batches.get()
                if batch is None:
                    if error:
                        raise error[0]
                    return
                yield batch
        finally:
            stop.set()
