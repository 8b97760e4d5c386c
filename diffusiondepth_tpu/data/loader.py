"""Batched, sharded, prefetching data loader.

Replaces the reference's torch DataLoader + DistributedSampler
(src/main.py:83-99): per-host sharding is index arithmetic (every host reads
``indices[host_index::host_count]``), shuffling is seeded per epoch
(``set_epoch`` equivalent), decode runs on a thread pool, and finished numpy
batches are prefetched ``prefetch`` deep so device steps overlap host IO.

Per-sample augmentation randomness is derived from (epoch seed, global
index) so runs are reproducible regardless of thread scheduling - stronger
determinism than the reference's worker-state RNGs.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


def _collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples])
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_threads: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        host_index: int = 0,
        host_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.host_index = host_index
        self.host_count = host_count
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """DistributedSampler.set_epoch equivalent (src/main.py:183)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host shard (DistributedSampler equivalent)
        idx = idx[self.host_index :: self.host_count]
        return idx

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        nb = len(self)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        epoch_seed = (self.seed + 1) * 1_000_003 + self.epoch
        takes_seed = self._getitem_takes_seed()

        def load_sample(gidx: int):
            if takes_seed:
                # keep the derived per-sample seed inside RandomState's range
                seed = (epoch_seed * 7_919 + int(gidx)) % (2**31 - 1)
                return self.dataset.__getitem__(int(gidx), seed=seed)
            return self.dataset.__getitem__(int(gidx))

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def safe_put(item) -> bool:
            """Bounded put that aborts when the consumer is gone (prevents the
            producer wedging on a full queue after an abandoned iterator)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(load_sample, b))
                        if not safe_put(_collate(samples)):
                            return
                safe_put(None)
            except BaseException as e:  # surface worker errors to the consumer
                safe_put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()

    def _getitem_takes_seed(self) -> bool:
        import inspect

        try:
            sig = inspect.signature(self.dataset.__getitem__)
            return "seed" in sig.parameters
        except (TypeError, ValueError):
            return False
