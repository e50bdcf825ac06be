"""Threaded prefetching loaders feeding the TPU host.

The reference uses ``torch.utils.data.DataLoader`` worker *processes*
(``train.py:160-170``); here a thread pool is sufficient — PIL decode and
resize release the GIL, the consumer is a TPU feed (host→device copy), and
threads avoid fork/pickle overhead.  A bounded queue keeps a steady batch
backlog so the device never waits on image IO.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from .sampler import InfiniteSampler


class InfiniteLoader:
    """Endless stream of stacked image batches from a map-style dataset."""

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 seed: Optional[int] = None, prefetch: int = 4,
                 shard_index: int = 0, shard_count: int = 1,
                 with_indices: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        # with_indices: yield (indices, batch) so consumers can key
        # per-image caches (train/target_cache.py) — dataset items are
        # deterministic functions of the index (resize-only pipeline)
        self.with_indices = with_indices
        self.num_workers = max(1, num_workers)
        self._sampler = InfiniteSampler(len(dataset), seed,
                                        shard_index=shard_index,
                                        shard_count=shard_count)
        self._sampler_lock = threading.Lock()
        self._q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(self.num_workers)]
        for t in self._threads:
            t.start()

    def _next_indices(self):
        with self._sampler_lock:
            return [next(self._sampler) for _ in range(self.batch_size)]

    def _worker(self):
        while not self._stop.is_set():
            idx = self._next_indices()
            items = [self.dataset[i] for i in idx]
            if isinstance(items[0], tuple):
                # multi-field datasets (e.g. Cityscapes (content, label))
                batch = tuple(np.stack([it[j] for it in items])
                              for j in range(len(items[0])))
            else:
                batch = np.stack(items)
            if self.with_indices:
                batch = (tuple(idx), batch)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        return self._q.get()

    def close(self):
        self._stop.set()


def iter_batches(dataset, batch_size: int) -> Iterator:
    """Sequential batching over a test dataset (6-tuple entries).

    Collates images into NHWC arrays, names into lists, and masks into an
    int32 (N, H, W) array or None when the dataset has no masks."""
    n = len(dataset)
    for start in range(0, n, batch_size):
        items = [dataset[i] for i in range(start, min(start + batch_size, n))]
        content = np.stack([it[0] for it in items])
        style = np.stack([it[1] for it in items])
        c_names = [it[2] for it in items]
        s_names = [it[3] for it in items]
        if items[0][4] is not None:
            c_masks = np.stack([it[4] for it in items])
            s_masks = np.stack([it[5] for it in items])
        else:
            c_masks = s_masks = None
        yield content, style, c_names, s_names, c_masks, s_masks
