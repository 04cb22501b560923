"""Threaded prefetching batch loader (replaces torch DataLoader)."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class BatchLoader:
    """Batches dataset samples with background worker threads.

    dataset must expose ``__len__`` and ``get(idx, epoch)`` returning a tuple
    of numpy arrays (all but the last axis-stackable; non-array extras are
    collected into lists).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 2, seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int) -> Iterator:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])).shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()

        def make_batch(idxs):
            samples = [self.dataset.get(int(i), epoch) for i in idxs]
            cols = list(zip(*samples))
            out = []
            for col in cols:
                if isinstance(col[0], np.ndarray):
                    out.append(np.stack(col))
                else:
                    out.append(list(col))
            return tuple(out)

        def worker(worker_id):
            for bi in range(worker_id, len(batches), self.num_workers):
                if stop.is_set():
                    return
                q.put((bi, make_batch(batches[bi])))

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()

        pending = {}
        try:
            for want in range(len(batches)):
                while want not in pending:
                    bi, batch = q.get()
                    pending[bi] = batch
                yield pending.pop(want)
        finally:
            stop.set()
            for t in threads:
                while t.is_alive():
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        break
                t.join(timeout=0.1)
