"""Background-thread batch prefetcher.

Parity role: reference `BlobFetcher` (dataloader.py:338-408) — a
torch DataLoader with 4 worker processes and a resume-aware SubsetSampler.
Here: a bounded-queue thread that keeps N batches ahead of the training
step, overlapping host IO (h5/npz reads, padding) with device compute.
Iterator-resume works because the loader's `state_dict()` is snapshotted
*before* each batch is produced."""

from __future__ import annotations

import queue
import threading
from typing import Callable


class ThreadPrefetcher:
    def __init__(self, fetch_fn: Callable[[], dict], depth: int = 4):
        self.fetch_fn = fetch_fn
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                item = self.fetch_fn()
            except Exception as e:  # surface worker errors to the consumer
                item = e
            while not self._stop.is_set():
                try:
                    self.q.put(item, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def get(self) -> dict:
        item = self.q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
