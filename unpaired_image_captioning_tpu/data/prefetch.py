"""Background batch prefetchers.

Parity role: reference `BlobFetcher` (dataloader.py:338-408) — a
torch DataLoader with 4 worker processes and a resume-aware SubsetSampler.

Two implementations:

- `ThreadPrefetcher`: a bounded-queue thread running the whole get_batch —
  overlaps host IO with device compute, enough when batch assembly is
  cheaper than a step.
- `ProcessPrefetcher`: the BlobFetcher equivalent. The loader's PLAN phase
  (index/caption RNG — everything stateful) stays in the parent, so the
  batch stream is bit-identical to synchronous get_batch and
  iterator-resume semantics are exact: `state_dict()` returns the loader
  state snapshotted BEFORE the next batch the consumer will receive was
  planned. Only the feature-ASSEMBLY phase (h5/npz reads + padding, pure
  w.r.t. loader state) fans out over fork'd worker processes; results
  re-order by sequence number."""

from __future__ import annotations

import collections
import multiprocessing as mp
import queue
import threading
from typing import Callable

import numpy as np


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


# arrays at least this large travel via POSIX shared memory instead of
# being pickled through the result queue — the att_feats tensor alone is
# 160 MB/batch f32 at protocol shapes, and a queue pickle is a full extra
# copy on each side
_SHM_MIN_BYTES = 1 << 20


def _feature_worker(loader, task_q, result_q):
    # fork'd child: fresh h5 handles (HDF5 handles are not fork-safe), then
    # pure feature assembly — no loader state is ever mutated here
    from multiprocessing import shared_memory

    loader.reopen_features()
    while True:
        item = task_q.get()
        if item is None:
            return
        seq, ixs = item
        try:
            feats = loader.assemble_features(ixs)
            out = {}
            for k, v in feats.items():
                if v is not None and v.nbytes >= _SHM_MIN_BYTES:
                    shm = shared_memory.SharedMemory(create=True,
                                                     size=v.nbytes)
                    np.ndarray(v.shape, v.dtype, buffer=shm.buf)[...] = v
                    out[k] = ("shm", shm.name, v.shape, v.dtype)
                    shm.close()
                else:
                    out[k] = ("raw", v)
            result_q.put((seq, out))
        except Exception as e:
            result_q.put((seq, e))


class ProcessPrefetcher:
    """Multi-process feature assembly behind a single-threaded plan stream.

    get() yields batches in exactly the order synchronous
    `loader.get_batch(split)` would produce them (the plan phase consumes
    the loader's RNG/iterators identically); `state_dict()` resumes from
    the batch AFTER the last one consumed."""

    def __init__(self, loader, split: str, num_workers: int = 4,
                 depth: int = 8):
        self.loader = loader
        self.split = split
        self.depth = max(depth, num_workers + 1)
        # Pre-warm the multiprocessing resource tracker BEFORE forking:
        # otherwise the first SharedMemory create races to spawn trackers
        # inside the forked children (intermittent deadlocks observed).
        from multiprocessing import shared_memory

        warm = shared_memory.SharedMemory(create=True, size=1)
        warm.close()
        warm.unlink()

        ctx = mp.get_context("fork")
        # SimpleQueue, NOT Queue: Queue's background feeder thread + fork is
        # a deadlock class (children can inherit a mid-put lock, and
        # join-vs-feeder-flush orders wrong at shutdown); SimpleQueue writes
        # the pipe directly under a shared lock. Payloads are small — big
        # arrays travel via shm.
        self._task_q = ctx.SimpleQueue()
        self._result_q = ctx.SimpleQueue()
        self._workers = [
            ctx.Process(target=_feature_worker,
                        args=(loader, self._task_q, self._result_q),
                        daemon=True)
            for _ in range(num_workers)]
        for w in self._workers:
            w.start()
        self._next_plan_seq = 0          # next sequence number to plan
        self._next_get_seq = 0           # next sequence number to hand out
        self._results_received = 0       # results pulled off the queue
        self._plans = collections.OrderedDict()   # seq -> (state_before, plan)
        self._done = {}                  # seq -> assembled features
        # shm segments backing batches already handed to the consumer; a
        # segment is unlinked two get()s later, by which point the consumer
        # has uploaded the arrays to the device (trainer.train copies into
        # jnp on entry)
        self._live_shm = collections.deque()
        self._deferred_evictions = 0
        self._DEFER_WARN_AFTER = 8
        self._fill()

    def _materialize(self, out: dict) -> dict:
        from multiprocessing import shared_memory

        feats, shms = {}, []
        for k, v in out.items():
            if v[0] == "shm":
                _, name, shape, dtype = v
                shm = shared_memory.SharedMemory(name=name)
                feats[k] = np.ndarray(shape, dtype, buffer=shm.buf)
                shms.append(shm)
            else:
                feats[k] = v[1]
        self._live_shm.append(shms)
        # LIFETIME CONTRACT: feature arrays returned by get() are views into
        # shared-memory segments that stay mapped for TWO further get()
        # calls only (one in-flight batch + one margin) — a consumer must
        # copy anything it keeps longer. If a view IS still exported when
        # its segment is evicted, defer the eviction instead of crashing
        # the training loop with BufferError; close() sweeps survivors.
        while len(self._live_shm) > 2:
            shms = self._live_shm.popleft()
            survivors = []
            for shm in shms:
                try:
                    shm.close()
                    shm.unlink()
                except BufferError:
                    survivors.append(shm)
            if survivors:
                self._live_shm.appendleft(survivors)
                # A consumer that keeps views alive indefinitely would grow
                # _live_shm (and /dev/shm) without bound and silently — count
                # consecutive deferrals and surface the contract violation.
                self._deferred_evictions += 1
                if self._deferred_evictions >= self._DEFER_WARN_AFTER:
                    import warnings
                    warnings.warn(
                        f"ProcessPrefetcher: shm eviction deferred "
                        f"{self._deferred_evictions} gets in a row "
                        f"({len(self._live_shm)} segments live) — a consumer "
                        f"is holding feature views past the two-get lifetime "
                        f"contract; copy arrays you keep.",
                        RuntimeWarning, stacklevel=3)
                break
            self._deferred_evictions = 0
        return feats

    def _fill(self):
        while len(self._plans) < self.depth:
            state = self.loader.state_dict()
            plan = self.loader.plan_batch(self.split)
            seq = self._next_plan_seq
            self._next_plan_seq += 1
            self._task_q.put((seq, plan["ixs"]))
            self._plans[seq] = (state, plan)

    def _recv(self, timeout: float = 120.0):
        """One result off the queue, with a liveness guard so a hard-crashed
        worker (segfault/OOM-kill) surfaces as an error, not a silent hang."""
        if not self._result_q._reader.poll(timeout):
            dead = [w.pid for w in self._workers if not w.is_alive()]
            raise RuntimeError(
                f"feature workers unresponsive for {timeout}s"
                + (f" (dead pids: {dead})" if dead else ""))
        s, feats = self._result_q.get()
        self._results_received += 1
        if isinstance(feats, Exception):
            raise feats
        self._done[s] = feats

    def get(self) -> dict:
        """Next batch. Feature arrays are ZERO-COPY views into shared
        memory valid for two further get() calls — copy anything kept
        longer (see the lifetime contract in _materialize)."""
        seq = self._next_get_seq
        self._next_get_seq += 1
        while seq not in self._done:
            self._recv()
        feats = self._materialize(self._done.pop(seq))
        _, plan = self._plans.pop(seq)
        plan = dict(plan)
        plan.pop("ixs")
        plan.update(feats)
        self._fill()
        return plan

    def state_dict(self) -> dict:
        """Loader state for the NEXT batch the consumer will receive —
        loading it into a fresh loader and reading synchronously reproduces
        the stream from that point (resume-before-produce semantics)."""
        if self._plans:
            state, _ = next(iter(self._plans.values()))
            return state
        return self.loader.state_dict()

    def close(self):
        # drain the EXACT number of outstanding results first (workers idle
        # only after their in-flight task completes), then send sentinels —
        # sentinel-before-drain races the in-flight puts and leaks segments
        outstanding = self._next_plan_seq - self._results_received
        try:
            for _ in range(outstanding):
                self._recv(timeout=30.0)
        except Exception:
            pass  # shutting down: a wedged worker gets terminated below
        for _ in self._workers:
            self._task_q.put(None)
        for w in self._workers:
            w.join(timeout=5.0)
            if w.is_alive():
                w.terminate()
        # map + unlink every shm segment still alive
        for out in self._done.values():
            self._materialize(out)
        self._done.clear()
        while self._live_shm:
            for shm in self._live_shm.popleft():
                try:
                    shm.close()
                    shm.unlink()
                except BufferError:
                    # a consumer still holds a view; unlink without close
                    # so the segment dies with the last mapping
                    try:
                        shm.unlink()
                    except Exception:
                        pass
