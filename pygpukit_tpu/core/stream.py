"""Logical streams over JAX's async dispatch (reference: src/pygpukit/core/stream.py:11-135).

JAX/TPU dispatch is asynchronous by construction — every op launch returns
immediately and the runtime orders work per device. A ``Stream`` here is a
logical ordering domain used by the scheduler layer (per-model isolation maps
to device partitions rather than hardware streams); ``synchronize`` blocks on
completion of everything issued through the stream.
"""

from __future__ import annotations

import enum
import itertools
import threading
import time
from dataclasses import dataclass, field


class StreamPriority(enum.IntEnum):
    HIGH = 0
    LOW = 1


_ids = itertools.count()


@dataclass
class Stream:
    priority: StreamPriority = StreamPriority.LOW
    stream_id: int = field(default_factory=lambda: next(_ids))
    _pending: list = field(default_factory=list, repr=False)

    def record(self, buf) -> None:
        """Associate an in-flight jax.Array with this stream."""
        self._pending.append(buf)
        if len(self._pending) > 64:
            # bound the tail: everything before the last 8 is almost surely done
            self._pending = self._pending[-8:]

    def synchronize(self) -> None:
        for buf in self._pending:
            try:
                buf.block_until_ready()
            except Exception:
                pass
        self._pending.clear()

    def __enter__(self):
        _tls.current = self
        return self

    def __exit__(self, *exc):
        _tls.current = None
        return False


class _TLS(threading.local):
    current: Stream | None = None


_tls = _TLS()
_default = Stream(StreamPriority.LOW)


def default_stream() -> Stream:
    return _default


def current_stream() -> Stream:
    return _tls.current or _default


class StreamManager:
    """Pool of streams by priority (reference: core/stream.py:55)."""

    def __init__(self, n_high: int = 1, n_low: int = 2):
        self.high = [Stream(StreamPriority.HIGH) for _ in range(n_high)]
        self.low = [Stream(StreamPriority.LOW) for _ in range(n_low)]
        self._rr = {StreamPriority.HIGH: 0, StreamPriority.LOW: 0}
        self._lock = threading.Lock()

    def get(self, priority: StreamPriority = StreamPriority.LOW) -> Stream:
        pool = self.high if priority == StreamPriority.HIGH else self.low
        with self._lock:
            i = self._rr[priority]
            self._rr[priority] = (i + 1) % len(pool)
        return pool[i]

    def synchronize_all(self) -> None:
        for s in self.high + self.low:
            s.synchronize()


class Event:
    """Timing event (reference CUDA event analog, core/event.cpp).

    ``record`` captures a host timestamp after blocking on a marker buffer,
    giving device-completion timing semantics.
    """

    def __init__(self):
        self._t: float | None = None

    def record(self, stream: Stream | None = None) -> None:
        (stream or current_stream()).synchronize()
        self._t = time.perf_counter()

    def elapsed_ms(self, other: "Event") -> float:
        if self._t is None or other._t is None:
            raise RuntimeError("event not recorded")
        return (other._t - self._t) * 1e3

    def elapsed_us(self, other: "Event") -> float:
        return self.elapsed_ms(other) * 1e3
