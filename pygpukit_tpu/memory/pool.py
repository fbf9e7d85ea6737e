"""Memory pool: quota, size-class reuse, LRU eviction, stats.

Python wrapper over the C++ pool (native/src/pool.cpp) with a pure-Python
fallback, mirroring the reference's Rust-backed pool + toggle (reference:
src/pygpukit/memory/pool.py:22-118, rust memory/pool.rs:106).

The pool manages *logical* device-budget blocks (HBM on TPU is owned by XLA;
the pool is the accounting + reuse policy the scheduler bills against) and
optionally real host staging buffers (host_backed=True) used by the transfer
engine.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from dataclasses import dataclass

from .._native import PkPoolStats, get_native

SIZE_CLASSES = [256 << i for i in range(21)]  # 256B .. 256MB


def _size_class(size: int) -> int:
    for c in SIZE_CLASSES:
        if size <= c:
            return c
    return SIZE_CLASSES[-1]


@dataclass
class PoolStats:
    quota_bytes: int = 0
    used_bytes: int = 0
    peak_bytes: int = 0
    allocations: int = 0
    frees: int = 0
    reuses: int = 0
    evictions: int = 0
    failures: int = 0
    free_list_bytes: int = 0


class MemoryBlock:
    __slots__ = ("block_id", "size", "pool")

    def __init__(self, block_id: int, size: int, pool: "MemoryPool"):
        self.block_id = block_id
        self.size = size
        self.pool = pool

    def free(self) -> None:
        self.pool.free(self)


class MemoryPool:
    """Quota'd pool with size-class free lists and LRU eviction."""

    def __init__(self, quota_bytes: int = 8 << 30, use_native: bool | None = None):
        self._native = get_native() if use_native in (None, True) else None
        if use_native is True and self._native is None:
            raise RuntimeError("native pool requested but library unavailable")
        if self._native is not None:
            self._handle = self._native.pk_pool_create(quota_bytes)
        else:
            self._handle = None
            self._lock = threading.RLock()
            self._quota = quota_bytes
            self._used = 0
            self._free_bytes = 0
            self._next = 1
            self._blocks: dict[int, int] = {}            # id -> class size
            self._free: OrderedDict[int, int] = OrderedDict()  # id -> class (LRU)
            self._host: dict[int, "np.ndarray"] = {}     # host-backed buffers
            self._stats = PoolStats(quota_bytes=quota_bytes)

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def alloc(self, size: int, host_backed: bool = False) -> MemoryBlock:
        if self._handle is not None:
            bid = self._native.pk_pool_alloc(self._handle, size,
                                             1 if host_backed else 0)
            if bid == 0:
                raise MemoryError(f"pool quota exceeded allocating {size}B")
            return MemoryBlock(bid, _size_class(size), self)
        with self._lock:
            cls = _size_class(size)
            for bid, c in self._free.items():
                if c == cls:
                    del self._free[bid]
                    self._free_bytes -= cls
                    self._used += cls
                    self._stats.reuses += 1
                    self._stats.allocations += 1
                    self._bump()
                    return MemoryBlock(bid, cls, self)
            while self._used + self._free_bytes + cls > self._quota and self._free:
                bid, c = self._free.popitem(last=False)
                self._free_bytes -= c
                self._blocks.pop(bid, None)
                self._host.pop(bid, None)
                self._stats.evictions += 1
            if self._used + cls > self._quota:
                self._stats.failures += 1
                raise MemoryError(f"pool quota exceeded allocating {size}B")
            bid = self._next
            self._next += 1
            self._blocks[bid] = cls
            if host_backed:
                import numpy as np
                self._host[bid] = np.zeros(cls, np.uint8)
            self._used += cls
            self._stats.allocations += 1
            self._bump()
            return MemoryBlock(bid, cls, self)

    def free(self, block: MemoryBlock) -> None:
        if self._handle is not None:
            self._native.pk_pool_free(self._handle, block.block_id)
            return
        with self._lock:
            cls = self._blocks.get(block.block_id)
            if cls is None or block.block_id in self._free:
                return
            self._used -= cls
            self._free_bytes += cls
            self._free[block.block_id] = cls
            self._stats.frees += 1

    def host_buffer(self, block_id: int):
        """uint8 numpy view of a host-backed block's staging memory (the
        reference's pinned-pool access path, rust pinned.rs:150); None for
        device-only blocks. Works on both backends."""
        import numpy as np
        if self._handle is not None:
            ptr = self._native.pk_pool_host_ptr(self._handle, block_id)
            if not ptr:
                return None
            size = self._native.pk_pool_block_size(self._handle, block_id)
            import ctypes
            buf = (ctypes.c_ubyte * size).from_address(ptr)
            return np.frombuffer(buf, np.uint8)
        with self._lock:
            return self._host.get(block_id)

    def trim(self, bytes_target: int) -> int:
        if self._handle is not None:
            return self._native.pk_pool_trim(self._handle, bytes_target)
        with self._lock:
            reclaimed = 0
            while self._free and reclaimed < bytes_target:
                bid, c = self._free.popitem(last=False)
                self._free_bytes -= c
                self._blocks.pop(bid, None)
                reclaimed += c
                self._stats.evictions += 1
            return reclaimed

    def stats(self) -> PoolStats:
        if self._handle is not None:
            raw = PkPoolStats()
            self._native.pk_pool_stats(self._handle, raw)
            return PoolStats(**{f: getattr(raw, f) for f, _ in raw._fields_})
        with self._lock:
            self._stats.used_bytes = self._used
            self._stats.free_list_bytes = self._free_bytes
            return PoolStats(**self._stats.__dict__)

    def _bump(self) -> None:
        if self._used > self._stats.peak_bytes:
            self._stats.peak_bytes = self._used

    def __del__(self):
        try:
            if self._handle is not None:
                self._native.pk_pool_destroy(self._handle)
                self._handle = None
        except Exception:
            pass
