"""Memory info + async host<->device copies (reference: src/pygpukit/core/memory.py:18)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from .array import Array
from .backend import get_backend
from .device import get_device_info


@dataclass
class MemoryInfo:
    total_bytes: int
    used_bytes: int
    free_bytes: int

    @property
    def total_gib(self) -> float:
        return self.total_bytes / (1 << 30)

    @property
    def used_gib(self) -> float:
        return self.used_bytes / (1 << 30)


def get_memory_info() -> MemoryInfo:
    backend = get_backend()
    dev = backend.device
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    total = int(stats.get("bytes_limit", get_device_info().hbm_gib * (1 << 30)))
    used = int(stats.get("bytes_in_use", 0))
    return MemoryInfo(total_bytes=total, used_bytes=used, free_bytes=total - used)


def copy_to_device(arr: np.ndarray) -> Array:
    """Async H2D: device_put returns immediately; transfer overlaps host work."""
    return Array(jax.device_put(np.asarray(arr), get_backend().device))


def copy_to_host(a: Array) -> np.ndarray:
    return a.to_numpy()


def copy_to_host_async(a: Array):
    """Start a D2H copy; returns a future-like with .result() -> np.ndarray."""
    fut = jax.device_get(a.jax)  # jax device_get is synchronous; emulate future

    class _Done:
        def result(self):
            return np.asarray(fut)

    return _Done()


def synchronize() -> None:
    """Barrier: wait for all outstanding device work (cf. cudaDeviceSynchronize)."""
    (jax.device_put(0.0, get_backend().device) + 0).block_until_ready()
