"""Kernel/executable caches (reference: rust dispatch/cache.rs:210
KernelCache + persistent_cache.rs:17-241 on-disk PTX cache with arch
fingerprint).

In-memory cache: keyed executables with stats. Persistent cache: wraps JAX's
XLA compilation cache directory (the serialized-executable store) with an
index + fingerprint so entries from other chip generations are not reused.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class CacheStats:
    entries: int = 0
    hits: int = 0
    misses: int = 0
    evictions: int = 0
    inserts: int = 0


class KernelCache:
    """LRU in-memory cache keyed by (source, options)."""

    def __init__(self, max_entries: int = 512):
        self.max_entries = max_entries
        self._data: dict = {}
        self._order: list = []
        self._lock = threading.Lock()
        self.stats = CacheStats()

    @staticmethod
    def make_key(source: str, options: tuple = ()) -> str:
        h = hashlib.sha256()
        h.update(source.encode())
        h.update(repr(options).encode())
        return h.hexdigest()[:32]

    def get(self, key: str):
        with self._lock:
            if key in self._data:
                self.stats.hits += 1
                self._order.remove(key)
                self._order.append(key)
                return self._data[key]
            self.stats.misses += 1
            return None

    def put(self, key: str, value) -> None:
        with self._lock:
            if key not in self._data and len(self._data) >= self.max_entries:
                old = self._order.pop(0)
                del self._data[old]
                self.stats.evictions += 1
            self._data[key] = value
            if key in self._order:
                self._order.remove(key)
            self._order.append(key)
            self.stats.inserts += 1
            self.stats.entries = len(self._data)

    def get_or_compile(self, source: str, options: tuple, compile_fn):
        key = self.make_key(source, options)
        hit = self.get(key)
        if hit is not None:
            return hit
        value = compile_fn()
        self.put(key, value)
        return value


def _platform_fingerprint() -> str:
    """Chip-generation fingerprint (reference: arch fingerprint)."""
    try:
        import jax
        d = jax.devices()[0]
        return f"{d.platform}:{getattr(d, 'device_kind', '?')}"
    except Exception:
        return "unknown"


class PersistentCache:
    """On-disk executable cache index (reference: persistent_cache.rs).

    The payloads live in JAX's compilation cache directory (set by the
    package __init__); this class maintains the index with fingerprints and
    exposes stats/invalidation.
    """

    def __init__(self, cache_dir: str | None = None):
        self.cache_dir = Path(
            cache_dir
            or os.environ.get("PYGPUKIT_COMPILE_CACHE",
                              os.path.expanduser("~/.cache/pygpukit_tpu/xla")))
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.index_path = self.cache_dir / "pygpukit_index.json"
        self.fingerprint = _platform_fingerprint()
        self._index = self._load()

    def _load(self) -> dict:
        if self.index_path.exists():
            try:
                return json.loads(self.index_path.read_text())
            except Exception:
                return {}
        return {}

    def _save(self) -> None:
        self.index_path.write_text(json.dumps(self._index, indent=0))

    def record(self, key: str, meta: dict | None = None) -> None:
        self._index[key] = {
            "fingerprint": self.fingerprint,
            "time": time.time(),
            **(meta or {}),
        }
        self._save()

    def lookup(self, key: str) -> dict | None:
        ent = self._index.get(key)
        if ent is None:
            return None
        if ent.get("fingerprint") != self.fingerprint:
            return None     # different chip generation: do not reuse
        return ent

    def invalidate(self, key: str | None = None) -> None:
        if key is None:
            self._index.clear()
        else:
            self._index.pop(key, None)
        self._save()

    def stats(self) -> dict:
        disk_files = sum(1 for _ in self.cache_dir.glob("*")
                         if _.name != "pygpukit_index.json")
        return {
            "indexed": len(self._index),
            "disk_entries": disk_files,
            "fingerprint": self.fingerprint,
            "dir": str(self.cache_dir),
        }
