"""Logical device partitions (reference: rust scheduler/partition.rs:14-230,
PartitionManager).

A partition is a quota bundle — HBM bytes, compute fraction, bandwidth,
concurrent executions — that a model/context is confined to. On TPU this is
the unit the multi-model controller bills against when mapping models onto
cores/chips of a slice (SURVEY §2.4: the stream-isolation analog).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from .._native import PkPartitionLimits, PkPartitionUsage, get_native
from .core import Scheduler


@dataclass
class PartitionLimits:
    memory_bytes: int = 1 << 30
    compute_fraction: float = 1.0
    bandwidth: float = 0.0        # 0 = unlimited
    max_streams: int = 1


@dataclass
class PartitionUsage:
    memory_used: int = 0
    bandwidth_used: float = 0.0
    streams_used: int = 0
    tasks_admitted: int = 0
    tasks_rejected: int = 0


class PartitionManager:
    """Create/destroy partitions and acquire/release their resources."""

    def __init__(self, scheduler: Scheduler):
        self.scheduler = scheduler
        self._native = get_native() if scheduler.is_native else None
        self._lock = threading.RLock()
        self._py: dict[int, tuple[PartitionLimits, PartitionUsage]] = {}
        self._next = 1

    def create(self, limits: PartitionLimits) -> int:
        if self._native is not None:
            raw = PkPartitionLimits(limits.memory_bytes,
                                    limits.compute_fraction,
                                    limits.bandwidth, limits.max_streams)
            return self._native.pk_part_create(self.scheduler._handle, raw)
        with self._lock:
            pid = self._next
            self._next += 1
            self._py[pid] = (limits, PartitionUsage())
            return pid

    def destroy(self, part_id: int) -> None:
        if self._native is not None:
            self._native.pk_part_destroy(self.scheduler._handle, part_id)
            return
        with self._lock:
            self._py.pop(part_id, None)

    def acquire(self, part_id: int, memory: int, bandwidth: float = 0.0) -> bool:
        if self._native is not None:
            return self._native.pk_part_acquire(
                self.scheduler._handle, part_id, memory, bandwidth) == 0
        with self._lock:
            ent = self._py.get(part_id)
            if ent is None:
                return False
            lim, use = ent
            if use.memory_used + memory > lim.memory_bytes:
                return False
            if lim.bandwidth > 0 and use.bandwidth_used + bandwidth > lim.bandwidth:
                return False
            if use.streams_used + 1 > lim.max_streams:
                return False
            use.memory_used += memory
            use.bandwidth_used += bandwidth
            use.streams_used += 1
            return True

    def release(self, part_id: int, memory: int, bandwidth: float = 0.0) -> None:
        if self._native is not None:
            self._native.pk_part_release(self.scheduler._handle, part_id,
                                         memory, bandwidth)
            return
        with self._lock:
            ent = self._py.get(part_id)
            if ent is None:
                return
            _, use = ent
            use.memory_used = max(0, use.memory_used - memory)
            use.bandwidth_used = max(0.0, use.bandwidth_used - bandwidth)
            use.streams_used = max(0, use.streams_used - 1)

    def usage(self, part_id: int) -> PartitionUsage | None:
        if self._native is not None:
            raw = PkPartitionUsage()
            rc = self._native.pk_part_usage(self.scheduler._handle, part_id, raw)
            if rc != 0:
                return None
            return PartitionUsage(raw.memory_used, raw.bandwidth_used,
                                  raw.streams_used, raw.tasks_admitted,
                                  raw.tasks_rejected)
        ent = self._py.get(part_id)
        return None if ent is None else ent[1]
