"""K8s-style task scheduler: QoS classes, admission control, memory
reservation (reference: src/pygpukit/scheduler/core.py:42-95 over rust
scheduler/{core,qos,admission}.rs).

Native C++ backend (native/src/scheduler.cpp) with pure-Python fallback.
"""

from __future__ import annotations

import enum
import threading
from dataclasses import dataclass, field

from .._native import (
    PkAdmitResult, PkSchedConfig, PkSchedStats, PkTaskDesc, get_native,
)


class TaskPolicy(enum.IntEnum):
    """QoS classes (reference: TaskPolicy, scheduler/core.py:52)."""
    GUARANTEED = 0
    BURSTABLE = 1
    BEST_EFFORT = 2


class TaskState(enum.IntEnum):
    PENDING = 0
    QUEUED = 1
    RUNNING = 2
    COMPLETED = 3
    FAILED = 4
    REJECTED = 5


class AdmitDecision(enum.IntEnum):
    ADMIT = 0
    QUEUE = 1
    REJECT_MEMORY = 2
    REJECT_BANDWIDTH = 3
    REJECT_QUEUE_FULL = 4
    REJECT_DEPS = 5

    @property
    def admitted(self) -> bool:
        return self in (AdmitDecision.ADMIT, AdmitDecision.QUEUE)


@dataclass
class AdmissionResult:
    decision: AdmitDecision
    eta_seconds: float = 0.0
    available_memory: int = 0


@dataclass
class Task:
    """Task descriptor (reference: Task, scheduler/core.py:66)."""
    task_id: int = 0
    memory_bytes: int = 0
    bandwidth: float = 0.0
    policy: TaskPolicy = TaskPolicy.BEST_EFFORT
    priority: int = 0
    partition_id: int = 0
    fn: object = None       # optional callable executed by run_pending
    result: object = None
    error: Exception | None = None


@dataclass
class SchedulerStats:
    submitted: int = 0
    completed: int = 0
    failed: int = 0
    rejected: int = 0
    queued: int = 0
    running: int = 0
    reserved_memory: int = 0


# QoS policy table mirrored from the native side (scheduler.cpp kQos)
_QOS_PRIORITY = {TaskPolicy.GUARANTEED: 300, TaskPolicy.BURSTABLE: 200,
                 TaskPolicy.BEST_EFFORT: 100}
_QOS_OVERCOMMIT = {TaskPolicy.GUARANTEED: 0.0, TaskPolicy.BURSTABLE: 1.0,
                   TaskPolicy.BEST_EFFORT: 1.0}


class Scheduler:
    """QoS scheduler with deterministic admission (reference: Scheduler,
    scheduler/core.py:95)."""

    def __init__(self, total_memory: int = 8 << 30,
                 overcommit_ratio: float = 1.2, max_pending: int = 256,
                 total_bandwidth: float = 100.0,
                 use_native: bool | None = None):
        self._native = get_native() if use_native in (None, True) else None
        if use_native is True and self._native is None:
            raise RuntimeError("native scheduler requested but unavailable")
        self._tasks: dict[int, Task] = {}
        self._lock = threading.RLock()
        self.total_memory = total_memory
        self.overcommit_ratio = overcommit_ratio
        self.max_pending = max_pending
        self.total_bandwidth = total_bandwidth
        if self._native is not None:
            cfg = PkSchedConfig(total_memory, overcommit_ratio, max_pending,
                                total_bandwidth)
            self._handle = self._native.pk_sched_create(cfg)
        else:
            self._handle = None
            self._queue: list[tuple] = []
            self._seq = 0
            self._next_id = 1
            self._reserved = 0
            self._bandwidth_reserved = 0.0
            self._stats = SchedulerStats()

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    # -- submission -----------------------------------------------------------

    def submit(self, task: Task) -> tuple[int, AdmissionResult]:
        if self._handle is not None:
            desc = PkTaskDesc(task.memory_bytes, task.bandwidth,
                              int(task.policy), task.priority,
                              task.partition_id)
            res = PkAdmitResult()
            tid = self._native.pk_sched_submit(self._handle, desc, res)
            task.task_id = tid
            with self._lock:
                self._tasks[tid] = task
            return tid, AdmissionResult(AdmitDecision(res.decision),
                                        res.eta_seconds, res.available_memory)
        with self._lock:
            limit = int(self.total_memory *
                        (1.0 + (self.overcommit_ratio - 1.0) *
                         _QOS_OVERCOMMIT[task.policy]))
            avail = max(limit - self._reserved, 0)
            self._stats.submitted += 1
            tid = self._next_id
            self._next_id += 1
            task.task_id = tid
            self._tasks[tid] = task
            if task.memory_bytes > limit:
                self._stats.rejected += 1
                return tid, AdmissionResult(AdmitDecision.REJECT_MEMORY, 0, avail)
            if (self.total_bandwidth > 0
                    and self._bandwidth_reserved + task.bandwidth
                    > self.total_bandwidth):
                self._stats.rejected += 1
                return tid, AdmissionResult(AdmitDecision.REJECT_BANDWIDTH, 0, avail)
            if len(self._queue) >= self.max_pending:
                self._stats.rejected += 1
                return tid, AdmissionResult(AdmitDecision.REJECT_QUEUE_FULL, 0, avail)
            decision = (AdmitDecision.ADMIT if task.memory_bytes <= avail
                        else AdmitDecision.QUEUE)
            self._seq += 1
            self._queue.append((int(task.policy),
                                -(_QOS_PRIORITY[task.policy] + task.priority),
                                self._seq, tid))
            self._reserved += task.memory_bytes
            self._bandwidth_reserved += task.bandwidth
            self._stats.queued += 1
            return tid, AdmissionResult(decision, 0.0, avail)

    def next_task(self) -> Task | None:
        if self._handle is not None:
            tid = self._native.pk_sched_next(self._handle)
            return self._tasks.get(tid) if tid else None
        with self._lock:
            if not self._queue:
                return None
            self._queue.sort()
            _, _, _, tid = self._queue.pop(0)
            self._stats.queued -= 1
            self._stats.running += 1
            return self._tasks[tid]

    def complete(self, task_id: int, failed: bool = False) -> None:
        if self._handle is not None:
            self._native.pk_sched_complete(self._handle, task_id,
                                           1 if failed else 0)
            return
        with self._lock:
            t = self._tasks.get(task_id)
            if t is None:
                return
            self._reserved = max(0, self._reserved - t.memory_bytes)
            self._bandwidth_reserved = max(
                0.0, self._bandwidth_reserved - t.bandwidth)
            self._stats.running = max(0, self._stats.running - 1)
            if failed:
                self._stats.failed += 1
            else:
                self._stats.completed += 1

    def task_state(self, task_id: int) -> TaskState | None:
        if self._handle is not None:
            s = self._native.pk_sched_task_state(self._handle, task_id)
            return TaskState(s) if s >= 0 else None
        return None  # py fallback tracks via stats only

    def run_pending(self) -> int:
        """Drain the queue executing Task.fn callables (FIFO scheduling loop,
        reference: scheduler/core.py run loop). Returns tasks run."""
        n = 0
        while True:
            t = self.next_task()
            if t is None:
                return n
            try:
                if callable(t.fn):
                    t.result = t.fn()
                self.complete(t.task_id, failed=False)
            except Exception as e:  # capture error (reference task FAILED state)
                t.error = e
                self.complete(t.task_id, failed=True)
            n += 1

    def stats(self) -> SchedulerStats:
        if self._handle is not None:
            raw = PkSchedStats()
            self._native.pk_sched_stats(self._handle, raw)
            return SchedulerStats(**{f: getattr(raw, f) for f, _ in raw._fields_})
        with self._lock:
            self._stats.reserved_memory = self._reserved
            return SchedulerStats(**self._stats.__dict__)

    def __del__(self):
        try:
            if self._handle is not None:
                self._native.pk_sched_destroy(self._handle)
                self._handle = None
        except Exception:
            pass
