"""Concurrent multi-model serving: per-model execution contexts with memory
budgets and device/partition assignment.

Rebuilds the reference's marquee concurrency feature (reference:
src/pygpukit/scheduler/execution.py:97-465 create_context/session over
rust MultiLLMController, dispatch_controller.rs:78): each model gets a
dedicated ExecutionContext with an HBM budget drawn from the global budget
and a partition. On CUDA isolation came from streams; on TPU it comes from
device assignment (contexts round-robin over the devices of the slice) plus
the partition's admission limits — XLA serialises programs per device, so
two contexts on different devices run truly concurrently.
"""

from __future__ import annotations

import asyncio
import contextlib
import enum
import threading
from dataclasses import dataclass, field

import jax

from .core import Scheduler, Task, TaskPolicy
from .partition import PartitionLimits, PartitionManager


class ContextState(enum.Enum):
    CREATED = "created"
    ACTIVE = "active"
    IDLE = "idle"
    DESTROYED = "destroyed"


@dataclass
class ContextStats:
    executions: int = 0
    total_wait_s: float = 0.0
    rejected: int = 0


@dataclass
class ExecutionContext:
    """Per-model context (reference: execution_context.rs:20-320).

    When created with a bandwidth budget, every ``run`` passes through the
    context's KernelPacingEngine (reference: pacing.rs:125 — one model's
    kernel storm can't starve another); ``run_sliced`` splits large rowwise
    work through the SliceScheduler with a yield point between slices
    (reference: slicing.rs:202)."""
    name: str
    max_memory: int
    partition_id: int
    device_index: int
    controller: "MultiModelController"
    state: ContextState = ContextState.CREATED
    stats: ContextStats = field(default_factory=ContextStats)
    pacing: object | None = None          # KernelPacingEngine
    slicer: object | None = None          # SliceScheduler
    _lock: threading.Lock = field(default_factory=threading.Lock)

    @property
    def device(self):
        devs = jax.devices()
        return devs[self.device_index % len(devs)]

    def run(self, fn, *args, memory_bytes: int = 0, **kwargs):
        """Execute fn with this context's resources acquired."""
        ctrl = self.controller
        mem = memory_bytes or 0
        if not ctrl.partitions.acquire(self.partition_id, mem):
            self.stats.rejected += 1
            raise RuntimeError(
                f"context {self.name!r}: partition resources exhausted")
        try:
            with self._lock:
                self.state = ContextState.ACTIVE
                self.stats.executions += 1
            if self.pacing is not None:
                self.pacing.admit(bytes_moved=mem)
            with jax.default_device(self.device):
                return fn(*args, **kwargs)
        finally:
            ctrl.partitions.release(self.partition_id, mem)
            with self._lock:
                self.state = ContextState.IDLE

    async def run_async(self, fn, *args, memory_bytes: int = 0, **kwargs):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            self.controller._executor,
            lambda: self.run(fn, *args, memory_bytes=memory_bytes, **kwargs))

    def run_sliced(self, fn, x, *args, axis: int = 0, memory_bytes: int = 0):
        """Row-sliced execution with inter-slice yields; paced per slice."""
        if self.slicer is None:
            from ..dispatch.slicing import SliceConfig, SliceScheduler
            self.slicer = SliceScheduler(SliceConfig(yield_fn=lambda: None))

        def paced(chunk, *a):
            if self.pacing is not None:
                self.pacing.admit(bytes_moved=memory_bytes)
            with jax.default_device(self.device):
                return fn(chunk, *a)

        return self.slicer.run_sliced(paced, x, *args, axis=axis)

    @contextlib.contextmanager
    def session(self):
        """Run user code pinned to this context's device (reference:
        session(), scheduler/execution.py:175)."""
        with self._lock:
            self.state = ContextState.ACTIVE
        try:
            with jax.default_device(self.device):
                yield self
        finally:
            with self._lock:
                self.state = ContextState.IDLE


@dataclass
class ControllerStats:
    contexts: int = 0
    total_budget: int = 0
    allocated_budget: int = 0


class MultiModelController:
    """Registry of contexts + global HBM budget arbitration (reference:
    MultiLLMController, dispatch_controller.rs:78)."""

    def __init__(self, total_memory: int = 16 << 30, max_workers: int = 4):
        self.scheduler = Scheduler(total_memory=total_memory)
        self.partitions = PartitionManager(self.scheduler)
        self.total_memory = total_memory
        self.allocated = 0
        self.contexts: dict[str, ExecutionContext] = {}
        self._lock = threading.RLock()
        self._next_device = 0
        import concurrent.futures
        self._executor = concurrent.futures.ThreadPoolExecutor(max_workers)

    def create_context(self, name: str, max_memory: int,
                       max_streams: int = 2,
                       device_index: int | None = None,
                       bandwidth_bytes_per_s: float | None = None,
                       slice_rows: int | None = None) -> ExecutionContext:
        """reference: create_context, scheduler/execution.py:97.
        ``bandwidth_bytes_per_s`` attaches a pacing engine enforcing the
        context's QoS bandwidth share; ``slice_rows`` configures
        run_sliced's tile size."""
        with self._lock:
            if name in self.contexts:
                raise ValueError(f"context {name!r} already exists")
            if self.allocated + max_memory > self.total_memory:
                raise MemoryError(
                    f"budget exhausted: {self.allocated + max_memory} > "
                    f"{self.total_memory}")
            pid = self.partitions.create(PartitionLimits(
                memory_bytes=max_memory, max_streams=max_streams))
            if device_index is None:
                device_index = self._next_device
                self._next_device += 1
            pacing = None
            if bandwidth_bytes_per_s is not None:
                from ..dispatch.pacing import KernelPacingEngine, PacingConfig
                window = 0.05
                pacing = KernelPacingEngine(PacingConfig(
                    window_s=window,
                    max_bytes_per_window=int(bandwidth_bytes_per_s * window)))
            slicer = None
            if slice_rows is not None:
                from ..dispatch.slicing import SliceConfig, SliceScheduler
                slicer = SliceScheduler(SliceConfig(slice_rows=slice_rows,
                                                    yield_fn=lambda: None))
            ctx = ExecutionContext(name=name, max_memory=max_memory,
                                   partition_id=pid,
                                   device_index=device_index,
                                   controller=self, pacing=pacing,
                                   slicer=slicer)
            self.contexts[name] = ctx
            self.allocated += max_memory
            return ctx

    def destroy_context(self, name: str) -> None:
        with self._lock:
            ctx = self.contexts.pop(name, None)
            if ctx is None:
                return
            self.partitions.destroy(ctx.partition_id)
            self.allocated -= ctx.max_memory
            ctx.state = ContextState.DESTROYED

    def get(self, name: str) -> ExecutionContext:
        return self.contexts[name]

    def stats(self) -> ControllerStats:
        with self._lock:
            return ControllerStats(
                contexts=len(self.contexts),
                total_budget=self.total_memory,
                allocated_budget=self.allocated,
            )

    def shutdown(self) -> None:
        self._executor.shutdown(wait=True)


_controller: MultiModelController | None = None
_controller_lock = threading.Lock()


def initialize(total_memory: int = 16 << 30) -> MultiModelController:
    """Global controller init (reference: initialize, execution.py:465)."""
    global _controller
    with _controller_lock:
        if _controller is None:
            _controller = MultiModelController(total_memory)
        return _controller


def create_context(name: str, max_memory: int, **kw) -> ExecutionContext:
    return initialize().create_context(name, max_memory, **kw)


def get_controller() -> MultiModelController | None:
    return _controller
