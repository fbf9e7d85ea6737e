"""Scheduler / pool / partition / transfer tests (reference model:
tests/test_scheduler.py, test_memory_pool.py, test_rust_admission_qos.py —
run against BOTH the C++ native backend and the pure-Python fallback)."""

import numpy as np
import pytest

from pygpukit_tpu._native import native_available
from pygpukit_tpu.memory import MemoryPool
from pygpukit_tpu.scheduler import (
    AdmitDecision, PartitionLimits, PartitionManager, Scheduler, Task,
    TaskPolicy,
)
from pygpukit_tpu.transfer import AsyncTransferEngine

BACKENDS = [False] + ([True] if native_available() else [])


@pytest.mark.parametrize("use_native", BACKENDS)
class TestMemoryPool:
    def test_alloc_free_reuse(self, use_native):
        pool = MemoryPool(quota_bytes=1 << 20, use_native=use_native)
        b1 = pool.alloc(1000)
        assert b1.size == 1024  # size class rounding
        pool.free(b1)
        b2 = pool.alloc(900)    # same class -> reuse
        s = pool.stats()
        assert s.reuses == 1
        assert s.allocations == 2

    def test_quota_enforced(self, use_native):
        pool = MemoryPool(quota_bytes=4096, use_native=use_native)
        pool.alloc(2048)
        pool.alloc(2048)
        with pytest.raises(MemoryError):
            pool.alloc(2048)
        assert pool.stats().failures == 1

    def test_eviction_on_pressure(self, use_native):
        pool = MemoryPool(quota_bytes=4096, use_native=use_native)
        b = pool.alloc(2048)
        pool.free(b)            # parked in free list
        pool.alloc(4096)        # needs eviction of the parked block
        assert pool.stats().evictions >= 1

    def test_trim(self, use_native):
        pool = MemoryPool(quota_bytes=1 << 20, use_native=use_native)
        blocks = [pool.alloc(4096) for _ in range(4)]
        for b in blocks:
            pool.free(b)
        reclaimed = pool.trim(8192)
        assert reclaimed >= 8192


@pytest.mark.parametrize("use_native", BACKENDS)
class TestScheduler:
    def test_admit_and_order(self, use_native):
        s = Scheduler(total_memory=1 << 30, use_native=use_native)
        _, r1 = s.submit(Task(memory_bytes=1 << 20,
                              policy=TaskPolicy.BEST_EFFORT))
        _, r2 = s.submit(Task(memory_bytes=1 << 20,
                              policy=TaskPolicy.GUARANTEED))
        _, r3 = s.submit(Task(memory_bytes=1 << 20,
                              policy=TaskPolicy.BURSTABLE, priority=5))
        assert r1.decision == AdmitDecision.ADMIT
        # GUARANTEED first, then BURSTABLE, then BEST_EFFORT
        assert s.next_task().policy == TaskPolicy.GUARANTEED
        assert s.next_task().policy == TaskPolicy.BURSTABLE
        assert s.next_task().policy == TaskPolicy.BEST_EFFORT
        assert s.next_task() is None

    def test_reject_memory(self, use_native):
        s = Scheduler(total_memory=1 << 20, overcommit_ratio=1.0,
                      use_native=use_native)
        _, r = s.submit(Task(memory_bytes=1 << 30,
                             policy=TaskPolicy.GUARANTEED))
        assert r.decision == AdmitDecision.REJECT_MEMORY
        assert s.stats().rejected == 1

    def test_overcommit_burstable_only(self, use_native):
        # guaranteed sees no overcommit headroom; burstable does
        s = Scheduler(total_memory=1 << 20, overcommit_ratio=2.0,
                      use_native=use_native)
        _, rg = s.submit(Task(memory_bytes=int(1.5 * (1 << 20)),
                              policy=TaskPolicy.GUARANTEED))
        _, rb = s.submit(Task(memory_bytes=int(1.5 * (1 << 20)),
                              policy=TaskPolicy.BURSTABLE))
        assert rg.decision == AdmitDecision.REJECT_MEMORY
        assert rb.decision in (AdmitDecision.ADMIT, AdmitDecision.QUEUE)

    def test_queue_full(self, use_native):
        s = Scheduler(total_memory=1 << 30, max_pending=2,
                      use_native=use_native)
        s.submit(Task(memory_bytes=1))
        s.submit(Task(memory_bytes=1))
        _, r = s.submit(Task(memory_bytes=1))
        assert r.decision == AdmitDecision.REJECT_QUEUE_FULL

    def test_run_pending_executes(self, use_native):
        s = Scheduler(total_memory=1 << 30, use_native=use_native)
        results = []
        t = Task(memory_bytes=16, fn=lambda: results.append(1) or "ok")
        s.submit(t)
        n = s.run_pending()
        assert n == 1 and results == [1] and t.result == "ok"
        assert s.stats().completed == 1

    def test_failed_task_captured(self, use_native):
        s = Scheduler(total_memory=1 << 30, use_native=use_native)
        def boom():
            raise ValueError("x")
        t = Task(memory_bytes=16, fn=boom)
        s.submit(t)
        s.run_pending()
        assert isinstance(t.error, ValueError)
        assert s.stats().failed == 1


@pytest.mark.parametrize("use_native", BACKENDS)
class TestPartitions:
    def test_acquire_release_limits(self, use_native):
        s = Scheduler(total_memory=1 << 30, use_native=use_native)
        pm = PartitionManager(s)
        pid = pm.create(PartitionLimits(memory_bytes=1 << 20, max_streams=1))
        assert pm.acquire(pid, 1 << 19)
        assert not pm.acquire(pid, 1 << 19)  # max_streams=1 blocks second
        pm.release(pid, 1 << 19)
        assert pm.acquire(pid, 1 << 19)
        u = pm.usage(pid)
        assert u.memory_used == 1 << 19
        assert u.streams_used == 1

    def test_memory_limit(self, use_native):
        s = Scheduler(total_memory=1 << 30, use_native=use_native)
        pm = PartitionManager(s)
        pid = pm.create(PartitionLimits(memory_bytes=1000, max_streams=8))
        assert not pm.acquire(pid, 2000)


class TestTransferEngine:
    def test_h2d_d2h_roundtrip(self):
        eng = AsyncTransferEngine(num_workers=2)
        arr = np.arange(1024, dtype=np.float32)
        fut = eng.h2d(arr)
        buf = fut.result(timeout=30)
        back = eng.d2h(buf).result(timeout=30)
        np.testing.assert_array_equal(back, arr)
        s = eng.stats()
        assert s.completed >= 2
        assert s.bytes_h2d == arr.nbytes
        eng.shutdown()

    def test_priority_and_sync(self):
        eng = AsyncTransferEngine(num_workers=1)
        futs = [eng.h2d(np.ones(16, np.float32), priority=AsyncTransferEngine.LOW)
                for _ in range(4)]
        hi = eng.h2d(np.zeros(16, np.float32), priority=AsyncTransferEngine.HIGH)
        eng.synchronize()
        assert hi.done() and all(f.done() for f in futs)
        eng.shutdown()


class TestMultiModel:
    def test_contexts_and_budget(self):
        from pygpukit_tpu.scheduler import MultiModelController
        ctrl = MultiModelController(total_memory=1 << 30)
        a = ctrl.create_context("model_a", 1 << 29)
        b = ctrl.create_context("model_b", 1 << 29)
        with pytest.raises(MemoryError):
            ctrl.create_context("model_c", 1 << 29)
        with pytest.raises(ValueError):
            ctrl.create_context("model_a", 1)
        assert a.device_index != b.device_index
        out = a.run(lambda x: x * 2, 21)
        assert out == 42
        st = ctrl.stats()
        assert st.contexts == 2
        ctrl.destroy_context("model_b")
        c = ctrl.create_context("model_c", 1 << 29)  # budget freed
        assert c is not None
        ctrl.shutdown()

    def test_session_pins_device(self):
        from pygpukit_tpu.scheduler import MultiModelController
        import jax.numpy as jnp
        ctrl = MultiModelController(total_memory=1 << 30)
        ctx = ctrl.create_context("m", 1 << 20, device_index=1)
        with ctx.session():
            x = jnp.ones((4,)) + 1
        assert float(x.sum()) == 8.0
        ctrl.shutdown()


@pytest.mark.parametrize("use_native", BACKENDS)
class TestBandwidthReservation:
    def test_oversubscription_rejected(self, use_native):
        s = Scheduler(total_memory=1 << 30, total_bandwidth=100.0,
                      use_native=use_native)
        _, r1 = s.submit(Task(memory_bytes=1, bandwidth=60.0))
        _, r2 = s.submit(Task(memory_bytes=1, bandwidth=60.0))
        assert r1.decision.admitted
        assert r2.decision == AdmitDecision.REJECT_BANDWIDTH
        # releasing the first frees bandwidth for a new task
        t = s.next_task()
        s.complete(t.task_id)
        _, r3 = s.submit(Task(memory_bytes=1, bandwidth=60.0))
        assert r3.decision.admitted


@pytest.mark.parametrize("use_native", BACKENDS)
class TestHostBackedPool:
    def test_host_ptr_lifecycle(self, use_native):
        """Host-backed staging blocks on BOTH backends (reference:
        pinned.rs:150; native pk_pool_host_ptr / py numpy buffers)."""
        from pygpukit_tpu.memory.pool import MemoryPool
        pool = MemoryPool(1 << 20, use_native=use_native)
        blk = pool.alloc(4096, host_backed=True)
        buf = pool.host_buffer(blk.block_id)
        assert buf is not None and buf.nbytes >= 4096
        buf[:4] = [1, 2, 3, 4]                        # writable staging
        assert list(pool.host_buffer(blk.block_id)[:4]) == [1, 2, 3, 4]
        blk.free()
        # device-only block has no host buffer
        blk2 = pool.alloc(512, host_backed=False)
        assert pool.host_buffer(blk2.block_id) is None
        blk2.free()


class TestPacingIntegration:
    """Pacing + slicing wired into the multi-model controller (reference:
    pacing.rs:125 / slicing.rs:202 carried real dispatch traffic there)."""

    def test_paced_context_throttles(self):
        import time
        from pygpukit_tpu.scheduler.execution import MultiModelController
        ctrl = MultiModelController(total_memory=1 << 30)
        ctx = ctrl.create_context("paced", 1 << 20,
                                  bandwidth_bytes_per_s=1e6)  # 1 MB/s
        t0 = time.monotonic()
        for _ in range(3):
            ctx.run(lambda: None, memory_bytes=60_000)  # > window budget
        assert ctx.pacing.stats.launches == 3
        assert ctx.pacing.stats.throttled >= 1          # hit the window cap
        assert time.monotonic() - t0 >= 0.04            # actually slept
        ctrl.shutdown()

    def test_run_sliced_correct_and_counted(self):
        import jax.numpy as jnp
        import numpy as np
        from pygpukit_tpu.scheduler.execution import MultiModelController
        ctrl = MultiModelController(total_memory=1 << 30)
        ctx = ctrl.create_context("sliced", 1 << 20, slice_rows=8)
        x = jnp.arange(20.0).reshape(20, 1)
        out = ctx.run_sliced(lambda c: c * 2.0, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
        assert ctx.slicer.stats.slices == 3             # ceil(20/8)
        ctrl.shutdown()
