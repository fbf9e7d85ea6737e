"""Stress tests (reference model: tests/stress_test.py — allocation and
execution loops that shake out leaks and state corruption)."""

import numpy as np
import pytest

import jax.numpy as jnp

import pygpukit_tpu as gp


class TestAllocationStress:
    def test_pool_alloc_free_cycles(self):
        from pygpukit_tpu.memory import MemoryPool
        pool = MemoryPool(quota_bytes=1 << 24)
        for cycle in range(50):
            blocks = [pool.alloc(1 << (8 + i % 8)) for i in range(16)]
            for b in blocks:
                pool.free(b)
        s = pool.stats()
        assert s.allocations == 800
        assert s.reuses > 500          # free lists actually reused
        assert s.used_bytes == 0

    def test_array_churn(self):
        for i in range(100):
            a = gp.from_numpy(np.full((64, 64), i, np.float32))
            b = gp.add(a, a)
            assert b.to_numpy()[0, 0] == 2 * i

    def test_executable_cache_churn(self):
        from pygpukit_tpu.core.executable import ExecutableCache, capture
        cache = ExecutableCache(max_entries=4)
        for i in range(12):
            exe = cache.get_or_capture(
                f"k{i % 6}", lambda x: x + 1, jnp.ones((4,)))
            out = exe.replay(jnp.ones((4,)))
        st = cache.stats()
        assert st["entries"] <= 4      # eviction bounded the cache


class TestSchedulerStress:
    def test_many_tasks_qos_ordering(self):
        from pygpukit_tpu.scheduler import Scheduler, Task, TaskPolicy
        s = Scheduler(total_memory=1 << 30, max_pending=512)
        order = []
        policies = [TaskPolicy.BEST_EFFORT, TaskPolicy.GUARANTEED,
                    TaskPolicy.BURSTABLE]
        for i in range(120):
            p = policies[i % 3]
            s.submit(Task(memory_bytes=1024, policy=p,
                          fn=lambda p=p: order.append(p)))
        n = s.run_pending()
        assert n == 120
        # all GUARANTEED drained before any BEST_EFFORT
        last_g = max(i for i, p in enumerate(order)
                     if p == TaskPolicy.GUARANTEED)
        first_be = min(i for i, p in enumerate(order)
                       if p == TaskPolicy.BEST_EFFORT)
        assert last_g < first_be
        assert s.stats().completed == 120

    def test_transfer_engine_flood(self):
        from pygpukit_tpu.transfer import AsyncTransferEngine
        eng = AsyncTransferEngine(num_workers=3)
        futs = [eng.h2d(np.full(256, i, np.float32)) for i in range(64)]
        results = [f.result(60) for f in futs]
        for i, r in enumerate(results):
            assert float(np.asarray(r)[0]) == i
        assert eng.stats().completed >= 64
        eng.shutdown()


class TestDecodeStress:
    def test_repeated_cache_reinit(self):
        from pygpukit_tpu.llm import (
            CausalTransformerModel, TransformerConfig, init_params,
        )
        cfg = TransformerConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=64, head_dim_override=8,
            max_position_embeddings=128, tie_word_embeddings=True)
        m = CausalTransformerModel(cfg, init_params(cfg, 0, jnp.float32),
                                   dtype=jnp.float32)
        ref = None
        for _ in range(5):
            m.init_fixed_cache(64)
            out = m.generate([3, 9], max_new_tokens=6, temperature=0.0)
            if ref is None:
                ref = out
            assert out == ref          # no state leaks across reinits
