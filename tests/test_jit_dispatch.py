"""JIT front end + dispatch services tests (reference model: tests/test_jit.py)."""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from pygpukit_tpu.dispatch import (
    KernelCache, KernelPacingEngine, PacingConfig, PersistentCache,
    SliceConfig, SliceScheduler,
)
from pygpukit_tpu.jit import (
    CompileError, CompileErrorCode, JITKernel, check_platform_compatibility,
    jit, warmup,
)


class TestJIT:
    def test_decorator_and_launch(self):
        @jit
        def double(x):
            return x * 2

        out = double(jnp.ones((4,)))
        np.testing.assert_allclose(np.asarray(out), 2.0)
        assert double.stats.compiles == 1
        double(jnp.ones((4,)))
        assert double.stats.compiles == 1       # cached
        assert double.stats.launches == 2

    def test_per_signature_compile(self):
        k = JITKernel(lambda x: x + 1, name="inc")
        k(jnp.ones((2,)))
        k(jnp.ones((3,)))
        assert k.stats.compiles == 2

    def test_static_argnums(self):
        k = JITKernel(lambda x, n: x * n, static_argnums=(1,))
        out = k(jnp.ones((2,)), 3)
        np.testing.assert_allclose(np.asarray(out), 3.0)

    def test_compile_error_classified(self):
        k = JITKernel(lambda x: x.bad_attr, name="broken")
        with pytest.raises(CompileError) as ei:
            k.compile(jnp.ones((2,)))
        assert ei.value.code in (CompileErrorCode.INVALID_INPUT,
                                 CompileErrorCode.COMPILATION_FAILED)

    def test_warmup_background(self):
        k = JITKernel(lambda x: x - 1)
        t = warmup(k, jnp.ones((4,)))
        t.join(timeout=120)
        assert k.stats.compiles == 1

    def test_platform_probe(self):
        info = check_platform_compatibility()
        assert info["compatible"] and info["devices"] >= 1


class TestKernelCache:
    def test_hit_miss_evict(self):
        c = KernelCache(max_entries=2)
        k1 = c.make_key("src1")
        assert c.get(k1) is None
        c.put(k1, "a")
        assert c.get(k1) == "a"
        c.put(c.make_key("src2"), "b")
        c.put(c.make_key("src3"), "c")   # evicts LRU (src1... but src1 was
        # touched after insert, so src2 is LRU)
        assert c.stats.evictions == 1
        assert c.stats.entries == 2

    def test_get_or_compile(self):
        c = KernelCache()
        calls = []
        v = c.get_or_compile("s", (), lambda: calls.append(1) or "v")
        assert v == "v" and len(calls) == 1
        v = c.get_or_compile("s", (), lambda: calls.append(1) or "v")
        assert len(calls) == 1           # cached


class TestPersistentCache:
    def test_record_lookup_fingerprint(self, tmp_path):
        pc = PersistentCache(cache_dir=str(tmp_path))
        pc.record("k1", {"note": "x"})
        assert pc.lookup("k1") is not None
        # wrong fingerprint rejected
        pc._index["k2"] = {"fingerprint": "other:chip", "time": 0}
        assert pc.lookup("k2") is None
        pc.invalidate("k1")
        assert pc.lookup("k1") is None
        assert "dir" in pc.stats()


class TestPacing:
    def test_throttles(self):
        eng = KernelPacingEngine(PacingConfig(
            window_s=0.05, max_launches_per_window=2))
        t0 = time.monotonic()
        for _ in range(5):
            assert eng.admit()
        elapsed = time.monotonic() - t0
        assert eng.stats.throttled >= 1
        assert elapsed >= 0.05           # at least one window wait

    def test_nonblocking_reject(self):
        eng = KernelPacingEngine(PacingConfig(
            window_s=10.0, max_launches_per_window=1))
        assert eng.admit(block=False)
        assert not eng.admit(block=False)


class TestSlicing:
    def test_sliced_matches_full(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((100, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
        yields = []
        sched = SliceScheduler(SliceConfig(slice_rows=32,
                                           yield_fn=lambda: yields.append(1)))
        out = sched.run_sliced(lambda a: a @ w, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w),
                                   rtol=1e-5)
        assert sched.stats.slices == 4
        assert len(yields) == 4


class TestDeterminismHarness:
    def test_bitwise_replay(self):
        import jax
        from pygpukit_tpu.profiling import verify_bitwise_replay
        f = jax.jit(lambda x: jnp.tanh(x @ x))
        x = jnp.ones((16, 16))
        rep = verify_bitwise_replay(f, x)
        assert rep and rep.runs == 3

    def test_recompile_parity(self):
        import jax
        from pygpukit_tpu.profiling import verify_recompile_parity
        x = jnp.linspace(0, 1, 64).reshape(8, 8)
        rep = verify_recompile_parity(
            lambda: jax.jit(lambda a: jnp.exp(a) @ a), x)
        assert rep

    def test_strategy_equivalence(self):
        from pygpukit_tpu.llm import (
            CausalTransformerModel, TransformerConfig, init_params,
        )
        from pygpukit_tpu.profiling import verify_strategy_equivalence
        cfg = TransformerConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=64, head_dim_override=8,
            max_position_embeddings=256, tie_word_embeddings=True)
        m = CausalTransformerModel(cfg, init_params(cfg, 9, jnp.float32),
                                   dtype=jnp.float32)
        rep = verify_strategy_equivalence(m, [3, 7], n_tokens=8)
        assert rep, rep.detail
