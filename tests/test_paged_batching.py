"""Paged attention + continuous batching + Llama-4 tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from pygpukit_tpu.ops.batching import (
    argmax_sample_fn, check_eos_fn, gather_embeddings_fn,
    prepare_position_ids_fn, scatter_last_token_logits_fn,
)
from pygpukit_tpu.ops.paged import (
    PagedKVCache, paged_attention_fn, reshape_and_cache_fn,
)


class TestBatchingPrimitives:
    def test_prepare_position_ids(self):
        lens = jnp.asarray([3, 2, 4])
        pos = np.asarray(prepare_position_ids_fn(lens, 9))
        assert pos.tolist() == [0, 1, 2, 0, 1, 0, 1, 2, 3]

    def test_scatter_last_logits(self):
        logits = jnp.arange(5 * 4).reshape(5, 4).astype(jnp.float32)
        lens = jnp.asarray([2, 3])
        out = np.asarray(scatter_last_token_logits_fn(logits, lens))
        np.testing.assert_array_equal(out[0], np.arange(4, 8))
        np.testing.assert_array_equal(out[1], np.arange(16, 20))

    def test_argmax_and_eos(self):
        logits = jnp.asarray([[0.0, 2.0, 1.0], [3.0, 0.0, 0.0]])
        toks = argmax_sample_fn(logits)
        assert np.asarray(toks).tolist() == [1, 0]
        assert np.asarray(check_eos_fn(toks, 0)).tolist() == [False, True]

    def test_gather_embeddings(self):
        table = jnp.arange(12).reshape(4, 3).astype(jnp.float32)
        out = np.asarray(gather_embeddings_fn(table, jnp.asarray([2, 0])))
        np.testing.assert_array_equal(out[0], [6, 7, 8])


class TestPagedAttention:
    def _ref_attn(self, q, k, v):
        hq, d = q.shape
        hk = k.shape[1]
        if hk != hq:
            k = np.repeat(k, hq // hk, axis=1)
            v = np.repeat(v, hq // hk, axis=1)
        out = np.zeros((hq, d), np.float32)
        for h in range(hq):
            s = k[:, h] @ q[h] / np.sqrt(d)
            p = np.exp(s - s.max())
            p /= p.sum()
            out[h] = p @ v[:, h]
        return out

    def test_matches_contiguous(self):
        rng = np.random.default_rng(0)
        hq, hk, d, bs = 4, 2, 8, 4
        ctx = 10
        cache = PagedKVCache(num_blocks=8, block_size=bs, num_kv_heads=hk,
                             head_dim=d, dtype=jnp.float32)
        cache.allocate(0)
        k = rng.standard_normal((ctx, hk, d)).astype(np.float32)
        v = rng.standard_normal((ctx, hk, d)).astype(np.float32)
        cache.append(0, 0, jnp.asarray(k), jnp.asarray(v))
        assert cache.context_len(0) == ctx
        q = rng.standard_normal((hq, d)).astype(np.float32)
        out = np.asarray(cache.attention(0, 0, jnp.asarray(q)))
        ref = self._ref_attn(q, k, v)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_pallas_gate_matches_gather(self, monkeypatch):
        """PYGPUKIT_PAGED_ATTENTION=pallas routes PagedKVCache.attention
        through the scalar-prefetch kernel; tiny shapes run in interpret
        mode on CPU (real-Mosaic parity is TPU-gated in
        test_pallas_kernels)."""
        from pygpukit_tpu.ops.paged import paged_attention_fn
        import jax
        rng = np.random.default_rng(3)
        nb, bs, hq, hk, d = 6, 8, 4, 2, 128
        kp = jnp.asarray(rng.standard_normal((nb, bs, hk, d)), jnp.float32)
        vp = jnp.asarray(rng.standard_normal((nb, bs, hk, d)), jnp.float32)
        q = jnp.asarray(rng.standard_normal((hq, d)), jnp.float32)
        table = jnp.asarray(rng.permutation(nb)[:3], jnp.int32)
        ref = np.asarray(jax.jit(paged_attention_fn)(
            q, kp, vp, table, jnp.int32(20)))
        from pygpukit_tpu.kernels.paged_attention import paged_attention
        monkeypatch.setenv("PYGPUKIT_PAGED_ATTENTION", "pallas")
        got = np.asarray(paged_attention(q, kp, vp, table, 20))
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 1e-5, rel

    def test_block_reuse_after_free(self):
        cache = PagedKVCache(num_blocks=2, block_size=4, num_kv_heads=1,
                             head_dim=4, dtype=jnp.float32)
        cache.allocate(0)
        k = jnp.ones((8, 1, 4))
        cache.append(0, 0, k, k)          # uses both blocks
        cache.allocate(1)
        with pytest.raises(MemoryError):
            cache.append(1, 0, jnp.ones((1, 1, 4)), jnp.ones((1, 1, 4)))
        cache.free(0)
        cache.append(1, 0, jnp.ones((1, 1, 4)), jnp.ones((1, 1, 4)))
        assert cache.stats()["used_blocks"] == 1

    def test_incremental_append_matches(self):
        rng = np.random.default_rng(1)
        hq = hk = 2
        d, bs = 4, 4
        cache = PagedKVCache(num_blocks=4, block_size=bs, num_kv_heads=hk,
                             head_dim=d, dtype=jnp.float32)
        cache.allocate(7)
        ks, vs = [], []
        for _ in range(3):                # appends crossing block boundary
            k = rng.standard_normal((3, hk, d)).astype(np.float32)
            v = rng.standard_normal((3, hk, d)).astype(np.float32)
            cache.append(7, 0, jnp.asarray(k), jnp.asarray(v))
            ks.append(k)
            vs.append(v)
        q = rng.standard_normal((hq, d)).astype(np.float32)
        out = np.asarray(cache.attention(7, 0, jnp.asarray(q)))
        ref = self._ref_attn(q, np.concatenate(ks), np.concatenate(vs))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestLlama4:
    def test_forward_and_greedy(self):
        from pygpukit_tpu.llm.models.llama4 import Llama4Config, Llama4Model
        cfg = Llama4Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, max_position_embeddings=64,
            no_rope_layers=[1, 1, 1, 0])       # last layer NoPE
        model = Llama4Model.init_random(cfg, seed=0)
        logits = model.forward([1, 5, 9])
        assert logits.shape == (3, 64)
        out = model.generate([1, 5, 9], max_new_tokens=4)
        assert len(out) == 4

    def test_nope_layer_changes_output(self):
        from pygpukit_tpu.llm.models.llama4 import Llama4Config, Llama4Model
        base = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, head_dim=8,
                    max_position_embeddings=64)
        m_rope = Llama4Model.init_random(Llama4Config(
            **base, no_rope_layers=[1, 1]), seed=0)
        m_nope = Llama4Model.init_random(Llama4Config(
            **base, no_rope_layers=[0, 0]), seed=0)
        a = np.asarray(m_rope.forward([1, 5, 9]))
        b = np.asarray(m_nope.forward([1, 5, 9]))
        assert not np.allclose(a, b)

    def test_irope_ops(self):
        from pygpukit_tpu.ops.nn.llama4 import irope_scale_fn, sdpa_irope_fn
        scale = np.asarray(irope_scale_fn(jnp.arange(10), 0.1, 4.0))
        # positions 0..2 -> floor((p+1)/4)=0 -> scale 1.0; pos 3 -> 1 bucket
        np.testing.assert_allclose(scale[:3], 1.0)
        assert scale[3] > 1.0
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((4, 2, 8)), jnp.float32)
        out = sdpa_irope_fn(q, q, q, jnp.arange(4))
        assert out.shape == (4, 2, 8)
