"""int8 KV cache: per-row-scaled dict caches ({"q" int8, "s" bf16}).

The FAST capacity rung on v5e (reference surface: kv_cache_quant_algo
"INT8", src/pygpukit/llm/quant.py:76): fp8 storage halves KV bytes but its
fp8->bf16 VPU convert costs 2x the batched attention kernel
(scripts/micro_bda_u8dma.py — the DMA is innocent, the convert is the tax);
int8->bf16 converts run at stream rate (the w4a8 GEMVs stream 725 GB/s
through them) and the per-row amax/127 scale carries ~1% RMS vs e4m3's
~3-5%. Caches become pytrees (ops/embedding.kv_cache_zeros) that flow
through capture/vmap/scan/donation unchanged; every consumer dispatches on
isinstance(cache, dict).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pygpukit_tpu.llm import CausalTransformerModel, TransformerConfig
from pygpukit_tpu.llm.model import (fuse_params, init_params_device,
                                    resolve_kv_dtype)
from pygpukit_tpu.ops.embedding import (kv_cache_zeros, kv_dequant,
                                        kv_compute_dtype, kv_quant_rows,
                                        kv_write)


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))


@pytest.fixture(scope="module")
def model_pair():
    cfg = TransformerConfig(
        vocab_size=256, hidden_size=128, num_layers=3, num_heads=8,
        num_kv_heads=2, intermediate_size=256,
        max_position_embeddings=1024)
    params = fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16))
    bf = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
    i8 = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16,
                                kv_dtype="int8")
    return bf, i8


class TestStorage:
    def test_resolve_and_alloc(self):
        assert resolve_kv_dtype("int8", jnp.bfloat16) == jnp.int8
        c = kv_cache_zeros((3, 64, 2, 16), jnp.int8)
        assert c["q"].shape == (3, 64, 2, 16) and c["q"].dtype == jnp.int8
        assert c["s"].shape == (3, 64) and c["s"].dtype == jnp.bfloat16
        cm = kv_cache_zeros((4, 3, 64, 32), jnp.int8, merged=True)
        assert cm["s"].shape == (4, 3, 64)
        # non-int8 stays a plain array
        assert kv_cache_zeros((3, 64, 2, 16), jnp.bfloat16).ndim == 4
        assert kv_compute_dtype(jnp.int8) == jnp.bfloat16

    def test_quant_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (5, 64, 2, 16),
                              jnp.float32) * 3.0
        q, s = kv_quant_rows(x, 2)
        assert q.dtype == jnp.int8 and s.shape == (5, 64)
        back = kv_dequant(q, s)
        assert _rel(back, x) < 0.01            # per-row int8: ~0.4% RMS
        # quantized against the bf16-ROUNDED scale: |q| reaches 127
        assert int(np.abs(np.asarray(q)).max()) == 127

    def test_kv_write_row(self):
        c = kv_cache_zeros((2, 16, 2, 8), jnp.int8)
        row = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 2, 8),
                                jnp.bfloat16)
        c = kv_write(c, row, (1, 3, 0, 0))
        got = kv_dequant(c["q"][1, 3], c["s"][1, 3])
        assert _rel(got, row[0, 0]) < 0.01
        # untouched rows stay zero (scale rows too)
        assert float(jnp.abs(c["q"][0]).sum()) == 0.0


class TestDecode:
    def test_decode_parity_vs_bf16_cache(self, model_pair):
        bf, i8 = model_pair
        prompt = [5, 11, 42, 7]
        la, lb = bf.prefill(prompt), i8.prefill(prompt)
        # prefill attends the fresh k/v, not the cache: logits identical
        assert _rel(lb, la) == 0.0
        for _ in range(4):
            ta = int(np.argmax(np.asarray(la)))
            la, lb = bf.decode_step(ta), i8.decode_step(ta)
            assert _rel(lb, la) < 0.05         # int8 cache noise only

    def test_decode_chunk_device_loop(self, model_pair):
        _, i8 = model_pair
        i8.prefill([5, 11, 42, 7])
        toks = i8.decode_chunk(9, 6)
        assert len(toks) == 6

    def test_snapshot_restore(self, model_pair):
        _, i8 = model_pair
        i8.prefill([5, 11, 42])
        snap = i8.snapshot_kv_cache()
        l1 = np.asarray(i8.decode_step(9))
        i8.restore_kv_cache(snap)
        l2 = np.asarray(i8.decode_step(9))
        assert np.array_equal(l1, l2)

    def test_speculative_with_int8_cache(self, model_pair):
        _, i8 = model_pair
        from pygpukit_tpu.llm.decode import DecodeSpeculative
        i8.init_fixed_cache(64)
        strat = DecodeSpeculative(n_draft_layers=2, gamma=2).bind(i8)
        toks = strat.generate([5, 11, 42], 6)
        assert len(toks) == 6
        i8.init_fixed_cache(1024)   # restore module-fixture capacity


class TestServing:
    def test_engines_match_across_steps(self, model_pair):
        import os
        _, i8 = model_pair
        from pygpukit_tpu.llm.serving import ContinuousBatchingEngine
        streams = {}
        for step in ("vmap", "batch"):
            os.environ["PYGPUKIT_SERVING_STEP"] = step
            try:
                for steps, pipe in ((1, False), (3, True)):
                    eng = ContinuousBatchingEngine(
                        i8, max_batch=2, max_seq_len=1024,
                        steps_per_dispatch=steps, pipelined=pipe)
                    if step == "batch":
                        assert eng._merged_pools
                        assert eng.k_cache["q"].ndim == 4
                    rs = [eng.submit([5, 11, 42], max_new_tokens=6),
                          eng.submit([7, 3], max_new_tokens=6)]
                    eng.run_until_complete()
                    streams[(step, steps, pipe)] = [r.generated for r in rs]
            finally:
                del os.environ["PYGPUKIT_SERVING_STEP"]
        first = next(iter(streams.values()))
        for k, v in streams.items():
            assert v == first, (k, v, first)

    def test_paged_matches_dense_int8(self, model_pair):
        """int8 dict BLOCK pools ([L,NB,Hk,BS,D] q + [L,NB,BS] scales):
        the paged engine's greedy streams match the dense int8 engine —
        per-row quantization is identical (amax over the row's heads), so
        only the attention formulation differs."""
        _, i8 = model_pair
        from pygpukit_tpu.llm.serving import ContinuousBatchingEngine
        prompts = [[5, 11, 42], [7, 3], [1, 2, 3, 4, 5]]
        for pipe in (False, True):
            dense = ContinuousBatchingEngine(
                i8, max_batch=3, max_seq_len=64, steps_per_dispatch=4,
                pipelined=pipe)
            paged = ContinuousBatchingEngine(
                i8, max_batch=3, max_seq_len=64, steps_per_dispatch=4,
                paged=True, block_size=8, pipelined=pipe)
            assert isinstance(paged.k_cache, dict)
            rd = [dense.submit(p, max_new_tokens=10) for p in prompts]
            rp = [paged.submit(p, max_new_tokens=10) for p in prompts]
            dense.run_until_complete()
            paged.run_until_complete()
            for d, p in zip(rd, rp):
                assert p.generated == d.generated, pipe


class TestPallasKernel:
    def test_interpret_matches_xla_dict_path(self):
        from pygpukit_tpu.kernels.batch_decode_attention import (
            batch_decode_attention)
        from pygpukit_tpu.ops.nn.attention import sdpa_batch_pools_fn
        B, L, MAX, HK, D, HQ, CH = 2, 3, 1024, 2, 64, 8, 512
        q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, HQ, D),
                              jnp.bfloat16)
        kf = jax.random.normal(jax.random.PRNGKey(1), (B, L, MAX, HK, D),
                               jnp.float32) * 0.5
        vf = jax.random.normal(jax.random.PRNGKey(2), (B, L, MAX, HK, D),
                               jnp.float32) * 0.5
        kq, ks = kv_quant_rows(kf, 2)
        vq, vs = kv_quant_rows(vf, 2)
        lens = jnp.array([700, 37], jnp.int32)
        o_pl = batch_decode_attention(
            q, {"q": kq.reshape(B, L, MAX, HK * D), "s": ks},
            {"q": vq.reshape(B, L, MAX, HK * D), "s": vs}, 1, lens,
            chunk=CH)
        o_x, _, _ = sdpa_batch_pools_fn(q, {"q": kq, "s": ks},
                                        {"q": vq, "s": vs}, 1, lens)
        assert _rel(o_pl, o_x) < 2e-2
        # and the int8 rung is tighter than fp8 against full precision
        of, _, _ = sdpa_batch_pools_fn(q, kf.astype(jnp.bfloat16),
                                       vf.astype(jnp.bfloat16), 1, lens)
        assert _rel(o_x, of) < 0.03
