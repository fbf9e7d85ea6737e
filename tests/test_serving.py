"""Continuous-batching engine tests: dynamic join/leave, output equivalence
with single-sequence generation, slot reuse, TP-sharded serving."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pygpukit_tpu.llm import CausalTransformerModel, TransformerConfig, init_params
from pygpukit_tpu.llm.serving import ContinuousBatchingEngine


@pytest.fixture(scope="module")
def model():
    cfg = TransformerConfig(
        vocab_size=97, hidden_size=48, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=96, head_dim_override=12,
        max_position_embeddings=256, tie_word_embeddings=True)
    return CausalTransformerModel(cfg, init_params(cfg, 5, jnp.float32),
                                  dtype=jnp.float32)


def _single_ref(model, prompt, n):
    model.init_fixed_cache(128)
    return model.generate(prompt, max_new_tokens=n, temperature=0.0)


class TestContinuousBatching:
    def test_matches_single_sequence(self, model):
        ref_a = _single_ref(model, [5, 11, 42], 8)
        ref_b = _single_ref(model, [7, 3], 8)
        eng = ContinuousBatchingEngine(model, max_batch=4, max_seq_len=128)
        ra = eng.submit([5, 11, 42], max_new_tokens=8)
        rb = eng.submit([7, 3], max_new_tokens=8)
        eng.run_until_complete()
        assert ra.done and rb.done
        assert ra.generated == ref_a, (ra.generated, ref_a)
        assert rb.generated == ref_b

    def test_dynamic_join(self, model):
        ref_c = _single_ref(model, [9, 9, 1], 6)
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128)
        r1 = eng.submit([5, 11, 42], max_new_tokens=6)
        eng.step()
        eng.step()
        # join mid-flight
        r2 = eng.submit([9, 9, 1], max_new_tokens=6)
        eng.run_until_complete()
        assert r1.done and r2.done
        assert r2.generated == ref_c

    def test_slot_reuse_overflow(self, model):
        # more requests than slots: queue drains as slots free
        refs = {i: _single_ref(model, [i + 1, 2], 4) for i in range(5)}
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128)
        reqs = [eng.submit([i + 1, 2], max_new_tokens=4) for i in range(5)]
        eng.run_until_complete()
        assert all(r.done for r in reqs)
        for i, r in enumerate(reqs):
            assert r.generated == refs[i], f"req {i}"
        assert eng.stats.requests_completed == 5
        assert eng.stats.prefills == 5

    def test_ttft_recorded(self, model):
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128)
        r = eng.submit([1, 2, 3], max_new_tokens=3)
        eng.run_until_complete()
        assert r.ttft_s is not None and r.ttft_s >= 0


class TestChunkedServing:
    def test_steps_per_dispatch_matches(self, model):
        refs = {p: _single_ref(model, list(p), 9)
                for p in ((5, 11, 42), (7, 3))}
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                       steps_per_dispatch=4)
        r1 = eng.submit([5, 11, 42], max_new_tokens=9)
        r2 = eng.submit([7, 3], max_new_tokens=9)
        eng.run_until_complete()
        assert r1.generated == refs[(5, 11, 42)]
        assert r2.generated == refs[(7, 3)]
        # 1 prefill-token + 8 more in ceil(8/4)=2 dispatches
        assert eng.stats.steps <= 3


class TestSampledServing:
    def test_seeded_sampling_deterministic(self, model):
        a = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                     steps_per_dispatch=4, temperature=0.8,
                                     top_k=10, seed=42)
        r1 = a.submit([5, 11], max_new_tokens=8)
        a.run_until_complete()
        b = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                     steps_per_dispatch=4, temperature=0.8,
                                     top_k=10, seed=42)
        r2 = b.submit([5, 11], max_new_tokens=8)
        b.run_until_complete()
        assert r1.generated == r2.generated
        # different seed -> (almost surely) different tokens
        c = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                     steps_per_dispatch=4, temperature=0.8,
                                     top_k=10, seed=7)
        r3 = c.submit([5, 11], max_new_tokens=8)
        c.run_until_complete()
        assert len(r3.generated) == 8


class TestPipelinedServing:
    """pipelined=True keeps last_tokens/poss on device and reads chunk N's
    tokens only after dispatching chunk N+1 — token streams must be
    identical to the non-pipelined engine."""

    def test_matches_single_sequence(self, model):
        refs = {p: _single_ref(model, list(p), 9)
                for p in ((5, 11, 42), (7, 3))}
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                       steps_per_dispatch=4, pipelined=True)
        r1 = eng.submit([5, 11, 42], max_new_tokens=9)
        r2 = eng.submit([7, 3], max_new_tokens=9)
        eng.run_until_complete()
        assert r1.done and r2.done
        assert r1.generated == refs[(5, 11, 42)], r1.generated
        assert r2.generated == refs[(7, 3)]
        assert not eng.has_work

    def test_slot_reuse_overflow(self, model):
        refs = {i: _single_ref(model, [i + 1, 2], 5) for i in range(6)}
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                       steps_per_dispatch=3, pipelined=True)
        reqs = [eng.submit([i + 1, 2], max_new_tokens=5) for i in range(6)]
        eng.run_until_complete()
        assert all(r.done for r in reqs)
        for i, r in enumerate(reqs):
            assert r.generated == refs[i], f"req {i}: {r.generated}"
        assert eng.stats.requests_completed == 6
        assert eng.stats.prefills == 6

    def test_dynamic_join_and_eos(self, model):
        full = _single_ref(model, [9, 9, 1], 8)
        eos = full[2]  # a token we know appears
        expected = full[:full.index(eos) + 1]   # stop at FIRST occurrence
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                       steps_per_dispatch=4, pipelined=True)
        r1 = eng.submit([5, 11, 42], max_new_tokens=6)
        eng.step()
        r2 = eng.submit([9, 9, 1], max_new_tokens=8, eos_token_id=eos)
        eng.run_until_complete()
        assert r1.done and r2.done
        assert r2.generated == expected, (r2.generated, full)
        assert r1.generated == _single_ref(model, [5, 11, 42], 6)

    def test_seeded_sampling_deterministic(self, model):
        outs = []
        for _ in range(2):
            e = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                         steps_per_dispatch=4, pipelined=True,
                                         temperature=0.8, top_k=10, seed=42)
            r = e.submit([5, 11], max_new_tokens=8)
            e.run_until_complete()
            outs.append(r.generated)
        assert outs[0] == outs[1] and len(outs[0]) == 8

    def test_tail_skip_drops_dead_chunk(self, model, monkeypatch):
        """When every active request is length-bound to finish inside the
        inflight chunk, the engine must NOT dispatch another (fully dead)
        chunk: same token streams, strictly fewer dispatches. The per-fusion
        serving trace measured the dead tail at 128/384 iterations (27% of
        device time) on the aligned bench workload."""
        def serve(skip):
            monkeypatch.setenv("PYGPUKIT_SERVE_TAILSKIP", "1" if skip else "0")
            eng = ContinuousBatchingEngine(model, max_batch=2,
                                           max_seq_len=128,
                                           steps_per_dispatch=6,
                                           pipelined=True)
            reqs = [eng.submit([i + 1, 2], max_new_tokens=6)
                    for i in range(4)]
            eng.run_until_complete()
            assert all(r.done for r in reqs)
            return [r.generated for r in reqs], eng.stats.steps
        s_off, n_off = serve(False)
        s_on, n_on = serve(True)
        assert s_on == s_off
        assert n_on < n_off, (n_on, n_off)

    def test_early_admit_reduces_chunks(self, model):
        """Length-bound requests get their replacement prefilled before the
        slot frees — fewer engine chunks than the lag-one baseline, same
        token streams."""
        def serve(**kw):
            eng = ContinuousBatchingEngine(model, max_batch=2,
                                           max_seq_len=128,
                                           steps_per_dispatch=4, **kw)
            reqs = [eng.submit([i + 1, 2], max_new_tokens=8)
                    for i in range(6)]
            eng.run_until_complete()
            return eng, reqs
        pl, pl_reqs = serve(pipelined=True)
        base, base_reqs = serve()
        for a, b in zip(pl_reqs, base_reqs):
            assert a.generated == b.generated
        # 6 requests x (1 prefill + 7 chunk tokens) over 2 slots = 2 chunks
        # per request, 2 slots -> 6 useful chunks; without lookahead each
        # 2-request wave wastes a chunk on the freed-slot lag
        assert pl.stats.steps <= base.stats.steps + 1, (
            pl.stats.steps, base.stats.steps)

    def test_quantized_model_serves(self, model):
        """Quantized {'q','scale'} weights compose with the pipelined engine
        (prefill-into-slot + chunk executables trace through model._mm)."""
        from pygpukit_tpu.llm.quant import quantize_model_params
        from pygpukit_tpu.llm import CausalTransformerModel
        qp = quantize_model_params(dict(model.params), "int8")
        qmodel = CausalTransformerModel(model.config, qp, dtype=model.dtype)
        qmodel.params["rope_cos"] = model.params.get("rope_cos")
        qmodel.params["rope_sin"] = model.params.get("rope_sin")
        eng = ContinuousBatchingEngine(qmodel, max_batch=2, max_seq_len=128,
                                       steps_per_dispatch=4, pipelined=True)
        reqs = [eng.submit([i + 1, 2], max_new_tokens=6) for i in range(3)]
        eng.run_until_complete()
        assert all(r.done and len(r.generated) == 6 for r in reqs)
        # deterministic across engines
        eng2 = ContinuousBatchingEngine(qmodel, max_batch=2, max_seq_len=128,
                                        steps_per_dispatch=4, pipelined=True)
        reqs2 = [eng2.submit([i + 1, 2], max_new_tokens=6) for i in range(3)]
        eng2.run_until_complete()
        for a, b in zip(reqs, reqs2):
            assert a.generated == b.generated

    def test_max_new_tokens_one(self, model):
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                       steps_per_dispatch=4, pipelined=True)
        r = eng.submit([3, 4], max_new_tokens=1)
        eng.run_until_complete()
        assert r.done and len(r.generated) == 1
        assert r.generated == _single_ref(model, [3, 4], 1)


class TestBatchRowsServing:
    """PYGPUKIT_SERVING_STEP=batch routes the chunk through
    batch_decode_step_fn: slot hidden rows are BATCHED through the weight
    matmuls (one [B, E] operand per weight stream) with only the per-slot
    attention tail vmapped. Token streams must match the vmapped chunk and
    the single-sequence reference exactly."""

    def test_greedy_matches_single_sequence(self, model, monkeypatch):
        monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "batch")
        refs = {p: _single_ref(model, list(p), 9)
                for p in ((5, 11, 42), (7, 3), (2, 4, 6, 8))}
        eng = ContinuousBatchingEngine(model, max_batch=3, max_seq_len=128,
                                       steps_per_dispatch=4, pipelined=True)
        assert eng._batch_rows
        reqs = [eng.submit(list(p), max_new_tokens=9) for p in refs]
        eng.run_until_complete()
        for r, p in zip(reqs, refs):
            assert r.generated == refs[p], (p, r.generated, refs[p])

    def test_greedy_nonpipelined_single_step(self, model, monkeypatch):
        monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "batch")
        refs = {p: _single_ref(model, list(p), 6)
                for p in ((5, 11, 42), (7, 3))}
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128)
        reqs = [eng.submit(list(p), max_new_tokens=6) for p in refs]
        eng.run_until_complete()
        for r, p in zip(reqs, refs):
            assert r.generated == refs[p]

    def test_greedy_nonpipelined_chunked(self, model, monkeypatch):
        monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "batch")
        refs = {p: _single_ref(model, list(p), 9)
                for p in ((5, 11, 42), (7, 3))}
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                       steps_per_dispatch=4)
        reqs = [eng.submit(list(p), max_new_tokens=9) for p in refs]
        eng.run_until_complete()
        for r, p in zip(reqs, refs):
            assert r.generated == refs[p]

    def test_sampled_matches_vmapped_chunk(self, model, monkeypatch):
        """Same seed => identical sampled streams across step formulations
        (the per-slot PRNG split sequences are constructed identically)."""
        monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "vmap")
        a = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                     steps_per_dispatch=4, temperature=0.8,
                                     top_k=10, seed=42, pipelined=True)
        ra = [a.submit([5, 11], max_new_tokens=8),
              a.submit([9, 1, 3], max_new_tokens=8)]
        a.run_until_complete()
        monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "batch")
        b = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                     steps_per_dispatch=4, temperature=0.8,
                                     top_k=10, seed=42, pipelined=True)
        rb = [b.submit([5, 11], max_new_tokens=8),
              b.submit([9, 1, 3], max_new_tokens=8)]
        b.run_until_complete()
        for x, y in zip(ra, rb):
            assert x.generated == y.generated

    def test_slot_reuse_overflow(self, model, monkeypatch):
        monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "batch")
        refs = {i: _single_ref(model, [i + 1, 2], 5) for i in range(6)}
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                       steps_per_dispatch=3, pipelined=True)
        reqs = [eng.submit([i + 1, 2], max_new_tokens=5) for i in range(6)]
        eng.run_until_complete()
        for i, r in enumerate(reqs):
            assert r.generated == refs[i], f"req {i}"

    def test_chunked_decode_attention_matches(self, model, monkeypatch):
        """PYGPUKIT_FLASH_DECODING=chunked (the ctx-bounded kv-chunk LSE
        path, vmapped per-slot inside the batch-rows step — vmap of the
        bounded lax.while_loop) must reproduce the full-softmax streams
        exactly on greedy decode."""
        monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "batch")
        refs = {p: _single_ref(model, list(p), 7)
                for p in ((5, 11, 42), (7, 3))}
        monkeypatch.setenv("PYGPUKIT_FLASH_DECODING", "chunked")
        monkeypatch.setenv("PYGPUKIT_FLASH_DECODING_CHUNK", "64")
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                       steps_per_dispatch=4, pipelined=True)
        reqs = [eng.submit(list(p), max_new_tokens=7) for p in refs]
        eng.run_until_complete()
        for r, p in zip(reqs, refs):
            assert r.generated == refs[p], (p, r.generated, refs[p])

    def test_pallas_batch_attention_matches(self, model, monkeypatch):
        """PYGPUKIT_BATCH_ATTN=pallas routes the batch-rows step's decode
        attention through the Pallas dense-pool kernel (interpret mode on
        CPU) — greedy streams must match the single-sequence reference."""
        monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "batch")
        monkeypatch.setenv("PYGPUKIT_BATCH_ATTN", "pallas")
        refs = {p: _single_ref(model, list(p), 6)
                for p in ((5, 11, 42), (7, 3))}
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=1024,
                                       steps_per_dispatch=3, pipelined=True)
        reqs = [eng.submit(list(p), max_new_tokens=6) for p in refs]
        eng.run_until_complete()
        for r, p in zip(reqs, refs):
            assert r.generated == refs[p], (p, r.generated, refs[p])

    def test_merged_pools_large_max(self, model, monkeypatch):
        """Batch-rows engines at MAX >= 1024 allocate MERGED KV pools
        [B, L, MAX, Hk*D]: the Pallas batched-attention kernel's operand is
        the merged view, so no pool-sized relayout ever materialises
        (merging 5-d pool carries per layer device-traced at 122 ms/step
        at batch-8 MAX=4096 — a 20x regression the merged layout removes).
        Streams must match the vmapped (5-d pool) engine exactly, for both
        bf16 and fp8 KV storage."""
        from pygpukit_tpu.llm.model import CausalTransformerModel
        cfg, params = model.config, model.params
        for kv in (None, "fp8"):
            m = CausalTransformerModel(cfg, params, kv_dtype=kv)
            monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "vmap")
            a = ContinuousBatchingEngine(m, max_batch=2, max_seq_len=1024,
                                         steps_per_dispatch=3,
                                         pipelined=True)
            assert not a._merged_pools and a.k_cache.ndim == 5
            ra = [a.submit([5, 11, 42], max_new_tokens=6),
                  a.submit([7, 3], max_new_tokens=6)]
            a.run_until_complete()
            monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "batch")
            b = ContinuousBatchingEngine(m, max_batch=2, max_seq_len=1024,
                                         steps_per_dispatch=3,
                                         pipelined=True)
            assert b._merged_pools and b.k_cache.ndim == 4
            assert b.k_cache.shape[-1] == (cfg.num_kv_heads * cfg.head_dim)
            rb = [b.submit([5, 11, 42], max_new_tokens=6),
                  b.submit([7, 3], max_new_tokens=6)]
            b.run_until_complete()
            for x, y in zip(ra, rb):
                assert x.generated == y.generated, (kv, x.generated,
                                                    y.generated)

    def test_merged_pools_nonpipelined(self, model, monkeypatch):
        """Merged pools through the non-pipelined batch-rows captures
        (single-step and chunked) — greedy matches the single-sequence
        reference."""
        monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "batch")
        refs = {p: _single_ref(model, list(p), 6)
                for p in ((5, 11, 42), (7, 3))}
        for steps in (1, 3):
            eng = ContinuousBatchingEngine(model, max_batch=2,
                                           max_seq_len=1024,
                                           steps_per_dispatch=steps)
            assert eng._merged_pools
            reqs = [eng.submit(list(p), max_new_tokens=6) for p in refs]
            eng.run_until_complete()
            for r, p in zip(reqs, refs):
                assert r.generated == refs[p], (steps, p, r.generated)

    def test_auto_chunked_pref_large_pool(self, model, monkeypatch):
        """Engines with MAX >= 1024 auto-scope decode_pref("chunked", 512)
        over their dense captures (measured +22% batch-8 at MAX=4096) —
        greedy streams must still match the single-sequence reference."""
        monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "batch")
        refs = {p: _single_ref(model, list(p), 6)
                for p in ((5, 11, 42), (7, 3))}
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=1024,
                                       steps_per_dispatch=3, pipelined=True)
        assert eng._attn_pref == ("chunked", 512)
        reqs = [eng.submit(list(p), max_new_tokens=6) for p in refs]
        eng.run_until_complete()
        for r, p in zip(reqs, refs):
            assert r.generated == refs[p], (p, r.generated, refs[p])


class TestStreamingCallback:
    @pytest.mark.parametrize("pipelined", [False, True])
    def test_on_token_streams_in_order(self, model, pipelined):
        seen = []
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                       steps_per_dispatch=4,
                                       pipelined=pipelined)
        r = eng.submit([5, 11, 42], max_new_tokens=7,
                       on_token=lambda req, t: seen.append(t))
        eng.run_until_complete()
        assert r.done
        assert seen == r.generated and len(seen) == 7

    def test_raising_callback_does_not_kill_engine(self, model):
        def boom(req, tok):
            raise RuntimeError("client went away")
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=128,
                                       steps_per_dispatch=4, pipelined=True)
        r1 = eng.submit([5, 11, 42], max_new_tokens=6, on_token=boom)
        r2 = eng.submit([7, 3], max_new_tokens=6)
        eng.run_until_complete()
        assert r1.done and r2.done
        assert len(r1.generated) == 6 and len(r2.generated) == 6
        assert r1.on_token is None     # disabled after the first raise


class TestPromptValidation:
    def test_oversized_prompt_rejected_at_submit(self, model):
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=32)
        with pytest.raises(ValueError):
            eng.submit(list(range(40)), max_new_tokens=4)
        # engine still serves other requests
        r = eng.submit([1, 2], max_new_tokens=3)
        eng.run_until_complete()
        assert r.done


class TestPagedServing:
    """Paged-KV serving (serving_paged.py): block pool + tables wired into
    the engine — greedy parity with the dense engine, block lifecycle,
    trash-block protection, HBM footprint."""

    def _engine(self, model, **kw):
        return ContinuousBatchingEngine(
            model, max_batch=3, max_seq_len=64, steps_per_dispatch=4,
            paged=True, block_size=8, **kw)

    def test_matches_dense_engine(self, model):
        dense = ContinuousBatchingEngine(model, max_batch=3, max_seq_len=64,
                                         steps_per_dispatch=4)
        paged = self._engine(model)
        prompts = [[5, 11, 42], [7, 3], [1, 2, 3, 4, 5]]
        reqs_d = [dense.submit(p, max_new_tokens=10) for p in prompts]
        reqs_p = [paged.submit(p, max_new_tokens=10) for p in prompts]
        dense.run_until_complete()
        paged.run_until_complete()
        for rd, rp in zip(reqs_d, reqs_p):
            assert rp.generated == rd.generated

    def test_dynamic_join_and_block_recycling(self, model):
        eng = self._engine(model, num_blocks=20)
        r1 = eng.submit([5, 6, 7], max_new_tokens=6)
        eng.step()
        r2 = eng.submit([9, 10], max_new_tokens=6)
        eng.run_until_complete()
        assert r1.done and r2.done
        assert len(r1.generated) == 6 and len(r2.generated) == 6
        # all blocks returned to the free list
        assert eng._alloc.free_blocks == 19          # 20 minus trash block
        assert (eng._tables_np == 0).all()           # rows point at trash

    def test_parity_with_dense_after_slot_reuse(self, model):
        """More requests than slots: finished slots recycle blocks; outputs
        still match the dense engine."""
        dense = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=64,
                                         steps_per_dispatch=4)
        paged = ContinuousBatchingEngine(
            model, max_batch=2, max_seq_len=64, steps_per_dispatch=4,
            paged=True, block_size=8)
        prompts = [[5, 11], [7, 3, 9], [13, 1], [2, 4, 6, 8]]
        rd = [dense.submit(p, max_new_tokens=6) for p in prompts]
        rp = [paged.submit(p, max_new_tokens=6) for p in prompts]
        dense.run_until_complete()
        paged.run_until_complete()
        for a, b in zip(rd, rp):
            assert b.generated == a.generated

    def test_int4_batch_rows_matches_vmap_routing(self):
        """Paged batch-rows (VERDICT r4 #1): the unmarked-trace capture (_mm
        sees stacked packed-int4 leaves with _idx from the paged step) must
        produce the same streams as the batched_trace-marked capture (XLA
        dequant routing) and as the dense engine — CPU routes both through
        XLA, so streams are exact; on TPU the stacked Pallas GEMV takes over
        with the same [B, E]-rows formulation."""
        import os
        cfg = TransformerConfig(
            vocab_size=97, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128,
            max_position_embeddings=256, tie_word_embeddings=True)
        from pygpukit_tpu.llm.quant import quantize_model_params
        params = quantize_model_params(init_params(cfg, 7, jnp.float32),
                                       "int4")
        m = CausalTransformerModel(cfg, params, dtype=jnp.float32)
        prompts = [[5, 11, 42], [7, 3], [1, 2, 3, 4]]
        streams = {}
        for mode in ("batch", "vmap"):
            os.environ["PYGPUKIT_SERVING_STEP"] = mode
            try:
                eng = ContinuousBatchingEngine(
                    m, max_batch=3, max_seq_len=64, steps_per_dispatch=4,
                    paged=True, block_size=8, pipelined=True)
                assert eng._batch_rows == (mode == "batch")
                reqs = [eng.submit(p, max_new_tokens=8) for p in prompts]
                eng.run_until_complete()
                streams[mode] = [r.generated for r in reqs]
            finally:
                os.environ.pop("PYGPUKIT_SERVING_STEP", None)
        assert streams["batch"] == streams["vmap"]
        dense = ContinuousBatchingEngine(m, max_batch=3, max_seq_len=64,
                                         steps_per_dispatch=4)
        rd = [dense.submit(p, max_new_tokens=8) for p in prompts]
        dense.run_until_complete()
        assert streams["batch"] == [r.generated for r in rd]

    def test_hbm_footprint_smaller(self, model):
        """The paged win: size num_blocks to EXPECTED usage (the default now
        covers the worst case since admission reserves fully up front)."""
        dense = ContinuousBatchingEngine(model, max_batch=3, max_seq_len=64)
        paged = self._engine(model, num_blocks=10)
        assert paged.k_cache.size < dense.k_cache.size / 1.5
        # ... and the sized-down pool still serves correctly
        r = paged.submit([5, 6, 7], max_new_tokens=6)
        paged.run_until_complete()
        assert r.done and len(r.generated) == 6

    def test_impossible_request_rejected_at_submit(self, model):
        eng = self._engine(model, num_blocks=3)   # 2 usable blocks = 16 toks
        with pytest.raises(MemoryError):
            eng.submit(list(range(1, 14)), max_new_tokens=20)
        # the engine stays serviceable for requests that fit
        r = eng.submit([1, 2], max_new_tokens=5)
        eng.run_until_complete()
        assert r.done

    def test_generation_to_context_limit_no_crash(self, model):
        """Regression: block reservation near max_seq_len must clamp to the
        table capacity instead of requesting more blocks than table rows
        (review finding: ValueError broadcast (65,) into (64,))."""
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=32,
                                       steps_per_dispatch=8, paged=True,
                                       block_size=8)
        r = eng.submit([1, 2, 3], max_new_tokens=64)   # runs into the limit
        eng.run_until_complete()
        assert r.done
        assert len(r.generated) <= 64

    def test_pipelined_paged_matches_paged(self, model):
        """VERDICT r2 #2: paged KV unified with the pipelined engine —
        identical greedy streams, same block-pool accounting."""
        plain = self._engine(model)
        piped = self._engine(model, pipelined=True)
        prompts = [[5, 11, 42], [7, 3], [1, 2, 3, 4, 5]]
        ra = [plain.submit(p, max_new_tokens=10) for p in prompts]
        rb = [piped.submit(p, max_new_tokens=10) for p in prompts]
        plain.run_until_complete()
        piped.run_until_complete()
        for a, b in zip(ra, rb):
            assert b.generated == a.generated
        assert piped._alloc.free_blocks == piped._alloc.num_blocks - 1

    def test_pipelined_paged_slot_reuse(self, model):
        """Block recycling under the one-chunk resolution lag: more requests
        than slots, outputs match the dense pipelined engine."""
        dense = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=64,
                                         steps_per_dispatch=4, pipelined=True)
        paged = ContinuousBatchingEngine(
            model, max_batch=2, max_seq_len=64, steps_per_dispatch=4,
            paged=True, pipelined=True, block_size=8)
        prompts = [[5, 11], [7, 3, 9], [13, 1], [2, 4, 6, 8]]
        rd = [dense.submit(p, max_new_tokens=6) for p in prompts]
        rp = [paged.submit(p, max_new_tokens=6) for p in prompts]
        dense.run_until_complete()
        paged.run_until_complete()
        for a, b in zip(rd, rp):
            assert b.generated == a.generated
        assert paged._alloc.free_blocks == paged._alloc.num_blocks - 1

    def test_pipelined_paged_wave_admission(self, model):
        """Same-bucket simultaneous admissions go through the paged wave
        prefill (one dispatch) and still match the reference stream."""
        refs = {}
        for i in range(3):
            refs[i] = _single_ref(model, [i + 1, 2, 3], 6)
        eng = ContinuousBatchingEngine(
            model, max_batch=3, max_seq_len=64, steps_per_dispatch=4,
            paged=True, pipelined=True, block_size=8)
        reqs = [eng.submit([i + 1, 2, 3], max_new_tokens=6) for i in range(3)]
        eng.run_until_complete()
        for i, r in enumerate(reqs):
            assert r.done and r.generated == refs[i], f"req {i}"
        assert any(k[0] == "paged-plw" for k in eng._prefill_exes)

    def test_pool_busy_defers_admission(self, model):
        """A request that fits the pool but not RIGHT NOW queues instead of
        crashing; it runs once blocks free."""
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=64,
                                       steps_per_dispatch=4, paged=True,
                                       block_size=8, num_blocks=9)
        # each request reserves ceil((2+10+1)/8)=2 blocks; 8 usable blocks
        reqs = [eng.submit([5, 6], max_new_tokens=10) for _ in range(6)]
        eng.run_until_complete()
        assert all(r.done and len(r.generated) == 10 for r in reqs)


class TestShardedServing:
    """TP-sharded serving on the virtual mesh (VERDICT r2 #9): shard_model
    composed with ContinuousBatchingEngine — the BASELINE.md v5e-8 north
    star's missing wiring. Token streams must match the unsharded engine."""

    def _sharded_pair(self, paged=False, pipelined=False):
        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 virtual devices")
        from pygpukit_tpu.parallel import make_mesh, shard_model
        cfg = TransformerConfig(
            vocab_size=97, hidden_size=48, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=96, head_dim_override=12,
            max_position_embeddings=256, tie_word_embeddings=True)
        params = init_params(cfg, 5, jnp.float32)
        plain = CausalTransformerModel(cfg, jax.tree.map(lambda x: x, params),
                                       dtype=jnp.float32)
        sharded = CausalTransformerModel(cfg, params, dtype=jnp.float32)
        mesh = make_mesh(2, tp=2)      # tp=2 divides num_kv_heads=2
        shard_model(sharded, mesh)
        kw = dict(max_batch=3, max_seq_len=64, steps_per_dispatch=4,
                  paged=paged, pipelined=pipelined,
                  **({"block_size": 8} if paged else {}))
        return (ContinuousBatchingEngine(plain, **kw),
                ContinuousBatchingEngine(sharded, mesh=mesh, **kw))

    def _run_pair(self, eng_a, eng_b):
        prompts = [[5, 11, 42], [7, 3], [1, 2, 3, 4, 5], [9, 9]]
        ra = [eng_a.submit(p, max_new_tokens=8) for p in prompts]
        rb = [eng_b.submit(p, max_new_tokens=8) for p in prompts]
        eng_a.run_until_complete()
        eng_b.run_until_complete()
        for a, b in zip(ra, rb):
            assert b.done and b.generated == a.generated

    def test_tp_matches_unsharded(self):
        self._run_pair(*self._sharded_pair())

    def test_tp_pipelined_matches(self):
        self._run_pair(*self._sharded_pair(pipelined=True))

    def test_tp_paged_matches(self):
        self._run_pair(*self._sharded_pair(paged=True))

    def test_tp_paged_pipelined_matches(self):
        self._run_pair(*self._sharded_pair(paged=True, pipelined=True))

    def test_moe_ep_matches_unsharded(self):
        """EXPERT-parallel serving (VERDICT r3 #7): a MoE model with its
        expert stacks sharded along the expert axis (shard_model ep=True)
        served by the engine — token streams match the unsharded engine."""
        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 virtual devices")
        from pygpukit_tpu.parallel import make_mesh, shard_model
        cfg = TransformerConfig(
            vocab_size=97, hidden_size=48, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=96, head_dim_override=12,
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
            max_position_embeddings=256, tie_word_embeddings=True)
        params = init_params(cfg, 11, jnp.float32)
        plain = CausalTransformerModel(cfg, jax.tree.map(lambda x: x, params),
                                       dtype=jnp.float32)
        sharded = CausalTransformerModel(cfg, params, dtype=jnp.float32)
        mesh = make_mesh(2, tp=2)          # 4 experts over tp=2
        shard_model(sharded, mesh, ep=True)
        # expert leaves really carry the EP layout
        from jax.sharding import PartitionSpec as P
        spec = sharded.params["layers"]["w_experts_gate"].sharding.spec
        assert tuple(spec) == (None, "tp", None, None), spec
        kw = dict(max_batch=3, max_seq_len=64, steps_per_dispatch=4,
                  pipelined=True)
        self._run_pair(ContinuousBatchingEngine(plain, **kw),
                       ContinuousBatchingEngine(sharded, mesh=mesh, **kw))

    def test_kv_heads_must_divide(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from pygpukit_tpu.parallel import make_mesh
        cfg = TransformerConfig(
            vocab_size=97, hidden_size=48, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=96, head_dim_override=12)
        m = CausalTransformerModel(cfg, init_params(cfg, 5, jnp.float32),
                                   dtype=jnp.float32)
        mesh = make_mesh(8, tp=8)
        with pytest.raises(ValueError, match="num_kv_heads"):
            ContinuousBatchingEngine(m, max_batch=2, max_seq_len=64,
                                     mesh=mesh)


class TestPagedGemmaFeatures:
    """Paged serving must apply the same architecture semantics as the
    dense path (regression: paged decode skipped embed_scale, attention
    softcap, and per-layer sliding windows — gemma-2-style models served
    silently wrong tokens in paged mode)."""

    def _model(self):
        cfg = TransformerConfig(
            vocab_size=97, hidden_size=48, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=96, head_dim_override=12,
            max_position_embeddings=128, tie_word_embeddings=True,
            use_post_norms=True, embed_scale=48 ** 0.5,
            query_scale=12 ** -0.5, attn_logit_softcap=50.0,
            final_logit_softcap=30.0, sliding_window=8,
            layer_types=("sliding_attention", "full_attention"))
        return CausalTransformerModel(cfg, init_params(cfg, 9, jnp.float32),
                                      dtype=jnp.float32)

    def test_paged_matches_dense_gemma_config(self):
        model = self._model()
        dense = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=64,
                                         steps_per_dispatch=4)
        paged = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=64,
                                         steps_per_dispatch=4, paged=True,
                                         block_size=8)
        # > window-length prompt so the sliding mask matters
        prompts = [list(range(1, 14)), [7, 3, 9]]
        rd = [dense.submit(p, max_new_tokens=10) for p in prompts]
        rp = [paged.submit(p, max_new_tokens=10) for p in prompts]
        dense.run_until_complete()
        paged.run_until_complete()
        for d, p in zip(rd, rp):
            assert p.generated == d.generated, (p.generated, d.generated)

    def test_paged_matches_single_model(self):
        model = self._model()
        model.init_fixed_cache(64)
        ref = model.generate(list(range(1, 14)), max_new_tokens=10,
                             temperature=0.0)
        paged = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=64,
                                         steps_per_dispatch=4, paged=True,
                                         block_size=8)
        r = paged.submit(list(range(1, 14)), max_new_tokens=10)
        paged.run_until_complete()
        assert r.generated == ref, (r.generated, ref)


class TestWarmupAndWaveSplit:
    """Admission waves are split into power-of-two sub-waves so the
    executable key space is bounded, and warmup() precompiles every
    executable the engine can hit — no XLA compile lands mid-workload
    (on TPU each fresh wave size cost 1.7-4.6 s while requests waited;
    scripts/micro_mixed_chunkwall.py)."""

    def _model(self, batch=8):
        cfg = TransformerConfig(
            vocab_size=97, hidden_size=48, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=96, head_dim_override=12,
            max_position_embeddings=256, tie_word_embeddings=True)
        return CausalTransformerModel(cfg, init_params(cfg, 5, jnp.float32),
                                      dtype=jnp.float32)

    @pytest.mark.parametrize("paged", [False, True])
    def test_no_compiles_after_warmup(self, paged):
        model = self._model()
        kw = dict(paged=True, block_size=8) if paged else {}
        eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=64,
                                       steps_per_dispatch=4, pipelined=True,
                                       **kw)
        eng.warmup(prompt_lens=(3,))
        keys = set(eng._prefill_exes.keys())
        # mixed workload: ragged lengths force waves of every size class
        rng = np.random.default_rng(0)
        reqs = [eng.submit([int(i) + 1, 2, 3],
                           max_new_tokens=int(rng.integers(2, 12)))
                for i in range(20)]
        eng.run_until_complete()
        assert all(r.done for r in reqs)
        assert set(eng._prefill_exes.keys()) == keys, (
            "executables compiled mid-workload:",
            set(eng._prefill_exes.keys()) - keys)

    def test_wave_split_streams_match_single(self):
        model = self._model()
        refs = [_single_ref(model, [i + 1, 2, 3], 6) for i in range(7)]
        eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=64,
                                       steps_per_dispatch=4, pipelined=True)
        # 7 simultaneous admissions -> sub-waves 4 + 2 + single
        reqs = [eng.submit([i + 1, 2, 3], max_new_tokens=6)
                for i in range(7)]
        eng.run_until_complete()
        for i, r in enumerate(reqs):
            assert r.generated == refs[i], (i, r.generated, refs[i])
