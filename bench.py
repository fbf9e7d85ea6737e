"""Headline benchmark on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} — the bf16
GEMM 8192^2 headline — with an "extra" dict carrying the quantized GEMM
TFLOPS and GEMV bandwidth rows that track BASELINE.md's quant tables
(reference: FP8xFP8 217 TFLOPS @ M8192/K4096/N14336; BF16 GEMV 1763-1810
GB/s, 98-101% of RTX 5090 peak).

Measurement rules (hard-won, CLAUDE.md): identical repeated calls pipeline
over the axon tunnel — every loop is CHAINED on its own output; the timing
barrier is a 1-element D2H read (block_until_ready may return early).
"""

from __future__ import annotations

import json
import time

BASELINE_BF16_TFLOPS = 173.0
BASELINE_FP8_TFLOPS = 217.0
BASELINE_GEMV_GBPS = 1810.0   # reference peak-BW GEMV (4096x14336)
BASELINE_GEMV_FRAC = 0.98     # that GEMV as a fraction of 5090 HBM peak
V5E_HBM_GBPS = 819.0


def _sync(x):
    import numpy as np
    return np.asarray(x.reshape(-1)[0:1])


def bench_hbm_stream(gb: float = 2.0, reps: int = 3) -> float:
    """Raw HBM streaming rate TODAY (repeated jit sum over a bf16 array).

    The axon-tunneled chip's memory path varies day to day while the MXU
    stays at full rate — bandwidth-bound rows below must be read against
    THIS number, not the 819 GB/s spec. Sweeps run INSIDE one jit call
    with an accumulator carried into each pass (defeats hoisting), and the
    rate comes from a TWO-POINT fit (36-pass call minus 4-pass call): the
    difference cancels the ~36 ms tunnel sync + dispatch constant exactly,
    keeping the row honest AND bounded-time on degraded-chip days (a fixed
    large pass count takes minutes at 4x degradation, while a single
    synced pass measures the tunnel — ~50 GB/s even on a healthy chip)."""
    import functools

    import jax
    import jax.numpy as jnp

    n = int(gb * 1e9 / 2)
    w = jax.random.normal(jax.random.PRNGKey(0), (n // 1024, 1024),
                          jnp.bfloat16)
    nbytes = int(w.size) * 2

    @functools.partial(jax.jit, static_argnames="passes")
    def f(w, passes):
        def body(_, acc):
            # acc feeds the add so XLA can't hoist the loop-invariant sum;
            # the add fuses into the reduction (one read of w per pass)
            return jnp.sum(w + acc, dtype=jnp.float32).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, passes, body, jnp.bfloat16(0))

    def timed(passes):
        t0 = time.perf_counter()
        _sync(f(w, passes))
        return time.perf_counter() - t0

    lo, hi = 4, 36
    timed(lo), timed(hi)                        # compile both variants
    t_lo = min(timed(lo) for _ in range(reps))
    t_hi = min(timed(hi) for _ in range(reps))
    return nbytes * (hi - lo) / max(t_hi - t_lo, 1e-9) / 1e9


def bench_gemm_bf16(n: int = 8192, iters: int = 100) -> float:
    import jax
    import jax.numpy as jnp

    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(ka, (n, n), jnp.bfloat16)
    b = jax.random.normal(kb, (n, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16))
    _sync(f(a, b))
    out = a
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(out, b)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * n * n * n / dt / 1e12


def bench_gemm_fp8(m: int = 8192, k: int = 4096, n: int = 14336,
                   iters: int = 50) -> float:
    """fp8xfp8 GEMM at the reference's quant-table shape."""
    import jax
    import jax.numpy as jnp
    from pygpukit_tpu.ops.matmul import matmul_fp8, quantize_fp8
    from pygpukit_tpu.core import from_numpy
    import numpy as np

    rng = np.random.default_rng(0)
    a = from_numpy(rng.standard_normal((m, k), np.float32))
    b = from_numpy(rng.standard_normal((k, n), np.float32))
    aq, asc = quantize_fp8(a)
    bq, bsc = quantize_fp8(b)
    y = matmul_fp8(aq, bq, asc, bsc)
    _sync(y.jax)
    # repeated-call throughput: per-call compute (~ms) dominates dispatch,
    # so tunnel pipelining only hides latency — legitimate for GEMM
    t0 = time.perf_counter()
    for _ in range(iters):
        y = matmul_fp8(aq, bq, asc, bsc)
    _sync(y.jax)
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * m * k * n / dt / 1e12


def bench_gemm_int8(m: int = 8192, k: int = 4096, n: int = 14336,
                    iters: int = 50) -> float:
    """Native int8 MXU GEMM (int32 accumulation) at the reference's
    quant-table shape — v5e's int8 MXU peak (~394 TOPS) is the one regime
    where this chip natively exceeds the reference's quant GEMM table."""
    import jax
    import jax.numpy as jnp

    ka, kb = jax.random.split(jax.random.PRNGKey(2))
    a = jax.random.randint(ka, (m, k), -127, 127, jnp.int8)
    b = jax.random.randint(kb, (k, n), -127, 127, jnp.int8)
    f = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    _sync(f(a, b))
    t0 = time.perf_counter()
    y = None
    for _ in range(iters):
        y = f(a, b)
    _sync(y)
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * m * k * n / dt / 1e12


def bench_gemm_int4(m: int = 8192, k: int = 4096, n: int = 14336,
                    iters: int = 30) -> float:
    """Packed-int4 w4a8 GEMM (in-register nibble unpack + native int8 MXU
    dots, kernels/gemv_quant.gemm_int4_w4a8) at the reference's quant-table
    shape. Reference flagships: int4-via-int8 121 TFLOPS, NVF4 261-446
    (README 'Quantized GEMM'/'NVF4 GEMM'). Measured round 4: 215.5 TOPS vs
    the XLA dequant-dot's 152.8 same-process."""
    import numpy as np

    import jax.numpy as jnp
    from pygpukit_tpu.kernels.gemv_quant import gemm_int4_w4a8

    rng = np.random.default_rng(3)
    w = rng.standard_normal((n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=1, keepdims=True) / 7.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    packed = jnp.asarray(((q[:, :k // 2] & 0xF)
                          | ((q[:, k // 2:] & 0xF) << 4)).astype(np.uint8))
    sc = jnp.asarray(scale[:, 0])
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    y = gemm_int4_w4a8(packed, x, sc)
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = gemm_int4_w4a8(packed, x, sc)
    _sync(y)
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * m * k * n / dt / 1e12


def bench_decode(mode: str, n_tokens: int = 256) -> dict:
    """1B-scale REAL-MODEL decode: tokens/s and weight-streaming GB/s.

    This replaces the synthetic projection sweeps of rounds 1-2 (VERDICT r2
    #10): synthetic formulations mis-measure in both directions on this
    chip (7-dot scan 394 GB/s, 4-dot fused scan 332, while the actual fused
    decode path runs faster than either implies). The honest, reproducible
    number is the model's own decode executable: device-init 1B params,
    optional int8/fp8 quantized leaves, fused, chunked device-side
    generation loop. GB/s = bytes the decode step must stream per token
    (layer weights + embed/lm_head) / measured ms per token."""
    import jax.numpy as jnp
    from pygpukit_tpu.llm.config import TransformerConfig
    from pygpukit_tpu.llm.model import (
        CausalTransformerModel, fuse_params, init_params_device,
    )

    cfg = TransformerConfig(
        vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
        num_kv_heads=4, intermediate_size=5632,
        max_position_embeddings=2048,
        # TinyLlama-1.1B (the class this mirrors) is untied: the lm head is
        # its own [E, V] read per token, and int8/fp8 modes quantize it
        # (round 3 — the head was the single biggest non-layer read in the
        # device trace, 174 us/tok bf16 -> 55 int8).
        tie_word_embeddings=False)
    params = init_params_device(cfg, 0, jnp.bfloat16)
    if mode != "bf16":
        from pygpukit_tpu.llm.quant import quantize_model_params
        params = quantize_model_params(params, mode)
    params = fuse_params(params)
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
    # cache sized to the request (prompt 16 + n_tokens, bucketed) — decode
    # attention masks over the WHOLE fixed buffer every step, so an
    # oversized cache is pure overhead (measured ~0.05 ms/tok going from
    # 1024 -> 512 on the 1B int8 path); the serving engine sizes per-slot
    # caches the same way.
    cache_len = 1 << (16 + n_tokens + 1).bit_length()
    model.init_fixed_cache(cache_len)
    # streamed bytes per decode step: every layer leaf + embed + lm_head
    def leaf_bytes(v):
        if v is None:
            return 0
        if isinstance(v, dict):
            return sum(leaf_bytes(x) for x in v.values())
        return int(v.size * jnp.dtype(v.dtype).itemsize)
    wbytes = (leaf_bytes(model.params["layers"])
              + leaf_bytes(model.params["embed"])
              + leaf_bytes(model.params.get("lm_head")))
    # Single-dispatch measurement: chunk_size == n_tokens runs the whole
    # generation as ONE device-side chunk executable — one dispatch, one
    # D2H sync. Round-3 device traces showed the old chunk=64 rows were
    # paying 3-4 tunnel syncs (~30 ms each) per measurement, i.e. ~0.5
    # ms/tok of pure tunnel latency misread as decode time; the device-side
    # loop exists exactly to amortize that.
    model.generate(list(range(1, 17)), max_new_tokens=n_tokens,
                   chunk_size=n_tokens)
    model.init_fixed_cache(cache_len)
    t0 = time.perf_counter()
    out = model.generate(list(range(1, 17)), max_new_tokens=n_tokens,
                         chunk_size=n_tokens)
    dt = (time.perf_counter() - t0) / len(out)
    res = {"toks_per_s": 1.0 / dt, "ms_per_tok": dt * 1e3,
           "gbps": wbytes / dt / 1e9, "frac_hbm_peak": wbytes / dt / 1e9
           / V5E_HBM_GBPS}
    if mode == "bf16":
        # long-context row: decode at live ctx 4096 over an 8192 cache
        # (the kv-chunk LSE path auto-gates at >= 8192). Cache content at
        # the skipped positions is garbage — timing-only, masked reads
        # cost the same (round-3 in-place-cache + LSE work made this
        # regime ~flat; the row keeps it honest across rounds).
        model.init_fixed_cache(8192)
        model.generate(list(range(1, 17)), max_new_tokens=129,
                       chunk_size=128)
        model.pos = 4096
        model.decode_chunk(5, 128)          # warm at the jump pos
        model.pos = 4096
        t0 = time.perf_counter()
        toks = model.decode_chunk(5, 128)
        dt2 = (time.perf_counter() - t0) / len(toks)
        res["ctx4k_toks_per_s"] = 1.0 / dt2
    return res


def bench_serving(mode: str = "int8", n_req: int = 32, steps: int = 128,
                  gen: int = 128, paged: bool = False) -> float:
    """Aggregate batch-8 serving throughput on the 1B bench model: the
    pipelined continuous-batching engine, n_req x gen-token requests,
    steps_per_dispatch = request length (the measured rule of thumb —
    chunk alignment dominates; round-4 sweep: int4 batch-rows 32 -> 1822,
    64 -> 1975-2085, 128 -> 2272 tok/s). The engine auto-selects the
    batch-rows chunk on TPU (docs/performance.md "Batch serving"). Warmup
    requests compile the chunk/prefill/wave executables outside the timed
    window."""
    import jax.numpy as jnp
    from pygpukit_tpu.llm.config import TransformerConfig
    from pygpukit_tpu.llm.model import (
        CausalTransformerModel, fuse_params, init_params_device,
    )
    from pygpukit_tpu.llm.quant import quantize_model_params
    from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

    cfg = TransformerConfig(
        vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
        num_kv_heads=4, intermediate_size=5632,
        max_position_embeddings=2048, tie_word_embeddings=False)
    params = quantize_model_params(
        fuse_params(init_params_device(cfg, 0, jnp.bfloat16)), mode)
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
    kw = dict(paged=True, block_size=16) if paged else {}
    eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=512,
                                   steps_per_dispatch=steps, pipelined=True,
                                   **kw)
    prompt = list(range(1, 17))
    for _ in range(8):
        eng.submit(prompt, max_new_tokens=steps)
    eng.run_until_complete()
    for _ in range(n_req):
        eng.submit(prompt, max_new_tokens=gen)
    t0 = time.perf_counter()
    eng.run_until_complete()
    return n_req * gen / (time.perf_counter() - t0)


def _bench_model(mode: str):
    import jax.numpy as jnp
    from pygpukit_tpu.llm.config import TransformerConfig
    from pygpukit_tpu.llm.model import (
        CausalTransformerModel, fuse_params, init_params_device,
    )
    cfg = TransformerConfig(
        vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
        num_kv_heads=4, intermediate_size=5632,
        max_position_embeddings=2048, tie_word_embeddings=False)
    params = fuse_params(init_params_device(cfg, 0, jnp.bfloat16))
    if mode != "bf16":
        from pygpukit_tpu.llm.quant import quantize_model_params
        params = quantize_model_params(params, mode)
    return CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)


def bench_prefill(mode: str = "bf16", s: int = 2048, iters: int = 10):
    """1B prefill throughput at S=2048 (VERDICT r4 #6: serving quality is
    decode + admission + prefill; this is the missing third). tok/s plus
    MFU against the v5e bf16 MXU peak (~197 TFLOPS). int4 mode exercises
    the M>1 w4a8 GEMM route in _mm. Reference cross-ref: FA3 prefill
    attention alone 51.97 TFLOPS (BASELINE.md)."""
    import numpy as np
    import jax.numpy as jnp

    model = _bench_model(mode)
    cfg = model.config
    model.init_fixed_cache(s)
    prompt = (np.arange(s - 1) % 31000 + 1).tolist()   # full bucket = s
    logits = model.prefill(prompt)
    _sync(logits)
    t0 = time.perf_counter()
    for _ in range(iters):
        model.pos = 0
        logits = model.prefill(prompt)
    _sync(logits)
    dt = (time.perf_counter() - t0) / iters
    e, hq, hk, d, i_sz = (cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads,
                          cfg.head_dim, cfg.intermediate_size)
    per_layer = (2 * s * e * (hq + 2 * hk) * d      # qkv projections
                 + 2 * s * hq * d * e               # out projection
                 + 3 * 2 * s * e * i_sz             # gate/up/down
                 + 2 * 2 * s * s * hq * d * 0.5)    # causal attention
    flops = cfg.num_layers * per_layer
    return {"toks_per_s": s / dt, "tflops": flops / dt / 1e12,
            "mfu": flops / dt / 197e12}


def bench_serving_mixed(mode: str = "int4", n_req: int = 32,
                        chunk: int = 32, seed: int = 42):
    """Honest-traffic serving row (VERDICT r4 #5): request lengths drawn
    32-256 (fixed seed), none aligned to the dispatch chunk — requests
    finish mid-chunk, slots idle the one-chunk resolution lag, wave
    admission runs ragged. Also reports TTFT percentiles (r4 #6).
    chunk=32 measured best on this workload (scripts/micro_serving_mixed.py
    sweep: 16/32/64/128 -> pick)."""
    import numpy as np
    from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

    rng = np.random.default_rng(seed)
    lens = rng.integers(32, 257, n_req)
    # ~1/4 of requests get an unreachable EOS id (vocab-1 never sampled by
    # the greedy random model in practice) — exercising the EOS bookkeeping
    # path costs nothing; finishing stays length-bound and mid-chunk
    eos = [int(r) for r in rng.integers(0, 4, n_req)]
    model = _bench_model(mode)
    eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=512,
                                   steps_per_dispatch=chunk, pipelined=True)
    prompt = list(range(1, 17))
    # production startup warmup: precompile chunk/prefill/wave executables
    # (wave sizes are power-of-two-bounded by _dispatch_prefills) — without
    # it, each fresh wave size compiles MID-WORKLOAD, 1.7-4.6 s per size
    # (scripts/micro_mixed_chunkwall.py: 516 tok/s cold vs ~1700 warm)
    eng.warmup(prompt_lens=(len(prompt),))
    for _ in range(8):
        eng.submit(prompt, max_new_tokens=chunk)
    eng.run_until_complete()
    reqs = []
    t0 = time.perf_counter()
    for i in range(n_req):
        reqs.append(eng.submit(
            prompt, max_new_tokens=int(lens[i]),
            eos_token_id=(model.config.vocab_size - 1) if eos[i] == 0
            else None))
    eng.run_until_complete()
    dt = time.perf_counter() - t0
    total = sum(len(r.generated) for r in reqs)
    ttfts = sorted(r.ttft_s for r in reqs if r.ttft_s is not None)
    p = lambda q: ttfts[min(int(q * len(ttfts)), len(ttfts) - 1)] * 1e3
    return {"toks_per_s": total / dt, "ttft_p50_ms": p(0.50),
            "ttft_p95_ms": p(0.95)}


def bench_serving_kv(n_req: int = 16, steps: int = 32, max_seq: int = 4096):
    """Capacity-rung serving A/B at large MAX (round 5): bf16 vs int8 KV
    storage, same process so the tunnel day cancels. int8-KV ({"q","s"}
    dict pools, per-row scales) halves KV bytes AND converts at stream
    rate — unlike fp8, whose fp8->bf16 VPU convert costs 2x the batched
    attention kernel (scripts/micro_bda_u8dma.py). int8 weights, batch-8
    pipelined, merged batch-rows pools — micro_serving_trace's regime."""
    import jax.numpy as jnp
    from pygpukit_tpu.llm.config import TransformerConfig
    from pygpukit_tpu.llm.model import (
        CausalTransformerModel, fuse_params, init_params_device,
    )
    from pygpukit_tpu.llm.quant import quantize_model_params
    from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

    cfg = TransformerConfig(
        vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
        num_kv_heads=4, intermediate_size=5632,
        max_position_embeddings=2048, tie_word_embeddings=False)
    params = quantize_model_params(
        fuse_params(init_params_device(cfg, 0, jnp.bfloat16)), "int8")
    prompt = list(range(1, 17))
    out = {}
    for kv in (None, "int8"):
        model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16,
                                       kv_dtype=kv)
        eng = ContinuousBatchingEngine(model, max_batch=8,
                                       max_seq_len=max_seq,
                                       steps_per_dispatch=steps,
                                       pipelined=True)
        for _ in range(8):
            eng.submit(prompt, max_new_tokens=steps)
        eng.run_until_complete()
        for _ in range(n_req):
            eng.submit(prompt, max_new_tokens=128)
        t0 = time.perf_counter()
        eng.run_until_complete()
        out[kv or "bf16"] = n_req * 128 / (time.perf_counter() - t0)
    return out


def main() -> None:
    tflops = bench_gemm_bf16()
    extra = {}
    try:
        # Chip-health row: bandwidth-bound numbers below are only
        # interpretable against TODAY's measured stream rate (the tunneled
        # chip's memory path has been observed 12x degraded while the MXU
        # ran at full speed).
        extra["hbm_stream_gbps"] = round(bench_hbm_stream(), 1)
        extra["hbm_stream_frac_spec"] = round(
            extra["hbm_stream_gbps"] / V5E_HBM_GBPS, 4)
    except Exception as e:
        extra["hbm_stream_error"] = type(e).__name__
    try:
        # v5e has NO native fp8 MXU: this row is a bf16-emulated ceiling
        # (~197 TFLOPS chip peak), recorded for format parity only. The
        # native quant-GEMM row for this chip is int8 below.
        extra["fp8_gemm_tflops"] = round(bench_gemm_fp8(), 1)
        extra["fp8_gemm_vs_baseline"] = round(
            extra["fp8_gemm_tflops"] / BASELINE_FP8_TFLOPS, 4)
        extra["fp8_gemm_note"] = "bf16-emulated (no native fp8 MXU on v5e)"
    except Exception as e:  # keep the headline robust
        extra["fp8_gemm_error"] = type(e).__name__
    try:
        extra["int8_gemm_tops"] = round(bench_gemm_int8(), 1)
        # reference's best quant-GEMM row: fp8xfp8 217 TFLOPS (BASELINE.md)
        extra["int8_gemm_vs_ref_fp8"] = round(
            extra["int8_gemm_tops"] / BASELINE_FP8_TFLOPS, 4)
    except Exception as e:
        extra["int8_gemm_error"] = type(e).__name__
    try:
        # 4-bit GEMM rung (VERDICT r3 #3): reference int4-via-int8 is 121
        # TFLOPS (its NVF4 table runs 261-446 on fp4-native hardware)
        extra["int4_gemm_tops"] = round(bench_gemm_int4(), 1)
        extra["int4_gemm_vs_ref_int4"] = round(
            extra["int4_gemm_tops"] / 121.0, 4)
    except Exception as e:
        extra["int4_gemm_error"] = type(e).__name__
    for name in ("bf16", "fp8", "int8", "int4", "int4_block"):
        try:
            r = bench_decode(name)
            extra[f"decode_1b_{name}_toks_per_s"] = round(r["toks_per_s"], 1)
            if "ctx4k_toks_per_s" in r:
                extra["decode_1b_bf16_ctx4k_toks_per_s"] = round(
                    r["ctx4k_toks_per_s"], 1)
            extra[f"decode_1b_{name}_gbps"] = round(r["gbps"], 1)
            extra[f"decode_1b_{name}_frac_hbm_peak"] = round(
                r["frac_hbm_peak"], 4)
            if extra.get("hbm_stream_gbps"):
                # fraction of TODAY's measured stream rate — the number to
                # read on degraded-chip days (spec-peak fractions collapse
                # with the chip, this one stays comparable across rounds)
                extra[f"decode_1b_{name}_frac_today"] = round(
                    r["gbps"] / extra["hbm_stream_gbps"], 4)
        except Exception as e:
            extra[f"decode_1b_{name}_error"] = type(e).__name__
    if "decode_1b_bf16_frac_hbm_peak" in extra:
        # cross-hardware decode-bandwidth comparison in FRACTION-OF-PEAK
        # terms (the honest metric across different HBM): our bf16 decode
        # frac-of-spec-peak vs the reference GEMV's 98% of RTX 5090 peak
        # (BASELINE.md GEMV rows, 1763-1810 GB/s vs 1792 spec). The old row
        # divided absolute GB/s across chips — untrackable by design.
        extra["decode_bf16_frac_peak_vs_ref"] = round(
            extra["decode_1b_bf16_frac_hbm_peak"] / BASELINE_GEMV_FRAC, 4)
    for smode in ("int8", "int4"):
        # batch-8 pipelined serving; the engine auto-selects the batch-rows
        # chunk on TPU (int4 rides the stacked Pallas w4a8 GEMV with all 8
        # slot rows in one call — the round-4 fix that made int4 the top
        # serving rung: 1827 vs int8's 1711 same-process batch-rows)
        try:
            extra[f"serving_1b_{smode}_toks_per_s"] = round(
                bench_serving(smode), 1)
        except Exception as e:
            extra[f"serving_1b_{smode}_error"] = type(e).__name__
    try:
        # paged KV + batch-rows int4 in ONE configuration (VERDICT r4 #1):
        # the paged chunk feeds real [B, E] rows to the stacked Pallas
        # w4a8 GEMV, block-table attention rides per-slot gathers
        extra["serving_1b_int4_paged_toks_per_s"] = round(
            bench_serving("int4", paged=True), 1)
    except Exception as e:
        extra["serving_1b_int4_paged_error"] = type(e).__name__
    try:
        # honest-traffic row (VERDICT r4 #5): mixed lengths 32-256, none
        # chunk-aligned, + TTFT percentiles (r4 #6)
        m = bench_serving_mixed("int4")
        extra["serving_1b_int4_mixed_toks_per_s"] = round(m["toks_per_s"], 1)
        extra["serving_ttft_p50_ms"] = round(m["ttft_p50_ms"], 1)
        extra["serving_ttft_p95_ms"] = round(m["ttft_p95_ms"], 1)
    except Exception as e:
        extra["serving_1b_int4_mixed_error"] = type(e).__name__
    for pmode in ("bf16", "int4"):
        # prefill visibility (VERDICT r4 #6): S=2048 throughput + MFU;
        # int4 exercises the M>1 w4a8 GEMM route
        try:
            r = bench_prefill(pmode)
            extra[f"prefill_1b_{pmode}_toks_per_s"] = round(
                r["toks_per_s"], 1)
            extra[f"prefill_1b_{pmode}_tflops"] = round(r["tflops"], 1)
            if pmode == "bf16":
                extra["prefill_1b_bf16_mfu"] = round(r["mfu"], 4)
        except Exception as e:
            extra[f"prefill_1b_{pmode}_error"] = type(e).__name__
    try:
        # capacity rung at large MAX (round 5): int8-KV should be ~free
        # (>= ~0.95x bf16) where fp8-KV pays the VPU-convert tax
        kvr = bench_serving_kv()
        extra["serving_1b_kv_int8_toks_per_s"] = round(kvr["int8"], 1)
        extra["serving_1b_kv_bf16_toks_per_s"] = round(kvr["bf16"], 1)
        extra["serving_kv_int8_vs_bf16"] = round(
            kvr["int8"] / kvr["bf16"], 4)
    except Exception as e:
        extra["serving_1b_kv_int8_error"] = type(e).__name__
    print(json.dumps({
        "metric": "bf16_gemm_8192_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOPS",
        "vs_baseline": round(tflops / BASELINE_BF16_TFLOPS, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
