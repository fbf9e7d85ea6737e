"""Benchmark suites: gemm / gemv / attention / decode
(reference: src/pygpukit/benchmark/{gemm,gemv,attention}.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Benchmark, BenchResult, time_fn


class GemmBenchmark(Benchmark):
    title = "GEMM (dense + quantized)"

    def __init__(self, sizes=(2048, 4096, 8192), dtypes=("bfloat16", "float32")):
        super().__init__()
        self.sizes = sizes
        self.dtypes = dtypes

    def run(self) -> None:
        key = jax.random.PRNGKey(0)
        for n in self.sizes:
            a32 = jax.random.normal(key, (n, n), jnp.float32)
            for dt in self.dtypes:
                d = jnp.dtype(dt)
                a = a32.astype(d)
                f = jax.jit(lambda a, b: jnp.dot(
                    a, b, preferred_element_type=jnp.float32).astype(a.dtype))
                ms = time_fn(f, a, a)
                self.results.append(BenchResult(
                    f"gemm {n}x{n} {dt}", ms, flops=2 * n**3,
                    bytes=2 * n * n * d.itemsize + n * n * d.itemsize))
            # fp8-stored weights (w8a16-style: bf16 act x fp8 weight)
            w8 = a32.astype(jnp.float8_e4m3fn)
            act = a32.astype(jnp.bfloat16)
            f8 = jax.jit(lambda x, w: jnp.dot(
                x, w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16))
            ms = time_fn(f8, act, w8)
            self.results.append(BenchResult(
                f"gemm {n}x{n} w8a16(fp8)", ms, flops=2 * n**3,
                bytes=n * n * 2 + n * n * 1 + n * n * 2))


class GemvBenchmark(Benchmark):
    title = "GEMV (decode M=1) — bandwidth-bound"

    # reference shapes (BASELINE.md): Qwen2.5-7B gate/down proj + hidden
    SHAPES = [(2048, 8192), (4096, 14336), (3584, 18944), (18944, 3584),
              (4096, 4096)]

    def run(self) -> None:
        key = jax.random.PRNGKey(1)
        for k, n in self.SHAPES:
            w = jax.random.normal(key, (n, k), jnp.bfloat16)
            x = jax.random.normal(key, (k,), jnp.bfloat16)
            f = jax.jit(lambda w, x: jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16))
            ms = time_fn(f, w, x, iters=50)
            self.results.append(BenchResult(
                f"gemv bf16 K={k} N={n}", ms, bytes=n * k * 2))
            # fp8 weight gemv (w8a16)
            w8 = w.astype(jnp.float8_e4m3fn)
            f8 = jax.jit(lambda w, x: jax.lax.dot_general(
                w.astype(jnp.bfloat16), x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16))
            ms = time_fn(f8, w8, x, iters=50)
            self.results.append(BenchResult(
                f"gemv w8a16 K={k} N={n}", ms, bytes=n * k * 1))


class AttentionBenchmark(Benchmark):
    title = "Attention (prefill)"

    def run(self) -> None:
        from ..ops.nn.attention import flash_attention_fn, sdpa_causal_fn
        key = jax.random.PRNGKey(2)
        for s, h, d in [(1024, 32, 128), (4096, 32, 128)]:
            q = jax.random.normal(key, (s, h, d), jnp.bfloat16)
            k = jax.random.normal(key, (s, h, d), jnp.bfloat16)
            v = jax.random.normal(key, (s, h, d), jnp.bfloat16)
            flops = 4 * h * s * s * d  # QK^T + PV, causal ~ /2 then *2 passes
            f1 = jax.jit(sdpa_causal_fn)
            ms = time_fn(f1, q, k, v, iters=10)
            self.results.append(BenchResult(
                f"sdpa_causal S={s} H={h} D={d}", ms, flops=flops // 2))
            f2 = jax.jit(lambda q, k, v: flash_attention_fn(
                q, k, v, chunk_size=512))
            ms = time_fn(f2, q, k, v, iters=10)
            self.results.append(BenchResult(
                f"flash(chunked) S={s} H={h} D={d}", ms, flops=flops // 2))


class DecodeBenchmark(Benchmark):
    title = "End-to-end decode (random-weight model)"

    def __init__(self, preset: str = "small"):
        super().__init__()
        self.preset = preset

    def run(self) -> None:
        import time as _t
        import numpy as np
        from ..llm.config import TransformerConfig
        from ..llm.model import CausalTransformerModel, init_params
        presets = {
            # ~GPT-2-124M scale
            "small": TransformerConfig(
                vocab_size=50257, hidden_size=768, num_layers=12,
                num_heads=12, intermediate_size=3072, norm_type="layernorm",
                activation="gelu", use_rope=False, use_position_embed=True,
                max_position_embeddings=1024),
            # ~1B scale
            "1b": TransformerConfig(
                vocab_size=32000, hidden_size=2048, num_layers=22,
                num_heads=32, num_kv_heads=4, intermediate_size=5632,
                max_position_embeddings=2048),
        }
        cfg = presets[self.preset]
        params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
        model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
        model.init_fixed_cache(1024)
        # warm (compiles prefill + chunked decode executables)
        model.generate(list(range(1, 17)), max_new_tokens=65, chunk_size=64)
        n = 256
        model.init_fixed_cache(1024)
        t0 = _t.perf_counter()
        out = model.generate(list(range(1, 17)), max_new_tokens=n + 1,
                             chunk_size=64)
        dt = _t.perf_counter() - t0
        tps = len(out) / dt
        self.results.append(BenchResult(
            f"decode {self.preset} tok/s={tps:.1f}", dt * 1e3 / len(out),
            extra={"tokens_per_s": tps}))


class MoEBenchmark(Benchmark):
    """Mixtral-arch decode through the token-count-routed MoE dispatch
    (ops/moe.select_moe_fn: expert-gather at decode)."""
    title = "MoE decode (Mixtral-arch, 8 experts top-2)"

    def run(self) -> None:
        import time as _t
        from ..llm.config import TransformerConfig
        from ..llm.model import CausalTransformerModel, init_params
        cfg = TransformerConfig(
            vocab_size=32000, hidden_size=1024, num_layers=8, num_heads=16,
            num_kv_heads=8, intermediate_size=3584,
            max_position_embeddings=2048, num_experts=8,
            num_experts_per_tok=2, moe_intermediate_size=1792)
        params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
        model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
        model.init_fixed_cache(512)
        model.generate(list(range(1, 9)), max_new_tokens=33, chunk_size=32)
        n = 128
        model.init_fixed_cache(512)
        t0 = _t.perf_counter()
        out = model.generate(list(range(1, 9)), max_new_tokens=n + 1,
                             chunk_size=32)
        dt = _t.perf_counter() - t0
        tps = len(out) / dt
        self.results.append(BenchResult(
            f"moe decode tok/s={tps:.1f}", dt * 1e3 / len(out),
            extra={"tokens_per_s": tps}))


class ServingBenchmark(Benchmark):
    """Continuous-batching aggregate throughput: pipelined+waves vs paged
    vs dense (llm/serving.py; reference shipped only the primitives)."""
    title = "Continuous-batching serving (batch 8, 128-tok requests)"

    def run(self) -> None:
        import time as _t
        from ..llm.config import TransformerConfig
        from ..llm.model import CausalTransformerModel, fuse_params, init_params
        from ..llm.serving import ContinuousBatchingEngine
        cfg = TransformerConfig(
            vocab_size=32000, hidden_size=1024, num_layers=8, num_heads=16,
            num_kv_heads=8, intermediate_size=2816,
            max_position_embeddings=2048)
        params = fuse_params(init_params(cfg, seed=0, dtype=jnp.bfloat16))
        model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
        prompt = list(range(1, 17))
        for label, kw in (("pipelined", {"pipelined": True}),
                          ("paged", {"paged": True, "block_size": 16}),
                          ("dense", {})):
            eng = ContinuousBatchingEngine(
                model, max_batch=8, max_seq_len=1024,
                steps_per_dispatch=16, **kw)
            for _ in range(2):                       # warm incl. wave exes
                [eng.submit(prompt, max_new_tokens=32) for _ in range(9)]
                eng.run_until_complete()
            reqs = [eng.submit(prompt, max_new_tokens=128)
                    for _ in range(16)]
            t0 = _t.perf_counter()
            eng.run_until_complete()
            dt = _t.perf_counter() - t0
            toks = sum(len(r.generated) for r in reqs)
            self.results.append(BenchResult(
                f"serving {label} tok/s={toks / dt:.1f}", dt * 1e3,
                extra={"tokens_per_s": toks / dt}))


SUITES = {
    "gemm": GemmBenchmark,
    "gemv": GemvBenchmark,
    "attention": AttentionBenchmark,
    "decode": DecodeBenchmark,
    "moe": MoEBenchmark,
    "serving": ServingBenchmark,
}
