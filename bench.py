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
V5E_HBM_GBPS = 819.0


def _sync(x):
    import numpy as np
    return np.asarray(x.reshape(-1)[0:1])


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


def bench_gemv(dtype: str, layers: int = 22, h: int = 2048, kv: int = 256,
               inter: int = 5632, reps: int = 16) -> float:
    """Decode weight-streaming bandwidth in GB/s via the SEVEN-projection
    per-layer scan — the exact roofline ablation from docs/performance.md
    ("Decode": weights-only floor 3.49 ms/tok = ~590 GB/s on bf16).

    Every simpler formulation mis-measures on this chip (CLAUDE.md):
    per-projection micro-GEMVs are dispatch-bound, an unrolled dependent
    chain measured 371-392 GB/s, and a single-matvec lax.scan hits an XLA
    lowering cliff at 119 GB/s. Only the model's own stacked-layer
    multi-projection scan streams at the rate decode actually achieves."""
    import jax
    import jax.numpy as jnp

    def mk(key, *shape):
        if dtype == "bf16":
            return jax.random.normal(key, shape, jnp.bfloat16)
        if dtype == "int8":
            return jax.random.randint(key, shape, -127, 127, jnp.int8)
        return jax.random.normal(key, shape, jnp.bfloat16).astype(
            jnp.float8_e4m3fn)

    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    lp = {"q": mk(ks[0], layers, h, h), "k": mk(ks[1], layers, h, kv),
          "v": mk(ks[2], layers, h, kv), "o": mk(ks[3], layers, h, h),
          "g": mk(ks[4], layers, h, inter), "u": mk(ks[5], layers, h, inter),
          "d": mk(ks[6], layers, inter, h)}
    elt = 2 if dtype == "bf16" else 1
    bytes_total = sum(int(w.size) for w in lp.values()) * elt
    x = jax.random.normal(ks[7], (1, h), jnp.bfloat16)

    @jax.jit
    def sweep(x, lp):
        def body(hc, wl):
            f32 = jnp.float32

            def dot(a, w):
                return jnp.dot(a, w.astype(jnp.bfloat16),
                               preferred_element_type=f32
                               ).astype(jnp.bfloat16)
            a = dot(hc, wl["q"])
            _k = dot(hc, wl["k"])
            _v = dot(hc, wl["v"])
            hc = hc + dot(a, wl["o"])
            g = dot(hc, wl["g"])
            u = dot(hc, wl["u"])
            hc = hc + dot(g * u, wl["d"])
            return hc + jnp.sum(_k) + jnp.sum(_v), None
        hc, _ = jax.lax.scan(body, x, lp)
        return hc

    _sync(sweep(x, lp))
    t0 = time.perf_counter()
    for _ in range(reps):
        x = sweep(x, lp)
        x = x[:, :h]
    _sync(x)
    dt = (time.perf_counter() - t0) / reps
    return bytes_total / dt / 1e9


def main() -> None:
    tflops = bench_gemm_bf16()
    extra = {}
    try:
        extra["fp8_gemm_tflops"] = round(bench_gemm_fp8(), 1)
        extra["fp8_gemm_vs_baseline"] = round(
            extra["fp8_gemm_tflops"] / BASELINE_FP8_TFLOPS, 4)
    except Exception as e:  # keep the headline robust
        extra["fp8_gemm_error"] = type(e).__name__
    for name in ("bf16", "fp8", "int8"):
        try:
            gbps = bench_gemv(name)
            extra[f"gemv_{name}_gbps"] = round(gbps, 1)
            extra[f"gemv_{name}_frac_hbm_peak"] = round(gbps / V5E_HBM_GBPS, 4)
        except Exception as e:
            extra[f"gemv_{name}_error"] = type(e).__name__
    if "gemv_bf16_gbps" in extra:
        extra["gemv_bf16_vs_baseline"] = round(
            extra["gemv_bf16_gbps"] / BASELINE_GEMV_GBPS, 4)
    print(json.dumps({
        "metric": "bf16_gemm_8192_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOPS",
        "vs_baseline": round(tflops / BASELINE_BF16_TFLOPS, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
