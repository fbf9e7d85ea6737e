"""Round-4 (VERDICT #4): can the fp8-KV convert cost be avoided WITHOUT a
Pallas kernel, by bounding batched decode-attention reads to live chunks?

Round-3 finding (docs/performance.md "fp8 KV cache"): the vmapped serving
chunk at MAX=4096 materialises the fp8->bf16 convert of the WHOLE cache
slice every step (96 -> 213 ms slice fusion), so fp8-KV batch serving was
slower than bf16-KV. But the full-softmax path also READS the whole MAX
buffer; the while-loop chunked path (sdpa_fixed_cache_chunked_fn) reads
only ceil(ctx/chunk) chunks — live bytes AND live converts.

Measures per-call time of the per-layer batched attention step at serving
shapes (B=8, Hq=32, Hk=4, D=64, MAX=4096) across:
  full/chunked x bf16/fp8 x live ctx {150, 3900}

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_kv8_chunked.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pygpukit_tpu.ops.nn.attention import (_sdpa_fixed_cache_full,
                                           sdpa_fixed_cache_chunked_fn)

B, HQ, HK, D, MAX = 8, 32, 4, 64, 4096
REPS = 64
if os.environ.get("KV8_SMOKE"):        # CPU syntax/parity smoke run
    MAX, REPS = 512, 2


def bench(fn, q, k, v, ctx, label):
    f = jax.jit(fn)
    out = f(q, k, v, ctx)
    np.asarray(out.reshape(-1)[:1])

    # chain q on the output so the tunnel pipelines without hoisting
    def chained(q, k, v, ctx):
        def body(_, qq):
            return fn(qq, k, v, ctx).reshape(qq.shape).astype(qq.dtype)
        return jax.lax.fori_loop(0, REPS, body, q)

    g = jax.jit(chained)
    np.asarray(g(q, k, v, ctx).reshape(-1)[:1])
    t0 = time.perf_counter()
    np.asarray(g(q, k, v, ctx).reshape(-1)[:1])
    per = (time.perf_counter() - t0) / REPS * 1e6
    print(f"{label:34s}: {per:8.1f} us/step", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, HQ, D)), jnp.bfloat16)
    k16 = jnp.asarray(rng.standard_normal((B, MAX, HK, D)), jnp.bfloat16)
    v16 = jnp.asarray(rng.standard_normal((B, MAX, HK, D)), jnp.bfloat16)
    k8 = k16.astype(jnp.float8_e4m3fn)
    v8 = v16.astype(jnp.float8_e4m3fn)

    def full(q, kc, vc, ctx):
        return jax.vmap(
            lambda qq, kk, vv, cl: _sdpa_fixed_cache_full(qq, kk, vv, cl),
            in_axes=(0, 0, 0, 0))(q, kc, vc, ctx)

    def chunked(q, kc, vc, ctx):
        return jax.vmap(
            lambda qq, kk, vv, cl: sdpa_fixed_cache_chunked_fn(
                qq, kk, vv, cl, chunk=512),
            in_axes=(0, 0, 0, 0))(q, kc, vc, ctx)

    for live in (150, 3900):
        ctx = jnp.full((B,), live, jnp.int32)
        print(f"-- live ctx = {live} (MAX={MAX}) --", flush=True)
        r = {}
        r["full_bf16"] = bench(full, q, k16, v16, ctx, f"full bf16 ctx={live}")
        r["full_fp8"] = bench(full, q, k8, v8, ctx, f"full fp8 ctx={live}")
        r["chunk_bf16"] = bench(chunked, q, k16, v16, ctx,
                                f"chunked bf16 ctx={live}")
        r["chunk_fp8"] = bench(chunked, q, k8, v8, ctx,
                               f"chunked fp8 ctx={live}")

    # parity: chunked fp8 vs full fp8 (same dequant math, LSE combine)
    ctx = jnp.full((B,), 150, jnp.int32)
    a = np.asarray(jax.jit(full)(q, k8, v8, ctx), np.float32)
    b = np.asarray(jax.jit(chunked)(q, k8, v8, ctx), np.float32)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    print(f"chunked-vs-full fp8 max rel: {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
