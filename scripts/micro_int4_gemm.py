"""int4 w4a8 GEMM TOPS at the reference's quant-GEMM shape + prefill sizes.

VERDICT r3 #3: the reference ships int4-via-int8 GEMM at 121 TFLOPS and
NVF4 GEMM at 261-446 (README "Quantized GEMM"/"NVF4 GEMM"); our packed-int4
prefill/batch silently rode the XLA dequant-dot. gemm_int4_w4a8
(kernels/gemv_quant.py) generalizes the GEMV's in-register unpack + native
int8 MXU dots to M-tiles. This measures:
  1. TOPS at M8192/K4096/N14336 (the reference's table shape) vs the XLA
     dequant dot formulation;
  2. prefill-shaped sweeps (M 32..512 on the 1B projections) to decide the
     _mm routing threshold.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_int4_gemm.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    return np.asarray(x.reshape(-1)[0:1])


def pack(w):
    n, k = w.shape
    scale = (np.abs(w).max(axis=1, keepdims=True) / 7.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    packed = jnp.asarray(((q[:, :k // 2] & 0xF)
                          | ((q[:, k // 2:] & 0xF) << 4)).astype(np.uint8))
    return packed, jnp.asarray(scale[:, 0])


def bench_pallas(packed, scale, x, iters=20):
    from pygpukit_tpu.kernels.gemv_quant import gemm_int4_w4a8
    y = gemm_int4_w4a8(packed, x, scale)
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = gemm_int4_w4a8(packed, x, scale)
    _sync(y)
    return (time.perf_counter() - t0) / iters


def bench_xla(packed, scale, x, iters=20):
    from pygpukit_tpu.llm.quant import unpack_int4

    @jax.jit
    def f(packed, scale, x):
        q_t = unpack_int4(packed)                  # [N, K]
        acc = jax.lax.dot_general(
            x.astype(jnp.bfloat16), q_t.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        return (acc * scale).astype(jnp.bfloat16)

    y = f(packed, scale, x)
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(packed, scale, x)
    _sync(y)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    # 1) reference table shape
    m, k, n = 8192, 4096, 14336
    w = rng.standard_normal((n, k)).astype(np.float32)
    packed, scale = pack(w)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32),
                    jnp.bfloat16)
    tp = bench_pallas(packed, scale, x)
    tx = bench_xla(packed, scale, x)
    tops_p = 2 * m * k * n / tp / 1e12
    tops_x = 2 * m * k * n / tx / 1e12
    print(f"M{m} K{k} N{n}: w4a8 {tops_p:7.1f} TOPS   "
          f"xla-dequant {tops_x:7.1f} TOPS  (ratio {tops_p/tops_x:.2f})",
          flush=True)
    # 2) prefill-shaped sweep on the 1B fused projections
    for (nn, kk) in ((2560, 2048), (2048, 2048), (11264, 2048), (2048, 5632)):
        w = rng.standard_normal((nn, kk)).astype(np.float32)
        packed, scale = pack(w)
        for mm in (32, 128, 512):
            x = jnp.asarray(rng.standard_normal((mm, kk)).astype(np.float32),
                            jnp.bfloat16)
            tp = bench_pallas(packed, scale, x, iters=30)
            tx = bench_xla(packed, scale, x, iters=30)
            print(f"  N{nn:5d} K{kk:4d} M{mm:3d}: w4a8 {tp*1e6:8.1f} us  "
                  f"xla {tx*1e6:8.1f} us  (ratio {tx/tp:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
