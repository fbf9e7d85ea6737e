"""fp8-KV batched attention: is the 2x kernel cost the DMA or the convert?

Round-5 trace (scripts/micro_serving_trace.py 4096 [fp8], merged pools):
the batch-rows serving step runs fp8-KV at 0.95x bf16 wall, and the ENTIRE
residual is the Pallas batched-attention kernel — closed_call 965 us/step
fp8 vs 474 bf16 while every other fusion is byte-identical. fp8 reads HALF
the chunk bytes yet takes 2x the time (~4x slower per byte), matching the
round-4 micro_fp8_nmajor finding.

Two candidate causes with different fixes:
  - Mosaic's fp8-typed chunk DMA is slow (tiling/lane packing): then
    DMAing the same bytes as uint8 and bitcasting to fp8 in-kernel
    (PYGPUKIT_BDA_U8DMA=1) recovers the rate;
  - the fp8->bf16 VPU convert is the cost (no fp8 datapath on v5e): then
    the u8 DMA changes nothing and the residual is hardware-irreducible.

This times the kernel standalone at the serving shape (B=8, L=22,
MAX=4096, Hk=4, D=64, Hq=32, chunk=512, ctx=144 — one live chunk/slot,
exactly the trace regime), 22x32 calls amortised inside one jit:
bf16 control, fp8, fp8+u8dma. Prints ms per 22-layer step and the
exactness of u8dma vs plain fp8.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_bda_u8dma.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import pygpukit_tpu as gp
from pygpukit_tpu.kernels import batch_decode_attention as bda

assert gp.get_backend().platform == "tpu"

B, L, MAX, HK, D, HQ, CHUNK, CTX = 8, 22, 4096, 4, 64, 32, 512, 144
STEPS = 32
LANES = HK * D

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (B, 1, HQ, D), jnp.bfloat16)
k_bf = jax.random.normal(kk, (B, L, MAX, LANES), jnp.bfloat16) * 0.3
v_bf = jax.random.normal(kv, (B, L, MAX, LANES), jnp.bfloat16) * 0.3
lens = jnp.full((B,), CTX, jnp.int32)


def cast_fp8(x):
    return jnp.clip(x.astype(jnp.float32), -448, 448).astype(
        jnp.float8_e4m3fn)


k8 = jax.jit(cast_fp8)(k_bf)
v8 = jax.jit(cast_fp8)(v_bf)


def run(kp, vp):
    @jax.jit
    def f(q, kp, vp, lens):
        def body(i, acc):
            o = bda.batch_decode_attention(q, kp, vp, i % L, lens,
                                           chunk=CHUNK)
            return acc + o.astype(jnp.float32).sum()
        return lax.fori_loop(0, L * STEPS, body, jnp.float32(0.0))

    r = f(q, kp, vp, lens)          # compile
    np.asarray(r)                   # warm + sync
    t0 = time.perf_counter()
    np.asarray(f(q, kp, vp, lens))
    dt = time.perf_counter() - t0
    return dt / STEPS * 1e3         # ms per 22-layer step


print(f"bf16 control : {run(k_bf, v_bf):7.3f} ms/step", flush=True)
ms_fp8 = run(k8, v8)
print(f"fp8          : {ms_fp8:7.3f} ms/step", flush=True)

os.environ["PYGPUKIT_BDA_U8DMA"] = "1"
ms_u8 = run(k8, v8)
print(f"fp8 + u8 DMA : {ms_u8:7.3f} ms/step", flush=True)

# exactness: u8dma must be bitwise vs the plain fp8 kernel
o_u8 = np.asarray(jax.jit(lambda: bda.batch_decode_attention(
    q, k8, v8, 3, lens, chunk=CHUNK))())
del os.environ["PYGPUKIT_BDA_U8DMA"]
o_fp8 = np.asarray(jax.jit(lambda: bda.batch_decode_attention(
    q, k8, v8, 3, lens, chunk=CHUNK))())
print("u8dma bitwise vs fp8:", np.array_equal(o_u8, o_fp8), flush=True)
