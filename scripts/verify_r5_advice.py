"""Round-5 verify: drive the ADVICE fixes on the real TPU chip.

1. int4_block scale fix: quant and dequant must use the IDENTICAL
   (bf16-stored) scale — reconstructing q from the stored scale is bitwise.
2. _mm M>1 w4a8 GEMM route: packed-int4 leaves with >8 rows route to the
   Pallas gemm_int4_w4a8 on TPU; numerics vs the XLA dequant dot within the
   activation-quant envelope, plus a timing A/B.
3. batch_decode_attention with an f32 query over a bf16 pool must COMPILE
   (previously Precision.HIGHEST leaked onto bf16 P@V operands, which
   Mosaic rejects) and match the XLA batched-pool attention.
"""
import os
import time

import numpy as np

import pygpukit_tpu as gp
import jax
import jax.numpy as jnp

assert gp.get_backend().platform == "tpu", gp.get_backend().platform
print("backend:", gp.get_backend().platform, jax.devices())

# ---- 1. int4_block scale round-trip --------------------------------------
from pygpukit_tpu.llm.quant import quantize_weight, dequantize_weight

rng = np.random.default_rng(0)
w = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32)
leaf = quantize_weight(w, "int4_block")
deq = dequantize_weight(leaf, jnp.float32)
err = float(jnp.sqrt(jnp.mean((deq - w) ** 2) / jnp.mean(w ** 2)))
print(f"int4_block dequant rel RMS: {err:.4f}")
assert err < 0.12, err

# re-quantizing the dequantized weight with the stored scale must be exact:
# quant and dequant now share the bf16 value
from pygpukit_tpu.llm.quant import unpack_int4
q = np.asarray(unpack_int4(leaf["q_packed"], axis=-2))      # [K, N]
s = np.asarray(leaf["scale_block"]).astype(np.float32)      # [K/B, N]
blk = np.asarray(w, np.float32).reshape(s.shape[0], -1, w.shape[1])
q2 = np.clip(np.round(blk / s[:, None, :]), -7, 7).astype(np.int8)
assert np.array_equal(q, q2.reshape(q.shape)), "quant/dequant scale mismatch"
print("int4_block: stored-scale quantization bitwise OK")

# ---- 2. _mm M>1 w4a8 GEMM route -------------------------------------------
from pygpukit_tpu.llm.model import _mm

K, N, M = 2048, 512, 64
wd = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
leaf4 = quantize_weight(wd, "int4")
x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.bfloat16)

os.environ["PYGPUKIT_INT4_GEMM"] = "xla"
y_ref = np.asarray(jax.jit(lambda a: _mm(a, leaf4))(x), np.float32)
os.environ["PYGPUKIT_INT4_GEMM"] = "pallas"
t0 = time.time()
y_pl = np.asarray(jax.jit(lambda a: _mm(a, leaf4))(x), np.float32)
print(f"pallas gemm compile+run: {time.time() - t0:.1f}s")
rel = np.sqrt(np.mean((y_pl - y_ref) ** 2) / np.mean(y_ref ** 2))
print(f"w4a8 gemm vs xla dequant rel RMS: {rel:.4f}")
assert rel < 0.05, rel

# timing A/B (same process): per-call wall with a D2H barrier
def timed(fn, x, n=20):
    y = fn(x)
    np.asarray(y[0, 0])
    t0 = time.time()
    for _ in range(n):
        y = fn(x)
    np.asarray(y[0, 0])
    return (time.time() - t0) / n * 1e3

os.environ["PYGPUKIT_INT4_GEMM"] = "xla"
f_x = jax.jit(lambda a: _mm(a, leaf4))
t_x = timed(f_x, x)
os.environ["PYGPUKIT_INT4_GEMM"] = "pallas"
f_p = jax.jit(lambda a: _mm(a, leaf4))
t_p = timed(f_p, x)
print(f"_mm M={M} int4: xla {t_x:.3f} ms vs pallas w4a8 {t_p:.3f} ms")

# ---- 3. f32 query over bf16 pool ------------------------------------------
from pygpukit_tpu.kernels.batch_decode_attention import batch_decode_attention
from pygpukit_tpu.ops.nn.attention import sdpa_batch_pools_fn

B, L, MAX, Hk, Hq, D = 2, 1, 512, 2, 4, 64
qq = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
kp = jnp.asarray(rng.standard_normal((B, L, MAX, Hk, D)), jnp.bfloat16)
vp = jnp.asarray(rng.standard_normal((B, L, MAX, Hk, D)), jnp.bfloat16)
lens = jnp.asarray([100, 317], jnp.int32)
t0 = time.time()
out = np.asarray(jax.jit(
    lambda *a: batch_decode_attention(*a, chunk=256))(
        qq, kp, vp, jnp.int32(0), lens), np.float32)
print(f"f32-q bda compile+run: {time.time() - t0:.1f}s")
ref = np.asarray(jax.jit(sdpa_batch_pools_fn)(
    qq, kp, vp, jnp.int32(0), lens)[0], np.float32)
rel = np.sqrt(np.mean((out - ref) ** 2) / np.mean(ref ** 2))
print(f"f32-q/bf16-pool bda vs xla rel RMS: {rel:.5f}")
assert rel < 2e-2, rel
print("ALL VERIFY CHECKS PASSED")
