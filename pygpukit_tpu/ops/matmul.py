"""Matmul family: dense + quantized GEMM/GEMV dispatch.

Reference surface: src/pygpukit/ops/matmul/{generic,fp8,w8a16,gemv,grouped,
availability}.py. TPU-native design: XLA ``dot_general`` is the vendor-BLAS
analog (hits the MXU at near peak); quantized paths store weights in fp8/int8/
int4 so HBM traffic shrinks while the MXU computes in bf16/int8 — the on-chip
upconvert is fused into the dot by XLA. Pallas kernels (kernels/gemm.py) are an
env-gated override (PYGPUKIT_GEMM=pallas), mirroring the reference's
PYGPUKIT_NO_CUTLASS-style gates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.array import Array, as_jax
from ._common import apply_op
from ..kernels import gemm as _gemm_kernels

_F32 = jnp.float32


def _f32_precision():
    """Precision for f32×f32 dots: full f32 unless fast mode is requested.

    JAX's DEFAULT matmul precision runs f32 through bf16 MXU passes (the TPU
    analog of TF32); PYGPUKIT_ALLOW_TF32=1 opts into it, mirroring the
    reference's PYGPUKIT_ALLOW_TF32 gate (native/ops/matmul/matmul.cu:56-97).
    """
    import os
    if os.environ.get("PYGPUKIT_ALLOW_TF32", "0") == "1":
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def _prec(a, b):
    return _f32_precision() if (a.dtype == _F32 and b.dtype == _F32) else None


def _dot(a, b):
    """2D/ND dot with f32 accumulation (MXU-friendly)."""
    if a.ndim == 2 and b.ndim == 2:
        return _gemm_kernels.gemm(a, b, out_dtype=jnp.promote_types(a.dtype, b.dtype))
    return jnp.matmul(a, b, preferred_element_type=_F32,
                      precision=_prec(a, b)).astype(
        jnp.promote_types(a.dtype, b.dtype)
    )


def matmul(a, b, *, out: Array | None = None) -> Array:
    """C = A @ B (2D or batched; reference: ops/matmul/generic.py:18)."""
    aj, bj = as_jax(a), as_jax(b)
    if aj.shape[-1] != bj.shape[-2 if bj.ndim > 1 else 0]:
        raise ValueError(f"matmul: inner dims mismatch {aj.shape} @ {bj.shape}")
    return apply_op(_dot, aj, bj, out=out)


def matmul_nt(a, b, *, out: Array | None = None) -> Array:
    """C = A @ B.T — B stored row-major [N, K] (optimal GEMV layout,
    reference: llm/repack.py:20)."""
    aj, bj = as_jax(a), as_jax(b)
    res = jax.lax.dot_general(
        aj, bj, (((aj.ndim - 1,), (bj.ndim - 1,)), ((), ())),
        preferred_element_type=_F32, precision=_prec(aj, bj),
    ).astype(jnp.promote_types(aj.dtype, bj.dtype))
    if out is not None:
        out._set_buffer(res.astype(out.dtype.jax_dtype))
        return out
    return Array(res)


def batched_matmul(a, b, *, out: Array | None = None) -> Array:
    return apply_op(_gemm_kernels.batched_gemm, as_jax(a), as_jax(b), out=out)


def gemv(w, x, *, out: Array | None = None) -> Array:
    """y[N] = W[N,K] @ x[K] — decode hot path (reference: ops/matmul/gemv.py).

    W is stored [N, K] (the reference's repacked B layout); bandwidth-bound on
    both architectures.
    """
    wj, xj = as_jax(w), as_jax(x)
    res = jax.lax.dot_general(
        wj, xj, (((1,), (0,)), ((), ())), preferred_element_type=_F32,
        precision=_prec(wj, xj),
    ).astype(jnp.promote_types(wj.dtype, xj.dtype))
    if out is not None:
        out._set_buffer(res.astype(out.dtype.jax_dtype))
        return out
    return Array(res)


gemv_bf16 = gemv


# ---------------------------------------------------------------------------
# Quantized paths (reference: ops/matmul/{fp8,w8a16,nvf4}.py)
# Scale conventions follow the reference: per-tensor (fp8) or per-channel
# (int8/int4 weights) scales, f32.
# ---------------------------------------------------------------------------

def quantize_fp8(a, *, out_dtype=jnp.float8_e4m3fn) -> tuple[Array, Array]:
    """Per-tensor symmetric fp8 quantization → (q, scale)."""
    aj = as_jax(a).astype(_F32)
    fmax = float(jnp.finfo(out_dtype).max)
    scale = jnp.maximum(jnp.max(jnp.abs(aj)) / fmax, 1e-12)
    q = (aj / scale).astype(out_dtype)
    return Array(q), Array(scale.reshape(()))


def quantize_int8(w, *, axis: int = -1) -> tuple[Array, Array]:
    """Per-channel symmetric int8 quantization along ``axis``."""
    wj = as_jax(w).astype(_F32)
    amax = jnp.max(jnp.abs(wj), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wj / scale), -127, 127).astype(jnp.int8)
    return Array(q), Array(scale)


def quantize_int4(w, *, axis: int = -1) -> tuple[Array, Array]:
    """Per-channel symmetric int4 quantization (stored as jnp.int4)."""
    wj = as_jax(w).astype(_F32)
    amax = jnp.max(jnp.abs(wj), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wj / scale), -7, 7).astype(jnp.int4)
    return Array(q), Array(scale)


def matmul_fp8(a_q, b_q, a_scale, b_scale, *, out_dtype=jnp.bfloat16,
               out: Array | None = None) -> Array:
    """FP8×FP8 GEMM with per-tensor scales → bf16 (reference: ops/matmul/fp8.py).

    The MXU computes in bf16 after an on-chip upconvert fused by XLA; the fp8
    storage halves weight/activation HBM traffic vs bf16.
    """
    def _f(aq, bq, sa, sb):
        acc = jnp.dot(aq.astype(jnp.bfloat16), bq.astype(jnp.bfloat16),
                      preferred_element_type=_F32)
        return (acc * (sa * sb)).astype(out_dtype)
    return apply_op(_f, a_q, b_q, a_scale, b_scale, out=out)


def matmul_w8a16(a, w_q, w_scale, *, out_dtype=jnp.bfloat16,
                 out: Array | None = None) -> Array:
    """BF16 activation × FP8 weight [K,N] with per-tensor/channel scale
    (reference: ops/matmul/w8a16.py)."""
    def _f(x, wq, ws):
        acc = jnp.dot(x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
                      preferred_element_type=_F32)
        return (acc * ws).astype(out_dtype)
    return apply_op(_f, a, w_q, w_scale, out=out)


def matmul_int8(a_q, b_q, a_scale, b_scale, *, out_dtype=jnp.bfloat16,
                out: Array | None = None) -> Array:
    """INT8×INT8 GEMM, exact int32 accumulation on the MXU (dp4a analog,
    reference: native/ops/matmul/gemm/int8_int8*)."""
    def _f(aq, bq, sa, sb):
        acc = jax.lax.dot_general(
            aq, bq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        # sa [M,1] (act rows), sb [1,N] (weight cols) broadcast over the output
        return (acc.astype(_F32) * sa * sb).astype(out_dtype)
    return apply_op(_f, a_q, b_q, a_scale, b_scale, out=out)


def gemv_w8a16(x, w_q, w_scale, *, out_dtype=jnp.bfloat16,
               out: Array | None = None) -> Array:
    """x[K] × fp8 W[N,K] decode GEMV — fp8 weight storage halves HBM traffic,
    the decode bottleneck (reference: native/ops/matmul/gemv/w8a16*)."""
    def _f(xv, wq, ws):
        acc = jax.lax.dot_general(
            wq.astype(jnp.bfloat16), xv.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=_F32,
        )
        return (acc * jnp.ravel(ws)).astype(out_dtype)
    return apply_op(_f, x, w_q, w_scale, out=out)


def gemv_int4(x, w_q, w_scale, *, out_dtype=jnp.bfloat16,
              out: Array | None = None) -> Array:
    """x[K] × int4 W[N,K] decode GEMV (reference: native/ops/matmul/gemv/int4*)."""
    def _f(xv, wq, ws):
        acc = jax.lax.dot_general(
            wq.astype(jnp.bfloat16), xv.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=_F32,
        )
        return (acc * jnp.ravel(ws)).astype(out_dtype)
    return apply_op(_f, x, w_q, w_scale, out=out)


def grouped_matmul(a, b_stack, group_ids, *, out: Array | None = None) -> Array:
    """Grouped GEMM for MoE: rows of ``a`` [T,K] each matmul their expert's
    weight ``b_stack`` [E,K,N] (reference: ops/matmul/grouped.py).

    Dense-einsum formulation: one-hot over experts keeps everything on the MXU
    with static shapes (no ragged dispatch); cost is E× the FLOPs of the
    minimal ragged matmul, acceptable for small top-k — a ragged Pallas kernel
    is the planned optimization.
    """
    def _f(x, w, gid):
        e = w.shape[0]
        onehot = jax.nn.one_hot(gid, e, dtype=x.dtype)        # [T,E]
        per_e = jnp.einsum("tk,ekn->ten", x, w,
                           preferred_element_type=_F32)        # [T,E,N]
        return jnp.einsum("te,ten->tn", onehot.astype(_F32), per_e).astype(x.dtype)
    return apply_op(_f, a, b_stack, group_ids, out=out)


def quantize_fp8_block(w, block: int = 128) -> tuple[Array, Array]:
    """Blockwise fp8 quantization (reference: SM120 blockwise fp8 GEMM,
    native/ops/matmul/gemm/fp8_block_scale — the ~0.1%-error envelope).

    w [K, N] → (q fp8 [K, N], scales f32 [K/block, N/block]); K, N padded to
    block multiples by the caller if needed.
    """
    wj = as_jax(w).astype(_F32)
    k, n = wj.shape
    kb, nb = -(-k // block), -(-n // block)
    pad_k, pad_n = kb * block - k, nb * block - n
    wp = jnp.pad(wj, ((0, pad_k), (0, pad_n)))
    blocks = wp.reshape(kb, block, nb, block)
    fmax = float(jnp.finfo(jnp.float8_e4m3fn).max)
    amax = jnp.max(jnp.abs(blocks), axis=(1, 3))          # [kb, nb]
    scale = jnp.maximum(amax / fmax, 1e-12)
    q = (blocks / scale[:, None, :, None]).astype(jnp.float8_e4m3fn)
    q = q.reshape(kb * block, nb * block)[:k, :n]
    return Array(q), Array(scale)


def matmul_fp8_block(a, w_q, w_scale, *, block: int = 128,
                     out_dtype=jnp.bfloat16, out: Array | None = None) -> Array:
    """x [M, K] @ blockwise-fp8 W [K, N] with per-(Kblock, Nblock) scales.

    Per-block partial dots accumulate in f32 with the block scale applied
    before the K-reduction — the same math as the reference's blockwise MMA
    epilogue, expressed as one einsum that XLA tiles onto the MXU.
    """
    def _f(x, wq, ws):
        m, k = x.shape
        n = wq.shape[1]
        kb, nb = ws.shape
        pad_k, pad_n = kb * block - k, nb * block - n
        xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, pad_k)))
        wp = jnp.pad(wq, ((0, pad_k), (0, pad_n)))
        xb = xp.reshape(m, kb, block)
        wb = wp.reshape(kb, block, nb, block).astype(jnp.bfloat16)
        # partial per (K-block, N-block) dots, then scale and reduce over kb
        part = jnp.einsum("mkc,kcnd->mknd", xb, wb,
                          preferred_element_type=_F32)      # [M,kb,nb,block]
        y = jnp.einsum("mknd,kn->mnd", part, ws).reshape(m, nb * block)
        return y[:, :n].astype(out_dtype)
    return apply_op(_f, a, w_q, w_scale, out=out)


# ---------------------------------------------------------------------------
# Availability probes (reference: ops/matmul/availability.py)
# ---------------------------------------------------------------------------

def fp8_available() -> bool:
    return True   # fp8 storage + bf16 MXU compute always available


def int8_available() -> bool:
    return True


def int4_available() -> bool:
    return True


def w8a16_available() -> bool:
    return True


def nvf4_available() -> bool:
    return False  # NVF4 is an NVIDIA-specific block format; int4 is the analog


def grouped_gemm_available() -> bool:
    return True
