"""Dense MXU GEMM Pallas kernels (bf16 / f32).

TPU-native replacement for the reference's CUTLASS / WMMA / cuBLASLt GEMM stack
(reference: native/ops/matmul/matmul.cu:43-120, native/ops/matmul/gemm/**).
One tiled MXU kernel with an f32 VMEM accumulator covers what the reference
needed ~10k LoC of per-SM kernels for; XLA's ``dot_general`` serves as the
"vendor BLAS" fallback (the cuBLASLt analog), selected via env override.

Env gates (mirroring the reference's PYGPUKIT_NO_CUTLASS-style tri-states):
  PYGPUKIT_GEMM = "pallas" | "xla" | "" (auto: pallas for large aligned, xla otherwise)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.backend import interpret_mode


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _gemm_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # HIGHEST precision only for f32 inputs: Mosaic rejects fp32 contract
    # precision on bf16 operands (bf16 is already the MXU-native input type)
    prec = (jax.lax.Precision.HIGHEST if a_ref.dtype == jnp.float32
            else None)
    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
        precision=prec,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype", "interpret")
)
def _gemm_pallas(a, b, *, bm: int, bn: int, bk: int, out_dtype, interpret: bool):
    m, k = a.shape
    k2, n = b.shape
    n_k = _cdiv(k, bk)
    grid = (_cdiv(m, bm), _cdiv(n, bn), n_k)
    kernel = functools.partial(_gemm_kernel, n_k=n_k)
    flops = 2 * m * n * k
    bytes_acc = a.size * a.dtype.itemsize + b.size * b.dtype.itemsize + m * n * jnp.dtype(out_dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=0
        ),
        interpret=interpret,
    )(a, b)


def _pick_tiles(m: int, n: int, k: int, dtype) -> tuple[int, int, int]:
    """Tile sizes: big MXU-friendly tiles, shrunk for small problems."""
    if dtype == jnp.float32:
        bm = min(_round_up(m, 8), 256)
        bk = min(_round_up(k, 128), 512)
    else:  # bf16/f16: sublane min 16
        bm = min(_round_up(m, 16), 256)
        bk = min(_round_up(k, 128), 512)
    bn = min(_round_up(n, 128), 512)
    return bm, bn, bk


def gemm(a: jax.Array, b: jax.Array, *, out_dtype=None,
         force: str | None = None) -> jax.Array:
    """C[m,n] = A[m,k] @ B[k,n] on the MXU.

    Pads unaligned shapes to tile multiples (XLA fuses the pads); falls back to
    XLA dot_general for small problems where kernel launch overhead dominates.
    """
    assert a.ndim == 2 and b.ndim == 2 and a.shape[1] == b.shape[0], (
        f"gemm shape mismatch: {a.shape} @ {b.shape}"
    )
    out_dtype = out_dtype or jnp.promote_types(a.dtype, b.dtype)
    mode = force or os.environ.get("PYGPUKIT_GEMM", "")
    m, k = a.shape
    n = b.shape[1]

    # XLA dot_general is the default: on TPU it is already MXU speed-of-light
    # for dense GEMM. The Pallas kernel is an explicit opt-in (compile cost on
    # tunneled hosts is high; use for fusion experiments / quantized variants).
    use_pallas = mode == "pallas" and m >= 64 and n >= 128 and k >= 128
    if not use_pallas:
        prec = (jax.lax.Precision.HIGHEST
                if a.dtype == jnp.float32 and b.dtype == jnp.float32
                and os.environ.get("PYGPUKIT_ALLOW_TF32", "0") != "1" else None)
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(out_dtype)

    bm, bn, bk = _pick_tiles(m, n, k, a.dtype)
    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), _round_up(k, bk)
    ap = a if (mp == m and kp == k) else jnp.pad(a, ((0, mp - m), (0, kp - k)))
    bp = b if (kp == k and np_ == n) else jnp.pad(b, ((0, kp - k), (0, np_ - n)))
    out = _gemm_pallas(
        ap, bp, bm=bm, bn=bn, bk=bk, out_dtype=jnp.dtype(out_dtype),
        interpret=interpret_mode(),
    )
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


def batched_gemm(a: jax.Array, b: jax.Array, *, out_dtype=None) -> jax.Array:
    """[B,m,k] @ [B,k,n] — XLA batched dot (MXU-tiled by the compiler)."""
    out_dtype = out_dtype or jnp.promote_types(a.dtype, b.dtype)
    prec = (jax.lax.Precision.HIGHEST
            if a.dtype == jnp.float32 and b.dtype == jnp.float32 else None)
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(out_dtype)
