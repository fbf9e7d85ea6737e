"""Pallas quantized GEMV kernels (decode M=1).

TPU-native replacement for the reference's bandwidth-optimised GEMV family
(reference: native/ops/matmul/gemv/** — bf16 at 98-101% of HBM peak, w8a16
fp8-weight kernels with 6-22x speedups). The kernel streams weight tiles
HBM→VMEM (Mosaic double-buffers the grid pipeline automatically), upcasts
fp8/int8 in-register, and accumulates f32 partial dots; bandwidth is the
roofline, so the win over bf16 is the storage dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.backend import interpret_mode

_F32 = jnp.float32


def _cdiv(a, b):
    return -(-a // b)


def _gemv_kernel(w_ref, x_ref, scale_ref, o_ref, acc_ref, *, n_k: int,
                 out_rows: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.bfloat16)           # [bn, bk] upcast in-register
    x = x_ref[:].astype(jnp.bfloat16)           # [rows, bk]
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=_F32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[:].astype(_F32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk", "interpret"))
def _gemv_pallas(w, x, scale, *, bn: int, bk: int, interpret: bool):
    n, k = w.shape
    rows = x.shape[0]
    n_k = _cdiv(k, bk)
    kernel = functools.partial(_gemv_kernel, n_k=n_k, out_rows=rows)
    return pl.pallas_call(
        kernel,
        grid=(_cdiv(n, bn), n_k),
        in_specs=[
            pl.BlockSpec((bn, bk), lambda ni, ki: (ni, ki)),
            pl.BlockSpec((rows, bk), lambda ni, ki: (0, ki)),
            pl.BlockSpec((1, bn), lambda ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((rows, bn), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows, bn), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k,
            bytes_accessed=n * k * w.dtype.itemsize + k * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(w, x, scale)


def gemv_quant(w_q, x, scale=None, bn: int = 1024, bk: int = 1024):
    """y[N] = W[N,K] @ x[K] with quantized weight storage.

    w_q: fp8/int8/bf16 [N, K]; x: bf16/f32 [K]; scale: per-output-column
    f32 [N] (or None for 1.0). Returns bf16 [N].
    """
    n, k = w_q.shape
    bn = min(bn, n)
    bk = min(bk, k)
    npad = _cdiv(n, bn) * bn - n
    kpad = _cdiv(k, bk) * bk - k
    if npad or kpad:
        w_q = jnp.pad(w_q, ((0, npad), (0, kpad)))
    xr = x.reshape(1, -1).astype(jnp.bfloat16)
    xr = jnp.pad(xr, ((0, 7), (0, kpad)))       # sublane min 8 rows
    if scale is None:
        scale = jnp.ones((n,), _F32)
    sc = jnp.pad(scale.reshape(1, -1).astype(_F32), ((0, 0), (0, npad)))
    out = _gemv_pallas(w_q, xr, sc, bn=bn, bk=bk,
                       interpret=interpret_mode())
    return out[0, :n]
