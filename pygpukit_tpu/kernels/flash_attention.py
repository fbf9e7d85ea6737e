"""Pallas flash attention (prefill) + flash decoding kernels.

TPU-native replacements for the reference's FA3 / flash-decoding CUDA kernels
(reference: native/ops/nn/attention/** — FA3 online-softmax tiling,
flash_decoding.cuh:1-16 kv-chunk parallel with LSE combine).

Prefill kernel: grid (heads, q_blocks, kv_blocks); the kv dimension is
sequential ("arbitrary") with the online-softmax state (running max, sum,
accumulator) in VMEM scratch — the FA recurrence mapped onto the Mosaic
pipeline. Causal masking is done in-kernel; fully-masked kv blocks are
skipped via pl.when.

Decode kernel: same recurrence with a single query row per head over kv
chunks of the fixed cache, masked beyond ctx_len (the flash-decoding
LSE-combine math, expressed as sequential accumulation).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.backend import interpret_mode

_F32 = jnp.float32
_NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# Prefill flash attention
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  bq: int, bk: int, n_kv: int, scale: float, causal: bool,
                  true_s: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    run = True
    if causal:
        # kv block strictly after the q block: nothing to do
        run = (ki * bk) <= (qi * bq + bq - 1)

    @pl.when(run if causal else True)
    def _():
        q = q_ref[0]                                   # [bq, d]
        k = k_ref[0]                                   # [bk, d]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) * scale        # [bq, bk]
        k_idx = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = k_idx >= true_s                          # padded keys
        if causal:
            q_idx = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            mask = mask | (k_idx > q_idx)
        s = jnp.where(mask, _NEG_INF, s)
        m_prev = m_ref[:]                               # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=_F32)
        m_ref[:] = m_new

    @pl.when(ki == n_kv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bq", "bk", "causal", "true_s", "interpret"))
def _flash_pallas(q, k, v, *, bq: int, bk: int, causal: bool, true_s: int,
                  interpret: bool):
    h, s, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    n_q = _cdiv(s, bq)
    n_kv = _cdiv(skv, bk)
    kernel = functools.partial(_flash_kernel, bq=bq, bk=bk, n_kv=n_kv,
                               scale=scale, causal=causal, true_s=true_s)
    return pl.pallas_call(
        kernel,
        grid=(h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda hh, qi, ki: (hh, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda hh, qi, ki: (hh, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda hh, qi, ki: (hh, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda hh, qi, ki: (hh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((h, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), _F32),      # running max
            pltpu.VMEM((bq, 1), _F32),      # running sum
            pltpu.VMEM((bq, d), _F32),      # accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * h * s * skv * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=h * s * skv,
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention(q, k, v, causal: bool = True, bq: int = 256,
                    bk: int = 512):
    """Pallas flash attention. Layout [S, H, D] (reference layout); GQA via
    head repeat. Pads S to block multiples."""
    s, hq, d = q.shape
    hk = k.shape[1]
    if hk != hq:
        k = jnp.repeat(k, hq // hk, axis=1)
        v = jnp.repeat(v, hq // hk, axis=1)
    bq = min(bq, max(128, 1 << (s - 1).bit_length()))
    bk = min(bk, max(128, 1 << (s - 1).bit_length()))
    sp = _cdiv(s, bq) * bq
    spk = _cdiv(s, bk) * bk
    qh = jnp.transpose(q, (1, 0, 2))
    kh = jnp.transpose(k, (1, 0, 2))
    vh = jnp.transpose(v, (1, 0, 2))
    if sp != s or spk != s:
        qh = jnp.pad(qh, ((0, 0), (0, sp - s), (0, 0)))
        kh = jnp.pad(kh, ((0, 0), (0, spk - s), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, spk - s), (0, 0)))
    out = _flash_pallas(qh, kh, vh, bq=bq, bk=bk, causal=causal, true_s=s,
                        interpret=interpret_mode())
    out = out[:, :s]
    return jnp.transpose(out, (1, 0, 2))


# ---------------------------------------------------------------------------
# Flash decoding (single query over fixed cache)
# ---------------------------------------------------------------------------

def _decode_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                   acc_ref, *, bk: int, n_kv: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ctx_len = len_ref[0]

    @pl.when(ki * bk < ctx_len)
    def _():
        q = q_ref[0]                                    # [1, d] padded to [8,d]
        k = k_ref[0]                                    # [bk, d]
        v = v_ref[0]
        d = q.shape[-1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) * (1.0 / math.sqrt(d))  # [8, bk]
        k_idx = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_idx >= ctx_len, _NEG_INF, s)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=_F32)
        m_ref[:] = m_new

    @pl.when(ki == n_kv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bk", "interpret"))
def _decode_pallas(q, k_cache, v_cache, ctx_len, *, bk: int, interpret: bool):
    h, qrows, d = q.shape
    max_len = k_cache.shape[1]
    n_kv = _cdiv(max_len, bk)
    kernel = functools.partial(_decode_kernel, bk=bk, n_kv=n_kv)
    return pl.pallas_call(
        kernel,
        grid=(h, n_kv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qrows, d), lambda hh, ki: (hh, 0, 0)),
            pl.BlockSpec((1, bk, d), lambda hh, ki: (hh, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda hh, ki: (hh, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, qrows, d), lambda hh, ki: (hh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, qrows, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((qrows, 1), _F32),
            pltpu.VMEM((qrows, 1), _F32),
            pltpu.VMEM((qrows, d), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray([ctx_len], jnp.int32), q, k_cache, v_cache)


def flash_decode(q, k_cache, v_cache, ctx_len, bk: int = 512):
    """Decode attention over a fixed cache: q [1, Hq, D], caches
    [MAX, Hk, D], ctx_len scalar. (reference: flash_decoding.cuh)."""
    _, hq, d = q.shape
    hk = k_cache.shape[1]
    if hk != hq:
        k_cache = jnp.repeat(k_cache, hq // hk, axis=1)
        v_cache = jnp.repeat(v_cache, hq // hk, axis=1)
    max_len = k_cache.shape[0]
    bk = min(bk, max_len)
    pad = _cdiv(max_len, bk) * bk - max_len
    kh = jnp.transpose(k_cache, (1, 0, 2))
    vh = jnp.transpose(v_cache, (1, 0, 2))
    if pad:
        kh = jnp.pad(kh, ((0, 0), (0, pad), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, pad), (0, 0)))
    # pad the single query row to the f32 sublane minimum (8)
    qh = jnp.transpose(q, (1, 0, 2))                    # [H, 1, D]
    qh = jnp.pad(qh, ((0, 0), (0, 7), (0, 0)))
    out = _decode_pallas(qh, kh, vh, jnp.int32(ctx_len), bk=bk,
                         interpret=interpret_mode())
    return jnp.transpose(out[:, :1], (1, 0, 2))         # [1, Hq, D]
