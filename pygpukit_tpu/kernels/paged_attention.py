"""Pallas paged attention with scalar-prefetched block tables.

TPU-native replacement for the reference's vLLM-style paged attention kernel
(reference: native/ops/attention/paged_attention.cuh:1-283; see PAPERS.md
"Ragged Paged Attention for TPU"). The defining trick: the per-sequence
block table is a *scalar-prefetch* argument, so each grid step's BlockSpec
``index_map`` reads ``table[b]`` to DMA exactly that sequence's next KV block
from the shared pool — no gather materialisation of the sequence's KV (the
XLA fallback in ops/paged.py builds a [max_blocks*bs, ...] gather first).

Decode-shaped: one query row per head (padded to the 8-row sublane minimum),
online-softmax accumulation over the sequence's blocks, masked beyond
ctx_len. GQA handled by grouped query rows per KV head.

The kernel reads pools in [NB, Hk, BS, D] layout so each DMA'd block is a
clean (BS, D) tile; the public wrapper accepts the framework-standard
[NB, BS, Hk, D] layout and transposes inside jit (serving integrations that
adopt the Pallas path should store pools pre-transposed).
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


def _paged_kernel(table_ref, len_ref, q_ref, k_ref, v_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, block_size: int, n_blocks: int,
                  scale: float):
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ctx_len = len_ref[0]

    @pl.when(bi * block_size < ctx_len)
    def _():
        q = q_ref[0]                                  # [rows, d]
        k2 = k_ref[0, 0]                              # [bs, d]
        v2 = v_ref[0, 0]
        # f32 inputs take the full-precision MXU pass; Mosaic rejects
        # HIGHEST on bf16 operands, so gate on dtype
        prec = (jax.lax.Precision.HIGHEST if q.dtype == _F32 else None)
        s = jax.lax.dot_general(
            q, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32, precision=prec) * scale  # [rows, bs]
        pos = bi * block_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(pos >= ctx_len, _NEG_INF, s)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=_F32, precision=prec)
        m_ref[:] = m_new

    @pl.when(bi == n_blocks - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_pallas(block_table, ctx_len, q, k_pool_t, v_pool_t, *,
                  interpret: bool):
    """q [Hk, rows, D]; pools [NB, Hk, BS, D]; block_table [max_blocks]."""
    hk, rows, d = q.shape
    _, _, block_size, _ = k_pool_t.shape
    n_blocks = block_table.shape[0]
    scale = 1.0 / math.sqrt(d)
    kernel = functools.partial(_paged_kernel, block_size=block_size,
                               n_blocks=n_blocks, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,        # block_table, ctx_len
        grid=(hk, n_blocks),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda h, b, tbl, ln: (h, 0, 0)),
            # THE trick: the DMA'd pool block is chosen by the prefetched
            # block table — tbl[b] picks the sequence's b-th physical block
            pl.BlockSpec((1, 1, block_size, d),
                         lambda h, b, tbl, ln: (tbl[b], h, 0, 0)),
            pl.BlockSpec((1, 1, block_size, d),
                         lambda h, b, tbl, ln: (tbl[b], h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, d), lambda h, b, tbl, ln: (h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows, 1), _F32),
            pltpu.VMEM((rows, 1), _F32),
            pltpu.VMEM((rows, d), _F32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hk, rows, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(block_table.astype(jnp.int32),
      jnp.asarray(ctx_len, jnp.int32).reshape(1),
      q, k_pool_t, v_pool_t)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_wrapped(q, k_pool, v_pool, block_table, ctx_len, *,
                   interpret: bool):
    hq, d = q.shape
    nb, bs, hk, _ = k_pool.shape
    g = hq // hk
    rows = max(8, g)                   # sublane minimum
    qg = q.reshape(hk, g, d)           # grouped queries per kv head
    if rows > g:
        qg = jnp.pad(qg, ((0, 0), (0, rows - g), (0, 0)))
    kt = k_pool.transpose(0, 2, 1, 3)  # [NB, Hk, BS, D]
    vt = v_pool.transpose(0, 2, 1, 3)
    out = _paged_pallas(block_table, ctx_len, qg, kt, vt,
                        interpret=interpret)
    return out[:, :g].reshape(hq, d)


def paged_attention(q, k_pool, v_pool, block_table, ctx_len):
    """Decode paged attention, Pallas scalar-prefetch version.

    q [Hq, D]; pools [NB, BS, Hk, D]; block_table [max_blocks] int32;
    ctx_len scalar. Returns [Hq, D]. Matches ops.paged.paged_attention_fn.
    """
    return _paged_wrapped(q, k_pool, v_pool, jnp.asarray(block_table),
                          jnp.asarray(ctx_len, jnp.int32),
                          interpret=interpret_mode())


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_wrapped_t(q, k_pool_t, v_pool_t, block_table, ctx_len, *,
                     interpret: bool):
    hq, d = q.shape
    nb, hk, bs, _ = k_pool_t.shape
    g = hq // hk
    rows = max(8, g)
    qg = q.reshape(hk, g, d)
    if rows > g:
        qg = jnp.pad(qg, ((0, 0), (0, rows - g), (0, 0)))
    out = _paged_pallas(block_table, ctx_len, qg, k_pool_t, v_pool_t,
                        interpret=interpret)
    return out[:, :g].reshape(hq, d)


def paged_attention_pools_t(q, k_pool_t, v_pool_t, block_table, ctx_len):
    """paged_attention for pools ALREADY stored [NB, Hk, BS, D] — the
    serving engine's layout (no per-call whole-pool transpose)."""
    return _paged_wrapped_t(q, k_pool_t, v_pool_t,
                            jnp.asarray(block_table),
                            jnp.asarray(ctx_len, jnp.int32),
                            interpret=interpret_mode())
