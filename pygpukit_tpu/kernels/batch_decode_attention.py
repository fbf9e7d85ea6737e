"""Pallas batched decode attention over the dense serving pools.

The batch-rows serving step (llm/model.batch_decode_step_fn) needs decode
attention for all B slots against layer ``layer`` of the FULL
[B, L, MAX, Hk, D] KV pools. Every XLA formulation loses:

- ``vmap`` of the per-slot chunk loop batches the chunk cursor, turning
  each cache slice into a gather (device-traced at batch-8 MAX=4096 on a
  1B model: 63 GB/s bf16, ~14 GB/s with an fp8-stored pool because the
  fp8->bf16 convert materialises — the top serving fusion either way).
- a natively-batched ``lax.while_loop`` with one shared scalar cursor
  reads contiguous slices, but XLA layout assignment gives the loop's
  pool carry a different layout from the surrounding dynamic-update
  writes and inserts full-pool conversion copies (2x738 MB per LAYER per
  step, device-traced at 74 ms/step — 11x the rest of the step).

A ``pallas_call`` sidesteps both: operands keep the pools' natural layout,
the grid replaces the loop (no copy-insertion), each chunk arrives as ONE
contiguous DMA, and fp8 pools convert in-kernel — only live chunk bytes
ever stream or convert (the capacity rung finally pays off at batch,
reference sdpa fp8 variant: src/pygpukit/ops/nn/attention.py:16-90;
chunked decode: native/ops/attention/flash_decoding.cuh).

Mechanics (see kernels/paged_attention.py for the scalar-prefetch pattern):

- pools are viewed as [B, L, MAX, Hk*D] (a free minor-dims merge), so a
  chunk block (1, 1, C, Hk*D) is one contiguous C*Hk*D*itemsize DMA AND a
  full-lane-width VMEM tile (Hk*D >= 256 on real configs; blocking
  [C, Hk, D] would land D=64 on the 128-lane axis, half-wasting every
  load, convert, and DMA row).
- grid = (B, MAX//C); the layer index, per-slot context lengths, and the
  per-layer sliding window ride as scalar prefetch. Dead chunks (beyond a
  slot's live context) clamp their index_map to the slot's last live
  block: consecutive grid steps that map to the same block skip the DMA,
  so dead capacity costs neither bandwidth nor conversion.
- queries ride as zero-padded rows over the SAME merged axis: row r
  (query head h = r // G... grouped h-major) carries q[h] in lanes
  [kv(h)*D, kv(h)*D+D) and zeros elsewhere, so the chunk dot
  q_pad [R, Hk*D] @ k_blk.T [Hk*D, C] computes every head's scores
  against exactly its own kv head — no cross-head terms to mask, one
  MXU-friendly dot per chunk. The weighted-value dot accumulates
  [R, Hk*D] and the caller extracts each row's D-slice (block-diagonal)
  outside the kernel.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.backend import interpret_mode

_F32 = jnp.float32
_NEG_INF = -1e30
_FP8 = (jnp.float8_e4m3fn, jnp.float8_e5m2)


def _select_row(mat, idx):
    """Row ``idx`` of a [L, C] VMEM tile as [1, C] f32, via masked
    reduction (Mosaic rejects dynamic sublane indexing unless the index is
    provably 8-aligned). Twin of kv_row_write._row_of (dtype-widening
    variant) — a Mosaic legality fix to either must be mirrored in the
    other."""
    sel = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 0) == idx
    return jnp.sum(jnp.where(sel, mat.astype(_F32), 0.0), axis=0,
                   keepdims=True)


def _bda_kernel(layer_ref, lens_ref, win_ref, q_ref, k_ref, v_ref, *rest,
                chunk: int, n_chunks: int, scale: float,
                softcap: float | None, kv_fp8=None, int8: bool = False):
    if int8:              # per-row-scale int8 pools: two extra scale refs
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    ci = pl.program_id(1)
    lyr = layer_ref[0]

    @pl.when(ci == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ctx = lens_ref[b]

    @pl.when(ci * chunk < ctx)
    def _():
        q = q_ref[0]                                   # [R, Hk*D] zero-padded
        k2 = k_ref[0, 0]                               # [C, Hk*D]
        v2 = v_ref[0, 0]
        if kv_fp8 is not None:        # u8-DMA probe: bitcast back to fp8
            k2 = jax.lax.bitcast_convert_type(k2, kv_fp8)
            v2 = jax.lax.bitcast_convert_type(v2, kv_fp8)
        if k2.dtype in _FP8 or k2.dtype == jnp.int8:
            k2 = k2.astype(jnp.bfloat16)    # int8->bf16 runs at stream rate
            v2 = v2.astype(jnp.bfloat16)    # (fp8's convert is the 2x tax)
        prec = jax.lax.Precision.HIGHEST if q.dtype == _F32 else None
        # zero lanes outside each row's kv-head block make this exactly
        # the per-head score — no cross-head masking needed
        s = jax.lax.dot_general(
            q, k2.astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=_F32, precision=prec) * scale  # [R, C]
        if int8:
            # k row scales fold into the score COLUMNS (C scales vs
            # C*lanes dequant multiplies). The scale block rides full-L
            # (Mosaic requires the block's second-to-last dim 8-divisible
            # or full — (1,1,C) on an [B,L,MAX] array is rejected), and the
            # layer row comes out via a masked sublane REDUCTION: a dynamic
            # sublane index must be provably 8-aligned ("cannot statically
            # prove that index in dimension 1 is a multiple of 8"), but
            # iota==lyr -> multiply -> sum over L is plain VPU work on a
            # [L, C] tile (~11k elems/call, noise).
            s = s * _select_row(ks_ref[0], lyr)            # [R,C] * [1,C]
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        pos = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        win = win_ref[0]
        lo = jnp.where(win > 0, ctx - win, jnp.int32(-(2 ** 30)))
        dead = (pos >= ctx) | (pos < lo)
        s = jnp.where(dead, _NEG_INF, s)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        # explicit zero for dead slots: rows whose running max is still at
        # init would otherwise contribute exp(-1e30 - (-1e30)) = 1 each
        p = jnp.where(dead, 0.0, jnp.exp(s - m_new))
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if int8:
            # fold v row scales into P (C multiplies vs C*lanes dequant)
            p = p * _select_row(vs_ref[0], lyr)
        # P@V operands follow q.dtype like the score dot: an f32 query over
        # a bf16/fp8 pool would otherwise pair HIGHEST with bf16 operands,
        # which Mosaic rejects
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(q.dtype), v2.astype(q.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=_F32, precision=prec)   # [R, Hk*D]
        m_ref[:] = m_new

    @pl.when(ci == n_chunks - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
                    ).astype(o_ref.dtype)


def batch_decode_attention(q, k_pool, v_pool, layer, ctx_lens,
                           scale: float | None = None, chunk: int = 512,
                           softcap: float | None = None, window=None):
    """Batched decode attention over dense pools, Pallas version.

    q [B, 1, Hq, D]; pools [B, L, MAX, Hk, D] — or PRE-MERGED
    [B, L, MAX, Hk*D] (ndim-detected), the batch-rows serving layout. The
    merged form is the fast path: merging here instead costs XLA two
    layout-converting FULL-POOL copies per pool per layer (device-traced
    at batch-8 MAX=4096: 4x~1.4 ms/layer = 122 ms/step — the 5-d carry's
    (Hk, D) tiling orders elements differently from the kernel's row-major
    [MAX, Hk*D] operand view, so the reshape is a relayout, not a bitcast).
    Storage bf16/f32, fp8 (converts in-kernel, chunk-at-a-time), or int8
    dicts ``{"q": int8 pool, "s": bf16 [B, L, MAX] row scales}`` — int8 is
    the FAST capacity rung: the int8->bf16 convert runs at stream rate
    where fp8's costs 2x the kernel (micro_bda_u8dma.py), and the row
    scales fold into the score columns / the P matrix (C multiplies per
    chunk, not C*lanes). layer: traced int32 scalar; ctx_lens [B] int32
    (lengths INCLUDING the just-written row); window: optional traced
    int32 scalar (<=0 or None = no sliding window).
    Returns [B, 1, Hq, D] matching ops.nn.attention.sdpa_batch_pools_fn.

    Requires chunk | MAX (callers fall back to the XLA path otherwise).
    Sliding-window models still DMA chunks below the window's lower edge
    (the index clamp only tracks the context tail); acceptable because
    window models cap live context at the window anyway.
    """
    bsz, t, hq, d = q.shape
    int8 = isinstance(k_pool, dict)           # {"q" int8, "s" bf16 [B,L,MAX]}
    ks = vs = None
    if int8:
        k_pool, ks = k_pool["q"], k_pool["s"]
        v_pool, vs = v_pool["q"], v_pool["s"]
    if k_pool.ndim == 4:                      # pre-merged [B, L, MAX, Hk*D]
        _, n_layers, max_len, _lanes = k_pool.shape
        hk = _lanes // d
    else:
        _, n_layers, max_len, hk, _ = k_pool.shape
    chunk = min(chunk, max_len)
    if t != 1 or max_len % chunk or hq % hk:
        raise ValueError("batch_decode_attention: unsupported shape")
    g = hq // hk
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    n_chunks = max_len // chunk
    rows = max(8, hq)
    lanes = hk * d
    # zero-padded query rows: row h*G+gi carries q[:, h*G+gi] in lanes
    # [h*D, h*D+D) — einsum against a 0/1 head-selection matrix (a gather
    # would materialise; this is a tiny one-time dot)
    qr = q.reshape(bsz, hq, d)
    sel = (jnp.arange(hq)[:, None] // g == jnp.arange(hk)[None, :]
           ).astype(q.dtype)                                   # [Hq, Hk]
    qp = jnp.einsum("bhd,hk->bhkd", qr, sel).reshape(bsz, hq, lanes)
    if rows > hq:
        qp = jnp.pad(qp, ((0, 0), (0, rows - hq), (0, 0)))
    if k_pool.ndim == 4:
        kpm, vpm = k_pool, v_pool             # already merged: no relayout
    else:
        # logically free minor-dims merge — but on a pool CARRY whose 5-d
        # layout tiles (Hk, D), XLA lowers this as full-pool relayout
        # copies per call; serve merged pools (see docstring) on hot paths
        kpm = k_pool.reshape(bsz, n_layers, max_len, lanes)
        vpm = v_pool.reshape(bsz, n_layers, max_len, lanes)
    win = (jnp.asarray(0, jnp.int32) if window is None
           else jnp.asarray(window, jnp.int32))
    # PYGPUKIT_BDA_U8DMA=1: DMA fp8 pools as uint8 bitcasts and bitcast
    # back in-kernel — isolates whether the fp8 chunk cost is the DMA's
    # dtype handling (this would fix it) or the fp8->bf16 VPU convert
    # (this changes nothing). Probe flag, not a production path.
    kv_fp8 = None
    if kpm.dtype in _FP8 and os.environ.get("PYGPUKIT_BDA_U8DMA") == "1":
        kv_fp8 = kpm.dtype
        kpm = jax.lax.bitcast_convert_type(kpm, jnp.uint8)
        vpm = jax.lax.bitcast_convert_type(vpm, jnp.uint8)
    kernel = functools.partial(
        _bda_kernel, chunk=chunk, n_chunks=n_chunks, scale=scale,
        softcap=softcap, kv_fp8=kv_fp8, int8=int8)

    def _pool_map(b, ci, lyr, lens, w):
        live_last = jnp.maximum((lens[b] + chunk - 1) // chunk - 1, 0)
        return (b, lyr[0], jnp.minimum(ci, live_last), 0)

    def _scale_map(b, ci, lyr, lens, w):
        # full-L block (second-to-last dim must be 8-divisible or full);
        # the kernel selects the layer row via the prefetched scalar
        live_last = jnp.maximum((lens[b] + chunk - 1) // chunk - 1, 0)
        return (b, 0, jnp.minimum(ci, live_last))

    in_specs = [
        pl.BlockSpec((1, rows, lanes),
                     lambda b, ci, lyr, lens, w: (b, 0, 0)),
        pl.BlockSpec((1, 1, chunk, lanes), _pool_map),
        pl.BlockSpec((1, 1, chunk, lanes), _pool_map),
    ]
    operands = [qp, kpm, vpm]
    if int8:
        in_specs += [pl.BlockSpec((1, n_layers, chunk), _scale_map),
                     pl.BlockSpec((1, n_layers, chunk), _scale_map)]
        operands += [ks, vs]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,            # layer, ctx_lens, window
        grid=(bsz, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, lanes),
                               lambda b, ci, lyr, lens, w: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows, 1), _F32),
            pltpu.VMEM((rows, 1), _F32),
            pltpu.VMEM((rows, lanes), _F32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, rows, lanes), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret_mode(),
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(ctx_lens, jnp.int32),
      win.reshape(1),
      *operands)
    # block-diagonal extract: row h*G+gi's result lives in its kv head's
    # D-lane block
    o4 = out[:, :hq].reshape(bsz, hk, g, hk, d)
    idx = jnp.arange(hk)
    return o4[:, idx, :, idx].transpose(1, 0, 2, 3).reshape(
        bsz, 1, hq, d)
