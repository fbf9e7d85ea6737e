"""Attention ops: causal SDPA, flash(chunked) attention, fixed-cache decode.

Reference surface: src/pygpukit/ops/nn/attention.py:16-90 (sdpa_causal,
sdpa_causal_fixed_cache*) backed by FA3/flash-decoding CUDA kernels
(native/ops/nn/attention/**). TPU-native design:

* prefill: chunked online-softmax attention expressed in XLA ``lax.scan`` —
  the flash-attention recurrence (running max + rescaled accumulator) with
  O(S·chunk) memory instead of O(S²); XLA fuses each chunk's QK^T, masking and
  PV into MXU-resident loops.
* decode: fixed-shape attention over a preallocated KV cache with a length
  mask — the flash-decoding analog; one compiled executable serves every
  context length (no "outside the graph" step like the reference's
  m1_graph.py:29-35 needed).

Layouts follow the reference: q/k/v are [seq, heads, head_dim]; GQA supported
via head-group broadcasting.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from ...core.array import Array
from .._common import apply_op

_F32 = jnp.float32
_NEG_INF = -1e30


def _gqa_expand(k, n_heads_q):
    """[S,Hk,D] -> [S,Hq,D] by repeating each kv head over its group."""
    n_kv = k.shape[-2]
    if n_kv == n_heads_q:
        return k
    rep = n_heads_q // n_kv
    return jnp.repeat(k, rep, axis=-2)


def _pf32(*arrs):
    """precision=HIGHEST when every operand is genuinely f32 (JAX's DEFAULT
    runs f32 dots through bf16 MXU passes on TPU). Gate on PRE-cast dtypes:
    bf16 inputs upcast for softmax stability carry only bf16 information,
    so DEFAULT costs them nothing."""
    if all(a.dtype == _F32 for a in arrs):
        from ...ops.matmul import _f32_precision
        return _f32_precision()
    return None


def _kv_load(blk):
    """Dequantise a cache block for attention math: fp8 storage (see
    ops/embedding.KV_FP8_MAX) reads as bf16 — the dot has no fp8 MXU to
    gain from, the halved HBM stream is the win. int8 dict blocks
    ({"q", "s"}, ops/embedding.kv_cache_zeros) dequantise against their
    per-row scales."""
    if isinstance(blk, dict):
        from ..embedding import kv_dequant
        return kv_dequant(blk["q"], blk["s"])
    from ..embedding import KV_FP8_MAX
    if jnp.dtype(blk.dtype) in KV_FP8_MAX:
        return blk.astype(jnp.bfloat16)
    return blk


def _kv_shape(cache):
    """Storage-leaf shape of a plain or int8-dict cache."""
    return (cache["q"] if isinstance(cache, dict) else cache).shape


def _pf32_kv(q, cache):
    """_pf32 against a cache that may be an int8 dict (never f32)."""
    return None if isinstance(cache, dict) else _pf32(q, cache)


def _apply_softcap(scores, softcap):
    """Gemma-2 attention logit soft-capping: cap*tanh(scores/cap)."""
    if softcap is None:
        return scores
    return softcap * jnp.tanh(scores * (1.0 / softcap))


def _window_or_inf(window):
    """Effective sliding window as a traced scalar: 0/None = unbounded."""
    if window is None:
        return None
    return jnp.where(jnp.asarray(window, jnp.int32) > 0,
                     jnp.asarray(window, jnp.int32), jnp.int32(1 << 30))


def sdpa_causal_fn(q, k, v, scale: float | None = None,
                   softcap: float | None = None, window=None):
    """Causal SDPA, [S,H,D] layout. f32 softmax accumulation.

    ``window``: optional sliding window (traced scalar; 0 = full) — query i
    attends keys j with i-window < j <= i. ``softcap``: Gemma-2 logit cap.
    """
    s, h, d = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    prec = _pf32(q, k)
    k = _gqa_expand(k, h)
    v = _gqa_expand(v, h)
    qh = jnp.transpose(q, (1, 0, 2)).astype(_F32)       # [H,S,D]
    kh = jnp.transpose(k, (1, 0, 2)).astype(_F32)
    vh = jnp.transpose(v, (1, 0, 2)).astype(_F32)
    scores = jnp.einsum("hqd,hkd->hqk", qh, kh, precision=prec) * scale
    scores = _apply_softcap(scores, softcap)
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    mask = j > i
    w = _window_or_inf(window)
    if w is not None:
        mask = mask | (j <= i - w)
    scores = jnp.where(mask, _NEG_INF, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hqk,hkd->hqd", probs, vh, precision=prec)
    return jnp.transpose(out, (1, 0, 2)).astype(q.dtype)


#: sequence length from which the Pallas flash kernel beats XLA chunked
#: flash for bf16 on v5e (measured: S=4096 15.9 vs 16.9 ms, S=8192 19.2 vs
#: 30.7 — the f32/short regime still favours XLA 13x, docs/performance.md)
PALLAS_FLASH_MIN_SEQ = 8192


def _attention_backend(q=None) -> str:
    """"" | "pallas" | "jax" — flash-attention backend: env-forced
    (reference pattern: PYGPUKIT_FA3 / PYGPUKIT_FLASH_ATTENTION gates,
    sdpa_causal.inl:37-126), else AUTO-selects the Pallas kernel in its
    measured winning regime (long-sequence bf16). PYGPUKIT_FLASH_ATTENTION=
    xla disables auto-selection."""
    import os
    from ...core.backend import get_backend
    mode = os.environ.get("PYGPUKIT_FLASH_ATTENTION", "")
    if get_backend().platform != "tpu":
        return ""
    if mode in ("pallas", "jax"):
        return mode
    if (mode != "xla" and q is not None and q.dtype == jnp.bfloat16
            and q.shape[0] >= PALLAS_FLASH_MIN_SEQ
            and q.shape[0] % 256 == 0 and q.shape[-1] % 128 == 0):
        return "pallas"
    return ""


def flash_attention_fn(q, k, v, scale: float | None = None,
                       chunk_size: int = 512, causal: bool = True,
                       softcap: float | None = None, window=None):
    """Online-softmax chunked attention (flash-attention recurrence in XLA).

    Memory O(S·chunk); numerically identical to full softmax (same f32
    accumulation, running-max rescaling — reference FA3 math,
    native/ops/nn/attention/fa3 online-softmax). ``softcap``/``window``
    (Gemma-2 semantics) route through the XLA path only — the Pallas
    kernels don't implement them.
    """
    s, h, d = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    backend = "" if (softcap is not None or window is not None) \
        else _attention_backend(q)
    if backend and scale == 1.0 / math.sqrt(d):
        if backend == "pallas":
            from ...kernels.flash_attention import flash_attention as _pfa
            return _pfa(q, k, v, causal=causal)
        # jax-shipped TPU flash kernel ([B,H,S,D] layout)
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as _jfa,
        )
        kq = _gqa_expand(k, h)
        vq = _gqa_expand(v, h)
        out = _jfa(jnp.transpose(q, (1, 0, 2))[None],
                   jnp.transpose(kq, (1, 0, 2))[None],
                   jnp.transpose(vq, (1, 0, 2))[None],
                   causal=causal, sm_scale=scale)
        return jnp.transpose(out[0], (1, 0, 2)).astype(q.dtype)
    k = _gqa_expand(k, h)
    v = _gqa_expand(v, h)
    if s <= chunk_size:
        if causal:
            return sdpa_causal_fn(q, k, v, scale, softcap=softcap,
                                  window=window)
        return _full_attn(q, k, v, scale)

    pad = (-s) % chunk_size
    sp = s + pad
    prec = _pf32(q, k)
    qh = jnp.transpose(q, (1, 0, 2)).astype(_F32)
    kh = jnp.pad(jnp.transpose(k, (1, 0, 2)).astype(_F32), ((0, 0), (0, pad), (0, 0)))
    vh = jnp.pad(jnp.transpose(v, (1, 0, 2)).astype(_F32), ((0, 0), (0, pad), (0, 0)))
    n_chunks = sp // chunk_size
    kc = kh.reshape(h, n_chunks, chunk_size, d).transpose(1, 0, 2, 3)
    vc = vh.reshape(h, n_chunks, chunk_size, d).transpose(1, 0, 2, 3)
    q_idx = jnp.arange(s)[None, :, None]                 # [1,S,1]

    w_eff = _window_or_inf(window)

    def body(carry, inp):
        m, l, acc = carry                                # [H,S,1], [H,S,1], [H,S,D]
        k_blk, v_blk, c_start = inp
        scores = jnp.einsum("hqd,hkd->hqk", qh, k_blk,
                            precision=prec) * scale
        scores = _apply_softcap(scores, softcap)
        kv_idx = c_start + jnp.arange(chunk_size)[None, None, :]
        mask = kv_idx >= s                                # padding
        if causal:
            mask = mask | (kv_idx > q_idx)
        if w_eff is not None:
            mask = mask | (kv_idx <= q_idx - w_eff)
        scores = jnp.where(mask, _NEG_INF, scores)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum("hqk,hkd->hqd", p, v_blk,
                                           precision=prec)
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((h, s, 1), _NEG_INF, _F32),
        jnp.zeros((h, s, 1), _F32),
        jnp.zeros((h, s, d), _F32),
    )
    starts = jnp.arange(n_chunks) * chunk_size
    (m, l, acc), _ = lax.scan(body, init, (kc, vc, starts))
    out = acc / jnp.maximum(l, 1e-30)
    return jnp.transpose(out, (1, 0, 2)).astype(q.dtype)


def _full_attn(q, k, v, scale):
    prec = _pf32(q, k)
    qh = jnp.transpose(q, (1, 0, 2)).astype(_F32)
    kh = jnp.transpose(k, (1, 0, 2)).astype(_F32)
    vh = jnp.transpose(v, (1, 0, 2)).astype(_F32)
    scores = jnp.einsum("hqd,hkd->hqk", qh, kh, precision=prec) * scale
    out = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, axis=-1), vh,
                     precision=prec)
    return jnp.transpose(out, (1, 0, 2)).astype(q.dtype)


#: cache size from which decode auto-switches to the kv-chunk LSE-combine
#: path (reference auto-enables flash decoding at kv_len>=1024,
#: flash_decoding.cuh:1-16 / sdpa_causal.inl:481-501; ours gates on the
#: CACHE capacity because that is what sets the full-softmax HBM read).
#: PYGPUKIT_FLASH_DECODING=full|chunked overrides the auto gate.
FLASH_DECODING_MIN_CACHE = 8192
FLASH_DECODING_CHUNK = 2048


#: trace-scoped decode-attention preference (mode, chunk) — set by the
#: batched serving engines' executable captures (see decode_pref): batch-8
#: serving at MAX=4096 measured full 1010 / chunked-512 1234 tok/s bf16
#: (fp8 665 / 820) because the chunked path reads+converts only live
#: chunks while the full softmax streams the whole preallocated pool.
_decode_pref: "contextvars.ContextVar[tuple[str, int] | None]" = None


def _get_pref():
    global _decode_pref
    if _decode_pref is None:
        import contextvars
        _decode_pref = contextvars.ContextVar("pygpukit_decode_pref",
                                              default=None)
    return _decode_pref


def decode_pref(mode: str, chunk: int | None = None):
    """Context manager: prefer a fixed-cache decode-attention backend
    ("full"/"chunked") and kv-chunk size for traces captured inside.
    Kernel/backend selection happens at Python trace time (same mechanism
    as model.batched_trace), so engines scope their chunk captures.
    PYGPUKIT_FLASH_DECODING[_CHUNK] env overrides still win."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        tok = _get_pref().set((mode, chunk))
        try:
            yield
        finally:
            _get_pref().reset(tok)
    return _cm()


def _decode_backend(max_len: int) -> str:
    import os
    mode = os.environ.get("PYGPUKIT_FLASH_DECODING", "")
    if mode in ("full", "chunked"):
        return mode
    pref = _get_pref().get()
    if pref is not None:
        return pref[0]
    return "chunked" if max_len >= FLASH_DECODING_MIN_CACHE else "full"


def _flash_chunk() -> int:
    """kv-chunk size for the LSE-combine decode path
    (PYGPUKIT_FLASH_DECODING_CHUNK overrides; the live-read granularity —
    smaller chunks track short live contexts in big caches more tightly
    at the cost of more loop iterations once contexts grow)."""
    import os
    env = os.environ.get("PYGPUKIT_FLASH_DECODING_CHUNK")
    if env:
        return int(env)
    pref = _get_pref().get()
    if pref is not None and pref[1]:
        return pref[1]
    return FLASH_DECODING_CHUNK


def sdpa_fixed_cache_fn(q, k_cache, v_cache, ctx_len,
                        scale: float | None = None,
                        softcap: float | None = None, window=None):
    """Decode attention over a fixed preallocated cache.

    q: [1,Hq,D] (or [T,Hq,D] for lookahead windows), caches [MAX,Hk,D],
    ctx_len: valid cache length (traced scalar — one executable serves all
    lengths; the flash-decoding analog, reference sdpa_causal.inl:481-501).
    Positions >= ctx_len are masked.

    Long caches (MAX >= FLASH_DECODING_MIN_CACHE) auto-route to the
    kv-chunk LSE-combine path, which only READS ceil(ctx/chunk) chunks —
    the full-softmax formulation streams the whole preallocated cache from
    HBM every step regardless of how much of it is valid.
    """
    if _decode_backend(_kv_shape(k_cache)[0]) == "chunked":
        return sdpa_fixed_cache_chunked_fn(q, k_cache, v_cache, ctx_len,
                                           scale, softcap=softcap,
                                           window=window)
    return _sdpa_fixed_cache_full(q, k_cache, v_cache, ctx_len, scale,
                                  softcap=softcap, window=window)


def _sdpa_fixed_cache_full(q, k_cache, v_cache, ctx_len,
                           scale: float | None = None,
                           softcap: float | None = None, window=None):
    if isinstance(k_cache, dict):      # int8: small-MAX path dequantises
        k_cache = _kv_load(k_cache)    # the whole (small) cache up front
        v_cache = _kv_load(v_cache)
    t, h, d = q.shape
    max_len, hk, _ = k_cache.shape
    g = h // hk
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    # grouped-query einsum: no GQA head materialisation and no f32 copy of
    # the cache — f32 accumulation happens inside the dot (this is the decode
    # hot loop; a cache-sized f32 temp per layer per step would dominate HBM
    # traffic at batch size > 1)
    qh = q.reshape(t, hk, g, d).transpose(1, 2, 0, 3)       # [Hk,G,T,D]
    kk = _kv_load(jnp.transpose(k_cache, (1, 0, 2)))         # [Hk,MAX,D]
    vv = _kv_load(jnp.transpose(v_cache, (1, 0, 2)))
    scores = jnp.einsum("hgtd,hkd->hgtk", qh, kk,
                        preferred_element_type=_F32,
                        precision=_pf32(q, k_cache)) * scale
    scores = _apply_softcap(scores, softcap)
    kv_idx = jnp.arange(max_len)[None, None, None, :]
    # query row i (0-based within the lookahead window) attends cache
    # positions < ctx_len - (t-1) + i
    q_off = jnp.arange(t)[None, None, :, None]
    limit = ctx_len - (t - 1) + q_off
    mask = kv_idx >= limit
    w_eff = _window_or_inf(window)
    if w_eff is not None:
        mask = mask | (kv_idx < limit - w_eff)
    scores = jnp.where(mask, _NEG_INF, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgtk,hkd->hgtd", probs.astype(vv.dtype), vv,
                     preferred_element_type=_F32,
                     precision=_pf32(q, v_cache))
    return out.transpose(2, 0, 1, 3).reshape(t, h, d).astype(q.dtype)


def sdpa_fixed_cache_chunked_fn(q, k_cache, v_cache, ctx_len,
                                scale: float | None = None,
                                chunk: int | None = None,
                                softcap: float | None = None, window=None):
    """kv-chunk LSE-combine decode (reference: flash_decoding.cuh — chunked
    partial softmax + log-sum-exp reduction, auto at kv_len>=1024).

    TPU formulation: a bounded ``lax.while_loop`` over cache chunks with the
    online-softmax recurrence. Unlike the full-softmax path (which streams
    the entire [MAX,Hk,D] cache every step) only ceil(ctx/chunk) chunks are
    ever read from HBM, so decode cost tracks the LIVE context, not the
    preallocated capacity — the TPU analog of the reference's win, where
    the parallelism came for free but the read didn't.
    """
    t, h, d = q.shape
    max_len, hk, _ = _kv_shape(k_cache)
    g = h // hk
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    chunk = min(chunk if chunk is not None else _flash_chunk(), max_len)
    prec_k = _pf32_kv(q, k_cache)
    prec_v = _pf32_kv(q, v_cache)
    n_chunks = -(-max_len // chunk)
    qh = q.reshape(t, hk, g, d).transpose(1, 2, 0, 3)        # [Hk,G,T,D]
    q_off = jnp.arange(t)[None, None, :, None]
    limit = ctx_len - (t - 1) + q_off                        # [1,1,T,1]
    w_eff = _window_or_inf(window)
    # with a sliding window, chunks wholly below the window's lower edge
    # contribute nothing — start the loop at the first live chunk
    lo = jnp.int32(0) if w_eff is None else jnp.maximum(
        jnp.int32(0), (ctx_len - t - w_eff + 1) // chunk)

    def cond(carry):
        i = carry[0]
        return (i * chunk < ctx_len) & (i < n_chunks)

    def body(carry):
        i, m, l, acc = carry
        start_log = i * chunk
        # dynamic_slice clamps near the end when chunk doesn't divide
        # max_len; slice from the clamped start and mask to the logical
        # [start_log, start_log+chunk) range so no position double-counts
        start = jnp.minimum(start_log, max_len - chunk)
        # slice the stored (possibly fp8/int8) block, THEN dequantise —
        # only live chunks ever stream from HBM or convert
        def _slice_c(cache):
            if isinstance(cache, dict):
                return {"q": lax.dynamic_slice(cache["q"], (start, 0, 0),
                                               (chunk, hk, d)),
                        "s": lax.dynamic_slice(cache["s"], (start,),
                                               (chunk,))}
            return lax.dynamic_slice(cache, (start, 0, 0), (chunk, hk, d))
        k_blk = _kv_load(_slice_c(k_cache))
        v_blk = _kv_load(_slice_c(v_cache))
        kk = jnp.transpose(k_blk, (1, 0, 2))                 # [Hk,C,D]
        vv = jnp.transpose(v_blk, (1, 0, 2))
        s = jnp.einsum("hgtd,hkd->hgtk", qh, kk,
                       preferred_element_type=_F32, precision=prec_k) * scale
        s = _apply_softcap(s, softcap)
        kv_idx = start + jnp.arange(chunk)[None, None, None, :]
        dead = (kv_idx >= limit) | (kv_idx < start_log)
        if w_eff is not None:
            dead = dead | (kv_idx < limit - w_eff)
        s = jnp.where(dead, _NEG_INF, s)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # explicit zero for dead slots: a chunk wholly dead for one query
        # row while that row's running max is still at init (-1e30) would
        # otherwise contribute exp(-1e30 - (-1e30)) = 1 per slot
        # (reachable with sliding windows when a row's window starts in a
        # later chunk than the loop's entry chunk)
        p = jnp.where(dead, 0.0, jnp.exp(s - m_new))
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "hgtk,hkd->hgtd", p.astype(vv.dtype), vv,
            preferred_element_type=_F32, precision=prec_v)
        return i + 1, m_new, l_new, acc_new

    init = (lo,
            jnp.full((hk, g, t, 1), _NEG_INF, _F32),
            jnp.zeros((hk, g, t, 1), _F32),
            jnp.zeros((hk, g, t, d), _F32))
    _, m, l, acc = lax.while_loop(cond, body, init)
    out = acc / jnp.maximum(l, 1e-30)
    return out.transpose(2, 0, 1, 3).reshape(t, h, d).astype(q.dtype)


def sdpa_batch_fixed_cache_fn(q, k_cache, v_cache, ctx_lens,
                              scale: float | None = None,
                              softcap: float | None = None, window=None):
    """Batched decode: q [B,1,Hq,D], caches [B,MAX,Hk,D], ctx_lens [B].

    Routes to the natively-batched chunk loop when the chunked backend is
    selected: ``vmap`` of the per-slot while loop batches the chunk index,
    so every slot's cache slice lowers to a GATHER (device-traced at
    MAX=4096 batch-8: 63 GB/s bf16 / ~14 GB/s fp8 — the dominant serving
    fusion). The batched form advances ONE shared scalar chunk index, so
    the reads stay contiguous dynamic slices at stream rate.
    """
    if _decode_backend(_kv_shape(k_cache)[1]) == "chunked":
        return sdpa_batch_fixed_cache_chunked_fn(
            q, k_cache, v_cache, ctx_lens, scale, softcap=softcap,
            window=window)
    def one(qq, kk, vv, cl):
        return sdpa_fixed_cache_fn(qq, kk, vv, cl, scale, softcap=softcap,
                                   window=window)
    return jax.vmap(one, in_axes=(0, 0, 0, 0))(q, k_cache, v_cache, ctx_lens)


def sdpa_batch_pools_fn(q, k_pool, v_pool, layer, ctx_lens,
                        scale: float | None = None,
                        softcap: float | None = None, window=None):
    """Batched decode attention reading layer ``layer`` of the FULL
    [B, L, MAX, Hk, D] pools (the batch-rows serving step's form).
    MERGED pools [B, L, MAX, Hk*D] are accepted too (ndim-detected): the
    layer slice un-merges AFTER slicing, so the un-merge relayout is
    layer-sized, never pool-sized.

    Returns ``(attn, k_pool, v_pool)`` — the pools threaded THROUGH the
    chunk while-loop as explicit carry. The caller's layer loop must carry
    the RETURNED pools: returning the pre-attention values keeps them live
    across the while loop, and XLA copy-insertion then duplicates both
    full pools at every layer's loop entry (device-traced: 2x738 MB
    copies/layer = 74 ms/step at batch-8 MAX=4096 on a 1B model — 11x the
    whole rest of the step). The layer slice likewise rides INTO the loop
    body — slicing the pool carry outside it materialises a [B,MAX,Hk,D]
    copy per layer.
    """
    if _decode_backend(_kv_shape(k_pool)[2]) == "chunked":
        return sdpa_batch_fixed_cache_chunked_fn(
            q, k_pool, v_pool, ctx_lens, scale, softcap=softcap,
            window=window, layer=layer, return_caches=True)

    def one(qq, kp_b, vp_b, cl):
        def _lyr(p):
            return jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(a, layer, 0,
                                                   keepdims=False), p)
        kb, vb = _lyr(kp_b), _lyr(vp_b)
        if isinstance(kb, dict):             # int8: dequant the layer slice
            kb, vb = _kv_load(kb), _kv_load(vb)
        if kb.ndim == 2:                         # merged slot [MAX, Hk*D]
            d = qq.shape[-1]
            kb = kb.reshape(kb.shape[0], -1, d)
            vb = vb.reshape(vb.shape[0], -1, d)
        return sdpa_fixed_cache_fn(qq, kb, vb, cl, scale, softcap=softcap,
                                   window=window)
    attn = jax.vmap(one, in_axes=(0, 0, 0, 0))(q, k_pool, v_pool, ctx_lens)
    return attn, k_pool, v_pool


def sdpa_batch_fixed_cache_chunked_fn(q, k_cache, v_cache, ctx_lens,
                                      scale: float | None = None,
                                      chunk: int | None = None,
                                      softcap: float | None = None,
                                      window=None, layer=None,
                                      return_caches: bool = False):
    """kv-chunk LSE decode over a BATCH of caches with one shared chunk
    cursor (reference flash_decoding.cuh semantics, batched).

    q: [B,T,Hq,D], caches: [B,MAX,Hk,D], ctx_lens: [B]. The while loop
    runs to ``max(ctx_lens)`` — every slot reads the same [*, start:start+C]
    window (a contiguous dynamic slice; per-slot starts would gather), and
    per-slot masking zeroes positions beyond each slot's context. Dead
    bytes read for short slots are bounded by the batch's ctx spread, not
    the pool capacity.

    ``layer``: optional traced layer index — caches are then the FULL
    [B, L, MAX, Hk, D] pools and the (layer, chunk) slice happens INSIDE
    the loop body. Slicing the layer outside would feed the while loop a
    materialised copy of a just-updated pool carry (measured: 8x8x22
    slices of a 738 MB pool = ~91 ms/step at batch-8 MAX=4096). MERGED
    pools [B, L, MAX, Hk*D] (the batch-rows serving layout — minor dims
    pre-merged so the Pallas kernel's operand view is free) are detected
    by ndim; the per-chunk block un-merges after the slice (chunk-sized,
    not pool-sized).

    ``return_caches``: return ``(out, k_cache, v_cache)`` with the caches
    threaded through the while loop as explicit carry. A caller whose own
    loop carries the caches MUST take these outputs: keeping the pre-call
    values live across the while loop makes XLA copy-insertion duplicate
    both full caches at loop entry (2x738 MB/layer = 74 ms/step measured).
    """
    bsz, t, h, d = q.shape
    kshape = _kv_shape(k_cache)
    merged = layer is not None and len(kshape) == 4     # [B,L,MAX,Hk*D]
    if merged:
        max_len, hk = kshape[2], kshape[3] // d
    else:
        max_len, hk = kshape[-3], kshape[-2]
    g = h // hk
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    chunk = min(chunk if chunk is not None else _flash_chunk(), max_len)
    prec_k = _pf32_kv(q, k_cache)
    prec_v = _pf32_kv(q, v_cache)
    n_chunks = -(-max_len // chunk)
    qh = q.reshape(bsz, t, hk, g, d).transpose(0, 2, 3, 1, 4)  # [B,Hk,G,T,D]
    q_off = jnp.arange(t)[None, None, None, :, None]
    limit = (ctx_lens[:, None, None, None, None] - (t - 1) + q_off)
    ctx_max = jnp.max(ctx_lens)
    w_eff = _window_or_inf(window)
    lo = jnp.int32(0) if w_eff is None else jnp.maximum(
        jnp.int32(0), (jnp.min(ctx_lens) - t - w_eff + 1) // chunk)

    def _blk_q(cache, start):
        if layer is None:
            return lax.dynamic_slice(cache, (0, start, 0, 0),
                                     (bsz, chunk, hk, d))
        if merged:
            blk = lax.dynamic_slice(cache, (0, layer, start, 0),
                                    (bsz, 1, chunk, hk * d))
            return blk.reshape(bsz, chunk, hk, d)
        blk = lax.dynamic_slice(cache, (0, layer, start, 0, 0),
                                (bsz, 1, chunk, hk, d))
        return blk.reshape(bsz, chunk, hk, d)

    def _blk(cache, start):
        if not isinstance(cache, dict):
            return _blk_q(cache, start)
        if layer is None:                 # s [B, MAX]
            s_blk = lax.dynamic_slice(cache["s"], (0, start), (bsz, chunk))
        else:                             # s [B, L, MAX]
            s_blk = lax.dynamic_slice(cache["s"], (0, layer, start),
                                      (bsz, 1, chunk)).reshape(bsz, chunk)
        return {"q": _blk_q(cache["q"], start), "s": s_blk}

    def cond(carry):
        i = carry[0]
        return (i * chunk < ctx_max) & (i < n_chunks)

    def body(carry):
        i, m, l, acc, kc, vc = carry
        start_log = i * chunk
        start = jnp.minimum(start_log, max_len - chunk)
        # contract straight on the block's stored [B,C,Hk,D] order — an
        # explicit transpose here makes XLA layout assignment re-lay the
        # WHOLE pool for the loop (6 pool-sized layout-conversion copies,
        # 2 per layer per step, device-traced at 74 ms/step)
        kk = _kv_load(_blk(kc, start))                        # [B,C,Hk,D]
        vv = _kv_load(_blk(vc, start))
        s = jnp.einsum("bhgtd,bkhd->bhgtk", qh, kk,
                       preferred_element_type=_F32, precision=prec_k) * scale
        s = _apply_softcap(s, softcap)
        kv_idx = start + jnp.arange(chunk)[None, None, None, None, :]
        dead = (kv_idx >= limit) | (kv_idx < start_log)
        if w_eff is not None:
            dead = dead | (kv_idx < limit - w_eff)
        s = jnp.where(dead, _NEG_INF, s)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(dead, 0.0, jnp.exp(s - m_new))
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhgtk,bkhd->bhgtd", p.astype(vv.dtype), vv,
            preferred_element_type=_F32, precision=prec_v)
        return i + 1, m_new, l_new, acc_new, kc, vc

    init = (lo,
            jnp.full((bsz, hk, g, t, 1), _NEG_INF, _F32),
            jnp.zeros((bsz, hk, g, t, 1), _F32),
            jnp.zeros((bsz, hk, g, t, d), _F32),
            k_cache, v_cache)
    _, m, l, acc, k_cache, v_cache = lax.while_loop(cond, body, init)
    out = acc / jnp.maximum(l, 1e-30)
    out = out.transpose(0, 3, 1, 2, 4).reshape(bsz, t, h, d).astype(q.dtype)
    if return_caches:
        return out, k_cache, v_cache
    return out


# ---------------------------------------------------------------------------
# Array-facing wrappers (reference: ops/nn/attention.py:16)
# ---------------------------------------------------------------------------

def sdpa_causal(q, k, v, scale: float | None = None, *,
                out: Array | None = None) -> Array:
    return apply_op(functools.partial(sdpa_causal_fn, scale=scale), q, k, v, out=out)


def flash_attention(q, k, v, scale: float | None = None, chunk_size: int = 512,
                    *, out: Array | None = None) -> Array:
    return apply_op(
        functools.partial(flash_attention_fn, scale=scale, chunk_size=chunk_size),
        q, k, v, out=out)


def sdpa_causal_fixed_cache(q, k_cache, v_cache, ctx_len: int,
                            scale: float | None = None, *,
                            out: Array | None = None) -> Array:
    return apply_op(
        lambda a, b, c: sdpa_fixed_cache_fn(a, b, c, jnp.int32(ctx_len), scale),
        q, k_cache, v_cache, out=out)
