"""Paged-KV serving path: block-pool caches + per-slot block tables for the
continuous-batching engine.

Reference: native/ops/attention/paged_attention.cuh:1-283 (vLLM-style block
tables + reshape_and_cache — shipped but never wired into the reference's
model; wiring it into a live serving engine is where this rebuild goes past
the reference) and PAPERS.md "Ragged Paged Attention for TPU".

Design:
- ONE shared pool per cache side, stored pre-transposed
  ``[L, NB, Hk, BS, D]`` (the layout the Pallas scalar-prefetch kernel
  consumes — no per-step transposes on the opt-in fast path).
- Block 0 is the TRASH block: dead slots' tables point at it, so their
  clamped decode writes land in a sacrificial block instead of corrupting
  blocks that were freed and re-allocated to live requests.
- HBM scales with #allocated blocks, not max_batch * max_seq_len: the
  dense engine pins B*L*MAX rows; the pool pins NB*BS rows total.
- All shapes static: the serve-chunk executable is one donated program
  (same chunked, device-resident-sampling design as the dense path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .config import TransformerConfig
from .model import (_attn_in, _logits, _mlp, _norm, _out_proj,
                    _project_qkv, _residual_tail, _slice_layer_params)
from ..ops.embedding import to_kv_dtype
from ..ops.nn.rope import apply_rope_fn

_F32 = jnp.float32


def _use_pallas_paged() -> bool:
    import os
    from ..core.backend import get_backend
    return (os.environ.get("PYGPUKIT_PAGED_ATTENTION", "") == "pallas"
            and get_backend().platform == "tpu")


# ------------------------------------------------------------------ compute --

def _paged_gather(pool_l, table):
    """Gather a sequence's blocks from one layer's pool as [Hk, MB*BS, D].

    int8 dict pools ({"q": [NB,Hk,BS,D], "s": [NB,BS] per-row scales})
    gather both leaves and dequantise the gathered (live-only) blocks —
    the scale sits between the gather and the dot, so only table-selected
    bytes ever convert."""
    from ..ops.nn.attention import _kv_load
    if isinstance(pool_l, dict):
        qg = pool_l["q"][table]                       # [MB, Hk, BS, D]
        sg = pool_l["s"][table]                       # [MB, BS]
        seq = qg.astype(jnp.bfloat16) * sg[:, None, :, None]
    else:
        seq = _kv_load(pool_l[table])
    mb, hk, bs, d = seq.shape
    return seq.transpose(1, 0, 2, 3).reshape(hk, mb * bs, d)


def _paged_attn_one(q, k_pool_l, v_pool_l, table, ctx_len, scale,
                    softcap=None, window=None):
    """q [Hq, D]; pools [NB, Hk, BS, D] (or int8 dicts); table [MB] ->
    [Hq, D].

    ``window``: per-layer sliding window (traced scalar, 0 = full) — the
    decode query at position ctx_len-1 attends keys in
    [ctx_len - window, ctx_len). ``softcap``: gemma-2 logit cap. Both
    mirror the dense sdpa_fixed_cache_fn semantics."""
    hq, d = q.shape
    from ..ops.nn.attention import _apply_softcap, _window_or_inf
    kseq = _paged_gather(k_pool_l, table)
    vseq = _paged_gather(v_pool_l, table)
    hk = kseq.shape[0]
    g = hq // hk
    mb = table.shape[0]
    bs = kseq.shape[1] // mb
    qh = q.reshape(hk, g, d)
    scores = jnp.einsum("hgd,hkd->hgk", qh, kseq,
                        preferred_element_type=_F32) * scale
    scores = _apply_softcap(scores, softcap)
    idx = jnp.arange(mb * bs)[None, None, :]
    mask = idx < ctx_len
    w = _window_or_inf(window)
    if w is not None:
        mask = mask & (idx >= ctx_len - w)
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("hgk,hkd->hgd", p, vseq.astype(_F32),
                   preferred_element_type=_F32)
    return o.reshape(hq, d).astype(q.dtype)


def _paged_write_rows(pool, rows, layer, blocks, offs, valid=None):
    """Scatter per-position KV ``rows`` [N, Hk, D] into layer ``layer`` at
    (blocks[n], offs[n]). int8 dict pools quantize each row (amax over its
    heads) and scatter both leaves; ``valid`` masks padded prefill rows to
    zero (they land in the trash block)."""
    if isinstance(pool, dict):
        from ..ops.embedding import kv_quant_rows
        q, s = kv_quant_rows(rows, 2)                        # [N,Hk,D], [N]
        if valid is not None:
            q = jnp.where(valid[:, None, None], q, 0)
            s = jnp.where(valid, s, 0)
        return {"q": pool["q"].at[layer, blocks, :, offs, :].set(q),
                "s": pool["s"].at[layer, blocks, offs].set(s)}
    if valid is not None:
        rows = jnp.where(valid[:, None, None], rows, 0)
    return pool.at[layer, blocks, :, offs, :].set(
        to_kv_dtype(rows, pool.dtype))


def paged_decode_step_fn(cfg: TransformerConfig, params, k_pool, v_pool,
                         tables, tokens, poss):
    """One batched decode step over the shared paged pool.

    k_pool/v_pool [L, NB, Hk, BS, D] (int8: dicts with [L, NB, BS] scale
    rows); tables [B, MB] int32; tokens [B];
    poss [B] -> (k_pool, v_pool, logits [B, V]).
    """
    from ..ops.embedding import kv_leaf
    bs = kv_leaf(k_pool).shape[3]
    scale = cfg.attn_scale
    b = tokens.shape[0]
    from .model import _embed_tokens
    h = _embed_tokens(cfg, params, tokens)                   # [B, E]
    rope_cos = params.get("rope_cos")
    rope_sin = params.get("rope_sin")
    blocks = tables[jnp.arange(b), poss // bs]               # [B]
    offs = poss % bs

    # fori_loop carrying the pools — in-place block writes; scan ys forced
    # a full 2x pool copy per step (see llm/model.decode_step_fn).
    # _slice_layer_params keeps packed-int4 dicts STACKED with the layer
    # index: this step feeds real [B, E] rows to _mm (it is never vmapped
    # over slots), so the stacked Pallas w4a8 GEMV carries all slot rows in
    # ONE kernel call — the batch-rows rung riding the paged pool
    # (VERDICT r4 #1: paged capacity + int4 throughput in one config).
    def body(i, st):
        h, kp, vp = st
        lp = _slice_layer_params(params["layers"], i)
        x = _attn_in(cfg, lp, h)
        q, k, v = _project_qkv(cfg, lp, x)                   # [B, H*, D]
        if cfg.use_rope:
            q = _rope_rows(q, rope_cos, rope_sin, poss, params, cfg, lp)
            k = _rope_rows(k, rope_cos, rope_sin, poss, params, cfg, lp)
        kp = _paged_write_rows(kp, k, i, blocks, offs)
        vp = _paged_write_rows(vp, v, i, blocks, offs)
        kp_l = jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False), kp)
        vp_l = jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False), vp)
        if (_use_pallas_paged() and not isinstance(kp_l, dict)
                and kp_l.dtype == jnp.bfloat16
                and cfg.attn_logit_softcap is None
                and cfg.sliding_window is None):
            # (fp8 pools, softcaps and sliding windows take the XLA gather
            # path — the Pallas kernel reads raw bf16 blocks and never
            # learned those semantics)
            # scalar-prefetch Pallas kernel (PYGPUKIT_PAGED_ATTENTION=pallas):
            # per-slot calls — the kernel's block-table prefetch DMAs only
            # the sequence's blocks, never a gathered max_seq copy
            from ..kernels.paged_attention import paged_attention_pools_t
            attn = jnp.stack([
                paged_attention_pools_t(q[b_], kp_l, vp_l, tables[b_],
                                        poss[b_] + 1)
                for b_ in range(b)])                          # [B, Hq, D]
        else:
            attn = jax.vmap(
                _paged_attn_one,
                in_axes=(0, None, None, 0, 0, None, None, None))(
                q, kp_l, vp_l, tables, poss + 1, scale,
                cfg.attn_logit_softcap,
                lp.get("attn_window"))                        # [B, Hq, D]
        h = _residual_tail(cfg, lp, h, attn.reshape(b, -1), b, x)
        return (h, kp, vp)

    h, k_pool, v_pool = lax.fori_loop(0, cfg.num_layers, body,
                                      (h, k_pool, v_pool))
    h = _norm(cfg, h, params["final_norm_w"], params.get("final_norm_b"))
    return k_pool, v_pool, _logits(cfg, params, h)


def _rope_rows(x, cos, sin, poss, params=None, cfg=None, lp=None):
    """x [B, Hx, D] roped at per-row positions poss [B]. LongRoPE models
    (params carries rope_cos_long) select factor tables per row by each
    sequence's own length (model.py _rope_rows_for semantics); gemma3
    sliding layers (lp carries use_local_rope) take the LOCAL theta
    tables (model.py _layer_rope semantics)."""
    from .model import _rope
    c = cos[poss]                                            # [B, D]
    s = sin[poss]
    if params is not None and "rope_cos_long" in params:
        use = (poss + 1 > params["rope_long_threshold"])[:, None]
        c = jnp.where(use, params["rope_cos_long"][poss], c)
        s = jnp.where(use, params["rope_sin_long"][poss], s)
    if (params is not None and lp is not None
            and "use_local_rope" in lp
            and "rope_cos_local" in params):
        use_l = lp["use_local_rope"] > 0
        c = jnp.where(use_l, params["rope_cos_local"][poss], c)
        s = jnp.where(use_l, params["rope_sin_local"][poss], s)
    if lp is not None and "use_rope_layer" in lp:
        # SmolLM3 NoPE layers: rotation by zero (identity tables)
        use_r = lp["use_rope_layer"] > 0
        c = jnp.where(use_r, c, jnp.ones_like(c))
        s = jnp.where(use_r, s, jnp.zeros_like(s))
    apply = ((lambda xv, cv, sv: _rope(cfg, xv, cv, sv))
             if cfg is not None else apply_rope_fn)
    return jax.vmap(lambda xv, cv, sv: apply(
        xv[None], cv[None], sv[None])[0])(x, c, s)


def paged_serve_chunk_fn(cfg: TransformerConfig, n_steps: int,
                         temperature: float, top_k: int, seed: int,
                         max_seq_len: int, params, k_pool, v_pool, tables,
                         last, poss, step_idx):
    """Advance all slots ``n_steps`` tokens over the paged pool (device-
    resident sampling; same chunked executable contract as the dense
    _serve_chunk_fn)."""
    b = last.shape[0]

    def step(carry, i):
        kp, vp, tok, ps, key = carry
        kp, vp, logits = paged_decode_step_fn(cfg, params, kp, vp, tables,
                                              tok, ps)
        if temperature <= 0.0:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            key, sub = jax.random.split(key)
            lf = logits.astype(_F32) / temperature
            if top_k > 0:
                topv = lax.top_k(lf, top_k)[0][:, -1:]
                lf = jnp.where(lf < topv, -1e30, lf)
            nxt = jax.random.categorical(sub, lf, axis=-1).astype(jnp.int32)
        ps = jnp.minimum(ps + 1, max_seq_len - 1)
        return (kp, vp, nxt, ps, key), nxt

    key = jax.random.fold_in(jax.random.PRNGKey(seed), step_idx)
    (k_pool, v_pool, last, poss, _), toks = lax.scan(
        step, (k_pool, v_pool, last, poss, key), jnp.arange(n_steps))
    return k_pool, v_pool, last, poss, toks.T    # [B, n_steps]


def paged_prefill_pl_fn(cfg: TransformerConfig, temperature: float,
                        top_k: int, seed: int, params, k_pool, v_pool,
                        last, poss, table, tokens, true_len, slot, rid):
    """Pipelined paged admission: prefill into the request's blocks AND
    sample the first token on device, updating the device-resident
    last/poss slot arrays (the paged twin of serving._prefill_into_slot_pl_fn
    — one async dispatch, no host sync)."""
    k_pool, v_pool, logits = paged_prefill_fn(cfg, params, k_pool, v_pool,
                                              table, tokens, true_len)
    if temperature <= 0.0:
        tok = jnp.argmax(logits).astype(jnp.int32)
    else:
        key = jax.random.fold_in(jax.random.PRNGKey(seed), rid)
        lf = logits.astype(_F32) / temperature
        if top_k > 0:
            topv = lax.top_k(lf, top_k)[0][-1]
            lf = jnp.where(lf < topv, -1e30, lf)
        tok = jax.random.categorical(key, lf).astype(jnp.int32)
    last = last.at[slot].set(tok)
    poss = poss.at[slot].set(true_len.astype(jnp.int32))
    return k_pool, v_pool, last, poss, tok


def paged_prefill_wave_pl_fn(cfg: TransformerConfig, temperature: float,
                             top_k: int, seed: int, n_wave: int, params,
                             k_pool, v_pool, last, poss, tables_w, tokens_w,
                             lens_w, slots_w, rids_w):
    """Pipelined paged admission WAVE: n_wave same-bucket prefills in one
    dispatch (paged twin of serving._prefill_wave_pl_fn)."""
    def body(i, carry):
        k_pool, v_pool, last, poss, toks = carry
        k_pool, v_pool, last, poss, tok = paged_prefill_pl_fn(
            cfg, temperature, top_k, seed, params, k_pool, v_pool, last,
            poss, tables_w[i], tokens_w[i], lens_w[i], slots_w[i], rids_w[i])
        return k_pool, v_pool, last, poss, toks.at[i].set(tok)

    toks0 = jnp.zeros((n_wave,), jnp.int32)
    return lax.fori_loop(0, n_wave, body,
                         (k_pool, v_pool, last, poss, toks0))


def paged_prefill_fn(cfg: TransformerConfig, params, k_pool, v_pool,
                     table, tokens, true_len):
    """Prefill one sequence into its blocks (table [MB]); returns last-pos
    logits. Padded rows scatter into the trash block (block 0)."""
    from ..ops.embedding import kv_leaf
    s = tokens.shape[0]
    bs = kv_leaf(k_pool).shape[3]
    from .model import _embed_tokens
    h = _embed_tokens(cfg, params, tokens)
    rope_cos = params.get("rope_cos")
    rope_sin = params.get("rope_sin")
    idx = jnp.arange(s)
    valid = idx < true_len
    blocks = jnp.where(valid, table[idx // bs], 0)
    offs = jnp.where(valid, idx % bs, 0)

    def body(i, st):
        h, kp, vp = st
        lp = _slice_layer_params(params["layers"], i)
        x = _attn_in(cfg, lp, h)
        q, k, v = _project_qkv(cfg, lp, x)
        if cfg.use_rope:
            from .model import _layer_rope, _rope, _rope_rows_for
            rc, rs = _rope_rows_for(params, 0, s, true_len)
            rcl = params.get("rope_cos_local")
            rc, rs = _layer_rope(
                lp, rc, rs,
                None if rcl is None else rcl[:s],
                None if rcl is None else params["rope_sin_local"][:s])
            q = _rope(cfg, q, rc, rs)
            k = _rope(cfg, k, rc, rs)
        kp = _paged_write_rows(kp, k, i, blocks, offs, valid)
        vp = _paged_write_rows(vp, v, i, blocks, offs, valid)
        from .model import _prefill_attn
        attn = _prefill_attn(q, k, v, true_len, cfg.attn_scale,
                             cfg.attn_logit_softcap, lp.get("attn_window"))
        h = _residual_tail(cfg, lp, h, attn, s, x)
        return (h, kp, vp)

    h, k_pool, v_pool = lax.fori_loop(0, cfg.num_layers, body,
                                      (h, k_pool, v_pool))
    h = _norm(cfg, h, params["final_norm_w"], params.get("final_norm_b"))
    last = jnp.take(h, true_len - 1, axis=0)
    return k_pool, v_pool, _logits(cfg, params, last)


# ---------------------------------------------------------------- allocator --

class BlockAllocator:
    """Host-side free-list allocator; block 0 is the permanent trash block."""

    def __init__(self, num_blocks: int, block_size: int):
        self.num_blocks = num_blocks
        self.block_size = block_size
        self._free = list(range(num_blocks - 1, 0, -1))   # 0 reserved
        self.allocated: dict[int, list[int]] = {}

    def alloc_for(self, request_id: int, n_tokens: int) -> list[int]:
        """Ensure request has blocks covering n_tokens; returns full list."""
        blocks = self.allocated.setdefault(request_id, [])
        need = -(-n_tokens // self.block_size)            # ceil
        while len(blocks) < need:
            if not self._free:
                raise MemoryError("paged KV pool exhausted")
            blocks.append(self._free.pop())
        return blocks

    def free(self, request_id: int) -> None:
        for b in self.allocated.pop(request_id, []):
            self._free.append(b)

    @property
    def free_blocks(self) -> int:
        return len(self._free)

    def stats(self) -> dict:
        used = sum(len(v) for v in self.allocated.values())
        return {"num_blocks": self.num_blocks, "used_blocks": used,
                "free_blocks": len(self._free),
                "block_size": self.block_size}
