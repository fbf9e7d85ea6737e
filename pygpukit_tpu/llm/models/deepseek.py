"""DeepSeek-V3 family (V3 / R1 class): Multi-head Latent Attention + MoE.

Beyond-reference family (the reference has no deepseek support; this file
follows the llama4.py pattern of a self-contained model with a
transformers-parity contract, reference: llm/models/llama4.py here and
detect_model_spec, reference llm/config.py:393).

TPU-first design choices:
- **Absorbed MLA decode.** transformers' DeepseekV3Attention materialises
  per-head K/V from the latent at every step (naive form). Here prefill
  uses the naive expansion (compute-bound, fine on the MXU) but the cache
  stores only the COMPRESSED latent ``c_kv`` [kv_lora_rank] plus the
  shared rope key [qk_rope_head_dim] — 576 f32-equivalents per position
  for V3 vs 128 heads x (192+128) for the naive cache, a ~70x KV HBM
  saving — and decode runs the absorbed form: queries project into latent
  space through w_uk (one einsum against the [Hq, dn, c] slice of
  kv_b_proj), scores = q_lat . c_kv + q_pe . k_pe, and the attention
  output re-expands through w_uv. Mathematically identical to the naive
  form (kv_b is linear).
- Layer stacks split into a DENSE group (the first ``first_k_dense``
  layers) and a MOE group, each a stacked pytree consumed by
  ``lax.fori_loop`` carrying the caches in place (model.py scan-ys copy
  lesson) — no expert-weight padding on dense layers.
- Router: sigmoid scores, +e_score_correction_bias for SELECTION only,
  group top-2-sum -> topk_group groups -> top_k experts, weights gathered
  from the PRE-bias scores, normalised, x routed_scaling_factor (HF
  DeepseekV3TopkRouter semantics). Expert compute is the dense one-hot
  formulation — exact, and the tiny-config parity path; large-scale
  serving should route through ops/moe's gather formulation.
"""

from __future__ import annotations

import functools
import json
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...core.executable import capture
from ...ops.nn.norm import rmsnorm_fn
from ...ops.nn.rope import apply_rope_interleaved_fn, apply_rope_fn, rope_init

_F32 = jnp.float32


@dataclass
class DeepseekV3Config:
    vocab_size: int = 129280
    hidden_size: int = 7168
    num_layers: int = 61
    num_heads: int = 128
    q_lora_rank: int | None = 1536
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    intermediate_size: int = 18432
    moe_intermediate_size: int = 2048
    n_routed_experts: int = 256
    n_shared_experts: int = 1
    num_experts_per_tok: int = 8
    n_group: int = 8
    topk_group: int = 4
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 2.5
    first_k_dense: int = 3
    # V3/R1: "noaux_tc" (sigmoid scores, bias-corrected group-limited
    # selection). V2: "greedy" (V2-Lite — plain softmax top-k) or
    # "group_limited_greedy" (V2/V2-Chat — group MAX selection).
    router_mode: str = "noaux_tc"
    rope_theta: float = 10000.0
    rope_interleave: bool = True
    rope_scaling: dict | None = None
    norm_eps: float = 1e-6
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def attn_scale(self) -> float:
        s = self.qk_head_dim ** -0.5
        if self.rope_scaling:
            m_all = self.rope_scaling.get("mscale_all_dim", 0)
            factor = self.rope_scaling.get("factor", 1.0)
            if m_all and factor > 1.0:
                import math
                ms = 0.1 * m_all * math.log(factor) + 1.0
                s = s * ms * ms
        return s

    @classmethod
    def from_hf(cls, hf: dict) -> "DeepseekV3Config":
        v2 = hf.get("model_type") == "deepseek_v2"
        return cls(
            vocab_size=hf.get("vocab_size", 129280),
            hidden_size=hf.get("hidden_size", 7168),
            num_layers=hf.get("num_hidden_layers", 61),
            num_heads=hf.get("num_attention_heads", 128),
            q_lora_rank=hf.get("q_lora_rank"),
            kv_lora_rank=hf.get("kv_lora_rank", 512),
            qk_nope_head_dim=hf.get("qk_nope_head_dim", 128),
            qk_rope_head_dim=hf.get("qk_rope_head_dim", 64),
            v_head_dim=hf.get("v_head_dim", 128),
            intermediate_size=hf.get("intermediate_size", 18432),
            moe_intermediate_size=hf.get("moe_intermediate_size", 2048),
            n_routed_experts=hf.get("n_routed_experts", 256),
            n_shared_experts=hf.get("n_shared_experts", 1),
            num_experts_per_tok=hf.get("num_experts_per_tok", 8),
            n_group=hf.get("n_group", 8),
            topk_group=hf.get("topk_group", 4),
            norm_topk_prob=hf.get("norm_topk_prob", not v2),
            routed_scaling_factor=hf.get("routed_scaling_factor",
                                          1.0 if v2 else 2.5),
            first_k_dense=hf.get("first_k_dense_replace", 0 if v2 else 3),
            router_mode=hf.get("topk_method",
                               "greedy" if v2 else "noaux_tc"),
            rope_theta=hf.get("rope_theta", 10000.0),
            rope_interleave=hf.get("rope_interleave", True),
            rope_scaling=hf.get("rope_scaling"),
            norm_eps=hf.get("rms_norm_eps", 1e-6),
            max_position_embeddings=hf.get("max_position_embeddings", 4096),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
        )



def _prec(*arrs):
    """precision=HIGHEST when the PRE-cast information is genuinely f32 —
    JAX DEFAULT runs f32 dots through bf16 MXU passes on TPU (the llama4
    lesson, CLAUDE.md); bf16 models keep fast DEFAULT."""
    if all(a.dtype == _F32 for a in arrs):
        from ...ops.matmul import _f32_precision
        return _f32_precision()
    return None

def _rope(cfg, x, cos, sin):
    fn = apply_rope_interleaved_fn if cfg.rope_interleave else apply_rope_fn
    return fn(x, cos, sin)


def _mla_qkv(cfg: DeepseekV3Config, lp, x, cos, sin):
    """x [T, E] -> q_nope [T,H,dn], q_pe [T,H,dr] (roped), c_kv [T,c]
    (normed latent), k_pe [T,dr] (roped shared key)."""
    t = x.shape[0]
    hq, dn, dr = cfg.num_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    if "w_qa" in lp:
        qa = rmsnorm_fn(jnp.dot(x, lp["w_qa"], precision=_prec(x, lp["w_qa"])),
                        lp["w_qa_norm"], cfg.norm_eps)
        q = jnp.dot(qa, lp["w_qb"],
                    precision=_prec(qa, lp["w_qb"])).reshape(t, hq, dn + dr)
    else:
        q = jnp.dot(x, lp["w_q"],
                    precision=_prec(x, lp["w_q"])).reshape(t, hq, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    ckv = jnp.dot(x, lp["w_kva"],
                  precision=_prec(x, lp["w_kva"]))       # [T, c + dr]
    c_kv = rmsnorm_fn(ckv[:, :cfg.kv_lora_rank], lp["w_kva_norm"],
                      cfg.norm_eps)
    k_pe = ckv[:, cfg.kv_lora_rank:]               # [T, dr]
    q_pe = _rope(cfg, q_pe, cos, sin)
    k_pe = _rope(cfg, k_pe[:, None, :], cos, sin)[:, 0, :]
    return q_nope, q_pe, c_kv, k_pe


def _mla_attn_naive(cfg: DeepseekV3Config, lp, q_nope, q_pe, c_kv, k_pe,
                    true_len):
    """Prefill attention: expand the latent to per-head K/V (MXU-bound,
    matches transformers' formulation) with causal + pad masking."""
    t = q_nope.shape[0]
    hq, dn, dv = cfg.num_heads, cfg.qk_nope_head_dim, cfg.v_head_dim
    kv = jnp.dot(c_kv, lp["w_kvb"],
                 precision=_prec(c_kv, lp["w_kvb"])).reshape(t, hq, dn + dv)
    k_nope, v = kv[..., :dn], kv[..., dn:]
    # scores over nope and rope parts separately (k_pe shared across heads)
    pr = _prec(q_nope, k_nope)        # gate on PRE-cast dtypes
    qn = q_nope.astype(_F32)
    s_nope = jnp.einsum("thd,shd->hts", qn, k_nope.astype(_F32),
                        precision=pr)
    s_rope = jnp.einsum("thd,sd->hts", q_pe.astype(_F32), k_pe.astype(_F32),
                        precision=pr)
    scores = (s_nope + s_rope) * cfg.attn_scale
    idx = jnp.arange(t)
    mask = (idx[None, :, None] >= idx[None, None, :]) & (
        idx[None, None, :] < true_len)
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hts,shd->thd", p, v.astype(_F32), precision=pr)
    return out.reshape(t, hq * dv)


def _mla_attn_absorbed(cfg: DeepseekV3Config, lp, q_nope, q_pe, ckv_cache,
                       kpe_cache, ctx_len):
    """Decode attention straight off the compressed cache.

    ckv_cache [MAX, c], kpe_cache [MAX, dr]; q_* [1, H, *]. w_kvb
    [c, H*(dn+dv)] is split into w_uk [H, dn, c] / w_uv [H, c, dv] and
    absorbed into the query / output sides.
    """
    hq, dn, dv, c = (cfg.num_heads, cfg.qk_nope_head_dim, cfg.v_head_dim,
                     cfg.kv_lora_rank)
    wkvb = lp["w_kvb"].reshape(c, hq, dn + dv)
    w_uk = jnp.transpose(wkvb[..., :dn], (1, 2, 0))      # [H, dn, c]
    w_uv = jnp.transpose(wkvb[..., dn:], (1, 0, 2))      # [H, c, dv]
    pr = _prec(q_nope, ckv_cache)     # gate on PRE-cast dtypes
    qn = q_nope[0].astype(_F32)                          # [H, dn]
    q_lat = jnp.einsum("hd,hdc->hc", qn, w_uk.astype(_F32), precision=pr)
    s_lat = jnp.einsum("hc,sc->hs", q_lat, ckv_cache.astype(_F32),
                       precision=pr)
    s_pe = jnp.einsum("hd,sd->hs", q_pe[0].astype(_F32),
                      kpe_cache.astype(_F32), precision=pr)
    scores = (s_lat + s_pe) * cfg.attn_scale
    mask = jnp.arange(ckv_cache.shape[0]) < ctx_len
    scores = jnp.where(mask[None, :], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    attn_lat = jnp.einsum("hs,sc->hc", p, ckv_cache.astype(_F32),
                          precision=pr)
    out = jnp.einsum("hc,hcd->hd", attn_lat, w_uv.astype(_F32),
                     precision=pr)
    return out.reshape(1, hq * dv)


def _dense_mlp(lp, x):
    pr = _prec(x, lp["w_gate"])
    g = jnp.dot(x, lp["w_gate"], precision=pr)
    u = jnp.dot(x, lp["w_up"], precision=pr)
    return jnp.dot(jax.nn.silu(g.astype(_F32)).astype(x.dtype) * u,
                   lp["w_down"], precision=pr)


def _group_mask(sel_scores, t, g, per, topk_group):
    """Boolean [T, N] mask of experts inside the top ``topk_group``
    groups, ranked by ``sel_scores`` [T, G]."""
    _, gidx = lax.top_k(sel_scores, topk_group)
    gmask = jnp.zeros((t, g), bool).at[
        jnp.arange(t)[:, None], gidx].set(True)
    return jnp.repeat(gmask, per, axis=-1)


def _router(cfg: DeepseekV3Config, lp, x):
    """Router -> dense one-hot weights [T, N].

    noaux_tc (V3/R1, HF DeepseekV3TopkRouter): sigmoid scores; selection
    by bias-corrected scores with group top-2-SUM limiting; weights from
    the PRE-bias scores. greedy / group_limited_greedy (V2, HF
    DeepseekV2MoEGate): softmax scores; plain or group-MAX-limited top-k;
    weights are the selected scores (normalised only if norm_topk_prob).
    """
    t = x.shape[0]
    n = cfg.n_routed_experts
    logits = jnp.dot(x.astype(_F32), lp["w_router"],
                     precision=_prec(x, x))                    # [T, N]
    if cfg.router_mode == "noaux_tc":
        g = cfg.n_group
        per = n // g
        scores = jax.nn.sigmoid(logits)
        sfc = scores + lp["b_router"][None, :]
        top2, _ = lax.top_k(sfc.reshape(t, g, per), min(2, per))
        emask = _group_mask(top2.sum(-1), t, g, per, cfg.topk_group)
        masked = jnp.where(emask, sfc, 0.0)
        _, eidx = lax.top_k(masked, cfg.num_experts_per_tok)   # [T, K]
        w = jnp.take_along_axis(scores, eidx, axis=-1)         # pre-bias!
    else:
        scores = jax.nn.softmax(logits, axis=-1)
        if cfg.router_mode == "group_limited_greedy":
            g = cfg.n_group
            per = n // g
            gmax = scores.reshape(t, g, per).max(-1)
            emask = _group_mask(gmax, t, g, per, cfg.topk_group)
            masked = jnp.where(emask, scores, 0.0)
        else:                                                  # greedy
            masked = scores
        w, eidx = lax.top_k(masked, cfg.num_experts_per_tok)
    # HF's V2 MoEGate never normalises topk weights (the config flag is
    # stored but unused in its forward); only the V3 router does.
    if cfg.norm_topk_prob and cfg.router_mode == "noaux_tc":
        w = w / (w.sum(-1, keepdims=True) + 1e-20)
    w = w * cfg.routed_scaling_factor
    dense = jnp.zeros((t, n), _F32)
    dense = dense.at[jnp.arange(t)[:, None], eidx].add(w)
    return dense


def _moe_mlp(cfg: DeepseekV3Config, lp, x):
    """Routed experts (dense one-hot dispatch — exact) + shared experts."""
    w = _router(cfg, lp, x)                                    # [T, N]
    pr = _prec(x, lp["w_experts_gate"])
    xg = jnp.einsum("te,neI->tnI", x.astype(_F32),
                    lp["w_experts_gate"].astype(_F32), precision=pr)
    xu = jnp.einsum("te,neI->tnI", x.astype(_F32),
                    lp["w_experts_up"].astype(_F32), precision=pr)
    act = jax.nn.silu(xg) * xu
    yo = jnp.einsum("tnI,nIe->tne", act,
                    lp["w_experts_down"].astype(_F32), precision=pr)
    routed = jnp.einsum("tne,tn->te", yo, w, precision=pr)
    shared = _dense_mlp(_shared_leaves(lp), x)
    return routed.astype(x.dtype) + shared


def _shared_leaves(lp):
    return {"w_gate": lp["w_shared_gate"], "w_up": lp["w_shared_up"],
            "w_down": lp["w_shared_down"]}


def _block(cfg: DeepseekV3Config, lp, h, attn_out, moe: bool):
    h = h + jnp.dot(attn_out, lp["w_o"],
                    precision=_prec(attn_out, lp["w_o"])).astype(h.dtype)
    y = rmsnorm_fn(h, lp["mlp_norm_w"], cfg.norm_eps)
    if moe:
        h = h + _moe_mlp(cfg, lp, y).astype(h.dtype)
    else:
        h = h + _dense_mlp(lp, y).astype(h.dtype)
    return h


def forward_fn(cfg: DeepseekV3Config, p, tokens):
    """tokens [S] -> logits [S, V] (uncached, naive attention)."""
    s = tokens.shape[0]
    h = jnp.take(p["embed"], tokens, axis=0)
    cos, sin = p["rope_cos"][:s], p["rope_sin"][:s]

    def run_group(h, group, moe):
        if group is None:
            return h

        def body(i, h):
            lp = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
                group)
            x = rmsnorm_fn(h, lp["attn_norm_w"], cfg.norm_eps)
            qn, qp, ckv, kpe = _mla_qkv(cfg, lp, x, cos, sin)
            attn = _mla_attn_naive(cfg, lp, qn, qp, ckv, kpe, s)
            return _block(cfg, lp, h, attn.astype(h.dtype), moe)

        n = jax.tree.leaves(group)[0].shape[0]
        return lax.fori_loop(0, n, body, h)

    h = run_group(h, p.get("dense_layers"), False)
    h = run_group(h, p.get("moe_layers"), True)
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    head = p["lm_head"] if p.get("lm_head") is not None else p["embed"].T
    return jnp.dot(h, head, preferred_element_type=_F32,
                   precision=_prec(h, head))


def prefill_fn(cfg: DeepseekV3Config, p, ckv_cache, kpe_cache, tokens,
               true_len):
    """Prefill: naive attention, but WRITE the compressed cache.

    ckv_cache [L, MAX, c]; kpe_cache [L, MAX, dr]. Returns (caches,
    last-position logits)."""
    s = tokens.shape[0]
    h = jnp.take(p["embed"], tokens, axis=0)
    cos, sin = p["rope_cos"][:s], p["rope_sin"][:s]
    kd = cfg.first_k_dense

    def run_group(carry, group, moe, off):
        if group is None:
            return carry

        def body(i, st):
            h, ckc, kpc = st
            lp = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
                group)
            x = rmsnorm_fn(h, lp["attn_norm_w"], cfg.norm_eps)
            qn, qp, ckv, kpe = _mla_qkv(cfg, lp, x, cos, sin)
            ckc = lax.dynamic_update_slice(
                ckc, ckv[None].astype(ckc.dtype), (i + off, 0, 0))
            kpc = lax.dynamic_update_slice(
                kpc, kpe[None].astype(kpc.dtype), (i + off, 0, 0))
            attn = _mla_attn_naive(cfg, lp, qn, qp, ckv, kpe, true_len)
            return (_block(cfg, lp, h, attn.astype(h.dtype), moe), ckc, kpc)

        n = jax.tree.leaves(group)[0].shape[0]
        return lax.fori_loop(0, n, body, carry)

    h, ckv_cache, kpe_cache = run_group(
        (h, ckv_cache, kpe_cache), p.get("dense_layers"), False, 0)
    h, ckv_cache, kpe_cache = run_group(
        (h, ckv_cache, kpe_cache), p.get("moe_layers"), True, kd)
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    last = jnp.take(h, true_len - 1, axis=0)
    head = p["lm_head"] if p.get("lm_head") is not None else p["embed"].T
    return ckv_cache, kpe_cache, jnp.dot(last, head,
                                         preferred_element_type=_F32,
                                         precision=_prec(last, head))


def decode_step_fn(cfg: DeepseekV3Config, p, ckv_cache, kpe_cache, token,
                   pos):
    """One absorbed-MLA decode step off the compressed cache."""
    h = jnp.take(p["embed"], token[None], axis=0)
    cos = lax.dynamic_slice_in_dim(p["rope_cos"], pos, 1, axis=0)
    sin = lax.dynamic_slice_in_dim(p["rope_sin"], pos, 1, axis=0)
    kd = cfg.first_k_dense

    def run_group(carry, group, moe, off):
        if group is None:
            return carry

        def body(i, st):
            h, ckc, kpc = st
            lp = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
                group)
            x = rmsnorm_fn(h, lp["attn_norm_w"], cfg.norm_eps)
            qn, qp, ckv, kpe = _mla_qkv(cfg, lp, x, cos, sin)
            ckc = lax.dynamic_update_slice(
                ckc, ckv[None].astype(ckc.dtype), (i + off, pos, 0))
            kpc = lax.dynamic_update_slice(
                kpc, kpe[None].astype(kpc.dtype), (i + off, pos, 0))
            attn = _mla_attn_absorbed(
                cfg, lp, qn, qp,
                lax.dynamic_index_in_dim(ckc, i + off, 0, keepdims=False),
                lax.dynamic_index_in_dim(kpc, i + off, 0, keepdims=False),
                pos + 1)
            return (_block(cfg, lp, h, attn.astype(h.dtype), moe), ckc, kpc)

        n = jax.tree.leaves(group)[0].shape[0]
        return lax.fori_loop(0, n, body, carry)

    h, ckv_cache, kpe_cache = run_group(
        (h, ckv_cache, kpe_cache), p.get("dense_layers"), False, 0)
    h, ckv_cache, kpe_cache = run_group(
        (h, ckv_cache, kpe_cache), p.get("moe_layers"), True, kd)
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    head = p["lm_head"] if p.get("lm_head") is not None else p["embed"].T
    logits = jnp.dot(h[0], head, preferred_element_type=_F32,
                     precision=_prec(h, head))
    return ckv_cache, kpe_cache, logits


def generate_scan_fn(cfg: DeepseekV3Config, n_steps: int, p, ckv_cache,
                     kpe_cache, token, pos):
    """Device-side greedy loop (model.py generate_scan_fn analog)."""
    def step(carry, _):
        ckc, kpc, tok, ps = carry
        ckc, kpc, logits = decode_step_fn(cfg, p, ckc, kpc, tok, ps)
        nxt = jnp.argmax(logits).astype(jnp.int32)
        return (ckc, kpc, nxt, ps + 1), nxt

    (ckv_cache, kpe_cache, token, pos), toks = lax.scan(
        step, (ckv_cache, kpe_cache, token, pos), None, length=n_steps)
    return ckv_cache, kpe_cache, toks


class DeepseekV3Model:
    """Parity-grade DeepSeek-V3/R1 model with absorbed-MLA cached decode."""

    _name = "deepseek"

    # -- hybrid-engine hooks (llm/serving_hybrid.py) -------------------------
    # the engine is pytree-generic: expose the compressed-latent MLA caches
    # as one {"ckv", "kpe"} pytree so DeepSeek batch-serves through
    # HybridServingEngine (each slot pins c+dr floats/token, not Hk*D*2)

    @staticmethod
    def _init_caches(cfg: DeepseekV3Config, max_seq_len: int,
                     dtype=jnp.float32):
        return {
            "ckv": jnp.zeros((cfg.num_layers, max_seq_len, cfg.kv_lora_rank),
                             dtype),
            "kpe": jnp.zeros(
                (cfg.num_layers, max_seq_len, cfg.qk_rope_head_dim), dtype),
        }

    @staticmethod
    def _prefill_fn(cfg: DeepseekV3Config, p, caches, tokens, true_len):
        ckc, kpc, logits = prefill_fn(cfg, p, caches["ckv"], caches["kpe"],
                                      tokens, true_len)
        return {"ckv": ckc, "kpe": kpc}, logits

    @staticmethod
    def _decode_step_fn(cfg: DeepseekV3Config, p, caches, token, pos):
        ckc, kpc, logits = decode_step_fn(cfg, p, caches["ckv"],
                                          caches["kpe"], token, pos)
        return {"ckv": ckc, "kpe": kpc}, logits

    def __init__(self, config: DeepseekV3Config, params: dict,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        if "rope_cos" not in params:
            scaling = config.rope_scaling or {}
            st = scaling.get("rope_type", scaling.get("type", ""))
            if st == "yarn":
                # every real DeepSeek-V2/V3/R1 checkpoint ships yarn
                # scaling; rope_init_yarn folds the HF attention factor
                # (mscale/mscale_all_dim ratio) into the tables while
                # cfg.attn_scale carries the softmax-side mscale^2 — the
                # same split transformers uses.
                from ...ops.nn.rope import rope_init_yarn
                cos, sin = rope_init_yarn(
                    config.max_position_embeddings,
                    config.qk_rope_head_dim, config.rope_theta,
                    scaling.get("factor", 1.0),
                    scaling.get("original_max_position_embeddings",
                                config.max_position_embeddings),
                    beta_fast=scaling.get("beta_fast") or 32.0,
                    beta_slow=scaling.get("beta_slow") or 1.0,
                    mscale=scaling.get("mscale"),
                    mscale_all_dim=scaling.get("mscale_all_dim"),
                    attention_factor=scaling.get("attention_factor"),
                    truncate=scaling.get("truncate", True))
            else:
                cos, sin = rope_init(config.max_position_embeddings,
                                     config.qk_rope_head_dim,
                                     config.rope_theta)
            params["rope_cos"], params["rope_sin"] = cos.jax, sin.jax
        self._fwd = jax.jit(functools.partial(forward_fn, config))
        self.ckv_cache = None
        self.kpe_cache = None
        self.pos = 0
        self._prefill_exes: dict = {}
        self._gen_exes: dict = {}

    # -- api -----------------------------------------------------------------

    def forward(self, input_ids):
        return self._fwd(self.params,
                         jnp.asarray(np.asarray(input_ids, np.int32)))

    def get_logits(self, input_ids) -> np.ndarray:
        return np.asarray(self.forward(input_ids), np.float32)

    def init_fixed_cache(self, max_seq_len: int):
        cfg = self.config
        self.max_seq_len = max_seq_len
        self.ckv_cache = jnp.zeros(
            (cfg.num_layers, max_seq_len, cfg.kv_lora_rank), self.dtype)
        self.kpe_cache = jnp.zeros(
            (cfg.num_layers, max_seq_len, cfg.qk_rope_head_dim), self.dtype)
        self.pos = 0

    def generate(self, input_ids, max_new_tokens: int = 32,
                 chunk_size: int = 64) -> list[int]:
        """Greedy generation: bucketed prefill + device-side chunk loop,
        first token deferred on device (model.py generate contract)."""
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        n = len(ids)
        if self.ckv_cache is None:
            need = n + max_new_tokens + 1
            self.init_fixed_cache(max(1 << (need - 1).bit_length(), 64))
        bucket = max(1 << (n - 1).bit_length(), 16)
        if bucket not in self._prefill_exes:
            fn = functools.partial(prefill_fn, self.config)
            self._prefill_exes[bucket] = capture(
                fn, self.params, self.ckv_cache, self.kpe_cache,
                jnp.zeros((bucket,), jnp.int32), jnp.int32(1),
                donate_argnums=(1, 2), name=f"dsv3_prefill_{bucket}")
        padded = np.zeros((bucket,), np.int32)
        padded[:n] = ids
        self.ckv_cache, self.kpe_cache, logits = self._prefill_exes[
            bucket].replay(self.params, self.ckv_cache, self.kpe_cache,
                           jnp.asarray(padded), jnp.int32(n))
        self.pos = n
        cur = jnp.argmax(logits).astype(jnp.int32)
        out: list[int] = []
        first = True
        while len(out) < max_new_tokens:
            steps = min(max_new_tokens - len(out) - (1 if first else 0),
                        chunk_size, self.max_seq_len - self.pos)
            if steps <= 0:
                if first:
                    out.append(int(np.asarray(cur)))
                break
            if steps not in self._gen_exes:
                fn = functools.partial(generate_scan_fn, self.config, steps)
                self._gen_exes[steps] = capture(
                    fn, self.params, self.ckv_cache, self.kpe_cache,
                    jnp.int32(0), jnp.int32(0), donate_argnums=(1, 2),
                    name=f"dsv3_generate_{steps}")
            self.ckv_cache, self.kpe_cache, toks = self._gen_exes[
                steps].replay(self.params, self.ckv_cache, self.kpe_cache,
                              jnp.int32(cur), jnp.int32(self.pos))
            self.pos += steps
            if first:
                toks = np.asarray(
                    jnp.concatenate([jnp.reshape(cur, (1,)), toks]))
                first = False
            else:
                toks = np.asarray(toks)
            out.extend(int(t) for t in toks)
            cur = out[-1]
        return out[:max_new_tokens]

    # -- loading -------------------------------------------------------------

    @classmethod
    def from_safetensors(cls, path, dtype=jnp.float32) -> "DeepseekV3Model":
        from ..safetensors import load_safetensors
        st = load_safetensors(path)
        hf = {}
        cj = Path(path if Path(path).is_dir() else Path(path).parent) \
            / "config.json"
        if cj.exists():
            hf = json.loads(cj.read_text())
        cfg = DeepseekV3Config.from_hf(hf)

        def t(name, transpose=False, dt=dtype):
            a = np.asarray(st.tensor_numpy(name))
            if transpose:
                a = a.T
            return jnp.asarray(a, dt)

        def layer(l: int, moe: bool) -> dict:
            pre = f"model.layers.{l}."
            lp = {
                "attn_norm_w": t(pre + "input_layernorm.weight", dt=_F32),
                "mlp_norm_w": t(pre + "post_attention_layernorm.weight",
                                dt=_F32),
                "w_kva": t(pre + "self_attn.kv_a_proj_with_mqa.weight", True),
                "w_kva_norm": t(pre + "self_attn.kv_a_layernorm.weight",
                                dt=_F32),
                "w_kvb": t(pre + "self_attn.kv_b_proj.weight", True),
                "w_o": t(pre + "self_attn.o_proj.weight", True),
            }
            if cfg.q_lora_rank:
                lp["w_qa"] = t(pre + "self_attn.q_a_proj.weight", True)
                lp["w_qa_norm"] = t(pre + "self_attn.q_a_layernorm.weight",
                                    dt=_F32)
                lp["w_qb"] = t(pre + "self_attn.q_b_proj.weight", True)
            else:
                lp["w_q"] = t(pre + "self_attn.q_proj.weight", True)
            if moe:
                lp["w_router"] = t(pre + "mlp.gate.weight", True, _F32)
                bias_key = pre + "mlp.gate.e_score_correction_bias"
                lp["b_router"] = (
                    t(bias_key, dt=_F32) if bias_key in st
                    else jnp.zeros((cfg.n_routed_experts,), _F32))
                gs, us, ds = [], [], []
                for e in range(cfg.n_routed_experts):
                    ep = pre + f"mlp.experts.{e}."
                    gs.append(t(ep + "gate_proj.weight", True))
                    us.append(t(ep + "up_proj.weight", True))
                    ds.append(t(ep + "down_proj.weight", True))
                lp["w_experts_gate"] = jnp.stack(gs)
                lp["w_experts_up"] = jnp.stack(us)
                lp["w_experts_down"] = jnp.stack(ds)
                lp["w_shared_gate"] = t(pre + "mlp.shared_experts.gate_proj.weight", True)
                lp["w_shared_up"] = t(pre + "mlp.shared_experts.up_proj.weight", True)
                lp["w_shared_down"] = t(pre + "mlp.shared_experts.down_proj.weight", True)
            else:
                lp["w_gate"] = t(pre + "mlp.gate_proj.weight", True)
                lp["w_up"] = t(pre + "mlp.up_proj.weight", True)
                lp["w_down"] = t(pre + "mlp.down_proj.weight", True)
            return lp

        kd = cfg.first_k_dense
        p: dict = {
            "embed": t("model.embed_tokens.weight"),
            "final_norm_w": t("model.norm.weight", dt=_F32),
            "lm_head": (t("lm_head.weight", True)
                        if "lm_head.weight" in st else None),
        }
        if kd > 0:
            dense = [layer(l, False) for l in range(kd)]
            p["dense_layers"] = {
                k: jnp.stack([d[k] for d in dense]) for k in dense[0]}
        if cfg.num_layers > kd:
            moe = [layer(l, True) for l in range(kd, cfg.num_layers)]
            p["moe_layers"] = {
                k: jnp.stack([m[k] for m in moe]) for k in moe[0]}
        return cls(cfg, p, dtype=dtype)
