"""LFM2 family (LiquidAI LFM2-350M/700M/1.2B class): hybrid gated
short-conv + attention decoder.

Beyond-reference family (standalone-model pattern like llama4.py /
deepseek.py / gptoss.py, with a transformers-parity contract against
HF modeling_lfm2.py). The interesting capability is the HYBRID cache:
conv layers carry a tiny [E, L_cache] rolling input-state instead of a
[MAX, Hk, D] KV cache — most layers cost O(1) memory in context length.

Mechanisms (transformers-exact):
- **Gated short conv** (Lfm2ShortConv.slow_forward): in_proj -> (B, C, x)
  thirds; Bx = B * x; depthwise causal conv over the sequence with kernel
  L_cache (newest input multiplies the LAST weight column); y = C *
  conv_out; out_proj. Decode keeps a per-layer [E, L_cache] state, rolled
  one slot per token.
- **Attention layers** (config.layer_types == "full_attention"): GQA with
  per-head q/k RMS norms (qwen3 convention) + standard split-half rope;
  out projection is ``out_proj`` (not o_proj).
- **MLP** w1/w3/w2 swiglu; ``block_auto_adjust_ff_dim`` recomputes the
  checkpoint's actual intermediate size (2/3 rule + multiple_of rounding).
- Norms: operator_norm (pre-mixer) + ffn_norm (pre-MLP); the final norm
  is (confusingly) named ``embedding_norm`` and runs AFTER the layers.

Layers are heterogeneous, so params/caches are per-layer LIST pytrees and
the layer loop unrolls statically at trace time (<= ~32 layers; every
executable stays a single compiled program). Known HF corner: its decode
conv-state write clamps cache_position to L_cache-1, which mis-places the
state when decoding at absolute position < L_cache-1 (a sub-3-token
prompt); we implement the steady-state roll semantics — identical for
every prompt of length >= L_cache.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...core.executable import capture
from ...ops.nn.norm import rmsnorm_fn
from ...ops.nn.rope import apply_rope_fn, rope_init

_F32 = jnp.float32


@dataclass
class Lfm2Config:
    vocab_size: int = 65536
    hidden_size: int = 1024
    num_layers: int = 16
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 4096
    layer_types: tuple = ()
    conv_l_cache: int = 3
    conv_bias: bool = False
    rope_theta: float = 1000000.0
    norm_eps: float = 1e-5
    max_position_embeddings: int = 128000
    tie_word_embeddings: bool = True

    @classmethod
    def from_hf(cls, hf: dict) -> "Lfm2Config":
        inter = hf.get("intermediate_size", 4096)
        if hf.get("block_auto_adjust_ff_dim", False):
            # HF Lfm2MLP recomputes the actual ff width from the nominal one
            inter = int(2 * inter / 3)
            mult = hf.get("block_ffn_dim_multiplier")
            if mult is not None:
                inter = int(mult * inter)
            mo = hf.get("block_multiple_of", 256)
            inter = mo * ((inter + mo - 1) // mo)
        n_layers = hf.get("num_hidden_layers", 16)
        heads = hf.get("num_attention_heads", 16)
        hidden = hf.get("hidden_size", 1024)
        return cls(
            vocab_size=hf.get("vocab_size", 65536),
            hidden_size=hidden,
            num_layers=n_layers,
            num_heads=heads,
            num_kv_heads=hf.get("num_key_value_heads", heads),
            head_dim=hf.get("head_dim") or hidden // heads,
            intermediate_size=inter,
            layer_types=tuple(hf.get("layer_types")
                              or ["full_attention"] * n_layers),
            conv_l_cache=hf.get("conv_L_cache", 3),
            conv_bias=hf.get("conv_bias", False),
            rope_theta=hf.get("rope_theta", 1000000.0),
            norm_eps=hf.get("norm_eps", 1e-5),
            max_position_embeddings=hf.get("max_position_embeddings",
                                           128000),
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
        )

    def is_attn(self, l: int) -> bool:
        return self.layer_types[l] == "full_attention"


# ------------------------------------------------------------------- blocks --

from ._base import (StandaloneCachedModel, attn_block_causal,
                    lm_head as _head_shared, mm as _mm,
                    qk_headnorm as _qk_headnorm)


def _mlp(lp, y):
    gate = _mm(y, lp["w1"])
    up = _mm(y, lp["w3"])
    act = (jax.nn.silu(gate.astype(_F32)) * up.astype(_F32)).astype(y.dtype)
    return _mm(act, lp["w2"])


def _conv_mix_full(cfg: Lfm2Config, lp, x):
    """Gated short-conv over a full [S, E] block (prefill/forward).

    Returns (mixer_out [S, E], Bx [S, E]) — Bx feeds the decode state."""
    bcx = _mm(x, lp["w_in"])                                  # [S, 3E]
    if "b_in" in lp:
        bcx = bcx + lp["b_in"]
    b, c, xx = jnp.split(bcx, 3, axis=-1)
    bx = b * xx                                               # [S, E]
    w = lp["conv_w"]                                          # [E, L]
    L = w.shape[1]
    # causal depthwise conv: out[s] = sum_j w[:, j] * bx[s - (L-1) + j]
    out = jnp.zeros_like(bx, dtype=_F32)
    for j in range(L):
        shift = L - 1 - j
        rolled = jnp.pad(bx, ((shift, 0), (0, 0)))[:bx.shape[0]]
        out = out + rolled.astype(_F32) * w[:, j].astype(_F32)
    if "conv_b" in lp:
        out = out + lp["conv_b"].astype(_F32)
    y = c.astype(_F32) * out
    y = _mm(y.astype(x.dtype), lp["w_out"])
    if "b_out" in lp:
        y = y + lp["b_out"]
    return y, bx


def _conv_mix_step(cfg: Lfm2Config, lp, x, state):
    """One decode step: x [1, E], state [E, L] -> (out [1, E], state')."""
    bcx = _mm(x, lp["w_in"])
    if "b_in" in lp:
        bcx = bcx + lp["b_in"]
    b, c, xx = jnp.split(bcx, 3, axis=-1)
    bx = (b * xx)[0]                                          # [E]
    state = jnp.concatenate(
        [state[:, 1:], bx[:, None].astype(state.dtype)], axis=-1)
    w = lp["conv_w"]
    out = jnp.sum(state.astype(_F32) * w.astype(_F32), axis=-1)  # [E]
    if "conv_b" in lp:
        out = out + lp["conv_b"].astype(_F32)
    y = c.astype(_F32) * out[None]
    y = _mm(y.astype(x.dtype), lp["w_out"])
    if "b_out" in lp:
        y = y + lp["b_out"]
    return y, state


def _attn_qkv(cfg: Lfm2Config, lp, x, cos, sin):
    s = x.shape[0]
    hq, hk, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = _mm(x, lp["w_q"]).reshape(s, hq, d)
    k = _mm(x, lp["w_k"]).reshape(s, hk, d)
    v = _mm(x, lp["w_v"]).reshape(s, hk, d)
    q = _qk_headnorm(q, lp["w_q_norm"], cfg.norm_eps)
    k = _qk_headnorm(k, lp["w_k_norm"], cfg.norm_eps)
    q = apply_rope_fn(q, cos, sin)
    k = apply_rope_fn(k, cos, sin)
    return q, k, v


def _attn_full(cfg: Lfm2Config, q, k, v, true_len):
    return attn_block_causal(q, k, v, true_len)


def _attn_cached(cfg: Lfm2Config, q, kc, vc, ctx_len):
    """Decode attention over the fixed cache (q [1, Hq, D])."""
    from ...ops.nn.attention import sdpa_fixed_cache_fn
    t, hq, d = q.shape
    out = sdpa_fixed_cache_fn(q, kc, vc, ctx_len)
    return out.reshape(t, hq * d)


# ------------------------------------------------------------------ passes --

def init_caches(cfg: Lfm2Config, max_seq_len: int, dtype=jnp.float32):
    """Hybrid per-layer cache list: attention layers get {k, v}
    [MAX, Hk, D]; conv layers get {conv: [E, L_cache]}."""
    caches = []
    for l in range(cfg.num_layers):
        if cfg.is_attn(l):
            shape = (max_seq_len, cfg.num_kv_heads, cfg.head_dim)
            caches.append({"k": jnp.zeros(shape, dtype),
                           "v": jnp.zeros(shape, dtype)})
        else:
            caches.append({"conv": jnp.zeros(
                (cfg.hidden_size, cfg.conv_l_cache), dtype)})
    return caches


def forward_fn(cfg: Lfm2Config, p, tokens):
    s = tokens.shape[0]
    h = jnp.take(p["embed"], tokens, axis=0)
    cos, sin = p["rope_cos"][:s], p["rope_sin"][:s]
    for l, lp in enumerate(p["layers"]):
        x = rmsnorm_fn(h, lp["operator_norm_w"], cfg.norm_eps)
        if cfg.is_attn(l):
            q, k, v = _attn_qkv(cfg, lp, x, cos, sin)
            mix = _mm(_attn_full(cfg, q, k, v, jnp.int32(s)), lp["w_out"])
        else:
            mix, _ = _conv_mix_full(cfg, lp, x)
        h = h + mix
        y = rmsnorm_fn(h, lp["ffn_norm_w"], cfg.norm_eps)
        h = h + _mlp(lp, y)
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    return _head(cfg, p, h)


def _head(cfg: Lfm2Config, p, h):
    return _head_shared(p, h)


def prefill_fn(cfg: Lfm2Config, p, caches, tokens, true_len):
    """Padded prefill: writes KV rows / conv states; last-pos logits."""
    s = tokens.shape[0]
    h = jnp.take(p["embed"], tokens, axis=0)
    cos, sin = p["rope_cos"][:s], p["rope_sin"][:s]
    new_caches = []
    for l, lp in enumerate(p["layers"]):
        x = rmsnorm_fn(h, lp["operator_norm_w"], cfg.norm_eps)
        cache = caches[l]
        if cfg.is_attn(l):
            q, k, v = _attn_qkv(cfg, lp, x, cos, sin)
            kc = lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, 0, 0))
            vc = lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, 0, 0))
            new_caches.append({"k": kc, "v": vc})
            mix = _mm(_attn_full(cfg, q, k, v, true_len), lp["w_out"])
        else:
            mix, bx = _conv_mix_full(cfg, lp, x)
            # state = the last L_cache VALID inputs, right-aligned
            # (zero-filled when true_len < L — HF left-pads)
            L = cfg.conv_l_cache
            idx = true_len - L + jnp.arange(L)                # [L]
            rows = jnp.take(bx, jnp.clip(idx, 0, s - 1), axis=0)  # [L, E]
            rows = jnp.where((idx >= 0)[:, None], rows, 0)
            new_caches.append(
                {"conv": rows.T.astype(cache["conv"].dtype)})
        h = h + mix
        y = rmsnorm_fn(h, lp["ffn_norm_w"], cfg.norm_eps)
        h = h + _mlp(lp, y)
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    last = jnp.take(h, true_len - 1, axis=0)
    return new_caches, _head(cfg, p, last)


def decode_step_fn(cfg: Lfm2Config, p, caches, token, pos):
    h = jnp.take(p["embed"], token[None], axis=0)
    cos = lax.dynamic_slice_in_dim(p["rope_cos"], pos, 1, axis=0)
    sin = lax.dynamic_slice_in_dim(p["rope_sin"], pos, 1, axis=0)
    new_caches = []
    for l, lp in enumerate(p["layers"]):
        x = rmsnorm_fn(h, lp["operator_norm_w"], cfg.norm_eps)
        cache = caches[l]
        if cfg.is_attn(l):
            q, k, v = _attn_qkv(cfg, lp, x, cos, sin)
            kc = lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (pos, 0, 0))
            vc = lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (pos, 0, 0))
            new_caches.append({"k": kc, "v": vc})
            mix = _mm(_attn_cached(cfg, q, kc, vc, pos + 1), lp["w_out"])
        else:
            mix, state = _conv_mix_step(cfg, lp, x, cache["conv"])
            new_caches.append({"conv": state})
        h = h + mix
        y = rmsnorm_fn(h, lp["ffn_norm_w"], cfg.norm_eps)
        h = h + _mlp(lp, y)
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    return new_caches, _head(cfg, p, h[0])


def generate_scan_fn(cfg: Lfm2Config, n_steps: int, p, caches, token, pos):
    def step(carry, _):
        caches, tok, ps = carry
        caches, logits = decode_step_fn(cfg, p, caches, tok, ps)
        nxt = jnp.argmax(logits).astype(jnp.int32)
        return (caches, nxt, ps + 1), nxt

    (caches, token, pos), toks = lax.scan(
        step, (caches, token, pos), None, length=n_steps)
    return caches, toks


# ------------------------------------------------------------------- model --

class Lfm2Model(StandaloneCachedModel):
    """Parity-grade Lfm2 with its hybrid cache (shared scaffolding in
    models/_base.py)."""

    _prefill_fn = staticmethod(prefill_fn)
    _generate_scan_fn = staticmethod(generate_scan_fn)
    _forward_fn = staticmethod(forward_fn)
    _init_caches = staticmethod(init_caches)
    _decode_step_fn = staticmethod(decode_step_fn)
    _name = "lfm2"

    def __init__(self, config: Lfm2Config, params: dict, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        if "rope_cos" not in params:
            cos, sin = rope_init(config.max_position_embeddings,
                                 config.head_dim, config.rope_theta)
            params["rope_cos"] = cos.jax.astype(_F32)
            params["rope_sin"] = sin.jax.astype(_F32)
        self._setup()

    @classmethod
    def from_safetensors(cls, path, dtype=jnp.float32) -> "Lfm2Model":
        from ..safetensors import load_safetensors
        st = load_safetensors(path)
        hf = {}
        cj = Path(path if Path(path).is_dir() else Path(path).parent) \
            / "config.json"
        if cj.exists():
            hf = json.loads(cj.read_text())
        cfg = Lfm2Config.from_hf(hf)

        def t(name, transpose=False, dt=dtype):
            a = np.asarray(st.tensor_numpy(name))
            if transpose:
                a = a.T
            return jnp.asarray(a, dt)

        lps = []
        for l in range(cfg.num_layers):
            pre = f"model.layers.{l}."
            lp = {
                "operator_norm_w": t(pre + "operator_norm.weight", dt=_F32),
                "ffn_norm_w": t(pre + "ffn_norm.weight", dt=_F32),
                "w1": t(pre + "feed_forward.w1.weight", True),
                "w3": t(pre + "feed_forward.w3.weight", True),
                "w2": t(pre + "feed_forward.w2.weight", True),
            }
            if cfg.is_attn(l):
                lp.update({
                    "w_q": t(pre + "self_attn.q_proj.weight", True),
                    "w_k": t(pre + "self_attn.k_proj.weight", True),
                    "w_v": t(pre + "self_attn.v_proj.weight", True),
                    "w_out": t(pre + "self_attn.out_proj.weight", True),
                    "w_q_norm": t(pre + "self_attn.q_layernorm.weight",
                                  dt=_F32),
                    "w_k_norm": t(pre + "self_attn.k_layernorm.weight",
                                  dt=_F32),
                })
            else:
                conv_w = np.asarray(
                    st.tensor_numpy(pre + "conv.conv.weight"))  # [E, 1, L]
                lp["conv_w"] = jnp.asarray(conv_w[:, 0, :], dtype)
                lp["w_in"] = t(pre + "conv.in_proj.weight", True)
                lp["w_out"] = t(pre + "conv.out_proj.weight", True)
                if cfg.conv_bias:
                    lp["conv_b"] = t(pre + "conv.conv.bias")
                    lp["b_in"] = t(pre + "conv.in_proj.bias")
                    lp["b_out"] = t(pre + "conv.out_proj.bias")
            lps.append(lp)
        p: dict = {
            "embed": t("model.embed_tokens.weight"),
            "final_norm_w": t("model.embedding_norm.weight", dt=_F32),
            "lm_head": (t("lm_head.weight", True)
                        if "lm_head.weight" in st
                        and not cfg.tie_word_embeddings else None),
            "layers": lps,
        }
        return cls(cfg, p, dtype=dtype)
