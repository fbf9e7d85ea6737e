"""GPT-OSS family (gpt-oss-20b / gpt-oss-120b class): MoE with attention
sinks, alternating sliding/full layers, yarn rope.

Beyond-reference family (no openai-oss support in the reference; follows
the llama4.py / deepseek.py standalone-model pattern with a
transformers-parity contract).

Mechanisms (all transformers-exact, modeling_gpt_oss.py):
- **Attention sinks**: each head carries a learned sink logit that joins
  the softmax denominator and is then dropped — attention mass can "park"
  on the sink instead of being forced onto real positions.
- **Alternating sliding/full attention** via config.layer_types, window
  as a traced per-layer leaf (the gemma2 mechanism here).
- **Clamped gated SwiGLU experts with biases**: gate/up INTERLEAVED in
  one gate_up tensor (gate = [..., ::2]); gate clamped above at
  ``limit``, up clamped both sides; glu = gate * sigmoid(alpha * gate);
  out = (up + 1) * glu. Router: softmax over the top-k logits only.
  Expert compute uses the exact dense formulation (one einsum over all
  experts — the parity path; large-scale serving should gather).
- yarn rope with truncate=False (the checkpoints ship factor 32).

Decode runs a fixed [L, MAX, Hk, D] KV cache with fori_loop layer
carries (in-place rows) and the device-side chunk loop.
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
from ...ops.nn.rope import apply_rope_fn, rope_init, rope_init_yarn

_F32 = jnp.float32


@dataclass
class GptOssConfig:
    vocab_size: int = 201088
    hidden_size: int = 2880
    num_layers: int = 24
    num_heads: int = 64
    num_kv_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 2880
    num_experts: int = 32
    num_experts_per_tok: int = 4
    sliding_window: int = 128
    layer_types: tuple = ()
    rope_theta: float = 150000.0
    rope_scaling: dict | None = None
    norm_eps: float = 1e-5
    max_position_embeddings: int = 131072
    swiglu_alpha: float = 1.702
    swiglu_limit: float = 7.0
    tie_word_embeddings: bool = False

    @classmethod
    def from_hf(cls, hf: dict) -> "GptOssConfig":
        n_layers = hf.get("num_hidden_layers", 24)
        lt = hf.get("layer_types") or [
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(n_layers)]
        return cls(
            vocab_size=hf.get("vocab_size", 201088),
            hidden_size=hf.get("hidden_size", 2880),
            num_layers=n_layers,
            num_heads=hf.get("num_attention_heads", 64),
            num_kv_heads=hf.get("num_key_value_heads", 8),
            head_dim=hf.get("head_dim", 64),
            intermediate_size=hf.get("intermediate_size", 2880),
            num_experts=hf.get("num_local_experts", 32),
            num_experts_per_tok=hf.get("num_experts_per_tok", 4),
            sliding_window=hf.get("sliding_window", 128),
            layer_types=tuple(lt),
            rope_theta=hf.get("rope_theta", 150000.0),
            rope_scaling=hf.get("rope_scaling"),
            norm_eps=hf.get("rms_norm_eps", 1e-5),
            max_position_embeddings=hf.get("max_position_embeddings",
                                           131072),
            swiglu_limit=hf.get("swiglu_limit", 7.0),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
        )


def _prec(*arrs):
    if all(a.dtype == _F32 for a in arrs):
        from ...ops.matmul import _f32_precision
        return _f32_precision()
    return None


def _build_rope(cfg: GptOssConfig):
    scaling = cfg.rope_scaling or {}
    st = scaling.get("rope_type", scaling.get("type", ""))
    if st == "yarn":
        return rope_init_yarn(
            cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
            scaling.get("factor", 1.0),
            scaling.get("original_max_position_embeddings",
                        cfg.max_position_embeddings),
            beta_fast=scaling.get("beta_fast") or 32.0,
            beta_slow=scaling.get("beta_slow") or 1.0,
            attention_factor=scaling.get("attention_factor"),
            truncate=scaling.get("truncate", True))
    return rope_init(cfg.max_position_embeddings, cfg.head_dim,
                     cfg.rope_theta)


def _qkv(cfg: GptOssConfig, lp, x):
    t = x.shape[0]
    d = cfg.head_dim
    pr = _prec(x, lp["w_q"])
    q = (jnp.dot(x, lp["w_q"], precision=pr)
         + lp["b_q"]).reshape(t, cfg.num_heads, d)
    k = (jnp.dot(x, lp["w_k"], precision=pr)
         + lp["b_k"]).reshape(t, cfg.num_kv_heads, d)
    v = (jnp.dot(x, lp["w_v"], precision=pr)
         + lp["b_v"]).reshape(t, cfg.num_kv_heads, d)
    return q, k, v


def _sink_softmax(scores, sinks, mask):
    """scores [H, T, S], sinks [H], mask [.., T, S] -> weights [H, T, S].

    The sink acts as one extra softmax column per head that is dropped
    after normalisation (HF eager_attention_forward)."""
    scores = jnp.where(mask, scores, -1e30)
    snk = sinks.astype(_F32)[:, None, None]                   # [H,1,1]
    m = jnp.maximum(jnp.max(scores, -1, keepdims=True), snk)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, -1, keepdims=True) + jnp.exp(snk - m)
    return e / denom


def _attn_windowed(cfg, lp, q, k, v, pos_q, ctx_len):
    """Window selected by the per-layer leaf (0 = full attention)."""
    t, s = q.shape[0], k.shape[0]
    kpos = jnp.arange(s)[None, :]
    qpos = pos_q + jnp.arange(t)[:, None]
    base = (kpos <= qpos) & (kpos < ctx_len)
    win = lp["attn_window"]
    wmask = jnp.where(win > 0, kpos > qpos - win, True)
    hq, d = cfg.num_heads, cfg.head_dim
    g = hq // cfg.num_kv_heads
    qh = q.astype(_F32).reshape(t, cfg.num_kv_heads, g, d)
    pr = _prec(q, k)
    scores = jnp.einsum("tkgd,skd->kgts", qh, k.astype(_F32),
                        precision=pr) * (d ** -0.5)
    scores = scores.reshape(hq, t, s)
    w = _sink_softmax(scores, lp["sinks"], (base & wmask)[None])
    w = w.reshape(cfg.num_kv_heads, g, t, s)
    out = jnp.einsum("kgts,skd->tkgd", w, v.astype(_F32), precision=pr)
    return out.reshape(t, hq * d)


def _moe(cfg: GptOssConfig, lp, x):
    """Router (softmax over the top-k logits only) + clamped-SwiGLU
    experts with biases, dense one-hot dispatch (exact)."""
    t = x.shape[0]
    n = cfg.num_experts
    pr = _prec(x, lp["w_router"])
    logits = (jnp.dot(x.astype(_F32), lp["w_router"], precision=pr)
              + lp["b_router"][None, :])                      # [T, N]
    topv, topi = lax.top_k(logits, cfg.num_experts_per_tok)
    topw = jax.nn.softmax(topv, axis=-1)
    wts = jnp.zeros((t, n), _F32).at[
        jnp.arange(t)[:, None], topi].set(topw)               # [T, N]
    gu = jnp.einsum("te,neI->tnI", x.astype(_F32),
                    lp["w_experts_gate_up"].astype(_F32), precision=pr)
    gu = gu + lp["b_experts_gate_up"].astype(_F32)[None]
    gate, up = gu[..., 0::2], gu[..., 1::2]
    gate = jnp.minimum(gate, cfg.swiglu_limit)
    up = jnp.clip(up, -cfg.swiglu_limit, cfg.swiglu_limit)
    glu = gate * jax.nn.sigmoid(gate * cfg.swiglu_alpha)
    act = (up + 1.0) * glu
    yo = jnp.einsum("tnI,nIe->tne", act,
                    lp["w_experts_down"].astype(_F32), precision=pr)
    yo = yo + lp["b_experts_down"].astype(_F32)[None]
    return jnp.einsum("tne,tn->te", yo, wts,
                      precision=pr).astype(x.dtype)


def _layer_tail(cfg, lp, h, attn):
    pr = _prec(h, lp["w_o"])
    o = jnp.dot(attn.astype(h.dtype), lp["w_o"], precision=pr) + lp["b_o"]
    h = h + o.astype(h.dtype)
    y = rmsnorm_fn(h, lp["mlp_norm_w"], cfg.norm_eps)
    return h + _moe(cfg, lp, y)


def _head(cfg, p, h):
    head = p["lm_head"] if p.get("lm_head") is not None else p["embed"].T
    return jnp.dot(h, head, preferred_element_type=_F32,
                   precision=_prec(h, head))


def forward_fn(cfg: GptOssConfig, p, tokens):
    """tokens [S] -> logits [S, V] (uncached)."""
    s = tokens.shape[0]
    h = jnp.take(p["embed"], tokens, axis=0)
    cos, sin = p["rope_cos"][:s], p["rope_sin"][:s]

    def body(i, h):
        lp = jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
            p["layers"])
        x = rmsnorm_fn(h, lp["attn_norm_w"], cfg.norm_eps)
        q, k, v = _qkv(cfg, lp, x)
        q = apply_rope_fn(q, cos, sin)
        k = apply_rope_fn(k, cos, sin)
        attn = _attn_windowed(cfg, lp, q, k, v, 0, s)
        return _layer_tail(cfg, lp, h, attn)

    h = lax.fori_loop(0, cfg.num_layers, body, h)
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    return _head(cfg, p, h)


def prefill_fn(cfg: GptOssConfig, p, k_cache, v_cache, tokens, true_len):
    s = tokens.shape[0]
    h = jnp.take(p["embed"], tokens, axis=0)
    cos, sin = p["rope_cos"][:s], p["rope_sin"][:s]

    def body(i, st):
        h, kc, vc = st
        lp = jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
            p["layers"])
        x = rmsnorm_fn(h, lp["attn_norm_w"], cfg.norm_eps)
        q, k, v = _qkv(cfg, lp, x)
        q = apply_rope_fn(q, cos, sin)
        k = apply_rope_fn(k, cos, sin)
        kc = lax.dynamic_update_slice(kc, k[None].astype(kc.dtype),
                                      (i, 0, 0, 0))
        vc = lax.dynamic_update_slice(vc, v[None].astype(vc.dtype),
                                      (i, 0, 0, 0))
        attn = _attn_windowed(cfg, lp, q, k, v, 0, true_len)
        return (_layer_tail(cfg, lp, h, attn), kc, vc)

    h, k_cache, v_cache = lax.fori_loop(0, cfg.num_layers, body,
                                        (h, k_cache, v_cache))
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    last = jnp.take(h, true_len - 1, axis=0)
    return k_cache, v_cache, _head(cfg, p, last)


def decode_step_fn(cfg: GptOssConfig, p, k_cache, v_cache, token, pos):
    h = jnp.take(p["embed"], token[None], axis=0)
    cos = lax.dynamic_slice_in_dim(p["rope_cos"], pos, 1, axis=0)
    sin = lax.dynamic_slice_in_dim(p["rope_sin"], pos, 1, axis=0)

    def body(i, st):
        h, kc, vc = st
        lp = jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
            p["layers"])
        x = rmsnorm_fn(h, lp["attn_norm_w"], cfg.norm_eps)
        q, k, v = _qkv(cfg, lp, x)
        q = apply_rope_fn(q, cos, sin)
        k = apply_rope_fn(k, cos, sin)
        kc = lax.dynamic_update_slice(kc, k[None].astype(kc.dtype),
                                      (i, pos, 0, 0))
        vc = lax.dynamic_update_slice(vc, v[None].astype(vc.dtype),
                                      (i, pos, 0, 0))
        kl = lax.dynamic_index_in_dim(kc, i, 0, keepdims=False)
        vl = lax.dynamic_index_in_dim(vc, i, 0, keepdims=False)
        attn = _attn_windowed(cfg, lp, q, kl, vl, pos, pos + 1)
        return (_layer_tail(cfg, lp, h, attn), kc, vc)

    h, k_cache, v_cache = lax.fori_loop(0, cfg.num_layers, body,
                                        (h, k_cache, v_cache))
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    return k_cache, v_cache, _head(cfg, p, h[0])


def generate_scan_fn(cfg: GptOssConfig, n_steps: int, p, k_cache, v_cache,
                     token, pos):
    def step(carry, _):
        kc, vc, tok, ps = carry
        kc, vc, logits = decode_step_fn(cfg, p, kc, vc, tok, ps)
        nxt = jnp.argmax(logits).astype(jnp.int32)
        return (kc, vc, nxt, ps + 1), nxt

    (k_cache, v_cache, token, pos), toks = lax.scan(
        step, (k_cache, v_cache, token, pos), None, length=n_steps)
    return k_cache, v_cache, toks


class GptOssModel:
    """Parity-grade GPT-OSS model with cached sink-attention decode."""

    _name = "gptoss"

    # -- hybrid-engine hooks (llm/serving_hybrid.py) -------------------------
    # the engine is pytree-generic: expose the twin stacked KV caches as one
    # {"k", "v"} pytree so GPT-OSS batch-serves through HybridServingEngine

    @staticmethod
    def _init_caches(cfg: GptOssConfig, max_seq_len: int, dtype=jnp.float32):
        shape = (cfg.num_layers, max_seq_len, cfg.num_kv_heads, cfg.head_dim)
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}

    @staticmethod
    def _prefill_fn(cfg: GptOssConfig, p, caches, tokens, true_len):
        kc, vc, logits = prefill_fn(cfg, p, caches["k"], caches["v"],
                                    tokens, true_len)
        return {"k": kc, "v": vc}, logits

    @staticmethod
    def _decode_step_fn(cfg: GptOssConfig, p, caches, token, pos):
        kc, vc, logits = decode_step_fn(cfg, p, caches["k"], caches["v"],
                                        token, pos)
        return {"k": kc, "v": vc}, logits

    def __init__(self, config: GptOssConfig, params: dict,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        if "rope_cos" not in params:
            cos, sin = _build_rope(config)
            params["rope_cos"], params["rope_sin"] = cos.jax, sin.jax
        self._fwd = jax.jit(functools.partial(forward_fn, config))
        self.k_cache = None
        self.v_cache = None
        self.pos = 0
        self._prefill_exes: dict = {}
        self._gen_exes: dict = {}

    def forward(self, input_ids):
        return self._fwd(self.params,
                         jnp.asarray(np.asarray(input_ids, np.int32)))

    def get_logits(self, input_ids) -> np.ndarray:
        return np.asarray(self.forward(input_ids), np.float32)

    def init_fixed_cache(self, max_seq_len: int):
        cfg = self.config
        self.max_seq_len = max_seq_len
        shape = (cfg.num_layers, max_seq_len, cfg.num_kv_heads, cfg.head_dim)
        self.k_cache = jnp.zeros(shape, self.dtype)
        self.v_cache = jnp.zeros(shape, self.dtype)
        self.pos = 0

    def generate(self, input_ids, max_new_tokens: int = 32,
                 chunk_size: int = 64) -> list[int]:
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        n = len(ids)
        if self.k_cache is None:
            need = n + max_new_tokens + 1
            self.init_fixed_cache(max(1 << (need - 1).bit_length(), 64))
        bucket = max(1 << (n - 1).bit_length(), 16)
        if bucket not in self._prefill_exes:
            fn = functools.partial(prefill_fn, self.config)
            self._prefill_exes[bucket] = capture(
                fn, self.params, self.k_cache, self.v_cache,
                jnp.zeros((bucket,), jnp.int32), jnp.int32(1),
                donate_argnums=(1, 2), name=f"gptoss_prefill_{bucket}")
        padded = np.zeros((bucket,), np.int32)
        padded[:n] = ids
        self.k_cache, self.v_cache, logits = self._prefill_exes[
            bucket].replay(self.params, self.k_cache, self.v_cache,
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
                    fn, self.params, self.k_cache, self.v_cache,
                    jnp.int32(0), jnp.int32(0), donate_argnums=(1, 2),
                    name=f"gptoss_generate_{steps}")
            self.k_cache, self.v_cache, toks = self._gen_exes[steps].replay(
                self.params, self.k_cache, self.v_cache, jnp.int32(cur),
                jnp.int32(self.pos))
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

    @classmethod
    def from_safetensors(cls, path, dtype=jnp.float32) -> "GptOssModel":
        from ..safetensors import load_safetensors
        st = load_safetensors(path)
        hf = {}
        cj = Path(path if Path(path).is_dir() else Path(path).parent) \
            / "config.json"
        if cj.exists():
            hf = json.loads(cj.read_text())
        cfg = GptOssConfig.from_hf(hf)

        def t(name, transpose=False, dt=dtype):
            a = np.asarray(st.tensor_numpy(name))
            if transpose:
                a = a.T
            return jnp.asarray(a, dt)

        L = cfg.num_layers
        lps = []
        for l in range(L):
            pre = f"model.layers.{l}."
            lps.append({
                "attn_norm_w": t(pre + "input_layernorm.weight", dt=_F32),
                "mlp_norm_w": t(pre + "post_attention_layernorm.weight",
                                dt=_F32),
                "w_q": t(pre + "self_attn.q_proj.weight", True),
                "b_q": t(pre + "self_attn.q_proj.bias"),
                "w_k": t(pre + "self_attn.k_proj.weight", True),
                "b_k": t(pre + "self_attn.k_proj.bias"),
                "w_v": t(pre + "self_attn.v_proj.weight", True),
                "b_v": t(pre + "self_attn.v_proj.bias"),
                "w_o": t(pre + "self_attn.o_proj.weight", True),
                "b_o": t(pre + "self_attn.o_proj.bias"),
                "sinks": t(pre + "self_attn.sinks", dt=_F32),
                "w_router": t(pre + "mlp.router.weight", True, _F32),
                "b_router": t(pre + "mlp.router.bias", dt=_F32),
                # experts ship as stacked parameters already ([N, E, 2I] /
                # [N, I, E]), NOT per-expert submodules
                "w_experts_gate_up": t(pre + "mlp.experts.gate_up_proj"),
                "b_experts_gate_up": t(pre + "mlp.experts.gate_up_proj_bias"),
                "w_experts_down": t(pre + "mlp.experts.down_proj"),
                "b_experts_down": t(pre + "mlp.experts.down_proj_bias"),
                "attn_window": jnp.int32(
                    cfg.sliding_window
                    if cfg.layer_types[l] == "sliding_attention" else 0),
            })
        p: dict = {
            "embed": t("model.embed_tokens.weight"),
            "final_norm_w": t("model.norm.weight", dt=_F32),
            "lm_head": (t("lm_head.weight", True)
                        if "lm_head.weight" in st else None),
            "layers": {k: jnp.stack([lp[k] for lp in lps])
                       for k in lps[0]},
        }
        return cls(cfg, p, dtype=dtype)
