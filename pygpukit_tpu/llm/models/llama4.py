"""Llama-4 / Llama-Guard-4 text model (reference:
src/pygpukit/llm/models/llama4.py:28-365 — parameterless QK L2 norm, iRoPE
temperature scaling, per-layer NoPE (no_rope_layers), SwiGLU MLP).

Functional JAX forward; HF Llama-4 text checkpoint names
(language_model.model.layers.* or model.layers.*).
"""

from __future__ import annotations

import functools
import json
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.nn.activation import swiglu_fn
from ...ops.nn.llama4 import sdpa_irope_fn
from ...ops.nn.norm import qk_l2norm_fn, rmsnorm_fn
from ...ops.matmul import _f32_precision
from ...ops.nn.rope import apply_rope_interleaved_fn

_F32 = jnp.float32


@dataclass
class Llama4Config:
    """reference: Llama4Config, llama4.py:30."""
    vocab_size: int = 202048
    hidden_size: int = 5120
    intermediate_size: int = 8192
    num_hidden_layers: int = 48
    num_attention_heads: int = 40
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    attn_scale: float = 0.1
    floor_scale: float = 8192.0
    use_qk_norm: bool = True
    max_position_embeddings: int = 8192
    no_rope_layers: list | None = None   # 0 = NoPE at that layer, 1 = RoPE

    @classmethod
    def from_json(cls, path) -> "Llama4Config":
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        tc = data.get("text_config", data)
        return cls(
            vocab_size=tc.get("vocab_size", 202048),
            hidden_size=tc.get("hidden_size", 5120),
            # dense layers use intermediate_size_mlp in HF llama4 configs
            # (intermediate_size is the MoE expert width)
            intermediate_size=tc.get("intermediate_size_mlp",
                                     tc.get("intermediate_size", 8192)),
            num_hidden_layers=tc.get("num_hidden_layers", 48),
            num_attention_heads=tc.get("num_attention_heads", 40),
            num_key_value_heads=tc.get("num_key_value_heads", 8),
            head_dim=tc.get("head_dim", 128),
            rms_norm_eps=tc.get("rms_norm_eps", 1e-5),
            rope_theta=tc.get("rope_theta", 500000.0),
            attn_scale=tc.get("attn_scale", 0.1),
            floor_scale=tc.get("floor_scale", 8192.0),
            use_qk_norm=tc.get("use_qk_norm", True),
            max_position_embeddings=min(
                tc.get("max_position_embeddings", 8192), 1 << 20),
            no_rope_layers=tc.get("no_rope_layers"),
        )


def _dot(x, w):
    if isinstance(w, dict):  # quantized {"q","scale"} leaf (quant.py)
        from ..model import _mm
        return _mm(x, w, out_dtype=_F32)
    prec = (_f32_precision()
            if x.dtype == _F32 and w.dtype == _F32 else None)
    return jnp.dot(x, w, preferred_element_type=_F32, precision=prec)


def llama4_forward_fn(cfg: Llama4Config, p, tokens):
    """tokens [S] -> logits [S, V].

    Per-layer rope flag comes from the stacked ``use_rope`` array (1 = RoPE,
    0 = NoPE with iRoPE temperature scaling) so the layer loop stays a scan.
    """
    s = tokens.shape[0]
    h = jnp.take(p["embed"], tokens, axis=0)
    positions = jnp.arange(s)
    rope_cos, rope_sin = p["rope_cos"][:s], p["rope_sin"][:s]
    hq, hk, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)

    def block(h, lp):
        x = rmsnorm_fn(h, lp["attn_norm_w"], cfg.rms_norm_eps)
        q = _dot(x, lp["w_q"]) \
            .astype(x.dtype).reshape(s, hq, d)
        k = _dot(x, lp["w_k"]) \
            .astype(x.dtype).reshape(s, hk, d)
        v = _dot(x, lp["w_v"]) \
            .astype(x.dtype).reshape(s, hk, d)
        use_rope = lp["use_rope"]          # traced 0/1 scalar per layer
        # HF semantics: interleaved-pair rope on rope layers; QK L2 norm
        # exists ONLY on rope layers (after rope); NoPE layers keep raw q/k
        q_r = apply_rope_interleaved_fn(q, rope_cos, rope_sin)
        k_r = apply_rope_interleaved_fn(k, rope_cos, rope_sin)
        if cfg.use_qk_norm:
            q_r = qk_l2norm_fn(q_r, cfg.rms_norm_eps)
            k_r = qk_l2norm_fn(k_r, cfg.rms_norm_eps)
        q = jnp.where(use_rope > 0, q_r, q)
        k = jnp.where(use_rope > 0, k_r, k)
        # iRoPE temperature only on NoPE layers (HF semantics)
        attn_rope = sdpa_irope_fn(q, k, v, positions, 0.0, cfg.floor_scale)
        attn_nope = sdpa_irope_fn(q, k, v, positions, cfg.attn_scale,
                                  cfg.floor_scale)
        attn = jnp.where(use_rope > 0, attn_rope, attn_nope)
        o = _dot(attn.reshape(s, hq * d), lp["w_o"]).astype(h.dtype)
        h = h + o
        y = rmsnorm_fn(h, lp["mlp_norm_w"], cfg.rms_norm_eps)
        gate = _dot(y, lp["w_gate"]) \
            .astype(y.dtype)
        up = _dot(y, lp["w_up"]) \
            .astype(y.dtype)
        mlp = _dot(swiglu_fn(gate, up), lp["w_down"]).astype(y.dtype)
        return h + mlp, None

    h, _ = lax.scan(block, h, p["layers"])
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.rms_norm_eps)
    if p.get("lm_head") is not None:
        return _dot(h, p["lm_head"])
    return lax.dot_general(h, p["embed"], (((1,), (1,)), ((), ())),
                           preferred_element_type=_F32,
                           precision=(_f32_precision()
                                      if h.dtype == _F32
                                      and p["embed"].dtype == _F32
                                      else None))


class Llama4Model:
    """reference: Llama4Model, llama4.py:219."""

    def __init__(self, config: Llama4Config, params: dict):
        self.config = config
        self.params = params
        if "rope_cos" not in params:
            from ...ops.nn import rope as rope_mod
            cos, sin = rope_mod.rope_init(
                config.max_position_embeddings, config.head_dim,
                config.rope_theta)
            params["rope_cos"], params["rope_sin"] = cos.jax, sin.jax
        self._fwd = jax.jit(functools.partial(llama4_forward_fn, config))

    def forward(self, input_ids) -> jnp.ndarray:
        return self._fwd(self.params,
                         jnp.asarray(np.asarray(input_ids, np.int32)))

    __call__ = forward

    def generate(self, input_ids, max_new_tokens: int = 32,
                 eos_token_id: int | None = None) -> list[int]:
        """Greedy generation (reference: generate, llama4.py:365)."""
        ids = list(np.asarray(input_ids, np.int32).reshape(-1))
        out = []
        for _ in range(max_new_tokens):
            logits = self.forward(ids)
            tok = int(np.asarray(logits[-1]).argmax())
            out.append(tok)
            ids.append(tok)
            if eos_token_id is not None and tok == eos_token_id:
                break
        return out

    @classmethod
    def init_random(cls, config: Llama4Config, seed: int = 0,
                    dtype=jnp.float32) -> "Llama4Model":
        cfg = config
        rng = np.random.default_rng(seed)
        e = cfg.hidden_size
        hq, hk, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)
        L = cfg.num_hidden_layers

        def w(*shape):
            return jnp.asarray(
                rng.standard_normal(shape, np.float32) * 0.02, dtype)

        no_rope = cfg.no_rope_layers or [1] * L
        p = {
            "embed": w(cfg.vocab_size, e),
            "final_norm_w": jnp.ones((e,), _F32),
            "lm_head": None,
            "layers": {
                "attn_norm_w": jnp.ones((L, e), _F32),
                "mlp_norm_w": jnp.ones((L, e), _F32),
                "w_q": w(L, e, hq * d),
                "w_k": w(L, e, hk * d),
                "w_v": w(L, e, hk * d),
                "w_o": w(L, hq * d, e),
                "w_gate": w(L, e, cfg.intermediate_size),
                "w_up": w(L, e, cfg.intermediate_size),
                "w_down": w(L, cfg.intermediate_size, e),
                "use_rope": jnp.asarray(no_rope, jnp.int32),
            },
        }
        return cls(cfg, p)

    @classmethod
    def from_safetensors(cls, model_path, dtype=jnp.bfloat16) -> "Llama4Model":
        """reference: from_safetensors, llama4.py:268."""
        from ..safetensors import load_safetensors
        mp = Path(model_path)
        st = load_safetensors(mp)
        cfg = Llama4Config.from_json(mp / "config.json") \
            if (mp / "config.json").exists() else Llama4Config()
        names = set(st.keys())
        pre = ("language_model.model."
               if any(n.startswith("language_model.") for n in names)
               else "model.")

        def t(name, transpose=False):
            arr = np.asarray(st.tensor_numpy(name))
            if transpose:
                arr = arr.T
            return jnp.asarray(np.ascontiguousarray(arr), dtype)

        L = cfg.num_hidden_layers
        no_rope = cfg.no_rope_layers or [1] * L
        layers = []
        for i in range(L):
            b = f"{pre}layers.{i}"
            layers.append({
                "attn_norm_w": t(f"{b}.input_layernorm.weight").astype(_F32),
                "mlp_norm_w": t(f"{b}.post_attention_layernorm.weight")
                .astype(_F32),
                "w_q": t(f"{b}.self_attn.q_proj.weight", True),
                "w_k": t(f"{b}.self_attn.k_proj.weight", True),
                "w_v": t(f"{b}.self_attn.v_proj.weight", True),
                "w_o": t(f"{b}.self_attn.o_proj.weight", True),
                "w_gate": t(f"{b}.feed_forward.gate_proj.weight", True)
                if f"{b}.feed_forward.gate_proj.weight" in names
                else t(f"{b}.mlp.gate_proj.weight", True),
                "w_up": t(f"{b}.feed_forward.up_proj.weight", True)
                if f"{b}.feed_forward.up_proj.weight" in names
                else t(f"{b}.mlp.up_proj.weight", True),
                "w_down": t(f"{b}.feed_forward.down_proj.weight", True)
                if f"{b}.feed_forward.down_proj.weight" in names
                else t(f"{b}.mlp.down_proj.weight", True),
                "use_rope": jnp.int32(no_rope[i]),
            })
        p = {
            "embed": t(f"{pre}embed_tokens.weight"),
            "final_norm_w": t(f"{pre}norm.weight").astype(_F32),
            "lm_head": (t("language_model.lm_head.weight", True)
                        if "language_model.lm_head.weight" in names
                        else (t("lm_head.weight", True)
                              if "lm_head.weight" in names else None)),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }
        return cls(cfg, p)
