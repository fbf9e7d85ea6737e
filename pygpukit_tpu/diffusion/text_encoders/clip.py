"""CLIP text encoder (reference: src/pygpukit/diffusion/text_encoders/clip.py
— pooled + sequence embeddings for SD/SDXL/FLUX conditioning).

Functional JAX forward over HF CLIPTextModel checkpoint weights; verified
against transformers in tests.
"""

from __future__ import annotations

import functools
import json
import math
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.nn.norm import layernorm_fn

_F32 = jnp.float32


@dataclass
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    eos_token_id: int = 49407
    hidden_act: str = "quick_gelu"

    @classmethod
    def from_hf(cls, hf: dict) -> "CLIPTextConfig":
        tc = hf.get("text_config", hf)
        return cls(
            vocab_size=tc.get("vocab_size", 49408),
            hidden_size=tc.get("hidden_size", 768),
            num_layers=tc.get("num_hidden_layers", 12),
            num_heads=tc.get("num_attention_heads", 12),
            intermediate_size=tc.get("intermediate_size", 3072),
            max_position_embeddings=tc.get("max_position_embeddings", 77),
            eos_token_id=tc.get("eos_token_id", 49407),
            hidden_act=tc.get("hidden_act", "quick_gelu"),
        )


def _act(name: str, x):
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x)


def clip_text_fn(cfg: CLIPTextConfig, p, ids, penultimate: bool = False):
    """ids [S] -> (hidden [S,E], pooled [E]).

    ``penultimate=True`` returns the SECOND-TO-LAST layer's hidden states
    (pre-final-layernorm) — the SD3/SDXL conditioning convention
    (diffusers: hidden_states[-2]); pooled is always the final-layer EOS
    hidden, passed through ``text_projection`` when the checkpoint has one
    (CLIPTextModelWithProjection)."""
    s = ids.shape[0]
    x = jnp.take(p["tok_embed"], ids, axis=0) + p["pos_embed"][:s]
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    causal = (j > i)[None]
    n_heads = cfg.num_heads
    d = cfg.hidden_size // n_heads

    def block(x, lp):
        h = layernorm_fn(x, lp["ln1.w"], lp["ln1.b"])
        q = (jnp.dot(h, lp["q.w"]) + lp["q.b"]).reshape(s, n_heads, d)
        k = (jnp.dot(h, lp["k.w"]) + lp["k.b"]).reshape(s, n_heads, d)
        v = (jnp.dot(h, lp["v.w"]) + lp["v.b"]).reshape(s, n_heads, d)
        qh = q.transpose(1, 0, 2).astype(_F32)
        kh = k.transpose(1, 0, 2).astype(_F32)
        vh = v.transpose(1, 0, 2).astype(_F32)
        scores = jnp.einsum("hqd,hkd->hqk", qh, kh) / math.sqrt(d)
        scores = jnp.where(causal, -1e30, scores)
        att = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, -1), vh)
        att = att.transpose(1, 0, 2).reshape(s, -1).astype(x.dtype)
        x = x + jnp.dot(att, lp["out.w"]) + lp["out.b"]
        h = layernorm_fn(x, lp["ln2.w"], lp["ln2.b"])
        h = _act(cfg.hidden_act, jnp.dot(h, lp["fc1.w"]) + lp["fc1.b"])
        x = x + jnp.dot(h, lp["fc2.w"]) + lp["fc2.b"]
        return x, None

    if penultimate:
        # run N-1 layers scanned, keep that hidden, run the final layer
        import jax as _jax
        head = _jax.tree.map(lambda a: a[:-1], p["layers"])
        tail = _jax.tree.map(lambda a: a[-1], p["layers"])
        x, _ = lax.scan(block, x, head)
        hidden_out = x
        x, _ = block(x, tail)
    else:
        x, _ = lax.scan(block, x, p["layers"])
        hidden_out = None
    x = layernorm_fn(x, p["final_ln.w"], p["final_ln.b"])
    # pooled = hidden at the FIRST EOS occurrence (transformers pools via
    # (ids == eos).int().argmax(-1), whose argmax picks the first match).
    # SD3's CLIP-L/G tokenizers pad with the eos token, so taking the LAST
    # match would read a pad position instead of the true EOS.
    eos_pos = jnp.argmin(jnp.where(ids == cfg.eos_token_id,
                                   jnp.arange(s), s))
    pooled = x[eos_pos]
    if "text_projection.w" in p:
        pooled = jnp.dot(pooled, p["text_projection.w"])
    return (hidden_out if penultimate else x), pooled


class CLIPTextEncoder:
    def __init__(self, config: CLIPTextConfig, params: dict):
        self.config = config
        self.params = params
        self._fn = jax.jit(functools.partial(clip_text_fn, config),
                           static_argnames=("penultimate",))

    def __call__(self, ids,
                 penultimate: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
        # params are f32: without the HIGHEST-precision scope TPU DEFAULT
        # bf16-izes the dots (1.3e-2 pooled err vs transformers; 3e-3 after)
        from ...ops.precision import f32_matmul_context
        with f32_matmul_context(self.params):
            return self._fn(self.params,
                            jnp.asarray(np.asarray(ids, np.int32)),
                            penultimate=penultimate)

    @classmethod
    def from_safetensors(cls, path) -> "CLIPTextEncoder":
        from ...llm.safetensors import load_safetensors
        st = load_safetensors(path)
        hf = {}
        cj = Path(path if Path(path).is_dir() else Path(path).parent) / "config.json"
        if cj.exists():
            hf = json.loads(cj.read_text())
        cfg = CLIPTextConfig.from_hf(hf)
        pre = ("text_model." if "text_model.embeddings.token_embedding.weight"
               in st.keys() else "")

        def t(name):
            return jnp.asarray(np.asarray(st.tensor_numpy(pre + name)), _F32)

        def lin(src, dst, out):
            out[f"{dst}.w"] = jnp.asarray(
                np.asarray(st.tensor_numpy(f"{pre}{src}.weight")).T, _F32)
            out[f"{dst}.b"] = t(f"{src}.bias")

        p = {
            "tok_embed": t("embeddings.token_embedding.weight"),
            "pos_embed": t("embeddings.position_embedding.weight"),
            "final_ln.w": t("final_layer_norm.weight"),
            "final_ln.b": t("final_layer_norm.bias"),
        }
        # CLIPTextModelWithProjection (SD3/SDXL text_encoder snapshots)
        if "text_projection.weight" in st.keys():
            p["text_projection.w"] = jnp.asarray(
                np.asarray(st.tensor_numpy("text_projection.weight")).T, _F32)
        layers = []
        for i in range(cfg.num_layers):
            b = f"encoder.layers.{i}"
            lp = {
                "ln1.w": t(f"{b}.layer_norm1.weight"),
                "ln1.b": t(f"{b}.layer_norm1.bias"),
                "ln2.w": t(f"{b}.layer_norm2.weight"),
                "ln2.b": t(f"{b}.layer_norm2.bias"),
            }
            lin(f"{b}.self_attn.q_proj", "q", lp)
            lin(f"{b}.self_attn.k_proj", "k", lp)
            lin(f"{b}.self_attn.v_proj", "v", lp)
            lin(f"{b}.self_attn.out_proj", "out", lp)
            lin(f"{b}.mlp.fc1", "fc1", lp)
            lin(f"{b}.mlp.fc2", "fc2", lp)
            layers.append(lp)
        p["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        return cls(cfg, p)
