"""T5 encoder (reference: src/pygpukit/diffusion/text_encoders/t5.py —
sharded model-0000X-of-0000Y loading for FLUX/SD3's T5-XXL conditioning).

T5 specifics handled: RMSNorm without bias, relative position bias buckets
(bidirectional), gated-GELU feed-forward, no attention scaling (T5 bakes the
scale into the weights).
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

_F32 = jnp.float32


@dataclass
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 1024
    num_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"

    @classmethod
    def from_hf(cls, hf: dict) -> "T5Config":
        return cls(
            vocab_size=hf.get("vocab_size", 32128),
            d_model=hf.get("d_model", 512),
            d_kv=hf.get("d_kv", 64),
            d_ff=hf.get("d_ff", 1024),
            num_layers=hf.get("num_layers", 6),
            num_heads=hf.get("num_heads", 8),
            relative_attention_num_buckets=hf.get(
                "relative_attention_num_buckets", 32),
            relative_attention_max_distance=hf.get(
                "relative_attention_max_distance", 128),
            layer_norm_epsilon=hf.get("layer_norm_epsilon", 1e-6),
            feed_forward_proj=hf.get("feed_forward_proj", "gated-gelu"),
        )


def t5_rmsnorm(x, w, eps):
    xf = x.astype(_F32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * lax.rsqrt(var + eps) * w.astype(_F32)).astype(x.dtype)


def _relative_buckets(rel_pos, num_buckets: int, max_distance: int):
    """Bidirectional T5 relative-position bucketing."""
    num_buckets //= 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(_F32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def t5_encoder_fn(cfg: T5Config, p, ids):
    """ids [S] -> hidden [S, d_model]."""
    s = ids.shape[0]
    x = jnp.take(p["tok_embed"], ids, axis=0)
    # relative position bias from layer 0's table, shared across layers
    ctx = jnp.arange(s)[:, None]
    mem = jnp.arange(s)[None, :]
    buckets = _relative_buckets(mem - ctx,
                                cfg.relative_attention_num_buckets,
                                cfg.relative_attention_max_distance)
    pos_bias = jnp.take(p["rel_bias"], buckets, axis=0)   # [S,S,H]
    pos_bias = pos_bias.transpose(2, 0, 1)                # [H,S,S]
    h_heads, dk = cfg.num_heads, cfg.d_kv

    def block(x, lp):
        h = t5_rmsnorm(x, lp["ln1.w"], cfg.layer_norm_epsilon)
        q = jnp.dot(h, lp["q.w"]).reshape(s, h_heads, dk).transpose(1, 0, 2)
        k = jnp.dot(h, lp["k.w"]).reshape(s, h_heads, dk).transpose(1, 0, 2)
        v = jnp.dot(h, lp["v.w"]).reshape(s, h_heads, dk).transpose(1, 0, 2)
        scores = jnp.einsum("hqd,hkd->hqk", q.astype(_F32), k.astype(_F32))
        scores = scores + pos_bias                        # no 1/sqrt(d): T5
        att = jnp.einsum("hqk,hkd->hqd",
                         jax.nn.softmax(scores, -1), v.astype(_F32))
        att = att.transpose(1, 0, 2).reshape(s, -1).astype(x.dtype)
        x = x + jnp.dot(att, lp["o.w"])
        h = t5_rmsnorm(x, lp["ln2.w"], cfg.layer_norm_epsilon)
        if "wi1.w" in lp:  # gated gelu
            gate = jax.nn.gelu(jnp.dot(h, lp["wi0.w"]), approximate=True)
            up = jnp.dot(h, lp["wi1.w"])
            ff = jnp.dot(gate * up, lp["wo.w"])
        else:
            ff = jnp.dot(jax.nn.relu(jnp.dot(h, lp["wi0.w"])), lp["wo.w"])
        return x + ff, None

    x, _ = lax.scan(block, x, p["layers"])
    return t5_rmsnorm(x, p["final_ln.w"], cfg.layer_norm_epsilon)


class T5Encoder:
    def __init__(self, config: T5Config, params: dict):
        self.config = config
        self.params = params
        self._fn = jax.jit(functools.partial(t5_encoder_fn, config))

    def __call__(self, ids) -> jnp.ndarray:
        # f32 checkpoints need HIGHEST precision on TPU (see clip.py)
        from ...ops.precision import f32_matmul_context
        with f32_matmul_context(self.params):
            return self._fn(self.params,
                            jnp.asarray(np.asarray(ids, np.int32)))

    @classmethod
    def from_safetensors(cls, path, dtype=jnp.float32) -> "T5Encoder":
        """Handles single and sharded (index.json) checkpoints
        (reference: sharded T5 loading)."""
        from ...llm.safetensors import load_safetensors
        st = load_safetensors(path)
        hf = {}
        cj = Path(path if Path(path).is_dir() else Path(path).parent) / "config.json"
        if cj.exists():
            hf = json.loads(cj.read_text())
        cfg = T5Config.from_hf(hf)
        pre = "encoder." if "encoder.block.0.layer.0.SelfAttention.q.weight" \
            in st.keys() else ""

        def t(name, transpose=False):
            arr = np.asarray(st.tensor_numpy(name))
            if transpose:
                arr = arr.T
            return jnp.asarray(np.ascontiguousarray(arr), dtype)

        emb_name = "shared.weight" if "shared.weight" in st else \
            f"{pre}embed_tokens.weight"
        p = {
            "tok_embed": t(emb_name),
            "final_ln.w": t(f"{pre}final_layer_norm.weight"),
            "rel_bias": t(f"{pre}block.0.layer.0.SelfAttention."
                          "relative_attention_bias.weight"),
        }
        layers = []
        gated = "gated" in cfg.feed_forward_proj
        for i in range(cfg.num_layers):
            b = f"{pre}block.{i}"
            lp = {
                "ln1.w": t(f"{b}.layer.0.layer_norm.weight"),
                "ln2.w": t(f"{b}.layer.1.layer_norm.weight"),
                "q.w": t(f"{b}.layer.0.SelfAttention.q.weight", True),
                "k.w": t(f"{b}.layer.0.SelfAttention.k.weight", True),
                "v.w": t(f"{b}.layer.0.SelfAttention.v.weight", True),
                "o.w": t(f"{b}.layer.0.SelfAttention.o.weight", True),
                "wo.w": t(f"{b}.layer.1.DenseReluDense.wo.weight", True),
            }
            if gated:
                lp["wi0.w"] = t(f"{b}.layer.1.DenseReluDense.wi_0.weight", True)
                lp["wi1.w"] = t(f"{b}.layer.1.DenseReluDense.wi_1.weight", True)
            else:
                lp["wi0.w"] = t(f"{b}.layer.1.DenseReluDense.wi.weight", True)
            layers.append(lp)
        p["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        return cls(cfg, p)
