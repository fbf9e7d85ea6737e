"""Reference-style layer classes over the functional kernels (reference:
src/pygpukit/llm/layers/{linear,norm,attention,mlp,moe,block}.py — the
class API users of the reference build custom models with).

The model itself stays functional (llm/model.py stacked-pytree scan — that
is the TPU-fast path); these classes wrap the SAME functional ops for
reference-compatible, layer-at-a-time model building, and their outputs are
parity-tested against the functional layer stack.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn.activation import gelu_fn, swiglu_fn
from ..ops.nn.attention import flash_attention_fn, sdpa_fixed_cache_fn
from ..ops.nn.norm import layernorm_fn, rmsnorm_fn
from ..ops.nn.rope import apply_rope_fn, rope_init

_F32 = jnp.float32


def precompute_freqs_cis(max_seq: int, head_dim: int,
                         theta: float = 10000.0):
    """RoPE cos/sin jnp tables [S, D] (reference: precompute_freqs_cis,
    llm/layers/attention.py — HF duplicated-frequency convention)."""
    cos, sin = rope_init(max_seq, head_dim, theta)
    return cos.jax, sin.jax


class Linear:
    """x @ w + b with a possibly-quantized weight (reference: LinearBF16 /
    LinearFP8, llm/layers/linear.py:25,106). w stored [in, out]."""

    def __init__(self, w, b=None):
        self.w = w if isinstance(w, dict) else jnp.asarray(w)
        self.b = None if b is None else jnp.asarray(b)

    @property
    def quantized(self) -> bool:
        return isinstance(self.w, dict)

    def __call__(self, x):
        from .model import _mm
        y = _mm(jnp.asarray(x), self.w)
        return y if self.b is None else y + self.b.astype(y.dtype)


LinearBF16 = Linear


class LinearFP8(Linear):
    """fp8-storage linear; accepts a dense weight and quantizes it."""

    def __init__(self, w, b=None):
        if not isinstance(w, dict):
            from .quant import quantize_weight
            w = quantize_weight(jnp.asarray(w), "fp8")
        super().__init__(w, b)


class RMSNorm:
    def __init__(self, weight, eps: float = 1e-5):
        self.w = jnp.asarray(weight)
        self.eps = eps

    def __call__(self, x):
        return rmsnorm_fn(jnp.asarray(x), self.w, self.eps)


class LayerNorm:
    def __init__(self, weight, bias=None, eps: float = 1e-5):
        self.w = jnp.asarray(weight)
        self.b = None if bias is None else jnp.asarray(bias)
        self.eps = eps

    def __call__(self, x):
        return layernorm_fn(jnp.asarray(x), self.w, self.b, self.eps)


def Norm(kind: str, weight, bias=None, eps: float = 1e-5):
    """Factory (reference: Norm) — "rmsnorm" | "layernorm"."""
    if kind == "rmsnorm":
        return RMSNorm(weight, eps)
    return LayerNorm(weight, bias, eps)


class Attention:
    """Causal self-attention with GQA + RoPE and an optional fixed KV cache
    (reference: Attention, llm/layers/attention.py:43,128).

    Prefill: ``__call__(x, positions=...)``. Decode: ``init_fixed_cache``
    then ``forward_fixed_cache(x_t, pos)``.
    """

    def __init__(self, w_q: Linear, w_k: Linear, w_v: Linear, w_o: Linear,
                 n_heads: int, n_kv_heads: int | None = None,
                 rope_cos=None, rope_sin=None):
        self.q, self.k, self.v, self.o = w_q, w_k, w_v, w_o
        self.n_heads = n_heads
        self.n_kv_heads = n_kv_heads or n_heads
        self.rope_cos = rope_cos
        self.rope_sin = rope_sin
        self.k_cache = None
        self.v_cache = None
        self.pos = 0

    def _heads(self, x):
        s = x.shape[0]
        q = self.q(x).reshape(s, self.n_heads, -1)
        k = self.k(x).reshape(s, self.n_kv_heads, -1)
        v = self.v(x).reshape(s, self.n_kv_heads, -1)
        return q, k, v

    def __call__(self, x):
        x = jnp.asarray(x)
        s = x.shape[0]
        q, k, v = self._heads(x)
        if self.rope_cos is not None:
            q = apply_rope_fn(q, self.rope_cos[:s], self.rope_sin[:s])
            k = apply_rope_fn(k, self.rope_cos[:s], self.rope_sin[:s])
        attn = flash_attention_fn(q, k, v)
        return self.o(attn.reshape(s, -1))

    def init_fixed_cache(self, max_seq_len: int, dtype=jnp.bfloat16) -> None:
        d = (self.k.w["q"] if self.k.quantized else self.k.w).shape[-1] \
            // self.n_kv_heads
        self.k_cache = jnp.zeros((max_seq_len, self.n_kv_heads, d), dtype)
        self.v_cache = jnp.zeros((max_seq_len, self.n_kv_heads, d), dtype)
        self.pos = 0

    def forward_fixed_cache(self, x_t, pos: int | None = None):
        """One decode step: x_t [1, E] -> [1, E]; caches update in place."""
        from jax import lax
        pos = self.pos if pos is None else pos
        q, k, v = self._heads(jnp.asarray(x_t))
        if self.rope_cos is not None:
            c = lax.dynamic_slice_in_dim(self.rope_cos, pos, 1, axis=0)
            sn = lax.dynamic_slice_in_dim(self.rope_sin, pos, 1, axis=0)
            q = apply_rope_fn(q, c, sn)
            k = apply_rope_fn(k, c, sn)
        self.k_cache = lax.dynamic_update_slice(
            self.k_cache, k.astype(self.k_cache.dtype), (pos, 0, 0))
        self.v_cache = lax.dynamic_update_slice(
            self.v_cache, v.astype(self.v_cache.dtype), (pos, 0, 0))
        attn = sdpa_fixed_cache_fn(q, self.k_cache, self.v_cache, pos + 1)
        self.pos = pos + 1
        return self.o(attn.reshape(1, -1))


CausalSelfAttention = Attention
LlamaAttention = Attention


class MLP:
    """SwiGLU (gate/up/down) or GELU (fc1/fc2) MLP (reference: MLP,
    llm/layers/mlp.py:90)."""

    def __init__(self, fc1: Linear, fc2: Linear, gate: Linear | None = None,
                 activation: str = "silu"):
        self.gate = gate
        self.up = fc1
        self.down = fc2
        self.activation = activation

    def __call__(self, x):
        x = jnp.asarray(x)
        if self.gate is not None:
            return self.down(swiglu_fn(self.gate(x), self.up(x)))
        return self.down(gelu_fn(self.up(x)))


LlamaMLP = MLP


class MoELayer:
    """Top-k routed expert MLP (reference: MoELayer, llm/layers/moe.py:29).
    Expert stacks [E, in, out]; routing via ops/moe.select_moe_fn."""

    def __init__(self, router: Linear, w_gate, w_up, w_down, top_k: int = 2):
        self.router = router
        self.w_gate, self.w_up, self.w_down = w_gate, w_up, w_down
        self.top_k = top_k

    _jit_cache: dict = {}

    def __call__(self, x):
        from ..ops.moe import select_moe_fn
        x = jnp.asarray(x)
        logits = self.router(x).astype(_F32)
        fn = select_moe_fn(x.shape[0], self.top_k)
        # jit: the gather/gmm formulations use advanced indexing, which
        # HANGS when eager over remote TPU transports (CLAUDE.md)
        key = (fn.__name__, self.top_k)
        if key not in MoELayer._jit_cache:
            import functools
            MoELayer._jit_cache[key] = jax.jit(
                functools.partial(fn, k=self.top_k))
        out = MoELayer._jit_cache[key](x, self.w_gate, self.w_up,
                                       self.w_down, logits)
        return out.astype(x.dtype)


class TransformerBlock:
    """norm -> attention -> residual -> norm -> mlp -> residual
    (reference: TransformerBlock, llm/layers/block.py:18)."""

    def __init__(self, attn: Attention, mlp, attn_norm, mlp_norm):
        self.attn = attn
        self.mlp = mlp
        self.attn_norm = attn_norm
        self.mlp_norm = mlp_norm

    def __call__(self, h):
        h = jnp.asarray(h)
        h = h + self.attn(self.attn_norm(h)).astype(h.dtype)
        return h + self.mlp(self.mlp_norm(h)).astype(h.dtype)


LlamaBlock = TransformerBlock
