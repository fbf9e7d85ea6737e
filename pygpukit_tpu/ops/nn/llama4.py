"""Llama-4 specific ops (reference: src/pygpukit/ops/nn/llama4.py:16-262,
native/ops/nn/llama4/): parameterless QK L2 norm, iRoPE temperature scaling,
fused iRoPE SDPA."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...core.array import Array
from .._common import apply_op
from .norm import qk_l2norm_fn  # Llama-4 QK-norm (RMS-style)

_F32 = jnp.float32


def irope_scale_fn(positions, attn_scale: float = 0.1,
                   floor_scale: float = 8192.0):
    """Temperature scale per position:
    log1p(floor((pos+1)/floor_scale)) * attn_scale + 1."""
    p = positions.astype(_F32)
    return jnp.log1p(jnp.floor((p + 1.0) / floor_scale)) * attn_scale + 1.0


def irope_scale_q_fn(q, positions, attn_scale: float = 0.1,
                     floor_scale: float = 8192.0):
    """q [S,H,D] scaled by per-position temperature (reference:
    irope_scale_q, llama4.py:103)."""
    scale = irope_scale_fn(positions, attn_scale, floor_scale)
    return (q.astype(_F32) * scale[:, None, None]).astype(q.dtype)


def sdpa_irope_fn(q, k, v, positions, attn_scale: float = 0.1,
                  floor_scale: float = 8192.0, causal_offset: int = 0):
    """Causal SDPA with iRoPE temperature fused into Q (reference:
    sdpa_irope, llama4.py:172). Layout [S,H,D]; GQA supported."""
    s, h, d = q.shape
    hk = k.shape[1]
    if hk != h:
        k = jnp.repeat(k, h // hk, axis=1)
        v = jnp.repeat(v, h // hk, axis=1)
    q = irope_scale_q_fn(q, positions, attn_scale, floor_scale)
    qh = jnp.transpose(q, (1, 0, 2)).astype(_F32)
    kh = jnp.transpose(k, (1, 0, 2)).astype(_F32)
    vh = jnp.transpose(v, (1, 0, 2)).astype(_F32)
    from ..matmul import _f32_precision
    prec = _f32_precision()
    scores = jnp.einsum("hqd,hkd->hqk", qh, kh,
                        precision=prec) / math.sqrt(d)
    i = jnp.arange(s)[:, None] + causal_offset
    j = jnp.arange(k.shape[0])[None, :]
    scores = jnp.where(j > i, -1e30, scores)
    out = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, -1), vh,
                     precision=prec)
    return jnp.transpose(out, (1, 0, 2)).astype(q.dtype)


# Array-facing wrappers (reference surface)

def l2norm(x, eps: float = 1e-6, *, out: Array | None = None) -> Array:
    """Llama-4 QK-norm (HF Llama4TextL2Norm: rsqrt of MEAN of squares)."""
    return apply_op(lambda a: qk_l2norm_fn(a, eps), x, out=out)


def irope_scale_q(q, positions, attn_scale: float = 0.1,
                  floor_scale: float = 8192.0, *,
                  out: Array | None = None) -> Array:
    return apply_op(
        lambda a, p: irope_scale_q_fn(a, p, attn_scale, floor_scale),
        q, positions, out=out)


def sdpa_irope(q, k, v, positions, attn_scale: float = 0.1,
               floor_scale: float = 8192.0, causal_offset: int = 0, *,
               out: Array | None = None) -> Array:
    return apply_op(
        lambda a, b, c, p: sdpa_irope_fn(a, b, c, p, attn_scale, floor_scale,
                                         causal_offset),
        q, k, v, positions, out=out)
