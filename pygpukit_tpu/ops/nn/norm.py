"""Normalization ops (reference: src/pygpukit/ops/nn/norm.py, native norm_kernels).

``*_fn`` are pure jnp functions used inside jitted model steps; the public
wrappers take/return Array handles. All reductions accumulate in f32
regardless of input dtype (matches the reference's kernel behaviour).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ...core.array import Array
from .._common import apply_op

_F32 = jnp.float32


def rmsnorm_fn(x, weight, eps: float = 1e-6):
    xf = x.astype(_F32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * lax.rsqrt(var + eps)
    return (y * weight.astype(_F32)).astype(x.dtype)


def layernorm_fn(x, weight, bias=None, eps: float = 1e-5):
    xf = x.astype(_F32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps) * weight.astype(_F32)
    if bias is not None:
        y = y + bias.astype(_F32)
    return y.astype(x.dtype)


def l2norm_fn(x, eps: float = 1e-12):
    """Parameterless true L2 norm over the last dim (unit-vector scaling)."""
    xf = x.astype(_F32)
    inv = lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv).astype(x.dtype)


def qk_l2norm_fn(x, eps: float = 1e-6):
    """Parameterless RMS-style "L2 norm" over the last dim — the Llama-4
    QK-norm semantics (HF Llama4TextL2Norm divides by sqrt(MEAN of squares),
    not the sum; reference: ops/nn/llama4.py l2norm). Verified against
    transformers in tests/test_llm_families.py::TestLlama4."""
    xf = x.astype(_F32)
    inv = lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv).astype(x.dtype)


def groupnorm_fn(x, weight, bias, num_groups: int, eps: float = 1e-5):
    """GroupNorm over channel dim (NHWC layout; diffusion VAE/UNet,
    reference: native/ops/nn/diffusion group_norm)."""
    xf = x.astype(_F32)
    n, h, w, cc = xf.shape
    g = num_groups
    xg = xf.reshape(n, h * w, g, cc // g)
    mu = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean((xg - mu) ** 2, axis=(1, 3), keepdims=True)
    y = ((xg - mu) * lax.rsqrt(var + eps)).reshape(n, h, w, cc)
    return (y * weight.astype(_F32) + bias.astype(_F32)).astype(x.dtype)


def rmsnorm(x, weight, eps: float = 1e-6, *, out: Array | None = None) -> Array:
    return apply_op(lambda a, w: rmsnorm_fn(a, w, eps), x, weight, out=out)


def layernorm(x, weight, bias=None, eps: float = 1e-5, *,
              out: Array | None = None) -> Array:
    if bias is None:
        return apply_op(lambda a, w: layernorm_fn(a, w, None, eps), x, weight, out=out)
    return apply_op(lambda a, w, b: layernorm_fn(a, w, b, eps), x, weight, bias, out=out)


def l2norm(x, eps: float = 1e-12, *, out: Array | None = None) -> Array:
    return apply_op(lambda a: l2norm_fn(a, eps), x, out=out)


def groupnorm(x, weight, bias, num_groups: int, eps: float = 1e-5, *,
              out: Array | None = None) -> Array:
    return apply_op(lambda a, w, b: groupnorm_fn(a, w, b, num_groups, eps),
                    x, weight, bias, out=out)
