"""Fused ops (reference: src/pygpukit/ops/nn/fused.py, native fused kernels:
rmsnorm_residual, swiglu, geglu, linear_bias_gelu).

On TPU these are single jnp expressions — XLA fuses the elementwise chains
into the surrounding matmuls; the functions exist to keep the reference's op
surface and to guarantee f32 intermediate precision.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.array import Array
from .._common import apply_op
from .activation import gelu_fn, swiglu_fn, geglu_fn  # noqa: F401 (re-export)
from .norm import rmsnorm_fn

_F32 = jnp.float32


def rmsnorm_residual_fn(x, residual, weight, eps: float = 1e-6):
    """h = x + residual; y = rmsnorm(h, weight). Returns (y, h)."""
    h = (x.astype(_F32) + residual.astype(_F32)).astype(x.dtype)
    return rmsnorm_fn(h, weight, eps), h


def linear_bias_gelu_fn(x, w, b):
    y = jnp.dot(x, w, preferred_element_type=_F32) + b.astype(_F32)
    return gelu_fn(y).astype(x.dtype)


def rmsnorm_residual(x, residual, weight, eps: float = 1e-6,
                     *, out: Array | None = None) -> tuple[Array, Array]:
    from ...core.array import as_jax
    y, h = rmsnorm_residual_fn(as_jax(x), as_jax(residual), as_jax(weight), eps)
    if out is not None:
        out._set_buffer(y.astype(out.dtype.jax_dtype))
        return out, Array(h)
    return Array(y), Array(h)


def linear_bias_gelu(x, w, b, *, out: Array | None = None) -> Array:
    return apply_op(linear_bias_gelu_fn, x, w, b, out=out)


def swiglu(gate, up, *, out: Array | None = None) -> Array:
    return apply_op(swiglu_fn, gate, up, out=out)


def geglu(gate, up, *, out: Array | None = None) -> Array:
    return apply_op(geglu_fn, gate, up, out=out)
