"""Activations (reference: src/pygpukit/ops/nn/activation.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...core.array import Array
from .._common import apply_op

_F32 = jnp.float32
_SQRT_2_OVER_PI = float(np.sqrt(2.0 / np.pi))


def gelu_fn(x, approximate: bool = True):
    xf = x.astype(_F32)
    if approximate:  # tanh approximation (GPT-2 standard)
        y = 0.5 * xf * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (xf + 0.044715 * xf**3)))
    else:
        from jax.scipy.special import erf
        y = 0.5 * xf * (1.0 + erf(xf / np.sqrt(2.0)))
    return y.astype(x.dtype)


def silu_fn(x):
    xf = x.astype(_F32)
    return (xf / (1.0 + jnp.exp(-xf))).astype(x.dtype)


def relu_fn(x):
    return jnp.maximum(x, 0)


def relu2_fn(x):
    r = jnp.maximum(x.astype(_F32), 0)
    return (r * r).astype(x.dtype)


def swiglu_fn(gate, up):
    """silu(gate) * up — fused MLP activation (reference: ops/nn/fused.py)."""
    gf = gate.astype(_F32)
    return ((gf / (1.0 + jnp.exp(-gf))) * up.astype(_F32)).astype(gate.dtype)


def geglu_fn(gate, up):
    return (gelu_fn(gate).astype(_F32) * up.astype(_F32)).astype(gate.dtype)


def gelu(x, approximate: bool = True, *, out: Array | None = None) -> Array:
    return apply_op(lambda a: gelu_fn(a, approximate), x, out=out)


def silu(x, *, out: Array | None = None) -> Array:
    return apply_op(silu_fn, x, out=out)


def relu(x, *, out: Array | None = None) -> Array:
    return apply_op(relu_fn, x, out=out)


def relu2(x, *, out: Array | None = None) -> Array:
    return apply_op(relu2_fn, x, out=out)


def swiglu(gate, up, *, out: Array | None = None) -> Array:
    return apply_op(swiglu_fn, gate, up, out=out)


def geglu(gate, up, *, out: Array | None = None) -> Array:
    return apply_op(geglu_fn, gate, up, out=out)
