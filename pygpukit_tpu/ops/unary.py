"""Unary math ops (reference: src/pygpukit/ops/unary.py)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.array import Array
from ._common import apply_op


def _make(fn):
    def op(a, *, out: Array | None = None) -> Array:
        return apply_op(fn, a, out=out)
    return op


exp = _make(jnp.exp)
log = _make(jnp.log)
sin = _make(jnp.sin)
cos = _make(jnp.cos)
tan = _make(jnp.tan)
tanh = _make(jnp.tanh)
sqrt = _make(jnp.sqrt)
rsqrt = _make(lambda x: jnp.reciprocal(jnp.sqrt(x)))
abs = _make(jnp.abs)  # noqa: A001
neg = _make(jnp.negative)
reciprocal = _make(jnp.reciprocal)
floor = _make(jnp.floor)
ceil = _make(jnp.ceil)
round = _make(jnp.round)  # noqa: A001
sign = _make(jnp.sign)
log2 = _make(jnp.log2)
expm1 = _make(jnp.expm1)
log1p = _make(jnp.log1p)
sigmoid = _make(lambda x: jnp.reciprocal(1 + jnp.exp(-x)))
erf = _make(lambda x: jnp.asarray(__import__("jax").scipy.special.erf(x)))
