"""Elementwise binary ops (reference: src/pygpukit/ops/elementwise.py)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.array import Array
from ._common import apply_op, check_same_shape


def add(a, b, *, out: Array | None = None) -> Array:
    check_same_shape(a, b, "add")
    return apply_op(jnp.add, a, b, out=out)


def sub(a, b, *, out: Array | None = None) -> Array:
    check_same_shape(a, b, "sub")
    return apply_op(jnp.subtract, a, b, out=out)


def mul(a, b, *, out: Array | None = None) -> Array:
    check_same_shape(a, b, "mul")
    return apply_op(jnp.multiply, a, b, out=out)


def div(a, b, *, out: Array | None = None) -> Array:
    check_same_shape(a, b, "div")
    return apply_op(jnp.divide, a, b, out=out)


def maximum(a, b, *, out: Array | None = None) -> Array:
    return apply_op(jnp.maximum, a, b, out=out)


def minimum(a, b, *, out: Array | None = None) -> Array:
    return apply_op(jnp.minimum, a, b, out=out)


def pow(a, b, *, out: Array | None = None) -> Array:  # noqa: A001
    return apply_op(jnp.power, a, b, out=out)


def clamp(a, min_val=None, max_val=None, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.clip(x, min_val, max_val), a, out=out)


def where(cond, a, b, *, out: Array | None = None) -> Array:
    return apply_op(jnp.where, cond, a, b, out=out)


def add_scaled(a, b, alpha: float, *, out: Array | None = None) -> Array:
    """a + alpha * b (axpy)."""
    return apply_op(lambda x, y: x + alpha * y, a, b, out=out)
