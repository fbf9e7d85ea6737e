"""Reductions (reference: src/pygpukit/ops/reduction.py)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.array import Array
from ._common import apply_op


def sum(a, axis=None, keepdims: bool = False, *, out: Array | None = None) -> Array:  # noqa: A001
    return apply_op(lambda x: jnp.sum(x, axis=axis, keepdims=keepdims), a, out=out)


def mean(a, axis=None, keepdims: bool = False, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.mean(x, axis=axis, keepdims=keepdims), a, out=out)


def max(a, axis=None, keepdims: bool = False, *, out: Array | None = None) -> Array:  # noqa: A001
    return apply_op(lambda x: jnp.max(x, axis=axis, keepdims=keepdims), a, out=out)


def min(a, axis=None, keepdims: bool = False, *, out: Array | None = None) -> Array:  # noqa: A001
    return apply_op(lambda x: jnp.min(x, axis=axis, keepdims=keepdims), a, out=out)


def argmax(a, axis=None, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.argmax(x, axis=axis).astype(jnp.int32), a, out=out)


def argmin(a, axis=None, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.argmin(x, axis=axis).astype(jnp.int32), a, out=out)


def sum_axis(a, axis: int, *, out: Array | None = None) -> Array:
    return sum(a, axis=axis, out=out)


def softmax(a, axis: int = -1, *, out: Array | None = None) -> Array:
    def _softmax(x):
        m = jnp.max(x, axis=axis, keepdims=True)
        e = jnp.exp(x - m)
        return e / jnp.sum(e, axis=axis, keepdims=True)
    return apply_op(_softmax, a, out=out)


def log_softmax(a, axis: int = -1, *, out: Array | None = None) -> Array:
    def _lsm(x):
        m = jnp.max(x, axis=axis, keepdims=True)
        s = x - m
        return s - jnp.log(jnp.sum(jnp.exp(s), axis=axis, keepdims=True))
    return apply_op(_lsm, a, out=out)


def cumsum(a, axis: int = -1, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.cumsum(x, axis=axis), a, out=out)
