"""Array constructors (reference: src/pygpukit/core/factory.py:17-206)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import dtypes as _dt
from .array import Array
from .backend import get_backend


def _resolve(dtype) -> _dt.DataType:
    return _dt.to_dtype(dtype if dtype is not None else _dt.float32)


def _place(buf: jax.Array) -> Array:
    return Array(jax.device_put(buf, get_backend().device))


def zeros(shape, dtype=None) -> Array:
    d = _resolve(dtype)
    return _place(jnp.zeros(shape, dtype=d.jax_dtype))


def ones(shape, dtype=None) -> Array:
    d = _resolve(dtype)
    return _place(jnp.ones(shape, dtype=d.jax_dtype))


def full(shape, fill_value, dtype=None) -> Array:
    d = _resolve(dtype)
    return _place(jnp.full(shape, fill_value, dtype=d.jax_dtype))


def empty(shape, dtype=None) -> Array:
    # XLA has no uninitialised alloc; zeros compiles to a cheap broadcast.
    return zeros(shape, dtype)


def arange(*args, dtype=None) -> Array:
    d = _resolve(dtype if dtype is not None else _dt.int32)
    return _place(jnp.arange(*args, dtype=d.jax_dtype))


def from_numpy(arr: np.ndarray, dtype=None) -> Array:
    return Array.from_numpy(np.asarray(arr), dtype)


def zeros_like(a: Array) -> Array:
    return zeros(a.shape, a.dtype)


def ones_like(a: Array) -> Array:
    return ones(a.shape, a.dtype)


def randn(*shape, dtype=None, seed: int = 0) -> Array:
    d = _resolve(dtype)
    key = jax.random.PRNGKey(seed)
    return _place(jax.random.normal(key, shape, dtype=jnp.float32).astype(d.jax_dtype))
