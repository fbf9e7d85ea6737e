"""NumPy-like device array: a thin mutable handle over an HBM-resident jax.Array.

Mirrors the reference ``GPUArray`` surface (reference: src/pygpukit/core/array.py:17,
401,455,503,639 — views, transpose routing, operator overloads, astype, narrow,
slice_rows, reshape) but TPU-native: the underlying storage is an immutable
``jax.Array``; "in-place" ops (``out=``, ``fill_``, KV-cache updates) rebind the
handle to a new buffer produced by a donated XLA computation, which XLA turns
into a true in-place update on device.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import dtypes as _dt
from .backend import get_backend


class Array:
    """Device array handle. Shape/dtype are static; the buffer can be rebound."""

    __slots__ = ("_buf",)

    def __init__(self, buf: jax.Array):
        self._buf = buf

    # -- construction helpers ------------------------------------------------

    @staticmethod
    def from_jax(buf: jax.Array) -> "Array":
        return Array(buf)

    @staticmethod
    def from_numpy(arr: np.ndarray, dtype=None) -> "Array":
        d = _dt.to_dtype(dtype) if dtype is not None else _dt.to_dtype(arr.dtype)
        backend = get_backend()
        buf = jax.device_put(np.asarray(arr, dtype=d.np_dtype), backend.device)
        return Array(buf)

    # -- core properties -----------------------------------------------------

    @property
    def jax(self) -> jax.Array:
        """The underlying jax.Array (current buffer)."""
        return self._buf

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self._buf.shape)

    @property
    def dtype(self) -> _dt.DataType:
        return _dt.to_dtype(self._buf.dtype)

    @property
    def ndim(self) -> int:
        return self._buf.ndim

    @property
    def size(self) -> int:
        return int(np.prod(self._buf.shape)) if self._buf.shape else 1

    @property
    def itemsize(self) -> float:
        return self.dtype.itemsize

    @property
    def nbytes(self) -> int:
        return int(self.size * self.dtype.itemsize)

    @property
    def device(self):
        return next(iter(self._buf.devices()))

    # -- buffer rebinding (the TPU "in-place" mechanism) ---------------------

    def _set_buffer(self, buf: jax.Array) -> None:
        if tuple(buf.shape) != tuple(self._buf.shape):
            raise ValueError(
                f"buffer rebind shape mismatch: {buf.shape} != {self._buf.shape}"
            )
        self._buf = buf

    # -- host transfer -------------------------------------------------------

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self._buf)

    def item(self):
        return self.to_numpy().item()

    def block_until_ready(self) -> "Array":
        self._buf.block_until_ready()
        return self

    # -- shape ops (views are cheap under XLA) -------------------------------

    def reshape(self, *shape) -> "Array":
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return Array(jnp.reshape(self._buf, shape))

    def view(self, *shape) -> "Array":
        return self.reshape(*shape)

    def ravel(self) -> "Array":
        return Array(jnp.ravel(self._buf))

    def transpose(self, *axes) -> "Array":
        if len(axes) == 1 and isinstance(axes[0], (tuple, list)):
            axes = tuple(axes[0])
        return Array(jnp.transpose(self._buf, axes or None))

    @property
    def T(self) -> "Array":
        return Array(self._buf.T)

    def narrow(self, dim: int, start: int, length: int) -> "Array":
        """Contiguous slice along one dimension (reference: array.py narrow)."""
        idx = [slice(None)] * self.ndim
        idx[dim] = slice(start, start + length)
        return Array(self._buf[tuple(idx)])

    def slice_rows(self, start: int, end: int) -> "Array":
        return Array(self._buf[start:end])

    def squeeze(self, axis=None) -> "Array":
        return Array(jnp.squeeze(self._buf, axis))

    def astype(self, dtype) -> "Array":
        d = _dt.to_dtype(dtype)
        return Array(self._buf.astype(d.jax_dtype))

    def copy(self) -> "Array":
        return Array(jnp.copy(self._buf))

    def fill_(self, value) -> "Array":
        self._buf = jnp.full_like(self._buf, value)
        return self

    def __getitem__(self, idx) -> "Array":
        return Array(self._buf[idx])

    # -- reductions (numpy-style methods; reference GPUArray surface) ---------

    def sum(self, axis=None, keepdims: bool = False) -> "Array":
        return Array(jnp.sum(self._buf, axis=axis, keepdims=keepdims))

    def mean(self, axis=None, keepdims: bool = False) -> "Array":
        return Array(jnp.mean(self._buf, axis=axis, keepdims=keepdims))

    def max(self, axis=None, keepdims: bool = False) -> "Array":
        return Array(jnp.max(self._buf, axis=axis, keepdims=keepdims))

    def min(self, axis=None, keepdims: bool = False) -> "Array":
        return Array(jnp.min(self._buf, axis=axis, keepdims=keepdims))

    def argmax(self, axis=None) -> "Array":
        return Array(jnp.argmax(self._buf, axis=axis).astype(jnp.int32))

    # -- operator overloads (route through the ops layer) --------------------

    def _binop(self, other, fn) -> "Array":
        o = other.jax if isinstance(other, Array) else other
        return Array(fn(self._buf, o))

    def __add__(self, other):
        return self._binop(other, jnp.add)

    def __radd__(self, other):
        return self._binop(other, lambda a, b: jnp.add(b, a))

    def __sub__(self, other):
        return self._binop(other, jnp.subtract)

    def __rsub__(self, other):
        return self._binop(other, lambda a, b: jnp.subtract(b, a))

    def __mul__(self, other):
        return self._binop(other, jnp.multiply)

    def __rmul__(self, other):
        return self._binop(other, lambda a, b: jnp.multiply(b, a))

    def __truediv__(self, other):
        return self._binop(other, jnp.divide)

    def __rtruediv__(self, other):
        return self._binop(other, lambda a, b: jnp.divide(b, a))

    def __neg__(self):
        return Array(jnp.negative(self._buf))

    def __matmul__(self, other):
        from ..ops.matmul import matmul
        return matmul(self, other)

    def __eq__(self, other: Any):  # elementwise, like numpy
        return self._binop(other, jnp.equal)

    def __ne__(self, other: Any):
        return self._binop(other, jnp.not_equal)

    def __lt__(self, other):
        return self._binop(other, jnp.less)

    def __le__(self, other):
        return self._binop(other, jnp.less_equal)

    def __gt__(self, other):
        return self._binop(other, jnp.greater)

    def __ge__(self, other):
        return self._binop(other, jnp.greater_equal)

    def __hash__(self):
        return id(self)

    def __len__(self) -> int:
        if not self.shape:
            raise TypeError("len() of 0-d array")
        return self.shape[0]

    def __repr__(self) -> str:
        return f"Array(shape={self.shape}, dtype={self.dtype.name})"


def as_jax(x) -> jax.Array:
    """Coerce Array / jax.Array / numpy / scalar into a jax.Array."""
    if isinstance(x, Array):
        return x.jax
    if isinstance(x, (jax.Array, np.ndarray)):
        return jnp.asarray(x)
    return jnp.asarray(x)


def wrap(x) -> Array:
    """Wrap a jax.Array into an Array handle."""
    if isinstance(x, Array):
        return x
    return Array(jnp.asarray(x))
