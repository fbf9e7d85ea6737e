"""Tensor layout ops: transposes, casts, concat, repeat
(reference: src/pygpukit/ops/tensor.py, native/ops/nn/tensor transposes)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.array import Array
from ..core.dtypes import to_dtype
from ._common import apply_op


def transpose_2d(a, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.swapaxes(x, 0, 1), a, out=out)


def transpose_3d_021(a, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.transpose(x, (0, 2, 1)), a, out=out)


def transpose_3d_102(a, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.transpose(x, (1, 0, 2)), a, out=out)


def transpose_4d_0213(a, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.transpose(x, (0, 2, 1, 3)), a, out=out)


def transpose_4d_0231(a, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.transpose(x, (0, 2, 3, 1)), a, out=out)


def reshape_copy(a, shape, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.reshape(x, shape), a, out=out)


def cast(a, dtype, *, out: Array | None = None) -> Array:
    d = to_dtype(dtype)
    return apply_op(lambda x: x.astype(d.jax_dtype), a, out=out)


def cast_f32_to_bf16(a, *, out: Array | None = None) -> Array:
    return cast(a, "bfloat16", out=out)


def cast_bf16_to_f32(a, *, out: Array | None = None) -> Array:
    return cast(a, "float32", out=out)


def cast_f32_to_f16(a, *, out: Array | None = None) -> Array:
    return cast(a, "float16", out=out)


def concat(arrays, axis: int = 0, *, out: Array | None = None) -> Array:
    from ..core.array import as_jax
    bufs = [as_jax(a) for a in arrays]
    res = jnp.concatenate(bufs, axis=axis)
    if out is not None:
        out._set_buffer(res.astype(out.dtype.jax_dtype))
        return out
    return Array(res)


def repeat(a, repeats: int, axis: int = 0, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.repeat(x, repeats, axis=axis), a, out=out)


def pad(a, pad_width, value=0.0, *, out: Array | None = None) -> Array:
    return apply_op(lambda x: jnp.pad(x, pad_width, constant_values=value), a, out=out)
