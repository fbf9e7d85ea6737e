"""Shared plumbing for the ops layer.

Every public op follows the reference contract (reference:
src/pygpukit/ops/matmul/generic.py:18-120): validate → compute → optionally
write into a caller-provided ``out=`` array (allocation-free hot path; on TPU
the rebind + XLA donation achieves the same zero-alloc effect that made the
reference ops CUDA-Graph-capturable).

Ops accept ``Array``, ``jax.Array``, ``np.ndarray`` or scalars and return an
``Array`` handle.
"""

from __future__ import annotations

from typing import Callable

from ..core.array import Array, as_jax


def apply_op(fn: Callable, *args, out: Array | None = None) -> Array:
    bufs = [as_jax(a) for a in args]
    res = fn(*bufs)
    if out is not None:
        if not isinstance(out, Array):
            raise TypeError("out= must be an Array")
        if tuple(res.shape) != out.shape:
            raise ValueError(f"out shape {out.shape} != result shape {tuple(res.shape)}")
        out._set_buffer(res.astype(out.dtype.jax_dtype))
        return out
    return Array(res)


def check_same_shape(a, b, op_name: str) -> None:
    sa, sb = tuple(as_jax(a).shape), tuple(as_jax(b).shape)
    if sa != sb:
        # allow numpy-style broadcasting like the reference's CPU path
        try:
            import numpy as np
            np.broadcast_shapes(sa, sb)
        except ValueError:
            raise ValueError(f"{op_name}: incompatible shapes {sa} vs {sb}") from None
