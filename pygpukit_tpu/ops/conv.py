"""Convolutions (reference: src/pygpukit/ops/conv.py, native conv2d/im2col).

XLA's conv_general_dilated is the MXU conv path on TPU (no im2col needed —
the compiler tiles convs onto the systolic array directly). Layouts follow
the reference: conv1d NCW, conv2d NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.array import Array
from ._common import apply_op

_F32 = jnp.float32


def conv1d_fn(x, w, b=None, stride: int = 1, padding: int = 0,
              dilation: int = 1, groups: int = 1):
    """x [N,C,W], w [O,C/g,K] -> [N,O,W']."""
    out = lax.conv_general_dilated(
        x.astype(_F32), w.astype(_F32),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=_F32,
    )
    if b is not None:
        out = out + b.astype(_F32)[None, :, None]
    return out.astype(x.dtype)


def conv2d_fn(x, w, b=None, stride=1, padding=0, dilation=1, groups: int = 1):
    """x [N,C,H,W], w [O,C/g,Kh,Kw] -> [N,O,H',W']."""
    stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
    dilation = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    out = lax.conv_general_dilated(
        x.astype(_F32), w.astype(_F32),
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=_F32,
    )
    if b is not None:
        out = out + b.astype(_F32)[None, :, None, None]
    return out.astype(x.dtype)


def conv_transpose1d_fn(x, w, b=None, stride: int = 1, padding: int = 0):
    """x [N,C,W], w [C,O,K] (torch ConvTranspose1d layout) -> [N,O,W']."""
    # torch layout [in, out, K] consumed directly: with transpose_kernel=True
    # lax.conv_transpose swaps the O/I kernel dims and flips the spatial dim,
    # exactly matching torch's ConvTranspose1d semantics. torch's `padding`
    # trims (K-1-p) relative to the full gradient conv.
    k = w.shape[-1]
    out = lax.conv_transpose(
        x.astype(_F32), w.astype(_F32),
        strides=(stride,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        transpose_kernel=True,
    )
    if b is not None:
        out = out + b.astype(_F32)[None, :, None]
    return out.astype(x.dtype)


def conv1d(x, w, b=None, stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1, *, out: Array | None = None) -> Array:
    fn = lambda *a: conv1d_fn(*a, stride=stride, padding=padding,
                              dilation=dilation, groups=groups)
    args = (x, w) if b is None else (x, w, b)
    return apply_op(fn, *args, out=out)


def conv2d(x, w, b=None, stride=1, padding=0, dilation=1, groups: int = 1,
           *, out: Array | None = None) -> Array:
    fn = lambda *a: conv2d_fn(*a, stride=stride, padding=padding,
                              dilation=dilation, groups=groups)
    args = (x, w) if b is None else (x, w, b)
    return apply_op(fn, *args, out=out)
