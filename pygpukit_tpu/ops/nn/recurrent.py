"""Recurrent ops: LSTM (reference: src/pygpukit/ops/nn/recurrent.py,
native/ops/nn recurrent LSTM kernels — used by Kokoro TTS layers).

The sequential recurrence is expressed as ``lax.scan`` so XLA compiles one
fused step kernel; gates follow the standard torch LSTM layout [i,f,g,o].
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ...core.array import Array
from .._common import apply_op

_F32 = jnp.float32


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def lstm_cell_fn(x, h, c, w_ih, w_hh, b_ih=None, b_hh=None):
    """One LSTM step. x [B,I], h/c [B,H], w_ih [4H,I], w_hh [4H,H] (torch gate
    order [i,f,g,o]). Returns (h_new, c_new)."""
    gates = (jnp.dot(x.astype(_F32), w_ih.T.astype(_F32))
             + jnp.dot(h.astype(_F32), w_hh.T.astype(_F32)))
    if b_ih is not None:
        gates = gates + b_ih.astype(_F32) + b_hh.astype(_F32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = _sigmoid(i), _sigmoid(f), _sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c.astype(_F32) + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new.astype(x.dtype), c_new.astype(x.dtype)


def lstm_fn(x, w_ih, w_hh, b_ih=None, b_hh=None, h0=None, c0=None,
            reverse: bool = False):
    """Full-sequence LSTM. x [S,B,I] -> (out [S,B,H], (h, c))."""
    s, b, _ = x.shape
    hidden = w_hh.shape[-1]
    h = h0 if h0 is not None else jnp.zeros((b, hidden), _F32)
    c = c0 if c0 is not None else jnp.zeros((b, hidden), _F32)

    def step(carry, xt):
        h, c = carry
        gates = (jnp.dot(xt.astype(_F32), w_ih.T.astype(_F32))
                 + jnp.dot(h, w_hh.T.astype(_F32)))
        if b_ih is not None:
            gates = gates + b_ih.astype(_F32) + b_hh.astype(_F32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = _sigmoid(i), _sigmoid(f), _sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (h, c), out = lax.scan(step, (h.astype(_F32), c.astype(_F32)), x,
                           reverse=reverse)
    return out.astype(x.dtype), (h.astype(x.dtype), c.astype(x.dtype))


def bilstm_fn(x, w_ih_f, w_hh_f, b_ih_f, b_hh_f, w_ih_b, w_hh_b, b_ih_b, b_hh_b):
    """Bidirectional LSTM: concat forward and backward hidden states."""
    fwd, _ = lstm_fn(x, w_ih_f, w_hh_f, b_ih_f, b_hh_f)
    bwd, _ = lstm_fn(x, w_ih_b, w_hh_b, b_ih_b, b_hh_b, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


def lstm(x, w_ih, w_hh, b_ih=None, b_hh=None, *, out: Array | None = None) -> Array:
    from ...core.array import as_jax
    res, _ = lstm_fn(as_jax(x), as_jax(w_ih), as_jax(w_hh),
                     as_jax(b_ih) if b_ih is not None else None,
                     as_jax(b_hh) if b_hh is not None else None)
    if out is not None:
        out._set_buffer(res.astype(out.dtype.jax_dtype))
        return out
    return Array(res)
