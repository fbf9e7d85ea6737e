"""Weight repacking for decode-optimal layouts (reference:
src/pygpukit/llm/repack.py:20 — repack to B[N,K] for peak-bandwidth GEMV).

On TPU the analog is lane-dimension alignment: the last dim of every weight
should be a multiple of 128 (the VPU/MXU lane width) so HBM reads are full
tiles. ``repack_model_weights`` pads trailing dims up to 128 where profitable
and records the padding so logits/outputs stay exact (padded columns are
zero → contribute nothing).
"""

from __future__ import annotations

import jax.numpy as jnp


LANE = 128


def _pad_last(w, multiple: int = LANE):
    last = w.shape[-1]
    pad = (-last) % multiple
    if pad == 0:
        return w, 0
    widths = [(0, 0)] * (w.ndim - 1) + [(0, pad)]
    return jnp.pad(w, widths), pad


def repack_model_weights(params: dict, multiple: int = LANE) -> tuple[dict, dict]:
    """Pad projection output dims to the lane width. Returns (params, info).

    Only out-dims of intermediate projections are padded (padding the final
    hidden dim or vocab would change downstream shapes); gate/up out-dims and
    the matching down in-dim are padded together so shapes stay consistent.
    """
    info: dict = {}
    layers = dict(params["layers"])
    if "w_gate" in layers and not isinstance(layers["w_gate"], dict):
        inter = layers["w_gate"].shape[-1]
        pad = (-inter) % multiple
        if pad:
            layers["w_gate"], _ = _pad_last(layers["w_gate"], multiple)
            layers["w_up"], _ = _pad_last(layers["w_up"], multiple)
            wd = layers["w_down"]
            widths = [(0, 0)] * (wd.ndim - 2) + [(0, pad), (0, 0)]
            layers["w_down"] = jnp.pad(wd, widths)
            info["intermediate_pad"] = pad
    out = dict(params)
    out["layers"] = layers
    return out, info


def repack_weight(w, multiple: int = LANE):
    """Pad one projection's out-dim to the lane multiple (reference:
    repack_weight — the B[N,K]-layout repack's TPU analog is lane-width
    padding; projections stay [in, out], CLAUDE.md matvec-form rule)."""
    return _pad_last(w, multiple)


def repack_linear(w, b=None, multiple: int = LANE):
    """(w, b) repacked together (reference: repack_linear)."""
    wp = _pad_last(w, multiple)
    if b is None:
        return wp, None
    import jax.numpy as jnp
    pad = wp.shape[-1] - b.shape[-1]
    return wp, (jnp.pad(b, (0, pad)) if pad else b)


def repack_norm(w, multiple: int = LANE):
    """Norm weights pass through (already lane-friendly 1-D f32)."""
    return w
