"""RoPE family + PoPE + ALiBi (reference: src/pygpukit/ops/nn/rope.py:16-628).

Rotation convention matches the reference (split-half / NeoX style):
  out[:half] = x[:half]*cos - x[half:]*sin
  out[half:] = x[half:]*cos + x[:half]*sin
Tables are [max_seq_len, head_dim] with the half-dim frequencies duplicated
across the two halves (HF convention, emb = cat(freqs, freqs)); apply reads
the first half_dim columns.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...core.array import Array, as_jax, wrap

_F32 = jnp.float32


# ---------------------------------------------------------------------------
# Table initialisation
# ---------------------------------------------------------------------------

def _tables_from_inv_freq(max_seq_len: int, head_dim: int, inv_freq,
                          positions=None):
    if positions is None:
        positions = jnp.arange(max_seq_len, dtype=_F32)
    angles = jnp.outer(positions, inv_freq)                    # [S, half]
    cos_h, sin_h = jnp.cos(angles), jnp.sin(angles)
    # HF/NeoX convention: frequencies duplicated across the two halves
    # (emb = cat(freqs, freqs)); apply reads [..., :half]. (The reference
    # stores even/odd interleaved but its apply also reads the first half —
    # we follow the HF layout so real checkpoints match bit-for-bit.)
    cos = jnp.concatenate([cos_h, cos_h], axis=-1)
    sin = jnp.concatenate([sin_h, sin_h], axis=-1)
    return cos, sin


def _base_inv_freq(head_dim: int, base: float):
    half = head_dim // 2
    return 1.0 / (base ** (jnp.arange(half, dtype=_F32) / half))


def rope_init(max_seq_len: int, head_dim: int, base: float = 10000.0
              ) -> tuple[Array, Array]:
    """Standard RoPE tables."""
    cos, sin = _tables_from_inv_freq(max_seq_len, head_dim,
                                     _base_inv_freq(head_dim, base))
    return wrap(cos), wrap(sin)


def rope_init_ntk_aware(max_seq_len: int, head_dim: int, base: float = 10000.0,
                        scale: float = 1.0) -> tuple[Array, Array]:
    """NTK-aware: scale the base instead of positions
    (reference: rope.py:136-207): base' = base * scale^(d/(d-2))."""
    base_scaled = base * (scale ** (head_dim / max(head_dim - 2, 1)))
    cos, sin = _tables_from_inv_freq(max_seq_len, head_dim,
                                     _base_inv_freq(head_dim, base_scaled))
    return wrap(cos), wrap(sin)


def rope_init_yarn(max_seq_len: int, head_dim: int, base: float = 10000.0,
                   scale: float = 1.0, original_max_len: int = 4096,
                   beta_fast: float = 32.0, beta_slow: float = 1.0,
                   mscale: float | None = None,
                   mscale_all_dim: float | None = None,
                   attention_factor: float | None = None,
                   truncate: bool = True) -> tuple[Array, Array]:
    """YaRN dimension-wise interpolation, transformers-exact
    (_compute_yarn_parameters): the interpolation ramp runs over DIMENSION
    indices between the log-derived correction bounds (not wavelength
    thresholds — round 3 fixed the earlier approximation, which produced a
    different ramp and would mismatch real yarn checkpoints), and the
    paper's attention factor sqrt-free mscale is folded into the tables."""
    import math

    def get_mscale(s, m=1.0):
        return 1.0 if s <= 1 else 0.1 * m * math.log(s) + 1.0

    if attention_factor is None:
        if mscale and mscale_all_dim:
            attention_factor = float(get_mscale(scale, mscale)
                                     / get_mscale(scale, mscale_all_dim))
        else:
            attention_factor = get_mscale(scale)

    def corr_dim(rot):
        return (head_dim
                * math.log(original_max_len / (rot * 2 * math.pi))
                / (2 * math.log(base)))

    low, high = corr_dim(beta_fast), corr_dim(beta_slow)
    if truncate:
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0), min(high, head_dim - 1)
    if low == high:
        high += 0.001
    half = head_dim // 2
    ramp = jnp.clip((jnp.arange(half, dtype=_F32) - low) / (high - low),
                    0.0, 1.0)
    extrap_factor = 1.0 - ramp
    inv_freq = _base_inv_freq(head_dim, base)
    interp = (inv_freq / scale) * (1 - extrap_factor) \
        + inv_freq * extrap_factor
    cos, sin = _tables_from_inv_freq(max_seq_len, head_dim, interp)
    return (wrap(cos * np.float32(attention_factor)),
            wrap(sin * np.float32(attention_factor)))


def rope_init_llama3(max_seq_len: int, head_dim: int, base: float = 500000.0,
                     scale: float = 8.0, original_max_len: int = 8192,
                     low_freq_factor: float = 1.0,
                     high_freq_factor: float = 4.0) -> tuple[Array, Array]:
    """Llama-3.1 frequency-dependent scaling (HF ``rope_type: "llama3"`` —
    every Llama-3.1/3.2/3.3 checkpoint; the reference never implemented it,
    its loaders only ship the llama3 CHAT template, chat.py:108).

    Components whose wavelength exceeds ``original_max_len /
    low_freq_factor`` are interpolated by ``scale``; wavelengths under
    ``original_max_len / high_freq_factor`` are untouched; a smooth ramp
    joins the two regimes (matches transformers
    ``_compute_llama3_parameters``)."""
    inv_freq = _base_inv_freq(head_dim, base)
    wavelen = 2 * np.pi / inv_freq
    low_w = original_max_len / low_freq_factor
    high_w = original_max_len / high_freq_factor
    # smooth factor in [0,1]: 0 -> fully interpolated, 1 -> untouched
    smooth = jnp.clip(
        (original_max_len / wavelen - low_freq_factor)
        / (high_freq_factor - low_freq_factor), 0.0, 1.0)
    scaled = (1 - smooth) * (inv_freq / scale) + smooth * inv_freq
    interp = jnp.where(wavelen > low_w, inv_freq / scale,
                       jnp.where(wavelen < high_w, inv_freq, scaled))
    cos, sin = _tables_from_inv_freq(max_seq_len, head_dim, interp)
    return wrap(cos), wrap(sin)


def rope_init_longrope(max_seq_len: int, head_dim: int, base: float,
                       ext_factors, attention_factor: float = 1.0
                       ) -> tuple[Array, Array]:
    """LongRoPE (Phi-3 family; HF ``rope_type: "longrope"``): per-dimension
    rescale of the inverse frequencies by ``ext_factors`` (the checkpoint's
    short_factor or long_factor list, one per head_dim/2), with the paper's
    attention scaling folded into the cos/sin tables (matches transformers
    _compute_longrope_parameters: inv_freq = 1/(ext * base^(2i/d)), tables
    scaled by attention_factor)."""
    ext = jnp.asarray(np.asarray(ext_factors, np.float32))
    inv_freq = _base_inv_freq(head_dim, base) / ext
    cos, sin = _tables_from_inv_freq(max_seq_len, head_dim, inv_freq)
    return (wrap(cos * np.float32(attention_factor)),
            wrap(sin * np.float32(attention_factor)))


def rope_init_linear(max_seq_len: int, head_dim: int, base: float = 10000.0,
                     scale: float = 1.0) -> tuple[Array, Array]:
    """Linear position interpolation: pos' = pos / scale (reference: rope.py:321)."""
    positions = jnp.arange(max_seq_len, dtype=_F32) / scale
    cos, sin = _tables_from_inv_freq(max_seq_len, head_dim,
                                     _base_inv_freq(head_dim, base), positions)
    return wrap(cos), wrap(sin)


# ---------------------------------------------------------------------------
# Application
# ---------------------------------------------------------------------------

def apply_rope_fn(x, cos, sin):
    """Rotate [..., S, H, D] (or [S,H,D]) with tables [S, D] (split-half)."""
    d = x.shape[-1]
    half = d // 2
    c = cos[..., :half]            # [S, half]
    s = sin[..., :half]
    # broadcast over the heads axis which sits between S and D
    c = jnp.expand_dims(c, -2)
    s = jnp.expand_dims(s, -2)
    x0, x1 = x[..., :half], x[..., half:]
    xf0, xf1 = x0.astype(_F32), x1.astype(_F32)
    r0 = xf0 * c - xf1 * s
    r1 = xf1 * c + xf0 * s
    return jnp.concatenate([r0, r1], axis=-1).astype(x.dtype)


def apply_rope_interleaved_fn(x, cos, sin):
    """Interleaved (even/odd complex-pair) RoPE — the Llama-4 convention
    (HF llama4 apply_rotary_emb via view_as_complex; reference:
    llm/models/llama4.py rope path). Most families use the split-half
    layout (apply_rope_fn); Llama-4 rotates adjacent pairs instead.
    Tables stay in the shared half-duplicated [S, D] layout; only the
    first half (the unique frequencies) is read."""
    d = x.shape[-1]
    half = d // 2
    c = jnp.expand_dims(cos[..., :half], -2).astype(_F32)   # [S, 1, D/2]
    s = jnp.expand_dims(sin[..., :half], -2).astype(_F32)
    xe = x[..., 0::2].astype(_F32)
    xo = x[..., 1::2].astype(_F32)
    oe = xe * c - xo * s
    oo = xe * s + xo * c
    return jnp.stack([oe, oo], axis=-1).reshape(x.shape).astype(x.dtype)


def rope_inplace(q: Array, k: Array, cos, sin) -> None:
    """Apply RoPE to q [S,Hq,D] and k [S,Hk,D] in place (buffer rebind).

    Matches reference rope_inplace (rope.py:16-47); GQA-compatible.
    """
    cj, sj = as_jax(cos), as_jax(sin)
    qj, kj = as_jax(q), as_jax(k)
    seq = qj.shape[0]
    q._set_buffer(apply_rope_fn(qj, cj[:seq], sj[:seq]))
    k._set_buffer(apply_rope_fn(kj, cj[:seq], sj[:seq]))


def rope_inplace_interleaved(q: Array, k: Array, cos, sin) -> None:
    """Interleaved-pair (Llama-4 convention) RoPE in place — the Array-
    surface twin of rope_inplace for models that rotate adjacent pairs."""
    cj, sj = as_jax(cos), as_jax(sin)
    qj, kj = as_jax(q), as_jax(k)
    seq = qj.shape[0]
    q._set_buffer(apply_rope_interleaved_fn(qj, cj[:seq], sj[:seq]))
    k._set_buffer(apply_rope_interleaved_fn(kj, cj[:seq], sj[:seq]))


def rope_inplace_f32table(q: Array, k: Array, cos, sin, start_pos: int = 0) -> None:
    """Positional-offset variant for incremental decode (reference: rope.py:109)."""
    cj, sj = as_jax(cos), as_jax(sin)
    qj, kj = as_jax(q), as_jax(k)
    seq = qj.shape[0]
    c = jnp.asarray(cj)[start_pos:start_pos + seq]
    s = jnp.asarray(sj)[start_pos:start_pos + seq]
    q._set_buffer(apply_rope_fn(qj, c, s))
    k._set_buffer(apply_rope_fn(kj, c, s))


# ---------------------------------------------------------------------------
# PoPE — additive sinusoidal positional encoding (reference: rope.py:386-506)
# ---------------------------------------------------------------------------

def pope_init_encoding(max_seq_len: int, head_dim: int, base: float = 10000.0
                       ) -> Array:
    half = head_dim // 2
    inv_freq = 1.0 / (base ** (jnp.arange(half, dtype=_F32) / half))
    angles = jnp.outer(jnp.arange(max_seq_len, dtype=_F32), inv_freq)
    enc = jnp.zeros((max_seq_len, head_dim), _F32)
    enc = enc.at[:, 0::2].set(jnp.sin(angles)).at[:, 1::2].set(jnp.cos(angles))
    return wrap(enc)


def pope_inplace(q: Array, k: Array, encoding, start_pos: int = 0) -> None:
    ej = as_jax(encoding)
    qj, kj = as_jax(q), as_jax(k)
    seq = qj.shape[0]
    e = ej[start_pos:start_pos + seq][:, None, :]  # [S,1,D]
    q._set_buffer((qj.astype(_F32) + e).astype(qj.dtype))
    k._set_buffer((kj.astype(_F32) + e).astype(kj.dtype))


# ---------------------------------------------------------------------------
# ALiBi (reference: rope.py:507-628)
# ---------------------------------------------------------------------------

def alibi_init_slopes(num_heads: int) -> Array:
    slopes = 2.0 ** (-8.0 * (jnp.arange(num_heads, dtype=_F32) + 1) / num_heads)
    return wrap(slopes)


def alibi_bias_fn(seq_len: int, slopes, causal: bool = True):
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    dist = (i - j).astype(_F32)
    bias = -jnp.asarray(slopes)[:, None, None] * dist[None]
    if causal:
        bias = jnp.where(j[None] > i[None], -1e9, bias)
    return bias


def alibi_compute_bias(seq_len: int, num_heads: int, slopes,
                       causal: bool = True) -> Array:
    return wrap(alibi_bias_fn(seq_len, as_jax(slopes), causal))


def alibi_add_bias(scores: Array, slopes) -> Array:
    """scores [H,S,S] += distance bias -slope*(i-j), in place (buffer
    rebind). The bias itself is NOT causal-masked — callers apply their own
    causal mask (use alibi_compute_bias(causal=True) for a masked bias)."""
    sj = as_jax(scores)
    seq = sj.shape[-1]
    scores._set_buffer(
        (sj.astype(_F32) + alibi_bias_fn(seq, as_jax(slopes), causal=False))
        .astype(sj.dtype))
    return scores
