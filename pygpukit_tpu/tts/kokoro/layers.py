"""Kokoro (StyleTTS2) layer library — TPU-native JAX rebuild of the
reference layer set (reference: src/pygpukit/tts/kokoro/layers.py:41-1342 —
Linear, LayerNorm, Conv1d, LSTM, ConvTranspose1d, InstanceNorm1d, AdaIN,
WeightNormConv1d, ALBERT encoder, KokoroTextEncoder, StyleEncoder,
AdaINResBlock, Decoder, ISTFTNet).

Layers are lightweight parameter holders with ``__call__`` over jnp arrays;
convolution layouts follow torch (NCW). Weight init matches torch defaults
closely enough for shape/flow tests; real checkpoints load via
``from_weights`` dicts.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.conv import conv1d_fn, conv_transpose1d_fn
from ...ops.nn.norm import layernorm_fn
from ...ops.nn.recurrent import bilstm_fn, lstm_fn

_F32 = jnp.float32


def _randn(key, *shape, scale=0.02):
    return jax.random.normal(key, shape, _F32) * scale


class Linear:
    def __init__(self, key, in_f: int, out_f: int, bias: bool = True):
        self.w = _randn(key, in_f, out_f, scale=1.0 / math.sqrt(in_f))
        self.b = jnp.zeros((out_f,), _F32) if bias else None

    def __call__(self, x):
        y = jnp.dot(x, self.w, preferred_element_type=_F32)
        return y + self.b if self.b is not None else y

    def load(self, w, b=None):
        self.w = jnp.asarray(np.asarray(w).T, _F32)  # torch [out,in] -> [in,out]
        if b is not None:
            self.b = jnp.asarray(np.asarray(b), _F32)
        return self


class LayerNorm:
    def __init__(self, dim: int, eps: float = 1e-5):
        self.w = jnp.ones((dim,), _F32)
        self.b = jnp.zeros((dim,), _F32)
        self.eps = eps

    def __call__(self, x):
        return layernorm_fn(x, self.w, self.b, self.eps)

    def load(self, w, b):
        self.w = jnp.asarray(np.asarray(w), _F32)
        self.b = jnp.asarray(np.asarray(b), _F32)
        return self


class Conv1d:
    """torch-layout conv: x [N,C,W], weight [O,I/g,K]."""

    def __init__(self, key, in_ch: int, out_ch: int, kernel: int,
                 stride: int = 1, padding: int = 0, dilation: int = 1,
                 groups: int = 1, bias: bool = True):
        scale = 1.0 / math.sqrt(in_ch * kernel / groups)
        self.w = _randn(key, out_ch, in_ch // groups, kernel, scale=scale)
        self.b = jnp.zeros((out_ch,), _F32) if bias else None
        self.stride, self.padding = stride, padding
        self.dilation, self.groups = dilation, groups

    def __call__(self, x):
        return conv1d_fn(x, self.w, self.b, self.stride, self.padding,
                         self.dilation, self.groups)

    def load(self, w, b=None):
        self.w = jnp.asarray(np.asarray(w), _F32)
        if b is not None:
            self.b = jnp.asarray(np.asarray(b), _F32)
        return self


class WeightNormConv1d(Conv1d):
    """Conv1d with weight normalisation folded at load time (reference:
    layers.py:841 — inference folds g * v/||v||)."""

    def load_weight_norm(self, g, v, b=None):
        v = np.asarray(v)
        norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True)) + 1e-12
        self.w = jnp.asarray(np.asarray(g).reshape(-1, 1, 1) * v / norm, _F32)
        if b is not None:
            self.b = jnp.asarray(np.asarray(b), _F32)
        return self


class ConvTranspose1d:
    def __init__(self, key, in_ch: int, out_ch: int, kernel: int,
                 stride: int = 1, padding: int = 0, bias: bool = True):
        scale = 1.0 / math.sqrt(in_ch * kernel)
        self.w = _randn(key, in_ch, out_ch, kernel, scale=scale)
        self.b = jnp.zeros((out_ch,), _F32) if bias else None
        self.stride, self.padding = stride, padding

    def __call__(self, x):
        return conv_transpose1d_fn(x, self.w, self.b, self.stride,
                                   self.padding)

    def load(self, w, b=None):
        self.w = jnp.asarray(np.asarray(w), _F32)
        if b is not None:
            self.b = jnp.asarray(np.asarray(b), _F32)
        return self


class LSTM:
    """(bi)LSTM over [S,B,I] (reference: layers.py:159)."""

    def __init__(self, key, input_size: int, hidden: int,
                 bidirectional: bool = True):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        s = 1.0 / math.sqrt(hidden)
        self.w_ih_f = _randn(k1, 4 * hidden, input_size, scale=s)
        self.w_hh_f = _randn(k2, 4 * hidden, hidden, scale=s)
        self.b_ih_f = jnp.zeros((4 * hidden,), _F32)
        self.b_hh_f = jnp.zeros((4 * hidden,), _F32)
        self.bidirectional = bidirectional
        if bidirectional:
            self.w_ih_b = _randn(k3, 4 * hidden, input_size, scale=s)
            self.w_hh_b = _randn(k4, 4 * hidden, hidden, scale=s)
            self.b_ih_b = jnp.zeros((4 * hidden,), _F32)
            self.b_hh_b = jnp.zeros((4 * hidden,), _F32)

    def __call__(self, x):
        if self.bidirectional:
            return bilstm_fn(x, self.w_ih_f, self.w_hh_f, self.b_ih_f,
                             self.b_hh_f, self.w_ih_b, self.w_hh_b,
                             self.b_ih_b, self.b_hh_b)
        out, _ = lstm_fn(x, self.w_ih_f, self.w_hh_f, self.b_ih_f, self.b_hh_f)
        return out


class InstanceNorm1d:
    """Per-channel instance norm over W, affine (reference: layers.py:917)."""

    def __init__(self, ch: int, eps: float = 1e-5):
        self.w = jnp.ones((ch,), _F32)
        self.b = jnp.zeros((ch,), _F32)
        self.eps = eps

    def __call__(self, x):  # [N,C,W]
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        y = (x - mu) / jnp.sqrt(var + self.eps)
        return y * self.w[None, :, None] + self.b[None, :, None]


class AdaIN:
    """Adaptive instance norm: style vector modulates per-channel gain/bias
    (reference: layers.py:954)."""

    def __init__(self, key, style_dim: int, ch: int):
        self.fc = Linear(key, style_dim, 2 * ch)
        self.norm_eps = 1e-5
        self.ch = ch

    def __call__(self, x, style):  # x [N,C,W], style [N,S]
        h = self.fc(style)                      # [N, 2C]
        gamma, beta = jnp.split(h, 2, axis=-1)
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        y = (x - mu) / jnp.sqrt(var + self.norm_eps)
        return (1 + gamma[:, :, None]) * y + beta[:, :, None]


def leaky_relu(x, slope: float = 0.1):
    return jnp.where(x >= 0, x, slope * x)


def snake(x, alpha):
    """Snake activation used by iSTFT-net style vocoders."""
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


class AlbertLayer:
    """ALBERT transformer layer (shared weights across depth; reference:
    layers.py:1008)."""

    def __init__(self, key, dim: int, n_heads: int, ffn: int):
        ks = jax.random.split(key, 6)
        self.q = Linear(ks[0], dim, dim)
        self.k = Linear(ks[1], dim, dim)
        self.v = Linear(ks[2], dim, dim)
        self.out = Linear(ks[3], dim, dim)
        self.ln1 = LayerNorm(dim)
        self.fc1 = Linear(ks[4], dim, ffn)
        self.fc2 = Linear(ks[5], ffn, dim)
        self.ln2 = LayerNorm(dim)
        self.n_heads = n_heads

    def __call__(self, x, mask=None):  # x [S, E]
        s, e = x.shape
        d = e // self.n_heads
        q = self.q(x).reshape(s, self.n_heads, d).transpose(1, 0, 2)
        k = self.k(x).reshape(s, self.n_heads, d).transpose(1, 0, 2)
        v = self.v(x).reshape(s, self.n_heads, d).transpose(1, 0, 2)
        scores = jnp.einsum("hsd,htd->hst", q, k) / math.sqrt(d)
        if mask is not None:
            scores = jnp.where(mask, -1e30, scores)
        att = jnp.einsum("hst,htd->hsd", jax.nn.softmax(scores, -1), v)
        att = att.transpose(1, 0, 2).reshape(s, e)
        x = self.ln1(x + self.out(att))
        h = jax.nn.gelu(self.fc1(x))
        return self.ln2(x + self.fc2(h))


class AlbertEncoder:
    """ALBERT: one shared layer applied n_layers times (reference:
    layers.py:1092 + PLBERTEncoder:432)."""

    def __init__(self, key, vocab: int, dim: int, n_heads: int, ffn: int,
                 n_layers: int, max_pos: int = 512, emb_dim: int | None = None):
        ks = jax.random.split(key, 4)
        emb_dim = emb_dim or dim
        self.tok = _randn(ks[0], vocab, emb_dim)
        self.pos = _randn(ks[1], max_pos, emb_dim)
        self.emb_ln = LayerNorm(emb_dim)
        self.emb_proj = (Linear(ks[2], emb_dim, dim)
                         if emb_dim != dim else None)
        self.layer = AlbertLayer(ks[3], dim, n_heads, ffn)
        self.n_layers = n_layers

    def __call__(self, ids):  # [S]
        s = ids.shape[0]
        x = self.tok[ids] + self.pos[:s]
        x = self.emb_ln(x)
        if self.emb_proj is not None:
            x = self.emb_proj(x)
        for _ in range(self.n_layers):
            x = self.layer(x)
        return x                                  # [S, dim]


class TextEncoder:
    """Kokoro text encoder: embedding → CNN stack → biLSTM (reference:
    KokoroTextEncoder, layers.py:1167)."""

    def __init__(self, key, vocab: int, dim: int, n_conv: int = 3,
                 kernel: int = 5):
        ks = jax.random.split(key, n_conv + 2)
        self.embed = _randn(ks[0], vocab, dim)
        pad = (kernel - 1) // 2
        self.convs = [Conv1d(ks[i + 1], dim, dim, kernel, padding=pad)
                      for i in range(n_conv)]
        self.norms = [LayerNorm(dim) for _ in range(n_conv)]
        self.lstm = LSTM(ks[-1], dim, dim // 2, bidirectional=True)

    def __call__(self, ids):  # [S] -> [S, dim]
        x = self.embed[ids]                      # [S, D]
        h = x.T[None]                             # [1, D, S]
        for conv, norm in zip(self.convs, self.norms):
            h = conv(h)
            h = norm(h[0].T).T[None]
            h = leaky_relu(h, 0.2)
        seq = h[0].T[:, None, :]                  # [S, 1, D]
        out = self.lstm(seq)                      # [S, 1, D]
        return out[:, 0, :]


class StyleEncoder:
    """Style vector from reference mel / voice embedding (reference:
    layers.py:510). Kokoro ships precomputed voice style vectors; this
    encoder maps mel → style for voice cloning parity."""

    def __init__(self, key, n_mels: int = 80, style_dim: int = 128):
        ks = jax.random.split(key, 5)
        chans = [n_mels, 128, 128, 256]
        self.convs = [Conv1d(ks[i], chans[i], chans[i + 1], 5, stride=2,
                             padding=2) for i in range(3)]
        self.fc = Linear(ks[4], chans[-1], style_dim)

    def __call__(self, mel):  # [frames, n_mels] -> [style_dim]
        h = mel.T[None]                          # [1, M, F]
        for c in self.convs:
            h = leaky_relu(c(h), 0.2)
        pooled = h.mean(axis=-1)[0]              # [C]
        return self.fc(pooled)


class AdaINResBlock:
    """Residual block with style-conditioned AdaIN (reference: layers.py:1224)."""

    def __init__(self, key, ch: int, style_dim: int, kernel: int = 3,
                 dilation: int = 1):
        ks = jax.random.split(key, 4)
        pad = dilation * (kernel - 1) // 2
        self.c1 = Conv1d(ks[0], ch, ch, kernel, padding=pad, dilation=dilation)
        self.c2 = Conv1d(ks[1], ch, ch, kernel, padding=pad, dilation=dilation)
        self.n1 = AdaIN(ks[2], style_dim, ch)
        self.n2 = AdaIN(ks[3], style_dim, ch)

    def __call__(self, x, style):  # [N,C,W], [N,S]
        h = self.c1(leaky_relu(self.n1(x, style), 0.2))
        h = self.c2(leaky_relu(self.n2(h, style), 0.2))
        return x + h


class ResBlock1d:
    """Plain residual conv block (reference: layers.py:568)."""

    def __init__(self, key, ch: int, kernel: int = 3,
                 dilations=(1, 3, 5)):
        ks = jax.random.split(key, len(dilations))
        self.convs = [Conv1d(ks[i], ch, ch, kernel,
                             padding=d * (kernel - 1) // 2, dilation=d)
                      for i, d in enumerate(dilations)]

    def __call__(self, x):
        for c in self.convs:
            x = x + c(leaky_relu(x, 0.1))
        return x


class ISTFTNet:
    """iSTFT-based vocoder: upsample → resblocks → (mag, phase) → iSTFT
    (reference: ISTFTNet, layers.py:666)."""

    def __init__(self, key, in_ch: int = 512, n_fft: int = 20,
                 hop: int = 5, upsamples=(10, 6), up_kernels=(20, 12)):
        ks = jax.random.split(key, 8)
        self.n_fft, self.hop = n_fft, hop
        ch = in_ch
        self.ups = []
        self.blocks = []
        for i, (u, k) in enumerate(zip(upsamples, up_kernels)):
            self.ups.append(ConvTranspose1d(
                ks[i], ch, ch // 2, k, stride=u, padding=(k - u) // 2))
            self.blocks.append(ResBlock1d(ks[i + 2], ch // 2))
            ch //= 2
        self.out_conv = Conv1d(ks[6], ch, n_fft + 2, 7, padding=3)

    def __call__(self, x):  # [1, C, W] -> audio [T]
        for up, blk in zip(self.ups, self.blocks):
            x = blk(leaky_relu(up(x), 0.1))
        spec = self.out_conv(x)[0]               # [n_fft+2, W]
        half = self.n_fft // 2 + 1
        mag = jnp.exp(jnp.clip(spec[:half], -11, 5))
        phase = jnp.pi * jnp.tanh(spec[half:2 * half])
        # complex ops are only TPU-supported under jit: form the complex STFT
        # from real mag/phase inside the jitted iSTFT
        return _istft_mag_phase(mag.T, phase.T, self.n_fft, self.hop)


@functools.lru_cache(maxsize=None)
def _istft_mag_phase_jit(n_fft: int, hop: int):
    import jax
    from ...ops.audio import istft as istft_op, hann_window

    def f(mag, phase):
        spec = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
        return istft_op(spec, n_fft, hop, window=hann_window(n_fft))

    return jax.jit(f)


def _istft_mag_phase(mag, phase, n_fft: int, hop: int):
    return _istft_mag_phase_jit(n_fft, hop)(mag, phase)


class DurationPredictor:
    """Text+style → per-phoneme durations (reference: Decoder/duration path,
    layers.py:588)."""

    def __init__(self, key, dim: int, style_dim: int):
        ks = jax.random.split(key, 3)
        self.proj_in = Linear(ks[0], dim + style_dim, dim)
        self.lstm = LSTM(ks[1], dim, dim // 2, bidirectional=True)
        self.proj = Linear(ks[2], dim, 1)

    def __call__(self, text_feats, style):  # [S,D], [style]
        s = text_feats.shape[0]
        st = jnp.tile(style[None], (s, 1))
        h = self.proj_in(jnp.concatenate([text_feats, st], axis=-1))
        h = self.lstm(h[:, None, :])[:, 0]
        dur = jax.nn.softplus(self.proj(h))[:, 0]   # [S] positive frames
        return dur


class F0NPredictor:
    """F0 + noise predictors over expanded features (reference: prosody
    predictors in model.py)."""

    def __init__(self, key, dim: int, style_dim: int):
        ks = jax.random.split(key, 4)
        self.blocks = [AdaINResBlock(ks[i], dim, style_dim) for i in range(2)]
        self.f0_conv = Conv1d(ks[2], dim, 1, 3, padding=1)
        self.n_conv = Conv1d(ks[3], dim, 1, 3, padding=1)

    def __call__(self, x, style):  # [1,D,W], [1,S]
        for b in self.blocks:
            x = b(x, style)
        return self.f0_conv(x)[0, 0], self.n_conv(x)[0, 0]
