"""Spectral features + preprocessing filters (reference:
src/pygpukit/ops/audio/{features,preprocessing,spectral,pitch,cqt}.py and the
native kernels in native/ops/audio/ — spectral_centroid_kernel:1360,
spectral_contrast_kernel:1882, delta_features_kernel:1004,
deemphasis_sequential_kernel:476, highpass_iir_kernel:537,
spectral_gate_kernel:616, autocorrelation_kernel:1261,
cqt_to_chroma_kernel:1669).

TPU design notes:
- Per-frame reductions (centroid/bandwidth/rolloff/flatness) are plain jnp
  reductions that XLA fuses into one pass over the spectrogram.
- The sequential IIR filters (deemphasis, single-pole highpass) are first-order
  linear recurrences y[i] = a*y[i-1] + b[i]; we lower them with
  ``jax.lax.associative_scan`` (log-depth) instead of the reference's
  single-thread sequential kernel.
- Frequency-axis convention matches the reference host code:
  ``freq_bin_hz = sample_rate / (2 * (n_freq - 1))``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_F32 = jnp.float32


def _first_order_recurrence(a, b):
    """Solve y[i] = a[i] * y[i-1] + b[i] (y[-1] = 0) with associative scan."""
    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, b1 * a2 + b2
    _, y = jax.lax.associative_scan(combine, (a, b))
    return y


# ---------------------------------------------------------------- features --

@functools.partial(jax.jit, static_argnames=("sample_rate",))
def spectral_centroid(spectrum, sample_rate: int = 16000):
    """Per-frame spectral centre of mass in Hz. spectrum: [F, n_freq]."""
    spectrum = spectrum.astype(_F32)
    n_freq = spectrum.shape[-1]
    freqs = jnp.arange(n_freq, dtype=_F32) * (sample_rate / (2.0 * (n_freq - 1)))
    num = jnp.sum(freqs * spectrum, axis=-1)
    den = jnp.sum(spectrum, axis=-1)
    return jnp.where(den > 1e-10, num / jnp.maximum(den, 1e-10), 0.0)


@functools.partial(jax.jit, static_argnames=("sample_rate", "p"))
def spectral_bandwidth(spectrum, centroids, sample_rate: int = 16000,
                       p: int = 2):
    """Weighted p-norm deviation of frequency around the centroid, in Hz."""
    spectrum = spectrum.astype(_F32)
    n_freq = spectrum.shape[-1]
    freqs = jnp.arange(n_freq, dtype=_F32) * (sample_rate / (2.0 * (n_freq - 1)))
    diff = jnp.abs(freqs[None, :] - centroids[:, None]) ** p
    num = jnp.sum(diff * spectrum, axis=-1)
    den = jnp.sum(spectrum, axis=-1)
    bw = jnp.where(den > 1e-10, num / jnp.maximum(den, 1e-10), 0.0)
    return bw ** (1.0 / p)


@functools.partial(jax.jit, static_argnames=("sample_rate", "roll_percent"))
def spectral_rolloff(spectrum, sample_rate: int = 16000,
                     roll_percent: float = 0.85):
    """Frequency below which ``roll_percent`` of spectral energy lies."""
    spectrum = spectrum.astype(_F32)
    n_freq = spectrum.shape[-1]
    bin_hz = sample_rate / (2.0 * (n_freq - 1))
    cum = jnp.cumsum(spectrum, axis=-1)
    threshold = cum[:, -1:] * roll_percent
    # first bin where cumsum >= threshold; default = last bin
    hit = cum >= threshold
    bin_idx = jnp.where(hit.any(axis=-1), jnp.argmax(hit, axis=-1), n_freq - 1)
    return bin_idx.astype(_F32) * bin_hz


@jax.jit
def spectral_flatness(spectrum):
    """Geometric mean / arithmetic mean per frame (1 = noise, 0 = tonal)."""
    mag = spectrum.astype(_F32) + 1e-10
    geo = jnp.exp(jnp.mean(jnp.log(mag), axis=-1))
    arith = jnp.mean(mag, axis=-1)
    return jnp.where(arith > 1e-10, geo / jnp.maximum(arith, 1e-10), 0.0)


@functools.partial(jax.jit, static_argnames=("n_bands", "alpha"))
def spectral_contrast(spectrum, n_bands: int = 6, alpha: float = 0.2):
    """Per-band log(peak) - log(valley); peaks/valleys = top/bottom
    ``alpha`` fraction of sorted band magnitudes. -> [F, n_bands]."""
    spectrum = spectrum.astype(_F32)
    n_freq = spectrum.shape[-1]
    cols = []
    for band in range(n_bands):
        start = band * n_freq // n_bands
        end = (band + 1) * n_freq // n_bands
        vals = jnp.sort(spectrum[:, start:end], axis=-1)   # [F, band_size]
        n_top = max(1, int((end - start) * alpha))
        valley = jnp.mean(vals[:, :n_top], axis=-1)
        peak = jnp.mean(vals[:, -n_top:], axis=-1)
        cols.append(jnp.log(peak + 1e-10) - jnp.log(valley + 1e-10))
    return jnp.stack(cols, axis=-1)


@functools.partial(jax.jit, static_argnames=("order", "width"))
def delta(features, order: int = 1, width: int = 2):
    """Regression delta features over [F, D]; ``order`` applies repeatedly."""
    x = features.astype(_F32)
    n_frames = x.shape[0]
    denom = 2.0 * sum(n * n for n in range(1, width + 1))

    def one_pass(x):
        out = jnp.zeros_like(x)
        for n in range(1, width + 1):
            plus = x[jnp.minimum(jnp.arange(n_frames) + n, n_frames - 1)]
            minus = x[jnp.maximum(jnp.arange(n_frames) - n, 0)]
            out = out + n * (plus - minus)
        return out / (denom + 1e-10)

    for _ in range(order):
        x = one_pass(x)
    return x


@functools.partial(jax.jit, static_argnames=("max_lag",))
def autocorrelation(x, max_lag: int):
    """acf[lag] = sum_i x[i] * x[i+lag] for lag in [0, max_lag)."""
    x = x.astype(_F32)
    n = x.shape[0]

    def per_lag(lag):
        shifted = jnp.roll(x, -lag)
        mask = jnp.arange(n) < (n - lag)
        return jnp.sum(jnp.where(mask, x * shifted, 0.0))

    return jax.vmap(per_lag)(jnp.arange(max_lag))


@functools.partial(jax.jit, static_argnames=("bins_per_octave",))
def chroma_cqt(cqt_magnitude, bins_per_octave: int = 12):
    """Fold CQT magnitudes [F, n_bins] into a 12-bin chromagram, per-frame
    max-normalised (reference cqt_to_chroma_kernel + normalize_chroma)."""
    mag = cqt_magnitude.astype(_F32)
    n_bins = mag.shape[-1]
    n_octaves = n_bins // bins_per_octave
    step = bins_per_octave // 12
    idx = (jnp.arange(n_octaves)[:, None] * bins_per_octave
           + jnp.arange(12)[None, :] * step)              # [oct, 12]
    folded = mag[:, idx].sum(axis=1)                       # [F, 12]
    mx = jnp.max(folded, axis=-1, keepdims=True)
    return jnp.where(mx > 1e-10, folded / jnp.maximum(mx, 1e-10), folded)


# ----------------------------------------------------------- preprocessing --

@functools.partial(jax.jit, static_argnames=("alpha",))
def deemphasis(x, alpha: float = 0.97):
    """Inverse of preemphasis: y[i] = x[i] + alpha * y[i-1] (assoc. scan)."""
    x = x.astype(_F32)
    a = jnp.full_like(x, alpha)
    return _first_order_recurrence(a, x)


@jax.jit
def remove_dc(x):
    return x - jnp.mean(x)


@functools.partial(jax.jit, static_argnames=("cutoff_hz", "sample_rate"))
def highpass_filter(x, cutoff_hz: float = 20.0, sample_rate: int = 16000):
    """Single-pole IIR highpass: y[i] = a*(y[i-1] + x[i] - x[i-1])."""
    x = x.astype(_F32)
    rc = 1.0 / (2.0 * jnp.pi * cutoff_hz)
    dt = 1.0 / sample_rate
    a = float(rc / (rc + dt))
    xd = x - jnp.concatenate([jnp.zeros(1, _F32), x[:-1]])
    return _first_order_recurrence(jnp.full_like(x, a), a * xd)


@functools.partial(jax.jit, static_argnames=("threshold",))
def noise_gate(x, threshold: float = 0.01):
    """Hard gate: zero samples with |x| < threshold."""
    return jnp.where(jnp.abs(x) < threshold, 0.0, x)


@functools.partial(jax.jit, static_argnames=("frame_size",))
def compute_short_term_energy(x, frame_size: int = 256):
    """Mean energy of non-overlapping frames -> [n_frames]."""
    x = x.astype(_F32)
    n_frames = x.shape[0] // frame_size
    frames = x[: n_frames * frame_size].reshape(n_frames, frame_size)
    return jnp.mean(frames * frames, axis=-1)


@functools.partial(jax.jit, static_argnames=("threshold", "attack_samples", "release_samples"))
def spectral_gate(x, threshold: float = 0.01, attack_samples: int = 64,
                  release_samples: int = 256):
    """Soft gate: per-frame gain = (energy/threshold)^2 below threshold.
    ``release_samples`` is accepted for API parity (the reference kernel
    ignores it too — spectral_gate_kernel:616)."""
    x = x.astype(_F32)
    n = x.shape[0]
    frame_size = attack_samples
    num_frames = n // frame_size
    if num_frames <= 0:
        return noise_gate(x, threshold)
    energy = compute_short_term_energy(x, frame_size)      # [num_frames]
    frame_idx = jnp.minimum(jnp.arange(n) // frame_size, num_frames - 1)
    e = energy[frame_idx]
    ratio = e / threshold
    gain = jnp.where(e < threshold, ratio * ratio, 1.0)
    return x * gain


@functools.partial(jax.jit, static_argnames=("frame_size", "hop_size"))
def zero_crossing_rate(x, frame_size: int = 512, hop_size: int = 256):
    """Per-frame zero-crossing fraction (reference:
    zero_crossing_rate_kernel)."""
    from .core import frame_signal
    frames = frame_signal(x.astype(_F32), frame_size, hop_size, center=False)
    signs = jnp.sign(frames)
    return jnp.mean(jnp.abs(jnp.diff(signs, axis=-1)) > 0, axis=-1)


@functools.partial(jax.jit, static_argnames=("sample_rate", "n_chroma", "tuning"))
def chroma_stft(spectrum, sample_rate: int = 16000, n_chroma: int = 12,
                tuning: float = 0.0):
    """Chromagram from an STFT magnitude spectrum [F, n_freq]: fold each FFT
    bin's energy into its pitch class, per-frame max-normalised (reference:
    audio_chroma_stft)."""
    spectrum = spectrum.astype(_F32)
    n_freq = spectrum.shape[-1]
    freqs = jnp.arange(n_freq, dtype=_F32) * (
        sample_rate / (2.0 * (n_freq - 1)))
    midi = 12.0 * jnp.log2(jnp.maximum(freqs, 1e-6) / 440.0) + 69.0 - tuning
    pc = jnp.mod(jnp.round(midi), n_chroma).astype(jnp.int32)    # [n_freq]
    valid = (freqs > 20.0).astype(_F32)
    onehot = (jax.nn.one_hot(pc, n_chroma, dtype=_F32)
              * valid[:, None])                                  # [n_freq, C]
    folded = spectrum @ onehot                                   # [F, C]
    mx = jnp.max(folded, axis=-1, keepdims=True)
    return jnp.where(mx > 1e-10, folded / jnp.maximum(mx, 1e-10), folded)
