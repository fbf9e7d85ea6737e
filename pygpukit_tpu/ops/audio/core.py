"""Audio DSP core: buffers, STFT/ISTFT, mel, MFCC, Griffin-Lim, resample.

TPU-native rebuild of the reference audio library (reference:
src/pygpukit/ops/audio/* + native/ops/audio/audio.{cu,hpp} — ~60 custom CUDA
DSP functions incl. hand-written FFT). On TPU ``jnp.fft`` runs on device and
XLA fuses the surrounding frame/window math, so no hand FFT is needed; the
module keeps the reference's function surface.

All functions accept/return jnp arrays (mono [N] or [frames, bins]);
AudioBuffer wraps them with sample-rate metadata.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32


@dataclass
class AudioBuffer:
    """Device audio buffer (reference: AudioBuffer, ops/audio/buffer.py)."""
    data: jnp.ndarray       # [N] f32 mono
    sample_rate: int

    @classmethod
    def from_pcm(cls, pcm: np.ndarray, sample_rate: int) -> "AudioBuffer":
        arr = np.asarray(pcm)
        if arr.dtype == np.int16:
            arr = arr.astype(np.float32) / 32768.0
        if arr.ndim == 2:  # downmix
            arr = arr.mean(axis=-1)
        return cls(jnp.asarray(arr, _F32), sample_rate)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.data)

    @property
    def duration(self) -> float:
        return self.data.shape[0] / self.sample_rate

    def __len__(self) -> int:
        return int(self.data.shape[0])


def hann_window(n: int) -> jnp.ndarray:
    return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n) / n)


def frame_signal(x, frame_length: int, hop_length: int, center: bool = True):
    """[N] -> [frames, frame_length] strided frames."""
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, (pad, pad), mode="reflect")
    n = x.shape[0]
    num = 1 + (n - frame_length) // hop_length
    idx = (jnp.arange(num)[:, None] * hop_length
           + jnp.arange(frame_length)[None, :])
    return x[idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "center"))
def stft(x, n_fft: int = 400, hop_length: int = 160,
         window: jnp.ndarray | None = None, center: bool = True):
    """[N] -> complex [frames, n_fft//2+1]."""
    w = window if window is not None else hann_window(n_fft)
    frames = frame_signal(x.astype(_F32), n_fft, hop_length, center)
    return jnp.fft.rfft(frames * w, n=n_fft, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "length", "center"))
def istft(spec, n_fft: int = 400, hop_length: int = 160,
          window: jnp.ndarray | None = None, length: int | None = None,
          center: bool = True):
    """Inverse STFT with overlap-add + window-square normalisation."""
    w = window if window is not None else hann_window(n_fft)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * w      # [F, n_fft]
    num = frames.shape[0]
    out_len = n_fft + hop_length * (num - 1)
    # overlap-add via scatter
    idx = (jnp.arange(num)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :]).reshape(-1)
    sig = jnp.zeros(out_len, _F32).at[idx].add(frames.reshape(-1))
    wsq = jnp.zeros(out_len, _F32).at[idx].add(
        jnp.tile(w * w, (num,)))
    sig = sig / jnp.maximum(wsq, 1e-8)
    if center:
        sig = sig[n_fft // 2:out_len - n_fft // 2]
    if length is not None:
        sig = sig[:length] if sig.shape[0] >= length else jnp.pad(
            sig, (0, length - sig.shape[0]))
    return sig


def _hz_to_mel(f):
    return 2595.0 * jnp.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=32)
def mel_filterbank(sr: int, n_fft: int, n_mels: int = 80,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Slaney-style triangular mel filterbank [n_mels, n_fft//2+1] (host;
    cached constant)."""
    fmax = fmax or sr / 2
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_bins)

    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    mel_pts = np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2)
    hz_pts = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    fb = np.zeros((n_mels, n_bins), np.float32)
    for i in range(n_mels):
        lo, cen, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (fft_freqs - lo) / max(cen - lo, 1e-8)
        down = (hi - fft_freqs) / max(hi - cen, 1e-8)
        fb[i] = np.maximum(0, np.minimum(up, down))
    # Slaney normalisation
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length", "n_mels", "power"))
def melspectrogram(x, sr: int, n_fft: int = 400, hop_length: int = 160,
                   n_mels: int = 80, power: float = 2.0):
    spec = jnp.abs(stft(x, n_fft, hop_length)) ** power     # [F, bins]
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    return spec @ fb.T                                       # [F, n_mels]


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length", "n_mels", "eps"))
def log_melspectrogram(x, sr: int, n_fft: int = 400, hop_length: int = 160,
                       n_mels: int = 80, eps: float = 1e-10):
    """Whisper-style log10 mel with dynamic-range clamping."""
    m = melspectrogram(x, sr, n_fft, hop_length, n_mels)
    logm = jnp.log10(jnp.maximum(m, eps))
    logm = jnp.maximum(logm, logm.max() - 8.0)
    return (logm + 4.0) / 4.0


@functools.partial(jax.jit, static_argnames=("sr", "n_mfcc", "n_fft", "hop_length", "n_mels"))
def mfcc(x, sr: int, n_mfcc: int = 13, n_fft: int = 400,
         hop_length: int = 160, n_mels: int = 40):
    """MFCC via DCT-II over log-mel."""
    logm = jnp.log(jnp.maximum(
        melspectrogram(x, sr, n_fft, hop_length, n_mels), 1e-10))
    n = n_mels
    k = jnp.arange(n_mfcc)[:, None]
    i = jnp.arange(n)[None, :]
    dct = jnp.cos(jnp.pi * k * (2 * i + 1) / (2 * n)) * jnp.sqrt(2.0 / n)
    return logm @ dct.T                                      # [F, n_mfcc]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "n_iter", "length", "seed"))
def griffin_lim(mag, n_fft: int = 400, hop_length: int = 160,
                n_iter: int = 32, length: int | None = None, seed: int = 0):
    """Phase reconstruction from magnitude (reference: griffin_lim kernels)."""
    key = jax.random.PRNGKey(seed)
    angles = jax.random.uniform(key, mag.shape, _F32, 0, 2 * jnp.pi)
    spec = mag * jnp.exp(1j * angles)

    def body(i, spec):
        x = istft(spec, n_fft, hop_length)
        re = stft(x, n_fft, hop_length)
        re = re[:mag.shape[0]]
        phase = re / jnp.maximum(jnp.abs(re), 1e-8)
        return mag * phase

    spec = jax.lax.fori_loop(0, n_iter, body, spec)
    return istft(spec, n_fft, hop_length, length=length)


@functools.partial(jax.jit, static_argnames=("orig_sr", "target_sr"))
def resample(x, orig_sr: int, target_sr: int):
    """Linear-interpolation resampling (reference: resample kernel)."""
    if orig_sr == target_sr:
        return x
    n = x.shape[0]
    out_n = int(round(n * target_sr / orig_sr))
    pos = jnp.arange(out_n) * (orig_sr / target_sr)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    i1 = jnp.clip(i0 + 1, 0, n - 1)
    frac = (pos - i0).astype(_F32)
    return x[i0] * (1 - frac) + x[i1] * frac


@functools.partial(jax.jit, static_argnames=("coeff",))
def preemphasis(x, coeff: float = 0.97):
    return jnp.concatenate([x[:1], x[1:] - coeff * x[:-1]])


def db_to_amplitude(db):
    return 10.0 ** (db / 20.0)


def amplitude_to_db(amp, eps: float = 1e-10):
    return 20.0 * jnp.log10(jnp.maximum(amp, eps))


class RingBuffer:
    """Streaming audio ring buffer (reference: native audio ring buffer,
    audio.hpp — feeds realtime pipelines with fixed memory)."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self._buf = np.zeros(capacity, np.float32)
        self._write = 0
        self._count = 0

    def push(self, samples: np.ndarray) -> None:
        s = np.asarray(samples, np.float32).ravel()
        if len(s) >= self.capacity:
            self._buf[:] = s[-self.capacity:]
            self._write = 0
            self._count = self.capacity
            return
        end = self._write + len(s)
        if end <= self.capacity:
            self._buf[self._write:end] = s
        else:
            split = self.capacity - self._write
            self._buf[self._write:] = s[:split]
            self._buf[:end - self.capacity] = s[split:]
        self._write = end % self.capacity
        self._count = min(self._count + len(s), self.capacity)

    def read_latest(self, n: int) -> np.ndarray:
        """Most recent n samples in chronological order."""
        n = min(n, self._count)
        start = (self._write - n) % self.capacity
        if start + n <= self.capacity:
            return self._buf[start:start + n].copy()
        split = self.capacity - start
        return np.concatenate([self._buf[start:], self._buf[:n - split]])

    def __len__(self) -> int:
        return self._count
