"""Audio analysis: VAD, YIN pitch, CQT, chroma, HPSS, effects
(reference: src/pygpukit/ops/audio/{vad,pitch,cqt,chroma,hpss,effects}.py +
native audio kernels)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .core import frame_signal, stft, istft

_F32 = jnp.float32


# ---------------------------------------------------------------------- VAD --

@functools.partial(jax.jit, static_argnames=("frame_length", "hop_length", "threshold_db"))
def vad_energy(x, frame_length: int = 400, hop_length: int = 160,
               threshold_db: float = -40.0):
    """Energy VAD: per-frame RMS vs dB threshold → bool [frames]."""
    frames = frame_signal(x.astype(_F32), frame_length, hop_length)
    rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1) + 1e-12)
    db = 20.0 * jnp.log10(jnp.maximum(rms, 1e-10))
    return db > threshold_db


@functools.partial(jax.jit, static_argnames=("frame_length", "hop_length", "max_rate"))
def vad_zcr(x, frame_length: int = 400, hop_length: int = 160,
            max_rate: float = 0.3):
    """Zero-crossing-rate gate (speech has moderate ZCR; noise high)."""
    frames = frame_signal(x.astype(_F32), frame_length, hop_length)
    signs = jnp.sign(frames)
    crossings = jnp.mean(jnp.abs(jnp.diff(signs, axis=-1)) > 0, axis=-1)
    return crossings < max_rate


@functools.partial(jax.jit, static_argnames=("hang_frames",))
def vad_hangover(active, hang_frames: int = 8):
    """Extend speech regions by ``hang_frames`` (reference: VAD hangover
    state machine). scan keeps it one fused kernel."""
    def step(count, a):
        count = jnp.where(a, hang_frames, jnp.maximum(count - 1, 0))
        return count, count > 0
    _, out = jax.lax.scan(step, jnp.int32(0), active)
    return out


# ---------------------------------------------------------------- YIN pitch --

@functools.partial(jax.jit, static_argnames=("sr", "frame_length", "hop_length", "fmin", "fmax", "threshold"))
def yin_pitch(x, sr: int, frame_length: int = 2048, hop_length: int = 512,
              fmin: float = 65.0, fmax: float = 1000.0,
              threshold: float = 0.1):
    """YIN fundamental-frequency estimation → f0 [frames] (0 = unvoiced)."""
    half = frame_length // 2
    tau_max = min(int(sr / fmin), half - 1)
    tau_min = max(int(sr / fmax), 2)
    frames = frame_signal(x.astype(_F32), frame_length, hop_length)  # [F, W]

    def per_frame(fr):
        # exact difference function d(tau) = sum_{j<half} (x[j]-x[j+tau])^2
        x0 = fr[:half]
        idx = jnp.arange(half)[None, :] + jnp.arange(half)[:, None]  # [tau, j]
        shifted = fr[idx]                                   # [half, half]
        e0 = jnp.sum(x0 * x0)
        e_tau = jnp.sum(shifted * shifted, axis=1)
        cross = shifted @ x0
        d = e0 + e_tau - 2.0 * cross                        # [half]
        # cumulative mean normalised difference
        tau = jnp.arange(1, half, dtype=_F32)
        cmnd = d[1:] * tau / jnp.maximum(jnp.cumsum(d[1:]), 1e-8)
        cmnd = jnp.concatenate([jnp.ones(1), cmnd])
        valid = (jnp.arange(half) >= tau_min) & (jnp.arange(half) < tau_max)
        below = valid & (cmnd < threshold)
        first = jnp.argmax(below)
        # YIN: descend from the first threshold crossing to its local dip
        # (not the global min — avoids octave errors); search a 25% window
        taus = jnp.arange(half)
        dip_window = (taus >= first) & (taus <= first + first // 4 + 2) & valid
        dip = jnp.argmin(jnp.where(dip_window, cmnd, jnp.inf))
        best = jnp.where(below.any(), dip,
                         jnp.argmin(jnp.where(valid, cmnd, jnp.inf)))
        # parabolic interpolation around the minimum for sub-sample tau
        b = jnp.clip(best, 1, half - 2)
        d0, d1, d2 = cmnd[b - 1], cmnd[b], cmnd[b + 1]
        denom = d0 + d2 - 2 * d1
        offset = jnp.where(jnp.abs(denom) > 1e-12,
                           0.5 * (d0 - d2) / denom, 0.0)
        tau_est = b.astype(_F32) + jnp.clip(offset, -1.0, 1.0)
        f0 = sr / jnp.maximum(tau_est, 1.0)
        voiced = cmnd[best] < 0.5
        return jnp.where(voiced & (best > 0), f0, 0.0)

    return jax.vmap(per_frame)(frames)


# ---------------------------------------------------------------------- CQT --

@functools.lru_cache(maxsize=8)
def _cqt_kernel(sr: int, n_bins: int, bins_per_octave: int, fmin: float,
                n_fft: int) -> np.ndarray:
    """Spectral-domain CQT kernel [n_bins, n_fft//2+1] (host constant)."""
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    kern = np.zeros((n_bins, n_fft // 2 + 1), np.complex64)
    for k, f in enumerate(freqs):
        if f >= sr / 2:
            continue
        nk = int(min(np.ceil(q * sr / f), n_fft))
        t = np.arange(nk)
        win = np.hanning(nk)
        atom = win * np.exp(2j * np.pi * f * t / sr) / nk
        buf = np.zeros(n_fft, np.complex64)
        buf[:nk] = atom
        kern[k] = np.fft.rfft(buf.real) + 1j * np.fft.rfft(buf.imag)
    return kern


@functools.partial(jax.jit, static_argnames=("sr", "n_bins", "bins_per_octave", "fmin", "hop_length"))
def cqt(x, sr: int, n_bins: int = 84, bins_per_octave: int = 12,
        fmin: float = 32.703, hop_length: int = 512):
    """Constant-Q transform magnitude [frames, n_bins]."""
    n_fft = 2048
    spec = stft(x, n_fft, hop_length)                       # [F, bins]
    kern = jnp.asarray(_cqt_kernel(sr, n_bins, bins_per_octave, fmin, n_fft))
    return jnp.abs(spec @ kern.T.conj())


@functools.partial(jax.jit, static_argnames=("sr", "hop_length"))
def chroma(x, sr: int, hop_length: int = 512):
    """12-bin chromagram folded from CQT."""
    c = cqt(x, sr, n_bins=84, bins_per_octave=12, hop_length=hop_length)
    return c.reshape(c.shape[0], 7, 12).sum(axis=1)


# --------------------------------------------------------------------- HPSS --

def _median_filter(x, size: int, axis: int):
    """Median filter along one axis via stacked rolls (static size)."""
    half = size // 2
    rolls = [jnp.roll(x, s, axis=axis) for s in range(-half, half + 1)]
    return jnp.median(jnp.stack(rolls), axis=0)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "kernel", "power"))
def hpss(x, n_fft: int = 2048, hop_length: int = 512, kernel: int = 17,
         power: float = 2.0):
    """Harmonic/percussive separation via median masking → (harm, perc)."""
    spec = stft(x, n_fft, hop_length)
    mag = jnp.abs(spec) ** power
    harm = _median_filter(mag, kernel, axis=0)   # smooth over time
    perc = _median_filter(mag, kernel, axis=1)   # smooth over frequency
    mask_h = harm / jnp.maximum(harm + perc, 1e-8)
    mask_p = perc / jnp.maximum(harm + perc, 1e-8)
    n = x.shape[0]
    xh = istft(spec * mask_h, n_fft, hop_length, length=n)
    xp = istft(spec * mask_p, n_fft, hop_length, length=n)
    return xh, xp


# ------------------------------------------------------------------ effects --

@functools.partial(jax.jit, static_argnames=("rate", "n_fft", "hop_length"))
def time_stretch(x, rate: float, n_fft: int = 2048, hop_length: int = 512):
    """Phase-vocoder time stretch (rate > 1 = faster/shorter)."""
    spec = stft(x, n_fft, hop_length)                      # [F, bins]
    f = spec.shape[0]
    steps = jnp.arange(0, f, rate)
    idx0 = jnp.clip(jnp.floor(steps).astype(jnp.int32), 0, f - 1)
    idx1 = jnp.clip(idx0 + 1, 0, f - 1)
    frac = (steps - idx0)[:, None].astype(_F32)
    mag = (1 - frac) * jnp.abs(spec[idx0]) + frac * jnp.abs(spec[idx1])
    # phase accumulation
    phase_adv = jnp.angle(spec[idx1]) - jnp.angle(spec[idx0])

    def scan_phase(ph, inp):
        m, adv = inp
        return ph + adv, ph
    init = jnp.angle(spec[0])
    _, phases = jax.lax.scan(scan_phase, init, (mag, phase_adv))
    out_spec = mag * jnp.exp(1j * phases)
    return istft(out_spec, n_fft, hop_length)


def pitch_shift(x, sr: int, n_steps: float, n_fft: int = 2048,
                hop_length: int = 512):
    """Pitch shift = time stretch + resample."""
    from .core import resample
    rate = 2.0 ** (-n_steps / 12.0)
    stretched = time_stretch(x, rate, n_fft, hop_length)
    shifted = resample(stretched, int(sr / rate), sr)
    n = x.shape[0]
    return (shifted[:n] if shifted.shape[0] >= n
            else jnp.pad(shifted, (0, n - shifted.shape[0])))


@functools.partial(jax.jit, static_argnames=("target_db",))
def normalize(x, target_db: float = -3.0):
    peak = jnp.max(jnp.abs(x))
    target = 10.0 ** (target_db / 20.0)
    return x * (target / jnp.maximum(peak, 1e-8))
