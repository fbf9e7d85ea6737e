"""Streaming audio objects: VAD, SpeechSegment, AudioStream (reference:
src/pygpukit/ops/audio/vad.py:32-150 VAD/SpeechSegment with adaptive
thresholding + hangover; buffer.py:299 AudioStream chunked processor)."""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .analysis import vad_hangover
from .core import RingBuffer, frame_signal

_F32 = jnp.float32


@dataclass
class SpeechSegment:
    """A detected speech region (reference: SpeechSegment, vad.py:32)."""
    start_sample: int
    end_sample: int
    start_time: float
    end_time: float


@functools.partial(jax.jit, static_argnames=("frame_size", "hop_size"))
def _vad_features(x, frame_size: int, hop_size: int):
    frames = frame_signal(x.astype(_F32), frame_size, hop_size, center=False)
    energy = jnp.mean(frames * frames, axis=-1)
    signs = jnp.sign(frames)
    zcr = jnp.mean(jnp.abs(jnp.diff(signs, axis=-1)) > 0, axis=-1)
    return energy, zcr


class VAD:
    """Voice activity detection: per-frame energy + zero-crossing features,
    adaptive noise-floor threshold, hangover smoothing, segment extraction
    (reference: VAD, vad.py:48 — same knobs and defaults)."""

    def __init__(self, sample_rate: int = 16000, frame_ms: float = 20.0,
                 hop_ms: float = 10.0, energy_threshold: float | None = None,
                 hangover_ms: float = 100.0, zcr_low: float = 0.02,
                 zcr_high: float = 0.25, min_energy_floor: float = 0.01):
        self.sample_rate = sample_rate
        self.frame_size = int(frame_ms * sample_rate / 1000)
        self.hop_size = int(hop_ms * sample_rate / 1000)
        self.energy_threshold = energy_threshold
        self.hangover_frames = int(hangover_ms / hop_ms)
        self.zcr_low = zcr_low
        self.zcr_high = zcr_high
        #: absolute floor under the adaptive threshold (reference default
        #: 0.01 mean-square — LOWER this for quiet recordings: ~-30 dBFS
        #: speech sits near 1e-3 and an 0.01 floor silences it entirely)
        self.min_energy_floor = min_energy_floor
        self.adaptive_multiplier = 3.0

    def detect(self, audio) -> list[SpeechSegment]:
        data = getattr(audio, "data", audio)
        energy, zcr = _vad_features(jnp.asarray(data), self.frame_size,
                                    self.hop_size)
        energy_np = np.asarray(energy)
        if self.energy_threshold is not None:
            thr = self.energy_threshold
        else:
            thr = max(float(energy_np.min()) * self.adaptive_multiplier,
                      self.min_energy_floor)
        zcr_np = np.asarray(zcr)
        active = (energy_np > thr) & (zcr_np >= self.zcr_low) & \
                 (zcr_np <= self.zcr_high)
        active |= energy_np > 4 * thr          # loud frames bypass zcr gate
        if self.hangover_frames > 0:
            active = np.asarray(vad_hangover(jnp.asarray(active),
                                             self.hangover_frames))
        segments: list[SpeechSegment] = []
        start = None
        for i, a in enumerate(active):
            if a and start is None:
                start = i
            elif not a and start is not None:
                segments.append(self._segment(start, i))
                start = None
        if start is not None:
            segments.append(self._segment(start, len(active)))
        return segments

    def _segment(self, f0: int, f1: int) -> SpeechSegment:
        s0 = f0 * self.hop_size
        s1 = f1 * self.hop_size + self.frame_size
        return SpeechSegment(s0, s1, s0 / self.sample_rate,
                             s1 / self.sample_rate)


class AudioStream:
    """Chunked streaming processor over a ring buffer (reference:
    AudioStream, buffer.py:299 — push PCM, pop overlapping chunks)."""

    def __init__(self, chunk_size: int = 480, hop_size: int | None = None,
                 sample_rate: int = 16000, buffer_duration: float = 30.0):
        self.chunk_size = chunk_size
        self.hop_size = hop_size if hop_size is not None else chunk_size // 2
        self.sample_rate = sample_rate
        self._ring = RingBuffer(int(buffer_duration * sample_rate))
        self._pending = np.zeros(0, np.float32)

    def push(self, pcm) -> None:
        arr = np.asarray(pcm)
        if arr.dtype == np.int16:
            arr = arr.astype(np.float32) / 32768.0
        self._ring.push(arr.astype(np.float32).ravel())
        self._pending = np.concatenate([self._pending,
                                        arr.astype(np.float32).ravel()])

    def has_chunk(self) -> bool:
        return len(self._pending) >= self.chunk_size

    def pop_chunk(self) -> np.ndarray | None:
        if not self.has_chunk():
            return None
        chunk = self._pending[:self.chunk_size].copy()
        self._pending = self._pending[self.hop_size:]
        return chunk

    def latest(self, seconds: float) -> np.ndarray:
        """Most recent window from the ring (ASR context reads)."""
        return self._ring.read_latest(int(seconds * self.sample_rate))
