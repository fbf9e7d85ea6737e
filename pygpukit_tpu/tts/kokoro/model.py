"""Kokoro-82M TTS model (reference: src/pygpukit/tts/kokoro/model.py:78 —
StyleTTS2 pipeline: text → ALBERT/PLBERT + text encoder → duration →
alignment expansion → F0/N prediction → style-conditioned decoder →
iSTFT vocoder; voice embeddings select the style).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    AdaINResBlock, AlbertEncoder, Conv1d, DurationPredictor, F0NPredictor,
    ISTFTNet, Linear, StyleEncoder, TextEncoder, leaky_relu,
)

SAMPLE_RATE = 24000


@dataclass
class KokoroConfig:
    vocab_size: int = 178            # phoneme vocab
    plbert_dim: int = 128
    plbert_heads: int = 2
    plbert_ffn: int = 256
    plbert_layers: int = 3
    hidden_dim: int = 128
    style_dim: int = 64
    decoder_dim: int = 256
    n_fft: int = 20
    hop: int = 5
    upsamples: tuple = (10, 6)
    up_kernels: tuple = (20, 12)
    sample_rate: int = SAMPLE_RATE


@dataclass
class SynthesisResult:
    """reference: SynthesisResult, model.py:44."""
    audio: np.ndarray
    sample_rate: int
    duration: float = 0.0
    phonemes: str = ""

    def to_wav(self, path: str) -> None:
        import struct, wave
        pcm = np.clip(self.audio, -1, 1)
        pcm16 = (pcm * 32767).astype(np.int16)
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(self.sample_rate)
            w.writeframes(pcm16.tobytes())


class KokoroTokenizer:
    """Phoneme tokenizer; char-level over the checkpoint-true Kokoro vocab
    when no phonemizer dictionary is provided (reference: KokoroTokenizer).
    Lowercase letters are real Kokoro symbols (ids 43-68), so the char-level
    fallback stays checkpoint-consistent."""

    def __init__(self, vocab: dict[str, int] | None = None):
        from .g2p import KOKORO_VOCAB
        self.vocab = vocab or KOKORO_VOCAB

    def encode(self, text: str) -> list[int]:
        text = text.lower()
        return [self.vocab[c] for c in text if c in self.vocab]


class KokoroModel:
    """reference: KokoroModel, model.py:78."""

    def __init__(self, config: KokoroConfig | None = None,
                 tokenizer: KokoroTokenizer | None = None,
                 voice_embeddings: dict[str, np.ndarray] | None = None,
                 seed: int = 0):
        cfg = self.config = config or KokoroConfig()
        self.tokenizer = tokenizer or KokoroTokenizer()
        self.voice_embeddings = {
            k: jnp.asarray(v, jnp.float32)
            for k, v in (voice_embeddings or {}).items()}
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 10)

        self.plbert = AlbertEncoder(
            ks[0], cfg.vocab_size, cfg.plbert_dim, cfg.plbert_heads,
            cfg.plbert_ffn, cfg.plbert_layers)
        self.text_encoder = TextEncoder(ks[1], cfg.vocab_size, cfg.hidden_dim)
        self.bert_proj = Linear(ks[2], cfg.plbert_dim, cfg.hidden_dim)
        self.style_encoder = StyleEncoder(ks[3], 80, cfg.style_dim)
        self.duration = DurationPredictor(ks[4], cfg.hidden_dim, cfg.style_dim)
        self.f0n = F0NPredictor(ks[5], cfg.hidden_dim, cfg.style_dim)
        self.dec_in = Conv1d(ks[6], cfg.hidden_dim + 2, cfg.decoder_dim, 3,
                             padding=1)
        self.dec_blocks = [AdaINResBlock(ks[7], cfg.decoder_dim, cfg.style_dim),
                           AdaINResBlock(ks[8], cfg.decoder_dim, cfg.style_dim)]
        self.vocoder = ISTFTNet(ks[9], cfg.decoder_dim, cfg.n_fft, cfg.hop,
                                cfg.upsamples, cfg.up_kernels)
        self._current_voice: str | None = None

    # -- voices ---------------------------------------------------------------

    def set_voice(self, name: str) -> None:
        if name not in self.voice_embeddings:
            raise KeyError(f"unknown voice {name!r}; have "
                           f"{list(self.voice_embeddings)}")
        self._current_voice = name

    def _style(self, speed_ref=None) -> jnp.ndarray:
        if self._current_voice is not None:
            return self.voice_embeddings[self._current_voice][:self.config.style_dim]
        return jnp.zeros((self.config.style_dim,), jnp.float32)

    # -- synthesis ------------------------------------------------------------

    MAX_FRAMES_PER_PHONEME = 20

    def _synth_core(self, ids, style, speed, total: int):
        """Traceable synthesis core (total = static frame budget).

        The dynamic duration sum becomes a static budget: alignment uses
        ``jnp.repeat(..., total_repeat_length=total)`` and the true frame
        count is returned so the caller trims the fixed-length audio.
        """
        # 1. text features: PLBERT semantic + CNN/LSTM acoustic, fused
        bert = self.bert_proj(self.plbert(ids))        # [S, H]
        acoustic = self.text_encoder(ids)              # [S, H]
        feats = bert + acoustic

        # 2. durations → frame alignment (monotonic hard expansion)
        dur = self.duration(feats, style) / speed      # [S]
        frames = jnp.clip(jnp.round(dur), 1,
                          self.MAX_FRAMES_PER_PHONEME).astype(jnp.int32)
        true_total = jnp.minimum(jnp.sum(frames), total)
        idx = jnp.repeat(jnp.arange(ids.shape[0]), frames,
                         total_repeat_length=total)
        expanded = feats[idx]                          # [total, H]

        # 3. prosody: F0 + noise over expanded features
        x = expanded.T[None]                           # [1, H, total]
        f0, noise = self.f0n(x, style[None])           # [total], [total]

        # 4. decoder: features + prosody, style-conditioned
        dec_in = jnp.concatenate(
            [x, f0[None, None, :], noise[None, None, :]], axis=1)
        h = self.dec_in(dec_in)
        for blk in self.dec_blocks:
            h = blk(h, style[None])

        # 5. iSTFT vocoder (fixed-length audio; trimmed by the caller)
        audio = self.vocoder(h)
        return audio, true_total

    def _synth_jitted(self, s_len: int, total: int):
        if not hasattr(self, "_synth_cache"):
            self._synth_cache = {}
        key = (s_len, total)
        if key not in self._synth_cache:
            import functools
            self._synth_cache[key] = jax.jit(
                functools.partial(self._synth_core, total=total))
        return self._synth_cache[key]

    def synthesize(self, text: str, voice: str | None = None,
                   speed: float = 1.0) -> SynthesisResult:
        """Text → audio (reference: synthesize).

        The whole pipeline runs as ONE jitted program per text length
        (eager per-op dispatch is unusable over remote TPU transports); the
        frame budget is static and the audio is trimmed to the true length.
        """
        if voice is not None:
            self.set_voice(voice)
        id_list = self.tokenizer.encode(text) or [1]
        ids = jnp.asarray(id_list, jnp.int32)
        style = self._style()
        total = len(id_list) * self.MAX_FRAMES_PER_PHONEME
        fn = self._synth_jitted(len(id_list), total)
        audio_full, true_total = fn(ids, style, jnp.float32(speed))
        # samples per frame = hop * prod(upsamples)
        spf = self.config.hop
        for u in self.config.upsamples:
            spf *= u
        n_samples = int(true_total) * spf
        audio = np.asarray(audio_full)[:n_samples]
        return SynthesisResult(
            audio=audio, sample_rate=self.config.sample_rate,
            duration=len(audio) / self.config.sample_rate,
            phonemes=text)

    def synthesize_streaming(self, text: str, voice: str | None = None,
                             chunk_chars: int = 64):
        """Sentence/segment streaming synthesis (reference: streaming synth)."""
        segments = []
        cur = ""
        for ch in text:
            cur += ch
            if ch in ".!?" or len(cur) >= chunk_chars:
                segments.append(cur.strip())
                cur = ""
        if cur.strip():
            segments.append(cur.strip())
        for seg in segments:
            if seg:
                yield self.synthesize(seg, voice)
