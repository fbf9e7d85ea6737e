#!/usr/bin/env python
"""Realtime voice loop demo: audio chunks → VAD → Whisper → LLM → Kokoro
(reference: examples/whisper_realtime_stt.py + the voice pipeline).

Runs fully self-contained with random-weight models and a synthetic
utterance (a sine "voice") so it demonstrates the full event flow without
microphones or checkpoints; pass --whisper/--llm for real models.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse
import time

import numpy as np


class _DemoTokenizer:
    def encode(self, text):
        return [min(ord(c), 96) for c in text][:16] or [1]

    def decode(self, ids):
        return "".join(chr(97 + (int(i) % 26)) for i in ids)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--whisper", default=None, help="HF whisper ckpt dir")
    ap.add_argument("--llm", default=None, help="HF causal-LM ckpt dir")
    args = ap.parse_args()

    import jax.numpy as jnp
    from pygpukit_tpu.pipeline import VADConfig, VoicePipeline
    from pygpukit_tpu.tts.kokoro import KokoroConfig, KokoroModel

    if args.whisper:
        from pygpukit_tpu.asr.whisper import WhisperModel
        asr = WhisperModel.from_safetensors(args.whisper)
        sot = [asr.config.sot_token_id, 50259, 50359, 50363]
    else:
        import torch, transformers, tempfile
        d = Path(tempfile.mkdtemp()) / "w"
        wcfg = transformers.WhisperConfig(
            vocab_size=96, num_mel_bins=80, d_model=64, encoder_layers=1,
            decoder_layers=1, encoder_attention_heads=4,
            decoder_attention_heads=4, encoder_ffn_dim=128,
            decoder_ffn_dim=128, max_target_positions=32, eos_token_id=3,
            decoder_start_token_id=2, pad_token_id=0)
        torch.manual_seed(0)
        transformers.WhisperForConditionalGeneration(wcfg).save_pretrained(
            d, safe_serialization=True)
        from pygpukit_tpu.asr.whisper import WhisperModel
        asr = WhisperModel.from_safetensors(d)
        sot = [2]

    if args.llm:
        from pygpukit_tpu.llm import load_model_from_safetensors
        llm = load_model_from_safetensors(args.llm)
    else:
        from pygpukit_tpu.llm import (
            CausalTransformerModel, TransformerConfig, init_params,
        )
        lcfg = TransformerConfig(
            vocab_size=97, hidden_size=48, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=96, head_dim_override=12,
            max_position_embeddings=256, tie_word_embeddings=True)
        llm = CausalTransformerModel(lcfg, init_params(lcfg, 0, jnp.float32),
                                     dtype=jnp.float32)

    tts = KokoroModel(KokoroConfig(hidden_dim=64, decoder_dim=64,
                                   plbert_dim=64))

    pipe = VoicePipeline(asr, llm, _DemoTokenizer(), tts, sot_sequence=sot,
                         vad_config=VADConfig(min_speech_frames=2),
                         max_reply_tokens=12)

    # synthetic mic: silence, a 0.5 s "utterance", silence
    sr = 16000
    t = np.arange(sr // 2) / sr
    speech = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    chunks = [np.zeros(4000, np.float32), speech, np.zeros(4000, np.float32)]

    t0 = time.time()
    for ev in pipe.run(chunks):
        stamp = time.time() - t0
        if ev.kind == "audio":
            print(f"[{stamp:6.1f}s] audio: {len(ev.audio)} samples "
                  f"({len(ev.audio) / tts.config.sample_rate:.2f}s)")
        else:
            print(f"[{stamp:6.1f}s] {ev.kind}: {ev.text[:60]}")


if __name__ == "__main__":
    main()
