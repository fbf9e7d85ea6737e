#!/usr/bin/env python
"""Speech-to-text with Whisper (reference: examples/whisper_realtime_stt.py).

Usage:
  python examples/whisper_stt.py --model /path/to/whisper --audio in.wav
"""

from __future__ import annotations


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse
import wave

import numpy as np


def read_wav(path: str) -> tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        pcm = np.frombuffer(w.readframes(n), dtype=np.int16)
        if w.getnchannels() == 2:
            pcm = pcm.reshape(-1, 2).mean(axis=1)
    return pcm.astype(np.float32) / 32768.0, sr


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="HF whisper checkpoint dir")
    ap.add_argument("--audio", required=True, help="wav file (16 kHz mono)")
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--language-token", type=int, default=50259,
                    help="language token id (default: <|en|>)")
    args = ap.parse_args()

    from pygpukit_tpu.asr.whisper import WhisperModel

    model = WhisperModel.from_safetensors(args.model)
    audio, sr = read_wav(args.audio)
    sot = [model.config.sot_token_id, args.language_token,
           50359, 50363]  # <|transcribe|> <|notimestamps|>
    toks = model.transcribe_tokens(audio, sot, max_new_tokens=args.max_tokens,
                                   sr=sr)
    print("token ids:", toks)
    try:
        from transformers import WhisperTokenizer
        tok = WhisperTokenizer.from_pretrained(args.model)
        print("text:", tok.decode(toks, skip_special_tokens=True))
    except Exception:
        print("(install a tokenizer for text output)")


if __name__ == "__main__":
    main()
