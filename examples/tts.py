#!/usr/bin/env python
"""Text-to-speech synthesis (reference: examples/tts.py).

Usage:
  # real checkpoint (hexgrad/Kokoro-82M snapshot: kokoro-v1_0.pth +
  # config.json + voices/*.pt)
  python examples/tts.py --text "Hello from the TPU." --model /path/to/kokoro \
      --voice af_heart -o out.wav

  # no checkpoint: architecture-exact random weights (audio is noise-like
  # but exercises the full StyleTTS2 pipeline)
  python examples/tts.py --text "Hello from the TPU." -o out.wav

  # pre-phonemized input (drive misaki/espeak externally)
  python examples/tts.py --phonemes "həloʊ wɜɹld" -o out.wav
"""

from __future__ import annotations


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default=None)
    ap.add_argument("--phonemes", default=None,
                    help="raw IPA input (bypasses the built-in G2P)")
    ap.add_argument("--model", default=None,
                    help="Kokoro-82M snapshot dir (random weights if omitted)")
    ap.add_argument("--voice", default="af_heart")
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--stream", action="store_true",
                    help="sentence-streaming synthesis")
    ap.add_argument("-o", "--output", default="out.wav")
    args = ap.parse_args()
    if not args.text and not args.phonemes:
        ap.error("--text or --phonemes required")

    from pygpukit_tpu.tts.kokoro import Kokoro82M

    if args.model:
        model = Kokoro82M.from_pretrained(args.model, voice=args.voice)
        print(f"loaded checkpoint; voices: {model.available_voices}")
    else:
        model = Kokoro82M.random_init()
        print("no checkpoint: random weights (pipeline demo)")

    t0 = time.time()
    if args.stream and args.text:
        import numpy as np
        chunks = [r.audio for r in model.synthesize_streaming(
            args.text, speed=args.speed)]
        from pygpukit_tpu.tts.kokoro.model import SynthesisResult
        result = SynthesisResult(audio=np.concatenate(chunks),
                                 sample_rate=24000)
        result.duration = len(result.audio) / 24000
    else:
        result = model.synthesize(args.text, phonemes=args.phonemes,
                                  speed=args.speed)
        print(f"phonemes: {result.phonemes}")
    print(f"synthesized {result.duration:.2f}s of audio "
          f"in {time.time() - t0:.1f}s")
    result.to_wav(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
