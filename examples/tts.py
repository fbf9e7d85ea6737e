#!/usr/bin/env python
"""Text-to-speech synthesis (reference: examples/tts.py).

Usage:
  python examples/tts.py --text "Hello from the TPU." -o out.wav
  python examples/tts.py --text "..." --voice af_heart --model /path/to/kokoro
"""

from __future__ import annotations


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", required=True)
    ap.add_argument("--model", default=None,
                    help="Kokoro checkpoint dir (random weights if omitted)")
    ap.add_argument("--voice", default=None)
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("-o", "--output", default="out.wav")
    args = ap.parse_args()

    from pygpukit_tpu.tts.kokoro import KokoroModel

    model = KokoroModel()   # round 1: random weights; checkpoint mapping WIP
    if args.model:
        print("note: checkpoint loading lands in the next round; "
              "synthesizing with random weights")
    t0 = time.time()
    result = model.synthesize(args.text, voice=args.voice, speed=args.speed)
    print(f"synthesized {result.duration:.2f}s of audio "
          f"in {time.time() - t0:.1f}s")
    result.to_wav(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
