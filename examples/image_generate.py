#!/usr/bin/env python
"""Text-to-image generation (reference: examples/image_generate.py).

Usage:
  python examples/image_generate.py --model /path/to/flux-checkpoint \\
      --prompt "a photo of an astronaut riding a horse" \\
      [--height 512 --width 512 --steps 4 --seed 0 -o out.png]
"""

from __future__ import annotations


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="FLUX checkpoint dir (transformer/ vae/ ...)")
    ap.add_argument("--prompt", default="a scenic mountain landscape")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--output", default="out.png")
    args = ap.parse_args()

    from pygpukit_tpu.diffusion import FluxPipeline

    print(f"loading {args.model} ...", flush=True)
    pipe = FluxPipeline.from_pretrained(args.model)
    t0 = time.time()
    out = pipe(prompt=args.prompt, height=args.height, width=args.width,
               num_inference_steps=args.steps,
               guidance_scale=args.guidance, seed=args.seed)
    print(f"generated in {time.time() - t0:.1f}s")

    img = out.images[0]
    try:
        from PIL import Image
        Image.fromarray(img).save(args.output)
    except ImportError:  # PIL-free fallback: raw PPM
        path = args.output.rsplit(".", 1)[0] + ".ppm"
        with open(path, "wb") as f:
            f.write(f"P6\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
            f.write(img.tobytes())
        print(f"(PIL unavailable; wrote {path})")
        return
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
