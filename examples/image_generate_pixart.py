#!/usr/bin/env python
"""PixArt-alpha / SD3 text-to-image (reference: examples/image_generate.py;
the FLUX path lives in examples/image_generate.py).

Usage:
  # PixArt (diffusers snapshot: transformer/ vae/ text_encoder/ tokenizer/)
  python examples/image_generate_pixart.py --family pixart \
      --model /path/to/PixArt-XL-2-512x512 --prompt "a red fox" -o fox.png

  # SD3 (diffusers snapshot)
  python examples/image_generate_pixart.py --family sd3 \
      --model /path/to/sd3-medium --prompt "a red fox" -o fox.png

  # no checkpoint: tiny random-weight pipeline demo (latents only)
  python examples/image_generate_pixart.py --family pixart
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=("pixart", "sd3"), default="pixart")
    ap.add_argument("--model", default=None)
    ap.add_argument("--prompt", default="a photograph of an astronaut")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--guidance", type=float, default=4.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--output", default="out.png")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    if args.family == "pixart":
        from pygpukit_tpu.diffusion import PixArtPipeline
        if args.model:
            pipe = PixArtPipeline.from_pretrained(args.model)
            out = pipe.generate(args.prompt, num_steps=args.steps,
                                guidance_scale=args.guidance, seed=args.seed)
        else:
            from pygpukit_tpu.diffusion.models.pixart import (
                PixArtConfig, PixArtTransformer)
            tiny = PixArtConfig(sample_size=16, patch_size=2, hidden_size=64,
                                depth=4, num_heads=4, caption_dim=32,
                                base_size=8)
            pipe = PixArtPipeline(PixArtTransformer.init_random(tiny))
            cap = jnp.zeros((8, 32), jnp.float32)
            out = pipe.generate(caption_embeds=cap, num_steps=args.steps,
                                guidance_scale=args.guidance, seed=args.seed)
            print(f"random-weight demo: latent {np.asarray(out).shape}")
            return
    else:
        from pygpukit_tpu.diffusion import SD3Pipeline
        if not args.model:
            from pygpukit_tpu.diffusion.models.sd3 import (
                SD3Config, SD3Transformer)
            tiny = SD3Config(sample_size=16, patch_size=2, in_channels=4,
                             out_channels=4, hidden_size=64, depth=3,
                             num_heads=4, context_dim=32, pooled_dim=24,
                             pos_embed_max_size=16)
            pipe = SD3Pipeline(SD3Transformer.init_random(tiny))
            out = pipe.generate(jnp.zeros((8, 32), jnp.float32),
                                jnp.zeros(24, jnp.float32),
                                num_steps=args.steps, seed=args.seed)
            print(f"random-weight demo: latent {np.asarray(out).shape}")
            return
        pipe = SD3Pipeline.from_pretrained(args.model)
        out = pipe.generate(prompt=args.prompt, num_steps=args.steps,
                            guidance_scale=args.guidance, seed=args.seed)

    img = np.asarray(out)
    if img.ndim == 4:
        img = img[0]
    try:
        from PIL import Image
        Image.fromarray(img.astype(np.uint8)).save(args.output)
        print(f"wrote {args.output}")
    except ImportError:
        np.save(args.output + ".npy", img)
        print(f"PIL unavailable; wrote {args.output}.npy")


if __name__ == "__main__":
    main()
