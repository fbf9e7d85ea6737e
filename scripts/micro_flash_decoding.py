"""Long-cache decode A/B: full-softmax vs kv-chunk LSE-combine (VERDICT #3).

The full-softmax decode streams the WHOLE preallocated cache from HBM
every step (22 layers x 2 x MAX x Hk x D); the chunked path reads only
ceil(ctx/2048) chunks. Same-process, 1B model, MAX=16384, short ctx —
the regime the auto-gate (cache >= 8192) exists for.

Usage: python scripts/micro_flash_decoding.py [max_cache] [n_tokens]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                    init_params_device)

MAX = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
NTOK = int(sys.argv[2]) if len(sys.argv) > 2 else 96

cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=MAX)
params = fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16))

kv_gb = 22 * 2 * MAX * 4 * 64 * 2 / 1e9
print(f"cache MAX={MAX} -> {kv_gb:.2f} GB KV streamed/step on the full "
      f"path", flush=True)

for mode in ("full", "chunked"):
    os.environ["PYGPUKIT_FLASH_DECODING"] = mode
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
    model.init_fixed_cache(MAX)
    model.generate(list(range(1, 17)), max_new_tokens=33, chunk_size=32)
    model.init_fixed_cache(MAX)
    t0 = time.perf_counter()
    out = model.generate(list(range(1, 17)), max_new_tokens=NTOK + 1,
                         chunk_size=32)
    dt = (time.perf_counter() - t0) / len(out)
    print(f"{mode:8s} {1/dt:7.1f} tok/s  {dt*1e3:6.2f} ms/tok", flush=True)
