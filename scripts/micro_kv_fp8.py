"""fp8-KV decode A/B: bf16 vs float8_e4m3fn cache, 1B model, long cache.

The full-softmax decode streams the whole preallocated cache per step;
fp8 storage halves those bytes (22 x 2 x MAX x 4 x 64: 738 MB bf16 ->
369 MB fp8 at MAX=16384). Same-process pairs; chunked path pinned OFF so
the cache stream is actually exercised, then a chunked pair for the
auto-gate regime.

Usage: python scripts/micro_kv_fp8.py [max_cache] [n_tokens]
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

for dec in ("full", "chunked"):
    os.environ["PYGPUKIT_FLASH_DECODING"] = dec
    for kv in (None, "fp8"):
        model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16,
                                       kv_dtype=kv)
        model.init_fixed_cache(MAX)
        model.generate(list(range(1, 17)), max_new_tokens=33, chunk_size=32)
        model.init_fixed_cache(MAX)
        t0 = time.perf_counter()
        out = model.generate(list(range(1, 17)), max_new_tokens=NTOK + 1,
                             chunk_size=32)
        dt = (time.perf_counter() - t0) / len(out)
        print(f"{dec:8s} kv={kv or 'bf16':5s} {1/dt:7.1f} tok/s "
              f"{dt*1e3:6.2f} ms/tok", flush=True)
