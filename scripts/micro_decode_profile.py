"""Decompose 1B decode time: where did 3.7 ms/tok become ~14? (round 3)

The decode-shaped 22-layer weight scan streams at ~590 GB/s (3.3 ms/sweep)
in the same environment where model.generate measures ~14 ms/tok — so the
chip is healthy and the slowdown is inside the decode path. Time each
piece in one process: prefill, decode_chunk replay, per-chunk-size sweep.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                    init_params_device)

cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048)
params = fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16))
model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
model.init_fixed_cache(1024)
model.generate(list(range(1, 17)), max_new_tokens=65, chunk_size=64)  # warm

# 1. whole generate
model.init_fixed_cache(1024)
t0 = time.perf_counter()
out = model.generate(list(range(1, 17)), max_new_tokens=193, chunk_size=64)
dt = time.perf_counter() - t0
print(f"generate 193 tok      : {dt:7.3f} s  {dt/len(out)*1e3:6.2f} ms/tok",
      flush=True)

# 2. prefill alone
model.init_fixed_cache(1024)
t0 = time.perf_counter()
model.prefill(np.arange(1, 17, dtype=np.int32))
print(f"prefill 16 tok        : {time.perf_counter()-t0:7.3f} s", flush=True)

# 3. decode_chunk alone (already positioned after prefill)
for rep in range(3):
    t0 = time.perf_counter()
    toks = model.decode_chunk(5, 64, 0.0, 0, 0)
    _ = [int(t) for t in toks]
    dt = time.perf_counter() - t0
    print(f"decode_chunk 64 (rep{rep}): {dt:7.3f} s  {dt/64*1e3:6.2f} ms/tok",
          flush=True)

# 4. chunk-size sweep (fresh cache each, pos reset)
for cs in (16, 32, 64, 128):
    model.init_fixed_cache(1024)
    model.generate(list(range(1, 17)), max_new_tokens=cs + 1, chunk_size=cs)
    model.init_fixed_cache(1024)
    t0 = time.perf_counter()
    out = model.generate(list(range(1, 17)), max_new_tokens=2 * cs + 1,
                         chunk_size=cs)
    dt = time.perf_counter() - t0
    print(f"chunk_size={cs:3d}        : {dt/len(out)*1e3:6.2f} ms/tok",
          flush=True)
