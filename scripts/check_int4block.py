"""Quick TPU check: int4 vs int4_block decode after the bf16 scale-expansion
change in gemv_quant (verifies the uncommitted optimization before commit).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_int4block.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                    init_params_device)
from pygpukit_tpu.llm.quant import quantize_model_params

# tunnel health probe
f = jax.jit(lambda x: x + 1)
x = jnp.zeros((1,), jnp.float32)
np.asarray(f(x))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    np.asarray(f(x))
    ts.append((time.perf_counter() - t0) * 1e3)
print(f"tunnel roundtrip: {min(ts):.1f} ms (healthy ~36)", flush=True)

E, L, I, V = 2048, 22, 5632, 32000
cfg = TransformerConfig(
    vocab_size=V, hidden_size=E, num_layers=L, num_heads=32,
    num_kv_heads=4, intermediate_size=I, max_position_embeddings=2048)
base = init_params_device(cfg, seed=0, dtype=jnp.bfloat16)


def decode_ms(params, label, n=128):
    model = CausalTransformerModel(cfg, fuse_params(params),
                                   dtype=jnp.bfloat16)
    model.init_fixed_cache(1024)
    model.generate(list(range(1, 17)), max_new_tokens=33, chunk_size=32)
    model.init_fixed_cache(1024)
    t0 = time.perf_counter()
    out = model.generate(list(range(1, 17)), max_new_tokens=n + 1,
                         chunk_size=64)
    dt = (time.perf_counter() - t0) / len(out) * 1e3
    print(f"{label:28s}: {dt:6.2f} ms/tok  ({1e3/dt:6.1f} tok/s)", flush=True)
    return dt


q4 = quantize_model_params(base, "int4")
decode_ms(q4, "int4 pallas gemv")
q4b = quantize_model_params(base, "int4_block")
decode_ms(q4b, "int4_block pallas gemv")
