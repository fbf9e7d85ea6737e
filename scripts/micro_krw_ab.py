"""A/B the Pallas KV-row-write kernel vs the XLA scatter path.

The batch-rows step's vmapped per-slot row writes lower to a serial
8-iteration scatter loop per pool leaf (~1.46 ms/step at batch-8 bf16
MAX=4096 — 27% of the step; 4 loops for int8 dicts). kv_rows_write
replaces a layer's writes with ONE RMW pallas_call. This A/Bs the bench
serving config (int4 weights, MAX=512, 32x128 aligned — the 2271 tok/s
row) and the capacity config (int8 weights MAX=4096, bf16 + int8 KV),
same process.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_krw_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                    init_params_device)
from pygpukit_tpu.llm.quant import quantize_model_params
from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048,
    tie_word_embeddings=False)
base = fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16))
prompt = list(range(1, 17))


def run(params, kv, max_seq, steps, mode):
    os.environ["PYGPUKIT_KV_WRITE"] = mode
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16,
                                   kv_dtype=kv)
    eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=max_seq,
                                   steps_per_dispatch=steps, pipelined=True)
    for _ in range(8):
        eng.submit(prompt, max_new_tokens=steps)
    eng.run_until_complete()
    best = 0.0
    for _ in range(2):
        n = 16 if max_seq >= 4096 else 32
        for _ in range(n):
            eng.submit(prompt, max_new_tokens=128)
        t0 = time.perf_counter()
        eng.run_until_complete()
        best = max(best, n * 128 / (time.perf_counter() - t0))
    return best


p_int4 = quantize_model_params(base, "int4")
for mode in ("xla", "pallas"):
    r = run(p_int4, None, 512, 128, mode)
    print(f"int4 MAX=512 steps=128 write={mode:6s}: {r:7.1f} tok/s",
          flush=True)
del p_int4

p_int8 = quantize_model_params(base, "int8")
for kv in (None, "int8"):
    for mode in ("xla", "pallas"):
        r = run(p_int8, kv, 4096, 32, mode)
        print(f"int8w MAX=4096 kv={kv or 'bf16':5s} write={mode:6s}: "
              f"{r:7.1f} tok/s", flush=True)
