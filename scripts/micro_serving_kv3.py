"""Same-process serving A/B: bf16 vs fp8 vs int8 KV storage at large MAX.

The round-5 capacity-rung question: fp8-KV costs ~5% (the fp8->bf16 VPU
convert, scripts/micro_bda_u8dma.py); int8-KV halves the bytes AND
converts at stream rate, so it should run >= bf16. Batch-8 MAX=4096,
int8 weights, pipelined engine with merged batch-rows pools — identical
to micro_serving_trace's regime, all three in ONE process so the tunnel
day cancels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_serving_kv3.py [max_seq]
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

MAXS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
STEPS = 32
N_REQ = 16

cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048)
params = quantize_model_params(
    fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16)), "int8")
prompt = list(range(1, 17))


def run(kv):
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16,
                                   kv_dtype=kv)
    eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=MAXS,
                                   steps_per_dispatch=STEPS, pipelined=True)
    for _ in range(8):
        eng.submit(prompt, max_new_tokens=STEPS)
    eng.run_until_complete()
    best = 0.0
    for _ in range(2):
        for _ in range(N_REQ):
            eng.submit(prompt, max_new_tokens=128)
        t0 = time.perf_counter()
        eng.run_until_complete()
        best = max(best, N_REQ * 128 / (time.perf_counter() - t0))
    return best


for kv in (None, "fp8", "int8"):
    r = run(kv)
    print(f"kv={kv or 'bf16':5s}: {r:7.1f} tok/s aggregate", flush=True)
