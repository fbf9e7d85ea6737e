"""Same-process serving A/B: bf16 vs fp8 KV pools (int8 w8a8 weights).

The dense pipelined engine's chunk executable streams the WHOLE
[B, L, MAX, Hk, D] pools every step (batch 8, MAX 512: 92 MB bf16).
fp8 halves that — the regime where the cache share is largest relative
to the int8 weight stream (~1.1 GB). Also reports the paged pair.

Usage: python scripts/micro_serving_kv8.py [n_requests] [steps] [max_seq]
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

N_REQ = int(sys.argv[1]) if len(sys.argv) > 1 else 32
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
MAXS = int(sys.argv[3]) if len(sys.argv) > 3 else 512

cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048)
params = quantize_model_params(
    fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16)), "int8")
prompt = list(range(1, 17))

kv_mb = 8 * 22 * 2 * MAXS * 4 * 64 / 1e6
print(f"dense pools batch-8 MAX={MAXS}: {kv_mb*2:.0f} MB bf16 / "
      f"{kv_mb:.0f} MB fp8 per step", flush=True)


def run(kv, paged=False):
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16,
                                   kv_dtype=kv)
    eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=MAXS,
                                   steps_per_dispatch=STEPS, pipelined=True,
                                   paged=paged)
    # warmup: compile the chunk/prefill/wave executables OUTSIDE the window
    for _ in range(8):
        eng.submit(prompt, max_new_tokens=STEPS)
    eng.run_until_complete()
    for _ in range(N_REQ):
        eng.submit(prompt, max_new_tokens=128)
    t0 = time.perf_counter()
    eng.run_until_complete()
    dt = time.perf_counter() - t0
    tput = N_REQ * 128 / dt
    print(f"{'paged' if paged else 'dense'} kv={kv or 'bf16':5s} "
          f"{tput:7.1f} tok/s aggregate", flush=True)
    return tput


modes = (False, True) if os.environ.get("PYGPUKIT_KV8_PAGED", "1") == "1" \
    else (False,)
for paged in modes:
    a = run(None, paged)
    b = run("fp8", paged)
    print(f"  -> fp8 speedup {b/a:.3f}x", flush=True)
