"""Same-process serving A/B: int8 vs int4 (w4a8) weights, pipelined engine.

int4 is the fastest single-stream decode rung (646-734 tok/s vs int8's
524) but had no batch-serving row. The chunk executable streams the whole
weight set once per step for all slots, so the packed-int4 saving
(~614 -> ~372 MB with the int8 head) should carry to batch 8 if the
vmapped stacked GEMV holds its rate.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_serving_int4.py [n_requests] [steps]

RESULT (2026-08-18, healthy chip): it does NOT carry — vmap of the Pallas
GEMV adds a batch grid dim whose weight index_map ignores the batch index,
so the kernel re-streams the whole stack once PER SLOT: int8 1798-1816 /
int4-Pallas 1065 tok/s. Forcing the XLA dequant dot (streams weights once
for all rows) read 1584-1616, so _mm now auto-routes packed-int4 to XLA
inside batched_trace() captures (PYGPUKIT_INT4_BATCHED=pallas opts out);
post-fix same-process: int8 1785-1834 / int4 1574 (0.86x). int4 stays the
single-stream rung; int8 w8a8 stays the batch-serving rung.
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

cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048,
    tie_word_embeddings=False)
base = fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16))
prompt = list(range(1, 17))


def run(mode):
    params = quantize_model_params(base, mode)
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
    eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=512,
                                   steps_per_dispatch=STEPS, pipelined=True)
    for _ in range(8):                       # compile outside the window
        eng.submit(prompt, max_new_tokens=STEPS)
    eng.run_until_complete()
    for _ in range(N_REQ):
        eng.submit(prompt, max_new_tokens=128)
    t0 = time.perf_counter()
    eng.run_until_complete()
    dt = time.perf_counter() - t0
    tput = N_REQ * 128 / dt
    print(f"{mode:5s} {tput:7.1f} tok/s aggregate", flush=True)
    return tput


def main():
    t8 = run("int8")
    t4 = run("int4")
    t8b = run("int8")                        # drift bound
    print(f"int4 vs int8: {t4 / max(t8, t8b):.3f}x (drift {t8b / t8:.3f})",
          flush=True)


if __name__ == "__main__":
    main()
