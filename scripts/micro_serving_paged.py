"""Paged x batch-rows serving A/B on the 1B bench model (VERDICT r4 #1).

Same-process: paged engine with the vmap-marked capture (old routing: _mm
-> XLA dequant dots) vs the batch-rows capture (new: stacked Pallas w4a8
GEMV carries all 8 slot rows), vs the dense batch-rows engine. Greedy token
agreement between the two paged routings is reported (w4a8 vs dequant-dot
numerics differ by activation-quant noise, so random-model greedy streams
may legitimately diverge — round-3 learning).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_serving_paged.py [mode]
"""
import os
import sys
import time

import numpy as np
import jax.numpy as jnp

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                    init_params_device)
from pygpukit_tpu.llm.quant import quantize_model_params

MODE = sys.argv[1] if len(sys.argv) > 1 else "int4"
STEPS = 128
N_REQ = 32
PROMPT = list(range(1, 17))

cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048,
    tie_word_embeddings=False)
params = quantize_model_params(
    fuse_params(init_params_device(cfg, 0, jnp.bfloat16)), MODE)
model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)


def run(step_mode: str, paged: bool):
    from pygpukit_tpu.llm.serving import ContinuousBatchingEngine
    os.environ["PYGPUKIT_SERVING_STEP"] = step_mode
    kw = dict(max_batch=8, max_seq_len=512, steps_per_dispatch=STEPS,
              pipelined=True)
    if paged:
        kw.update(paged=True, block_size=16)
    eng = ContinuousBatchingEngine(model, **kw)
    for _ in range(8):
        eng.submit(PROMPT, max_new_tokens=STEPS)
    eng.run_until_complete()
    reqs = []
    for _ in range(N_REQ):
        reqs.append(eng.submit(PROMPT, max_new_tokens=STEPS))
    t0 = time.perf_counter()
    eng.run_until_complete()
    dt = time.perf_counter() - t0
    toks = [r.generated for r in reqs]
    return N_REQ * STEPS / dt, toks


r_vmap, t_vmap = run("vmap", paged=True)
print(f"paged {MODE} vmap-routing:  {r_vmap:8.1f} tok/s", flush=True)
r_batch, t_batch = run("batch", paged=True)
print(f"paged {MODE} batch-rows:    {r_batch:8.1f} tok/s", flush=True)
r_dense, t_dense = run("batch", paged=False)
print(f"dense {MODE} batch-rows:    {r_dense:8.1f} tok/s", flush=True)
agree_v = sum(a == b for a, b in zip(t_batch, t_vmap))
agree_d = sum(a == b for a, b in zip(t_batch, t_dense))
print(f"stream agreement: paged-batch vs paged-vmap {agree_v}/{N_REQ}, "
      f"vs dense-batch {agree_d}/{N_REQ}")
print(f"paged/dense ratio: {r_batch / r_dense:.4f}  "
      f"paged speedup vs vmap: {r_batch / r_vmap:.4f}")
