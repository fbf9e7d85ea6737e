"""A/B the dead-tail-chunk skip (serving._tail_covered) on the bench config.

The per-fusion serving trace (micro_serving_trace.py 512 bf16 int4 128)
showed 384 chunk-loop iterations for 256 useful steps: when every active
request is length-bound to finish inside the inflight chunk, the pipelined
engine still pre-dispatched one more chunk — fully dead, ~27% of window
device time. _tail_covered skips that dispatch deterministically.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_tailskip_ab.py
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


def run(params, skip, paged=False, n_req=32):
    os.environ["PYGPUKIT_SERVE_TAILSKIP"] = "1" if skip else "0"
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
    kw = dict(paged=True, block_size=16) if paged else {}
    eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=512,
                                   steps_per_dispatch=128, pipelined=True,
                                   **kw)
    for _ in range(8):
        eng.submit(prompt, max_new_tokens=128)
    eng.run_until_complete()
    best = 0.0
    for _ in range(2):
        for _ in range(n_req):
            eng.submit(prompt, max_new_tokens=128)
        t0 = time.perf_counter()
        eng.run_until_complete()
        best = max(best, n_req * 128 / (time.perf_counter() - t0))
    return best


p_int4 = quantize_model_params(base, "int4")
for paged in (False, True):
    streams = {}
    for skip in (False, True):
        os.environ["PYGPUKIT_SERVE_TAILSKIP"] = "1" if skip else "0"
        model = CausalTransformerModel(cfg, p_int4, dtype=jnp.bfloat16)
        kw = dict(paged=True, block_size=16) if paged else {}
        eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=512,
                                       steps_per_dispatch=128, pipelined=True,
                                       **kw)
        reqs = [eng.submit([i + 1, 2, 3], max_new_tokens=17)
                for i in range(12)]
        eng.run_until_complete()
        streams[skip] = [r.generated for r in reqs]
    tag = "paged" if paged else "dense"
    print(f"{tag} streams skip==noskip: {streams[True] == streams[False]}",
          flush=True)

for paged in (False, True):
    tag = "paged" if paged else "dense"
    for skip in (False, True):
        r = run(p_int4, skip, paged=paged)
        print(f"int4 {tag} MAX=512 steps=128 tailskip={int(skip)}: "
              f"{r:7.1f} tok/s", flush=True)
