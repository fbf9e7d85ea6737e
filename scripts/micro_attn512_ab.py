"""A/B decode-attention backends for the MAX=512 serving regime.

The int4 MAX=512 trace (micro_serving_trace.py, post tail-skip) shows
~298 us/iter of constant_dynamic-slice fusions + ~204 us/iter of pool
copies on the attention read path — ~30% of the 1.65 ms iteration. The
chunked LSE path reads live kv-chunks only; this A/Bs it against the
default full-pool softmax on the bench serving config, plus stream
parity.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_attn512_ab.py
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
p_int4 = quantize_model_params(base, "int4")
del base
prompt = list(range(1, 17))

CONFIGS = [("full", None), ("chunked", 128), ("chunked", 256)]


def engine():
    model = CausalTransformerModel(cfg, p_int4, dtype=jnp.bfloat16)
    return ContinuousBatchingEngine(model, max_batch=8, max_seq_len=512,
                                    steps_per_dispatch=128, pipelined=True)


streams = {}
for mode, chunk in CONFIGS:
    os.environ["PYGPUKIT_FLASH_DECODING"] = mode
    if chunk:
        os.environ["PYGPUKIT_FLASH_DECODING_CHUNK"] = str(chunk)
    else:
        os.environ.pop("PYGPUKIT_FLASH_DECODING_CHUNK", None)
    eng = engine()
    reqs = [eng.submit([i + 1, 2, 3], max_new_tokens=20) for i in range(10)]
    eng.run_until_complete()
    streams[(mode, chunk)] = [r.generated for r in reqs]
ok = all(v == streams[CONFIGS[0]] for v in streams.values())
print(f"streams identical across backends: {ok}", flush=True)

for mode, chunk in CONFIGS:
    os.environ["PYGPUKIT_FLASH_DECODING"] = mode
    if chunk:
        os.environ["PYGPUKIT_FLASH_DECODING_CHUNK"] = str(chunk)
    else:
        os.environ.pop("PYGPUKIT_FLASH_DECODING_CHUNK", None)
    eng = engine()
    for _ in range(8):
        eng.submit(prompt, max_new_tokens=128)
    eng.run_until_complete()
    best = 0.0
    for _ in range(2):
        for _ in range(32):
            eng.submit(prompt, max_new_tokens=128)
        t0 = time.perf_counter()
        eng.run_until_complete()
        best = max(best, 32 * 128 / (time.perf_counter() - t0))
    print(f"int4 MAX=512 attn={mode}:{chunk or '-'}: {best:7.1f} tok/s",
          flush=True)
os.environ.pop("PYGPUKIT_FLASH_DECODING", None)
os.environ.pop("PYGPUKIT_FLASH_DECODING_CHUNK", None)
