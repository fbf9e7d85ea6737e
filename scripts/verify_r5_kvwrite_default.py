"""Verify the KV row-write kernel DEFAULT flip (auto -> pallas on TPU).

Drives the public API on the real chip:
  1. batch-rows serving token streams: default (pallas) == forced xla,
     for bf16-KV and int8-KV dict pools;
  2. paged engine streams: default == forced xla;
  3. decode determinism: capture -> two replays bitwise equal with the
     kernel default-on.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_r5_kvwrite_default.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import pygpukit_tpu as gp

assert gp.get_backend().platform == "tpu", gp.get_backend().platform

import jax.numpy as jnp

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                    init_params_device)
from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

cfg = TransformerConfig(
    vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
    num_kv_heads=2, intermediate_size=512, max_position_embeddings=512,
    tie_word_embeddings=True)
params = fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16))
PROMPTS = [[i + 1, 2, 3] for i in range(8)]


def streams(mode, kv=None, paged=False):
    os.environ["PYGPUKIT_KV_WRITE"] = mode
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16,
                                   kv_dtype=kv)
    eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=128,
                                   pipelined=True, paged=paged)
    reqs = [eng.submit(p, max_new_tokens=8) for p in PROMPTS]
    eng.run_until_complete()
    assert all(r.done for r in reqs)
    return [r.generated for r in reqs]


fails = 0
for kv in (None, "int8"):
    a = streams("xla", kv=kv)
    b = streams("auto", kv=kv)  # auto -> pallas on TPU after the flip
    ok = a == b
    fails += not ok
    print(f"batch-rows kv={kv or 'bf16'}: xla == default: {ok}")
    if not ok:
        print("  xla    :", a)
        print("  default:", b)

a = streams("xla", paged=True)
b = streams("auto", paged=True)
ok = a == b
fails += not ok
print(f"paged: xla == default: {ok}")

# decode determinism with the kernel default-on
os.environ.pop("PYGPUKIT_KV_WRITE", None)
model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
model.init_fixed_cache(128)
t1 = model.generate([5, 11, 42], max_new_tokens=8, temperature=0.0)
model.init_fixed_cache(128)
t2 = model.generate([5, 11, 42], max_new_tokens=8, temperature=0.0)
ok = t1 == t2
fails += not ok
print(f"decode replay bitwise: {ok} ({t1})")

print("VERIFY PASS" if fails == 0 else f"VERIFY FAIL ({fails})")
sys.exit(1 if fails else 0)
