"""TPU drive: auto chunked-512 decode attention in the serving engine.

Checks, on the real chip through the public API:
  1. an engine with max_seq_len >= 1024 auto-selects the chunked pref and
     its greedy streams match single-sequence model.generate;
  2. a small-pool engine (MAX=128, pref off) still matches;
  3. env override PYGPUKIT_FLASH_DECODING=full on a big pool also matches
     (the pref is preference, not semantics).
"""
import numpy as np

import jax.numpy as jnp

import pygpukit_tpu as gp
from pygpukit_tpu.llm import (CausalTransformerModel, TransformerConfig,
                              init_params)
from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

assert gp.get_backend().platform == "tpu", gp.get_backend().platform

cfg = TransformerConfig(
    vocab_size=97, hidden_size=48, num_layers=2, num_heads=4,
    num_kv_heads=2, intermediate_size=96, head_dim_override=12,
    max_position_embeddings=2048, tie_word_embeddings=True)
model = CausalTransformerModel(cfg, init_params(cfg, 5, jnp.float32),
                               dtype=jnp.float32)

prompts = ([5, 11, 42], [7, 3])
model.init_fixed_cache(128)
refs = [model.generate(list(p), max_new_tokens=8, temperature=0.0)
        for p in prompts]
print("refs:", refs, flush=True)

for max_len, expect_pref in ((1024, ("chunked", 512)), (128, None)):
    eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=max_len,
                                   steps_per_dispatch=4, pipelined=True)
    assert eng._attn_pref == expect_pref, (max_len, eng._attn_pref)
    reqs = [eng.submit(list(p), max_new_tokens=8) for p in prompts]
    eng.run_until_complete()
    for r, ref, p in zip(reqs, refs, prompts):
        assert r.generated == ref, (max_len, p, r.generated, ref)
    print(f"MAX={max_len} pref={expect_pref}: streams match", flush=True)

import os
os.environ["PYGPUKIT_FLASH_DECODING"] = "full"
eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=1024,
                               steps_per_dispatch=4, pipelined=True)
reqs = [eng.submit(list(p), max_new_tokens=8) for p in prompts]
eng.run_until_complete()
for r, ref in zip(reqs, refs):
    assert r.generated == ref, (r.generated, ref)
print("env-override full on MAX=1024: streams match", flush=True)
print("OK", flush=True)
