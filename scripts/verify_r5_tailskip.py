"""Verify the dead-tail-chunk skip (serving._tail_covered) on the real TPU.

Token-stream parity skip vs no-skip through the public API, on workloads
the skip condition must NOT mishandle:
  - aligned length-bound requests (the case the skip targets),
  - NON-aligned lengths (mixed 5..37 tokens, multiple admission waves),
  - EOS-bound requests (finish earlier than the length bound),
  - paged engine,
plus single-stream generate parity as the ground truth.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_r5_tailskip.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)

WORK = [  # (prompt, max_new, eos or None)
    ([5, 11, 42], 8, None), ([7, 3], 8, None), ([9, 9, 1], 8, None),
    ([1, 2], 8, None), ([3, 4, 5], 8, None), ([6, 7], 8, None),
    ([8, 9], 8, None), ([10, 11], 8, None),          # aligned wave
    ([12, 13], 5, None), ([14, 15], 21, None),       # non-aligned
    ([16, 17], 37, None), ([18, 19], 13, None),
    ([20, 21], 30, 125), ([22, 23], 30, 125),        # EOS-bound (125 is the
    ([24, 25], 30, 125), ([26, 27], 30, 125),        # greedy attractor)
]


def streams(skip, paged):
    os.environ["PYGPUKIT_SERVE_TAILSKIP"] = "1" if skip else "0"
    eng = ContinuousBatchingEngine(model, max_batch=4, max_seq_len=128,
                                   steps_per_dispatch=8, pipelined=True,
                                   paged=paged, block_size=8)
    reqs = [eng.submit(p, max_new_tokens=n, eos_token_id=e)
            for p, n, e in WORK]
    eng.run_until_complete()
    assert all(r.done for r in reqs)
    return [r.generated for r in reqs]


fails = 0
for paged in (False, True):
    a = streams(False, paged)
    b = streams(True, paged)
    ok = a == b
    fails += not ok
    tag = "paged" if paged else "dense"
    print(f"{tag}: skip == no-skip streams: {ok}")
    if not ok:
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"  req {i}: {x} != {y}")

# ground truth: engine (skip on) matches single-stream generate
os.environ["PYGPUKIT_SERVE_TAILSKIP"] = "1"
model.init_fixed_cache(128)
ref = model.generate([5, 11, 42], max_new_tokens=8, temperature=0.0)
eng = ContinuousBatchingEngine(model, max_batch=4, max_seq_len=128,
                               steps_per_dispatch=8, pipelined=True)
r = eng.submit([5, 11, 42], max_new_tokens=8)
eng.run_until_complete()
ok = r.generated == ref
fails += not ok
print(f"engine == single-stream generate: {ok} ({ref})")

print("VERIFY PASS" if fails == 0 else f"VERIFY FAIL ({fails})")
sys.exit(1 if fails else 0)
