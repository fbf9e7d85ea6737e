"""Device-side self-speculative decode A/B on the 1B model (round 3).

Same-process rows (the only kind that mean anything on this chip):
  1. plain chunked decode (the 3.7-ms/tok baseline path)
  2. speculative, n_draft = num_layers (draft == target): every round
     accepts gamma+1 tokens — the mechanism CEILING. Honest framing: real
     acceptance needs real weights; random-weight drafts accept ~never.
  3. speculative, n_draft = 4: the honest random-weight number (expect
     ~1 token/round => slower than plain; prints tokens/round so the
     acceptance-speed curve can be read off).

The per-round cost model to verify: round ~= (1 + gamma*n_draft/L) *
step_time, while emitting accepted+1 tokens.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_spec_decode.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.decode import DecodeSpeculative
from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                    init_params_device)

cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048)
params = fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16))
model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)

N = 192
PROMPT = list(range(1, 17))

# 1. plain chunked decode
model.init_fixed_cache(1024)
model.generate(PROMPT, max_new_tokens=33, chunk_size=32)
model.init_fixed_cache(1024)
t0 = time.perf_counter()
out = model.generate(PROMPT, max_new_tokens=N + 1, chunk_size=64)
dt = (time.perf_counter() - t0) / len(out)
plain = dt * 1e3
print(f"plain chunked         : {plain:6.2f} ms/tok ({1/dt:6.1f} tok/s)",
      flush=True)

for n_draft, gamma in ((cfg.num_layers, 4), (cfg.num_layers, 7), (4, 4)):
    model.init_fixed_cache(1024)
    strat = DecodeSpeculative(n_draft_layers=n_draft, gamma=gamma).bind(model)
    strat.generate(PROMPT, 33)                       # compile + warm
    model.init_fixed_cache(1024)
    strat2 = DecodeSpeculative(n_draft_layers=n_draft,
                               gamma=gamma).bind(model)
    t0 = time.perf_counter()
    out = strat2.generate(PROMPT, N + 1)
    dt = (time.perf_counter() - t0) / len(out)
    tpr = (strat2.stats.tokens_generated - 1) / max(strat2.stats.steps - 1, 1)
    print(f"spec d={n_draft:2d} g={gamma}        : {dt*1e3:6.2f} ms/tok "
          f"({1/dt:6.1f} tok/s)  {tpr:4.2f} tok/round  "
          f"acc {strat2.stats.accepted}/"
          f"{strat2.stats.accepted + strat2.stats.rejected}", flush=True)
