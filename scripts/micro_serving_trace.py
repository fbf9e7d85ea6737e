"""Per-fusion device trace of the batched serving chunk at large MAX.

micro_serving_kv8 measured batch-8 MAX=4096 int8 at 964 tok/s (bf16 KV)
= 8.3 ms/step, while the stream bound is ~2.7 ms (1.1 GB int8 weights +
0.74 GB pools at ~676 GB/s). This script traces a steady-state window of
the pipelined engine and aggregates per-fusion device time to find the
missing ~5 ms/step.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_serving_trace.py [max_seq] [kv] [wmode] [steps]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                    init_params_device)
from pygpukit_tpu.llm.quant import quantize_model_params
from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

MAXS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
KV = sys.argv[2] if len(sys.argv) > 2 else None
if KV in ("bf16", "none", "None"):
    KV = None
WMODE = sys.argv[3] if len(sys.argv) > 3 else "int8"
STEPS = int(sys.argv[4]) if len(sys.argv) > 4 else 32
N_REQ = 16

cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048,
    tie_word_embeddings=False)
params = quantize_model_params(
    fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16)), WMODE)
prompt = list(range(1, 17))

model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16, kv_dtype=KV)
eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=MAXS,
                               steps_per_dispatch=STEPS, pipelined=True)
for _ in range(8):
    eng.submit(prompt, max_new_tokens=STEPS)
eng.run_until_complete()

for _ in range(N_REQ):
    eng.submit(prompt, max_new_tokens=128)
t0 = time.perf_counter()
eng.run_until_complete()
dt = time.perf_counter() - t0
n_tok = N_REQ * 128
print(f"wall: {n_tok/dt:.1f} tok/s aggregate "
      f"({dt/n_tok*8*1e3:.2f} ms/step at batch 8)", flush=True)

logdir = f"/tmp/serving_trace_{MAXS}_{KV or 'bf16'}"
os.system(f"rm -rf {logdir}")
for _ in range(N_REQ):
    eng.submit(prompt, max_new_tokens=128)
with jax.profiler.trace(logdir):
    eng.run_until_complete()

paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
assert paths, f"no trace under {logdir}"
with gzip.open(paths[0], "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
tpu_pids = {e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))}
agg = defaultdict(lambda: [0.0, 0])
for e in events:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids:
        agg[e.get("name", "?")][0] += e.get("dur", 0.0)
        agg[e.get("name", "?")][1] += 1

# steps in the window ~= n_tok / 8 (batch-8 slots); report per STEP
n_steps = n_tok / 8
print(f"\nper-STEP device time (window ~{n_steps:.0f} steps):")
print(f"{'us/step':>9} {'count':>8}  name")
for name, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:45]:
    print(f"{dur/n_steps:9.1f} {cnt:8d}  {name[:100]}")
