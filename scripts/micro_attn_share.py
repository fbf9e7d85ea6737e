"""Where does the 1B decode step spend device time — attention vs weights?

docs/performance.md carries two claims in tension: the attention cost law
(~46 us/layer fixed => ~1.0 ms/tok at 22 layers) vs the round-3 int8 trace
decomposition (weight dots 1416 us + head 55 + act-quant 63 + slices 55 +
writes 27 = 1616 of 1740 us => attention <= ~130 us/tok). This script
settles it per-mode with a jax.profiler trace of ONE decode chunk,
aggregating per-fusion device times and classifying them.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_attn_share.py [bf16|int8|int4]
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
import numpy as np

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                    init_params_device)

MODE = sys.argv[1] if len(sys.argv) > 1 else "bf16"
N_TOK = 128

cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048,
    tie_word_embeddings=False)
params = init_params_device(cfg, 0, jnp.bfloat16)
if MODE != "bf16":
    from pygpukit_tpu.llm.quant import quantize_model_params
    params = quantize_model_params(params, MODE)
params = fuse_params(params)
model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
model.init_fixed_cache(512)
model.generate(list(range(1, 17)), max_new_tokens=N_TOK, chunk_size=N_TOK)

model.init_fixed_cache(512)
t0 = time.perf_counter()
out = model.generate(list(range(1, 17)), max_new_tokens=N_TOK,
                     chunk_size=N_TOK)
wall = (time.perf_counter() - t0) / len(out)
print(f"wall: {wall*1e3:.3f} ms/tok  ({1/wall:.1f} tok/s)", flush=True)

logdir = f"/tmp/attn_share_{MODE}"
os.system(f"rm -rf {logdir}")
model.init_fixed_cache(512)
model.prefill(np.arange(1, 17, dtype=np.int32))
with jax.profiler.trace(logdir):
    toks = model.decode_chunk(5, N_TOK)
    _ = np.asarray(toks)

# --- parse ---
paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
assert paths, f"no trace under {logdir}"
with gzip.open(paths[0], "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
tpu_pids = {e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))}
agg = defaultdict(lambda: [0.0, 0])
total = 0.0
for e in events:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids:
        name = e.get("name", "?")
        agg[name][0] += e.get("dur", 0.0)
        agg[name][1] += 1
        total += e.get("dur", 0.0)

ATTN_KEYS = ("attention", "softmax", "dynamic-slice", "dynamic_update",
             "scatter", "dot.1", "reduce")


def classify(name: str) -> str:
    n = name.lower()
    if "softmax" in n or "exponential" in n:
        return "attn-softmax"
    if "dynamic-update-slice" in n or "scatter" in n:
        return "cache-write"
    if "dynamic-slice" in n or "gather" in n:
        return "slice/gather"
    if "convert" in n:
        return "convert"
    if "fusion" in n or "dot" in n or "custom-call" in n:
        return "dot/fusion"
    return "other"


print(f"\ndevice total: {total/1e3/N_TOK:.3f} ms/tok over {N_TOK} tokens")
print(f"{'us/tok':>9} {'count':>7}  name")
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
for name, (dur, cnt) in rows[:40]:
    print(f"{dur/N_TOK:9.1f} {cnt:7d}  [{classify(name)}] {name[:90]}")
bycls = defaultdict(float)
for name, (dur, cnt) in agg.items():
    bycls[classify(name)] += dur
print("\nby class (us/tok):")
for c, d in sorted(bycls.items(), key=lambda kv: -kv[1]):
    print(f"  {c:14s} {d/N_TOK:9.1f}")
