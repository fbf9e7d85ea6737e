"""bf16 single-stream last mile (VERDICT r4 #4): trace + targeted A/Bs.

decode_1b_bf16_frac_today sits at 0.916; the traced residual is ~255
us/tok of non-stream fusions (attention chain ~69, cache slices ~55,
writes ~27, head/embed/sampling the rest). This script measures, in ONE
process: baseline chunk, chunked-LSE decode attention at small MAX (reads
live ctx only instead of the full masked pool), and a per-fusion device
trace of the baseline to name every residual microsecond.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_bf16_lastmile.py
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

N_TOK = 256
cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048,
    tie_word_embeddings=False)
params = fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16))
model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)


def run(tag):
    model.init_fixed_cache(512)
    model.generate(list(range(1, 17)), max_new_tokens=N_TOK,
                   chunk_size=N_TOK)
    best = None
    for _ in range(3):
        model.init_fixed_cache(512)
        t0 = time.perf_counter()
        out = model.generate(list(range(1, 17)), max_new_tokens=N_TOK,
                             chunk_size=N_TOK)
        dt = (time.perf_counter() - t0) / len(out)
        best = dt if best is None else min(best, dt)
    print(f"{tag:34s}: {1/best:7.1f} tok/s  {best*1e3:6.3f} ms/tok",
          flush=True)
    return best


base = run("baseline full-softmax MAX=512")

for chunk in (128, 256):
    os.environ["PYGPUKIT_FLASH_DECODING"] = "chunked"
    os.environ["PYGPUKIT_FLASH_DECODING_CHUNK"] = str(chunk)
    model._gen_exes = {}
    model._prefill_exes = {}
    try:
        run(f"chunked-LSE decode attn chunk={chunk}")
    finally:
        del os.environ["PYGPUKIT_FLASH_DECODING"]
        del os.environ["PYGPUKIT_FLASH_DECODING_CHUNK"]
model._gen_exes = {}
model._prefill_exes = {}

# per-fusion trace of the baseline chunk
logdir = "/tmp/bf16_lastmile_trace"
os.system(f"rm -rf {logdir}")
model.init_fixed_cache(512)
model.generate(list(range(1, 17)), max_new_tokens=N_TOK, chunk_size=N_TOK)
model.init_fixed_cache(512)
with jax.profiler.trace(logdir):
    model.generate(list(range(1, 17)), max_new_tokens=N_TOK,
                   chunk_size=N_TOK)

paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
assert paths, f"no trace under {logdir}"
with gzip.open(paths[0], "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
tpu_pids = {e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))}
agg = defaultdict(lambda: [0.0, 0])
tot = 0.0
for e in events:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids:
        agg[e.get("name", "?")][0] += e.get("dur", 0.0)
        agg[e.get("name", "?")][1] += 1
        tot += e.get("dur", 0.0)
print(f"\ndevice total {tot/N_TOK:.1f} us/tok; per-fusion (us/tok):")
for name, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]:
    print(f"{dur/N_TOK:9.2f} {cnt:8d}  {name[:100]}")
