"""Per-chunk wall timestamps for the mixed serving workload: where do the
~190 ms/chunk of non-device time go?  Wraps the engine's step() with
timers and sweeps chunk sizes in ONE process (same-process ratios only).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_mixed_chunkwall.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench
from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

model = bench._bench_model("int4")
prompt = list(range(1, 17))


def run(chunk, tag=""):
    rng = np.random.default_rng(42)
    lens = rng.integers(32, 257, 32)
    eos = [int(r) for r in rng.integers(0, 4, 32)]
    eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=512,
                                   steps_per_dispatch=chunk, pipelined=True)
    for _ in range(8):
        eng.submit(prompt, max_new_tokens=chunk)
    eng.run_until_complete()

    marks = []
    reqs = []
    t0 = time.perf_counter()
    for i in range(32):
        reqs.append(eng.submit(
            prompt, max_new_tokens=int(lens[i]),
            eos_token_id=(model.config.vocab_size - 1) if eos[i] == 0
            else None))
    while eng.has_work:
        t = time.perf_counter()
        eng.step()
        marks.append(time.perf_counter() - t)
    dt = time.perf_counter() - t0
    total = sum(len(r.generated) for r in reqs)
    arr = np.array(marks) * 1e3
    hist = ", ".join(f"{v:.0f}" for v in arr)
    print(f"[{tag}] chunk={chunk}: {total} tok in {dt:.2f}s = "
          f"{total / dt:.1f} tok/s; {len(marks)} step() calls, "
          f"wall ms each: [{hist}]", flush=True)
    return total / dt


for chunk in (32, 64, 128):
    run(chunk, "cold")
    run(chunk, "warm")
