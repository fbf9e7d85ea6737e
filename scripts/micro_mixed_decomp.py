"""Decompose the mixed-traffic serving gap (bench serving_1b_int4_mixed:
516 tok/s vs 3955 aligned, 2026-08-20).

Runs the bench workload with per-phase wall accounting: chunk dispatches,
prefill waves, useful-vs-dispatched slot-steps. Usage:
PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_mixed_decomp.py [chunk]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench

chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 32

from pygpukit_tpu.llm.serving import ContinuousBatchingEngine  # noqa: E402

rng = np.random.default_rng(42)
n_req = 32
lens = rng.integers(32, 257, n_req)
eos = [int(r) for r in rng.integers(0, 4, n_req)]
model = bench._bench_model("int4")
eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=512,
                               steps_per_dispatch=chunk, pipelined=True)
prompt = list(range(1, 17))
for _ in range(8):
    eng.submit(prompt, max_new_tokens=chunk)
eng.run_until_complete()
s0_steps, s0_pref = eng.stats.steps, eng.stats.prefills

reqs = []
t0 = time.perf_counter()
for i in range(n_req):
    reqs.append(eng.submit(
        prompt, max_new_tokens=int(lens[i]),
        eos_token_id=(model.config.vocab_size - 1) if eos[i] == 0 else None))
eng.run_until_complete()
dt = time.perf_counter() - t0

total = sum(len(r.generated) for r in reqs)
chunks = eng.stats.steps - s0_steps
prefills = eng.stats.prefills - s0_pref
print(f"chunk={chunk} total_tokens={total} wall={dt:.2f}s "
      f"-> {total / dt:.1f} tok/s")
print(f"chunk dispatches={chunks} ({chunks * chunk} steps, "
      f"{chunks * chunk * 8} slot-steps for {total} useful = "
      f"{total / (chunks * chunk * 8):.1%} occupancy)")
print(f"prefill calls={prefills} (requests={n_req})")
print(f"per-chunk wall: {dt / max(chunks, 1) * 1e3:.1f} ms "
      f"(aligned headline ~{chunk * 2:.0f} ms device at 2 ms/step)")
