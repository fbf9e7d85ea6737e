"""Chunk-size sweep for the mixed-length serving row (VERDICT r4 #5).

Fixed-seed workload: 32 requests, lengths 32-256, none chunk-aligned.
steps_per_dispatch trades dispatch amortisation against overshoot (a slot
finishing mid-chunk decodes garbage to the chunk edge) and admission lag
(a freed slot idles until the next chunk boundary).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_serving_mixed.py
"""
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402

for chunk in (16, 32, 64, 128):
    r = bench.bench_serving_mixed("int4", chunk=chunk)
    print(f"chunk={chunk:4d}: {r['toks_per_s']:8.1f} tok/s  "
          f"ttft p50 {r['ttft_p50_ms']:6.1f} ms  "
          f"p95 {r['ttft_p95_ms']:6.1f} ms", flush=True)
