"""Same-process serving A/B: int8 vs int4 (w4a8) weights, pipelined engine.

int4 is the fastest single-stream decode rung (646-734 tok/s vs int8's
524) but had no batch-serving row. The chunk executable streams the whole
weight set once per step for all slots, so the packed-int4 saving
(~614 -> ~372 MB with the int8 head) should carry to batch 8 if the
vmapped stacked GEMV holds its rate.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_serving_int4.py

RESULT (2026-08-18, healthy chip): it does NOT carry — vmap of the Pallas
GEMV adds a batch grid dim whose weight index_map ignores the batch index,
so the kernel re-streams the whole stack once PER SLOT: int8 1798-1816 /
int4-Pallas 1065 tok/s. Forcing the XLA dequant dot (streams weights once
for all rows) read 1584-1616, so _mm now auto-routes packed-int4 to XLA
inside batched_trace() captures (PYGPUKIT_INT4_BATCHED=pallas opts out);
post-fix same-process: int8 1785-1834 / int4 1574 (0.86x). int4 stays the
single-stream rung; int8 w8a8 stays the batch-serving rung.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def run(mode):
    tput = bench.bench_serving(mode)
    print(f"{mode:5s} {tput:7.1f} tok/s aggregate", flush=True)
    return tput


def main():
    t8 = run("int8")
    t4 = run("int4")
    t8b = run("int8")                        # drift bound
    print(f"int4 vs int8: {t4 / max(t8, t8b):.3f}x (drift {t8b / t8:.3f})",
          flush=True)


if __name__ == "__main__":
    main()
