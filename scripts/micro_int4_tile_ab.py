"""Same-process A/B of int4 decode tile overrides on the REAL 1B model.

Follow-up to scripts/micro_int4_tiles.py: the per-shape sweep showed the
adaptive single-tile grids leave Mosaic nothing to double-buffer (qkv
default 8.03 us vs 6.04 at a 4-way K split), but three of its four stacks
fit in VMEM, so only the real decode loop — where ~550 MB of weights
stream from HBM every token — can settle whether K-splits pay.

Builds bench.py's TinyLlama-faithful 1B, measures int4 decode with the
adaptive tiles, then rebuilds with kernels.gemv_quant.TILE_OVERRIDES set
(fresh model => fresh trace reads the table) and measures again. Order is
default-first so any drift favours the incumbent, and a third run repeats
the default to bound drift.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_int4_tile_ab.py

RESULT (2026-08-18, healthy chip): a WASH — default 734.1 / k-split 735.1 /
default#2 729.6 tok/s (1.001x, drift 0.994). The micro's 25% single-tile
penalty does NOT transfer to the real loop: with ~500 MB streaming per
token the next call's tile DMA overlaps the previous call's tail anyway,
so per-call grid pipelining buys nothing. The remaining per-call excess
(~53 vs 36 us/layer device-traced) is NOT tile-grid ramp. TILE_OVERRIDES
stays empty by default.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pygpukit_tpu.kernels import gemv_quant as gq

# K-splits restoring grid pipelining on the four 1B fused projections
# (N, K/2) -> (bn, bk_half); all divide exactly.
OVERRIDES = {
    (2560, 1024): (2560, 256),   # qkv  : grid (1,1) -> (1,4)
    (2048, 1024): (2048, 256),   # o    : grid (1,1) -> (1,4)
    (2048, 2816): (2048, 256),   # down : grid (1,2) -> (1,11)
}


def run(tag):
    r = bench.bench_decode("int4")
    print(f"{tag}: {r['toks_per_s']:.1f} tok/s  {r['ms_per_tok']:.3f} ms/tok "
          f"({r['gbps']:.0f} GB/s)", flush=True)
    return r["toks_per_s"]


def main():
    base = run("default  ")
    gq.TILE_OVERRIDES.update(OVERRIDES)
    split = run("k-split  ")
    gq.TILE_OVERRIDES.clear()
    base2 = run("default#2")
    print(f"split vs default: {split / max(base, base2):.3f}x "
          f"(drift {base2 / base:.3f})", flush=True)


if __name__ == "__main__":
    main()
