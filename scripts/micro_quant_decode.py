"""Same-process 1B decode across quant modes (VERDICT r3 #1/#6).

Runs bench.bench_decode (the driver's real-model decode measurement) for
each mode given on argv, in one process so the numbers are comparable
(chip speed varies 10-30% day to day). Modes: bf16, fp8, int8, w8a8
(int8 leaves + PYGPUKIT_INT8_MODE=w8a8 native int8 MXU dots), int4,
int4_block.

First int4/int4_block run pays one ~3-6 min Mosaic compile per distinct
weight shape (persisted in the XLA cache).

Usage: python scripts/micro_quant_decode.py bf16 int8 w8a8 int4_block
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

for mode in sys.argv[1:] or ["bf16", "int8", "w8a8"]:
    real = mode
    if mode == "w8a8":
        os.environ["PYGPUKIT_INT8_MODE"] = "w8a8"
        real = "int8"
    else:
        os.environ.pop("PYGPUKIT_INT8_MODE", None)
    r = bench.bench_decode(real)
    print(f"{mode:12s} {r['toks_per_s']:7.1f} tok/s  {r['ms_per_tok']:6.2f} "
          f"ms/tok  {r['gbps']:6.1f} GB/s  ({r['frac_hbm_peak']*100:4.1f}% "
          f"of spec HBM)", flush=True)
