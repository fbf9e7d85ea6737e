"""Minimal Mosaic-lowering repro for the int4_block v2 (w4a8) stacked GEMV.

Round-4: the full decode hit `_gather_lowering_rule: Shape mismatch in
input, indices and output` when compiling `_gemv_block_w4a8_stacked_pallas`
on TPU (interpret mode passes). This drives ONE kernel call per decode
projection shape to find the offending op.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_block_v2_repro.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pygpukit_tpu.kernels.gemv_quant import gemv_int4_block_w4a8_stacked


def main():
    L, blk = 2, 32
    # the 1B decode projection shapes (fused leaves): K x N
    shapes = [(2048, 2816), (2048, 11264), (5632, 2048), (2048, 2048)]
    for k, n in shapes:
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.integers(0, 255, (L, k // 2, n), np.uint8))
        s = jnp.asarray(rng.random((L, k // blk, n), np.float32) * 0.01)
        x = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)
        try:
            out = gemv_int4_block_w4a8_stacked(w, 0, x, s)
            out = np.asarray(out)
            print(f"K={k} N={n}: OK {out.shape} {float(np.abs(out).mean()):.4f}",
                  flush=True)
        except Exception as e:
            print(f"K={k} N={n}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
