"""Round-4: why does XLA copy the DOWN-proj scale stack (bf16[22,176,2048],
15.9MB) into VMEM (S(1)) on every decode layer step? (traced: 171 us/tok of
copy-done wait + ~350MB/tok of copy traffic — the single biggest non-stream
cost on the int4_block decode.)

Compiles each decode-projection stacked block GEMV standalone for TPU and
greps the optimized HLO for copies of the scale operand; also times each.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_scale_copy.py
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pygpukit_tpu.kernels.gemv_quant import gemv_int4_block_w4a8_stacked


def main():
    L, blk = 22, 32
    shapes = [("qkv", 2048, 2816), ("o", 2048, 2048),
              ("gateup", 2048, 11264), ("down", 5632, 2048)]
    rng = np.random.default_rng(0)
    for name, k, n in shapes:
        w = jnp.asarray(rng.integers(0, 255, (L, k // 2, n), np.uint8))
        s = jnp.asarray(rng.random((L, k // blk, n), np.float32) * 0.01,
                        jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)

        fn = jax.jit(lambda w, x, s: gemv_int4_block_w4a8_stacked(
            w, jnp.int32(L // 2), x, s))
        compiled = fn.lower(w, x, s).compile()
        hlo = compiled.as_text()
        copies = [ln.strip()[:160] for ln in hlo.splitlines()
                  if re.search(r"= \S+ copy\(", ln)
                  and "S(1)" in ln]
        np.asarray(fn(w, x, s))            # warm
        t0 = time.perf_counter()
        reps = 50
        y = x
        for _ in range(reps):
            y = fn(w, y[:, :1] * 0 + x, s)   # chain to defeat hoisting
        np.asarray(y[0, :1])
        dt = (time.perf_counter() - t0) / reps * 1e6
        bytes_ = w.size + s.size * 2
        print(f"{name:7s} K={k:5d} N={n:5d}: {dt:7.1f} us/call "
              f"({bytes_/dt/1e3:6.0f} GB/s incl. x-chain)  "
              f"S(1)-copies={len(copies)}", flush=True)
        for c in copies:
            print(f"    {c}", flush=True)


if __name__ == "__main__":
    main()
