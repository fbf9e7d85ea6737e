"""Tile-size sweep for the stacked w4a8 int4 GEMV at the REAL 1B decode
shapes (round 3 late: the remaining int4 lever).

Theory under test: the per-call overhead (~17 us/layer across 4 calls,
device-traced 53 vs 36 us stream-ideal) is RAMP EXPOSURE — _adaptive_tiles
targets 2-3 MB tiles for sustained streaming, but the per-layer projections
are only 2.1-5.8 MB packed, so calls run with grid=(1,1) or (1,2): the
first (only) tile's DMA fully serializes against the unpack+dot. Smaller
tiles give Mosaic's grid pipeline something to overlap.

Measures a chained per-call latency: y feeds a cheap reduction back into x
so consecutive calls cannot overlap (decode is a strict chain), looping
layers via the stacked kernel exactly like the decode loop does.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_int4_tiles.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pygpukit_tpu.kernels.gemv_quant import gemv_int4_w4a8_stacked

L = 22
SHAPES = {                      # name: (N, K) of the 1B fused projections
    "qkv":     (2560, 2048),
    "o":       (2048, 2048),
    "gate_up": (11264, 2048),
    "down":    (2048, 5632),
}
# tile candidates per shape: (bn, bk_half); None = adaptive default
CANDS = {
    "qkv":     [None, (2560, 256), (640, 1024), (1280, 512)],
    "o":       [None, (2048, 256), (512, 1024)],
    "gate_up": [None, (2816, 256), (1408, 1024)],
    "down":    [None, (2048, 704), (2048, 352), (512, 2816)],
}

key = jax.random.PRNGKey(0)


def make_stack(n, k):
    kw, ks = jax.random.split(jax.random.fold_in(key, n * 131 + k))
    w = jax.random.randint(kw, (L, n, k // 2), 0, 255, jnp.uint8)
    s = jax.random.uniform(ks, (L, 1, n), jnp.float32, 0.005, 0.02)
    return w, s


def chain(w, s, x, bn, bk):
    # one jitted program: fori over n_calls stacked-GEMV calls, each call's
    # input derived from the previous output (strict chain, like decode)
    k = x.shape[-1]

    def body(i, x):
        y = gemv_int4_w4a8_stacked(w, i % L, x, s, bn=bn, bk_half=bk)
        # cheap mix back to [1, K]: slice + broadcast (negligible device time)
        r = jnp.sum(y, axis=-1, keepdims=True) * 1e-6
        return (x + r).astype(jnp.bfloat16)[:, :k]

    @jax.jit
    def run(x, n_calls):
        # n_calls TRACED (fori_loop lowers to while): ONE compile serves
        # both two-point measurement counts — Mosaic compiles are 3-6 min
        return jax.lax.fori_loop(0, n_calls, body, x)

    return run


def main():
    # two-point fit (bench_hbm_stream style): the ~36 ms tunnel sync
    # swamps a single run, so per-call time comes from (t_hi - t_lo) /
    # (hi - lo) — the difference cancels sync + dispatch exactly
    lo, hi = L * 8, L * 72
    for name, (n, k) in SHAPES.items():
        w, s = make_stack(n, k)
        x = jax.random.normal(jax.random.fold_in(key, 7), (1, k),
                              jnp.bfloat16)
        packed_mb = n * k / 2 / 1e6
        print(f"== {name}: N={n} K={k} packed {packed_mb:.1f} MB/layer",
              flush=True)
        for cand in CANDS[name]:
            bn, bk = cand if cand else (None, None)
            try:
                f = chain(w, s, x, bn, bk)

                def timed(n_calls):
                    t0 = time.perf_counter()
                    np.asarray(f(x, jnp.int32(n_calls))[0, :1])
                    return time.perf_counter() - t0

                timed(lo), timed(hi)            # compile both
                t_lo = min(timed(lo) for _ in range(3))
                t_hi = min(timed(hi) for _ in range(3))
                per_call = (t_hi - t_lo) / (hi - lo) * 1e6
                gbps = packed_mb * 1e6 / (per_call * 1e-6) / 1e9
                print(f"  bn={bn} bk_half={bk}: {per_call:7.2f} us/call "
                      f"({gbps:6.0f} GB/s packed)", flush=True)
            except Exception as e:
                print(f"  bn={bn} bk_half={bk}: FAIL {type(e).__name__}: "
                      f"{e}", flush=True)


if __name__ == "__main__":
    main()
