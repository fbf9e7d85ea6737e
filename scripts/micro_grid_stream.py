"""Decisive overlap experiment (VERDICT r2 #7): sequential-grid + BlockSpec.

Round 2's hand-DMA fused decode kernel got ZERO DMA/compute overlap (Mosaic
conservatively orders recycled-slot DMA starts after prior compute). The
untried structural option: express tile streaming through the sequential TPU
grid with BlockSpec index_maps — Mosaic auto-double-buffers grid inputs,
which is the standard overlap mechanism.

This kernel: grid=(T,), W[T, K, N] streamed one block per step, matvec
y_t = x @ W_t. If throughput >> 410 GB/s (XLA's scan rate) the mechanism
works and the whole-model decode kernel should be rebuilt on it; if it sits
at ~410 GB/s (no overlap) the fused kernel gets frozen per VERDICT #7.

Cost model being tested (from round-2 microbenches):
  per-dot floor ~13.7us (small tiles) / VMEM-stream 740 GB/s (big tiles)
  vs HBM DMA at full rate. Perfect overlap => max(DMA, compute).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    return np.asarray(x.reshape(-1)[0:1])


def make_stream_kernel(t, k, n, w_dtype):
    # x padded to 8 rows: single-sublane M=1 dots lower pathologically in
    # Mosaic (measured 7-24 GB/s); the flash decode kernel pads for the
    # same reason
    def kernel(x_ref, w_ref, o_ref):
        w = w_ref[0]
        if w.dtype != jnp.bfloat16:
            w = w.astype(jnp.bfloat16)
        o_ref[0] = jnp.dot(x_ref[:], w,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((8, k), lambda i: (0, 0)),          # x resident
            pl.BlockSpec((1, k, n), lambda i: (i, 0, 0)),    # W streamed
        ],
        out_specs=pl.BlockSpec((1, 8, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, 8, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )


def bench(label, t, k, n, dtype, reps=32):
    key = jax.random.PRNGKey(0)
    if dtype == "bf16":
        w = jax.random.normal(key, (t, k, n), jnp.bfloat16)
        elt = 2
    else:
        w = jax.random.randint(key, (t, k, n), -127, 127, jnp.int8)
        elt = 1
    x = jax.random.normal(jax.random.PRNGKey(1), (8, k), jnp.bfloat16)
    fn = jax.jit(make_stream_kernel(t, k, n, w.dtype))
    y = fn(x, w)
    _sync(y)
    nbytes = t * k * n * elt
    t0 = time.perf_counter()
    for _ in range(reps):
        # chain via x so calls serialize without a sync roundtrip
        y = fn(x + y[0, :, :1].astype(jnp.bfloat16) * 0, w)
    _sync(y)
    dt = (time.perf_counter() - t0) / reps
    gbps = nbytes / dt / 1e9
    print(f"{label:44s} {dt*1e3:7.2f} ms  {gbps:7.1f} GB/s "
          f"({gbps/819.0*100:4.1f}% peak)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    # ~12 MB bf16 tiles (the round-2 sweet spot): [2048, 2816]
    bench("bf16 grid-stream 12MB tiles (32x)", 32, 2048, 2816, "bf16")
    # ~4 MB tiles: probes the per-dot floor
    bench("bf16 grid-stream 4MB tiles (88x)", 88, 2048, 1024, "bf16")
    # int8, same tile bytes (12 MB = [2048, 5632])
    bench("int8 grid-stream 12MB tiles (32x)", 32, 2048, 5632, "int8")


if __name__ == "__main__":
    main()
