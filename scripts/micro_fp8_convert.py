"""Probe: why did the K-major converting GEMV stream at ~20-55 GB/s?

Round-4 finding: the first version of this probe measured EVERY mode slow
(bf16 54.9, fp8 22.1 GB/s) — far below the chip's 745 GB/s — implicating
the KERNEL SHAPE, not the fp8 convert per se. This version separates the
variables:

  - xla_stream : bench.bench_hbm_stream — the day's chip context
  - kmajor_*   : w tile [bk, bn], dot contracts sublanes (rhs-native?)
  - nmajor_*   : w tile [bn, bk], dot contracts lanes (the layout every
                 fast w4a8 GEMV in this repo uses)
  - *_nodot    : DMA + one-column reduce only (raw stream ceiling for the
                 same grid)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_fp8_convert.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, K, N = 24, 2048, 2816          # 138 MB fp8 / 275 MB bf16 > VMEM
BK, BN = 2048, 2816


def make_kernel(mode, last):
    def kernel(w_ref, x_ref, o_ref, acc_ref):
        ki = pl.program_id(0)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = w_ref[0]
        if "nodot" in mode:
            # touch one lane-row so the DMA can't be elided; no MXU
            acc_ref[:] += jnp.sum(w[:1].astype(jnp.float32), axis=0,
                                  keepdims=True) * x_ref[:1, :1]
        else:
            wb = w.astype(jnp.bfloat16)
            if mode.startswith("kmajor"):
                acc_ref[:] += jax.lax.dot_general(
                    x_ref[:], wb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                acc_ref[:] += jax.lax.dot_general(
                    x_ref[:], wb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(ki == last - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(jnp.bfloat16)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def run(w_stack, x, mode):
    kmaj = mode.startswith("kmajor") or "nodot" in mode
    shp = w_stack.shape                    # [L, a, b]
    out_w = BN if (kmaj and "nodot" not in mode) else \
        (shp[2] if "nodot" in mode else BN)
    rows = x.shape[0]
    return pl.pallas_call(
        make_kernel(mode, L),
        grid=(L,),
        in_specs=[pl.BlockSpec((1,) + shp[1:], lambda ki: (ki, 0, 0)),
                  pl.BlockSpec((rows, x.shape[1]), lambda ki: (0, 0))],
        out_specs=pl.BlockSpec((rows, out_w), lambda ki: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, out_w), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows, out_w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
    )(w_stack, x)


def _sync(y):
    return np.asarray(y.reshape(-1)[0:1])


def main():
    sys.path.insert(0, "/root/repo")
    import bench
    print(f"xla_stream  : {bench.bench_hbm_stream():7.1f} GB/s", flush=True)
    rng = np.random.default_rng(0)
    wf = rng.standard_normal((L, K, N)).astype(np.float32)
    w_f8_km = jnp.asarray(wf, jnp.float8_e4m3fn)             # [L, K, N]
    w_f8_nm = jnp.asarray(np.swapaxes(wf, 1, 2).copy(),
                          jnp.float8_e4m3fn)                 # [L, N, K]
    w_bf_km = jnp.asarray(wf, jnp.bfloat16)
    w_bf_nm = jnp.asarray(np.swapaxes(wf, 1, 2).copy(), jnp.bfloat16)
    x = jnp.ones((8, K), jnp.bfloat16)
    cases = (
        ("kmajor_fp8", w_f8_km), ("nmajor_fp8", w_f8_nm),
        ("kmajor_bf16", w_bf_km), ("nmajor_bf16", w_bf_nm),
        ("kmajor_fp8_nodot", w_f8_km), ("kmajor_bf16_nodot", w_bf_km),
    )
    for mode, w in cases:
        try:
            y = run(w, x, mode)
            _sync(y)
            reps = 8
            t0 = time.perf_counter()
            for _ in range(reps):
                y = run(w, x, mode)
            _sync(y)
            dt = (time.perf_counter() - t0) / reps
            nb = int(w.size) * w.dtype.itemsize
            print(f"{mode:18s}: {dt*1e3:8.2f} ms  {nb/dt/1e9:7.1f} GB/s",
                  flush=True)
        except Exception as e:
            print(f"{mode:18s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
