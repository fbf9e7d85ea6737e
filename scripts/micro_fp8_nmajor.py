"""fp8 stacked GEMV: N-major vs K-major layout, production-structured.

The K-major gemv_conv_stacked ran the 1B fp8 decode at 72 tok/s (~70 GB/s)
while the N-major w4a8 kernels stream 725 GB/s packed — and a simplified
grid-(L,) probe streamed slowly even with NO dot and bf16 weights, so the
suspect is kernel/grid structure, not the fp8 convert. This probe uses the
EXACT production structure (PrefetchScalarGridSpec, grid (ni, ki), layer
fori_loop inside one jit, adaptive ~2-6 MB tiles) for both layouts on the
four 1B projections, bf16 control included.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_fp8_nmajor.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygpukit_tpu.kernels.gemv_quant import (
    _adaptive_tiles, _adaptive_tiles_conv, _cdiv, _VMEM_LIMIT,
)

L = 22
ROWS = 8
_F32 = jnp.float32


def _kern_nmajor(idx_ref, w_ref, x_ref, o_ref, acc_ref, *, n_k):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(jnp.bfloat16)            # [bn, bk]
    acc_ref[:] += lax.dot_general(x_ref[:], w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=_F32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kern_kmajor(idx_ref, w_ref, x_ref, o_ref, acc_ref, *, n_k):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(jnp.bfloat16)            # [bk, bn]
    acc_ref[:] += lax.dot_general(x_ref[:], w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=_F32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("layout", "bn", "bk"))
def gemv(w_stack, idx, x, *, layout, bn, bk):
    if layout == "nmajor":
        n_layers, n, k = w_stack.shape
        wspec = pl.BlockSpec((1, bn, bk), lambda ni, ki, idx: (idx[0], ni, ki))
        kern = _kern_nmajor
    else:
        n_layers, k, n = w_stack.shape
        wspec = pl.BlockSpec((1, bk, bn), lambda ni, ki, idx: (idx[0], ki, ni))
        kern = _kern_kmajor
    n_k = _cdiv(k, bk)
    return pl.pallas_call(
        functools.partial(kern, n_k=n_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_cdiv(n, bn), n_k),
            in_specs=[wspec,
                      pl.BlockSpec((ROWS, bk), lambda ni, ki, idx: (0, ki))],
            out_specs=pl.BlockSpec((ROWS, bn), lambda ni, ki, idx: (0, ni)),
            scratch_shapes=[pltpu.VMEM((ROWS, bn), _F32)],
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k, bytes_accessed=n * k, transcendentals=0),
    )(jnp.asarray(idx, jnp.int32).reshape(1), w_stack, x)


def _sync(y):
    return np.asarray(y.reshape(-1)[0:1])


def main():
    shapes = {"qkv": (2048, 2560), "o": (2048, 2048),
              "gate_up": (2048, 11264), "down": (5632, 2048)}
    rng = np.random.default_rng(0)
    for dt_name, dt in (("fp8", jnp.float8_e4m3fn), ("bf16", jnp.bfloat16)):
        for layout in ("nmajor", "kmajor"):
            stacks = {}
            tiles = {}
            total = 0
            for name, (k, n) in shapes.items():
                w = rng.standard_normal((L, k, n)).astype(np.float32)
                if layout == "nmajor":
                    arr = jnp.asarray(np.swapaxes(w, 1, 2).copy(), dt)
                    bn, bk = _adaptive_tiles(n, k)   # lanes=k? n-major rows n
                else:
                    arr = jnp.asarray(w, dt)
                    bn, bk = _adaptive_tiles_conv(k, n)
                stacks[name] = arr
                tiles[name] = (bn, bk)
                total += int(arr.size) * arr.dtype.itemsize

            @jax.jit
            def sweep(stacks, x0):
                def body(i, acc):
                    h = acc
                    for name, (k, n) in shapes.items():
                        bn, bk = tiles[name]
                        y = gemv(stacks[name], i, h[:, :k], layout=layout,
                                 bn=bn, bk=bk)
                        h = jnp.pad(y[:, :1], ((0, 0), (0, 5631))) + h
                    return h
                return lax.fori_loop(0, L, body, x0)

            x0 = jnp.ones((ROWS, 5632), jnp.bfloat16)
            try:
                y = sweep(stacks, x0)
                _sync(y)
                t0 = time.perf_counter()
                for _ in range(4):
                    y = sweep(stacks, x0)
                _sync(y)
                dt_s = (time.perf_counter() - t0) / 4
                print(f"{dt_name:4s} {layout:7s}: {dt_s*1e3:8.2f} ms/sweep  "
                      f"{total/dt_s/1e9:7.1f} GB/s", flush=True)
            except Exception as e:
                print(f"{dt_name:4s} {layout:7s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
