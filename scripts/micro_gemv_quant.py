"""Microbench: where do the bytes go in quantized decode GEMV?

BENCH_r02: bf16 sweep streams 393.7 GB/s (48% HBM peak) but fp8/int8 only
245-253 GB/s (30%) — quantization yields 1.3x instead of the ~2x byte-count
promise. This script times formulation variants of the SAME 22-layer
7-projection scan to find which part of the int8/fp8 path burns the time:
the astype(bf16) upconvert, the dot lowering, or the scale-apply.

Run on the real chip: python scripts/micro_gemv_quant.py
(measurements are same-process back-to-back; tunnel variance 10-30%
between processes, CLAUDE.md).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

L, H, KV, INTER = 22, 2048, 256, 5632
REPS = 16
SHAPES = {"q": (H, H), "k": (H, KV), "v": (H, KV), "o": (H, H),
          "g": (H, INTER), "u": (H, INTER), "d": (INTER, H)}


def _sync(x):
    return np.asarray(x.reshape(-1)[0:1])


def mk_weights(dtype: str):
    ks = jax.random.split(jax.random.PRNGKey(1), len(SHAPES))
    lp = {}
    for kk, (name, shp) in zip(ks, SHAPES.items()):
        if dtype == "bf16":
            w = jax.random.normal(kk, (L, *shp), jnp.bfloat16)
        elif dtype == "int8":
            w = jax.random.randint(kk, (L, *shp), -127, 127, jnp.int8)
        elif dtype == "int4":
            w = jax.random.randint(kk, (L, *shp), -7, 7, jnp.int8).astype(jnp.int4)
        else:  # fp8
            w = jax.random.normal(kk, (L, *shp), jnp.bfloat16).astype(
                jnp.float8_e4m3fn)
        lp[name] = w
    elt = {"bf16": 2, "fp8": 1, "int8": 1, "int4": 0.5}[dtype]
    nbytes = int(sum(w.size for w in lp.values()) * elt)
    return lp, nbytes


def time_sweep(sweep, x, lp, nbytes, label):
    _sync(sweep(x, lp))
    t0 = time.perf_counter()
    xx = x
    for _ in range(REPS):
        xx = sweep(xx, lp)[:, :H]
    _sync(xx)
    dt = (time.perf_counter() - t0) / REPS
    gbps = nbytes / dt / 1e9
    print(f"{label:44s} {dt*1e3:7.2f} ms  {gbps:7.1f} GB/s "
          f"({gbps/819.0*100:4.1f}% peak)")
    return dt


def scan_of(dot):
    @jax.jit
    def sweep(x, lp):
        def body(hc, wl):
            a = dot(hc, wl["q"])
            _k = dot(hc, wl["k"])
            _v = dot(hc, wl["v"])
            hc = hc + dot(a, wl["o"])
            g = dot(hc, wl["g"])
            u = dot(hc, wl["u"])
            hc = hc + dot(g * u, wl["d"])
            return hc + jnp.sum(_k) + jnp.sum(_v), None
        hc, _ = jax.lax.scan(body, x, lp)
        return hc
    return sweep


def main():
    print("devices:", jax.devices())
    x = jax.random.normal(jax.random.PRNGKey(7), (1, H), jnp.bfloat16)

    # --- baseline: bf16 ---
    lp, nb = mk_weights("bf16")
    def dot_bf16(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)
    t_bf16 = time_sweep(scan_of(dot_bf16), x, lp, nb, "bf16 (baseline)")
    del lp

    # --- int8 variants ---
    lp8, nb8 = mk_weights("int8")

    def dot_cast(a, w):
        return jnp.dot(a, w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    time_sweep(scan_of(dot_cast), x, lp8, nb8, "int8 astype(bf16) [current]")

    def dot_cast_f32(a, w):
        return jnp.dot(a.astype(jnp.float32), w.astype(jnp.float32),
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    time_sweep(scan_of(dot_cast_f32), x, lp8, nb8, "int8 astype(f32) dot")

    # native int8 x int8 dot, int32 accum (activation quantized per-step)
    def dot_native(a, w):
        amax = jnp.max(jnp.abs(a.astype(jnp.float32)))
        sa = jnp.maximum(amax / 127.0, 1e-12)
        aq = jnp.clip(jnp.round(a.astype(jnp.float32) / sa), -127, 127
                      ).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sa).astype(jnp.bfloat16)
    time_sweep(scan_of(dot_native), x, lp8, nb8, "int8 native w8a8 int32-accum")

    # int8 weights viewed as bf16 lanes: dot with einsum lowering
    def dot_einsum(a, w):
        return jnp.einsum("mk,kn->mn", a, w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
    time_sweep(scan_of(dot_einsum), x, lp8, nb8, "int8 einsum astype")

    # upconvert-only ablation: is the convert itself the cost?
    @jax.jit
    def convert_only(x, lp):
        s = x[0, 0].astype(jnp.float32)
        for w in lp.values():
            s = s + jnp.sum(w.astype(jnp.bfloat16).astype(jnp.float32)
                            ) * 1e-9 + s * 0
        return x + s.astype(jnp.bfloat16)
    time_sweep(convert_only, x, lp8, nb8, "int8 convert+reduce only (no dot)")

    # reduce-only: pure streaming floor for int8 bytes via sum
    @jax.jit
    def reduce_only(x, lp):
        s = jnp.float32(0)
        for w in lp.values():
            s = s + jnp.sum(w, dtype=jnp.int32).astype(jnp.float32)
        return x + s.astype(jnp.bfloat16) * 1e-20
    time_sweep(reduce_only, x, lp8, nb8, "int8 sum-reduce only (stream floor)")
    del lp8

    # --- fp8 variants ---
    lpf, nbf = mk_weights("fp8")
    time_sweep(scan_of(dot_cast), x, lpf, nbf, "fp8 astype(bf16) [current]")
    @jax.jit
    def reduce_only_f(x, lp):
        s = jnp.float32(0)
        for w in lp.values():
            s = s + jnp.sum(w.astype(jnp.bfloat16), dtype=jnp.float32)
        return x + s.astype(jnp.bfloat16) * 1e-20
    time_sweep(reduce_only_f, x, lpf, nbf, "fp8 sum-reduce only (stream floor)")
    del lpf

    # --- int4 ---
    try:
        lp4, nb4 = mk_weights("int4")
        time_sweep(scan_of(dot_cast), x, lp4, nb4, "int4 astype(bf16)")
    except Exception as e:
        print("int4:", type(e).__name__, e)

    print(f"\nbf16 reference time: {t_bf16*1e3:.2f} ms; "
          f"ideal int8 time = {t_bf16*1e3/2:.2f} ms")


if __name__ == "__main__":
    main()
