"""Microbench v2: int32-packed quantized GEMV formulations.

Finding from micro_gemv_quant.py: int8/fp8 HBM streaming is ELEMENT-rate
limited (~270 GB/s = half of bf16's 410 GB/s at the same element count) —
the load path moves one element per 32-bit lane. Packing 4 bytes into an
int32 word should restore the byte rate; unpack via arithmetic shifts on
the VPU, then dot. K-packed layout (word (k,n) holds W[4k+0..3, n]) needs
no output permutation: y = sum_b dot(x[b::4], unpack_b(Wp)).
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
          f"({gbps/819.0*100:4.1f}% peak)", flush=True)
    return dt


def pack_k(w):  # int8 [K, N] -> int32 [K//4, N], word(k,n) = W[4k..4k+3, n]
    k, n = w.shape
    v = np.asarray(w).reshape(k // 4, 4, n).transpose(0, 2, 1)  # [K/4, N, 4]
    return jnp.asarray(
        np.ascontiguousarray(v).view(np.int32).reshape(k // 4, n))


def unpack_b(wp, b):
    # byte b of each int32 word, sign-extended (little-endian packing)
    return ((wp << (24 - 8 * b)) >> 24)


def main():
    print("devices:", jax.devices(), flush=True)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, H), jnp.bfloat16)
    rng = np.random.default_rng(3)
    w8 = {k: rng.integers(-127, 127, (L, *s), dtype=np.int8)
          for k, s in SHAPES.items()}
    nbytes = sum(w.size for w in w8.values())

    # --- floor: int32-bitcast sum-reduce ---
    lp32 = {k: jnp.asarray(v.reshape(L, s[0] // 4, 4, s[1])
                           .transpose(0, 1, 3, 2).copy()
                           .view(np.int32).reshape(L, s[0] // 4, s[1]))
            for (k, s), v in zip(SHAPES.items(), w8.values())}

    @jax.jit
    def reduce32(x, lp):
        s = jnp.float32(0)
        for w in lp.values():
            s = s + jnp.sum(w, dtype=jnp.int32).astype(jnp.float32)
        return x + s.astype(jnp.bfloat16) * 1e-20
    time_sweep(reduce32, x, lp32, nbytes, "int8->int32 packed sum floor")

    # --- K-packed dot: 4 strided-x dots per projection ---
    def dot_packed(a, wp):
        acc = jnp.zeros((a.shape[0], wp.shape[1]), jnp.float32)
        for b in range(4):
            wb = unpack_b(wp, b).astype(jnp.bfloat16)
            acc = acc + jnp.dot(a[:, b::4], wb,
                                preferred_element_type=jnp.float32)
        return acc.astype(jnp.bfloat16)

    @jax.jit
    def sweep_packed(x, lp):
        def body(hc, wl):
            a = dot_packed(hc, wl["q"])
            _k = dot_packed(hc, wl["k"])
            _v = dot_packed(hc, wl["v"])
            hc = hc + dot_packed(a, wl["o"])
            g = dot_packed(hc, wl["g"])
            u = dot_packed(hc, wl["u"])
            hc = hc + dot_packed(g * u, wl["d"])
            return hc + jnp.sum(_k) + jnp.sum(_v), None
        hc, _ = jax.lax.scan(body, x, lp)
        return hc
    time_sweep(sweep_packed, x, lp32, nbytes, "int8 K-packed 4-dot")

    # --- K-packed, single dot via unpack-and-restack ---
    def dot_restack(a, wp):
        planes = [unpack_b(wp, b).astype(jnp.bfloat16) for b in range(4)]
        w = jnp.stack(planes, axis=1).reshape(wp.shape[0] * 4, wp.shape[1])
        return jnp.dot(a, w, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    @jax.jit
    def sweep_restack(x, lp):
        def body(hc, wl):
            a = dot_restack(hc, wl["q"])
            _k = dot_restack(hc, wl["k"])
            _v = dot_restack(hc, wl["v"])
            hc = hc + dot_restack(a, wl["o"])
            g = dot_restack(hc, wl["g"])
            u = dot_restack(hc, wl["u"])
            hc = hc + dot_restack(g * u, wl["d"])
            return hc + jnp.sum(_k) + jnp.sum(_v), None
        hc, _ = jax.lax.scan(body, x, lp)
        return hc
    time_sweep(sweep_restack, x, lp32, nbytes, "int8 K-packed restack 1-dot")

    # --- N-packed (bitcast along minor dim, no pre-transpose) + 4 dots into
    #     interleaved output, un-interleave at the end of each projection ---
    lp32n = {k: jnp.asarray(np.ascontiguousarray(v.reshape(L, s[0], s[1]))
                            .view(np.int32))
             for (k, s), v in zip(SHAPES.items(), w8.values())}

    def dot_npacked(a, wp):
        # wp [K, N/4]; plane b = W[k, 4j+b] -> y strided; gather-free:
        # compute [4, N/4] then transpose-reshape to [N]
        ys = []
        for b in range(4):
            wb = unpack_b(wp, b).astype(jnp.bfloat16)
            ys.append(jnp.dot(a, wb, preferred_element_type=jnp.float32))
        y = jnp.stack(ys, axis=-1).reshape(a.shape[0], -1)  # [M, N]
        return y.astype(jnp.bfloat16)

    @jax.jit
    def sweep_npacked(x, lp):
        def body(hc, wl):
            a = dot_npacked(hc, wl["q"])
            _k = dot_npacked(hc, wl["k"])
            _v = dot_npacked(hc, wl["v"])
            hc = hc + dot_npacked(a, wl["o"])
            g = dot_npacked(hc, wl["g"])
            u = dot_npacked(hc, wl["u"])
            hc = hc + dot_npacked(g * u, wl["d"])
            return hc + jnp.sum(_k) + jnp.sum(_v), None
        hc, _ = jax.lax.scan(body, x, lp)
        return hc
    time_sweep(sweep_npacked, x, lp32n, nbytes, "int8 N-packed 4-dot")

    # --- fp8 packed: bytes -> int32 words, unpack -> uint8 -> bitcast fp8 ---
    wf = {k: jax.random.normal(jax.random.PRNGKey(i), (L, *s), jnp.bfloat16
                               ).astype(jnp.float8_e4m3fn)
          for i, (k, s) in enumerate(SHAPES.items())}
    lpf32 = {}
    for (k, s), v in zip(SHAPES.items(), wf.values()):
        raw = np.asarray(jax.device_get(v)).view(np.uint8)
        raw = raw.reshape(L, s[0] // 4, 4, s[1]).transpose(0, 1, 3, 2).copy()
        lpf32[k] = jnp.asarray(raw.view(np.int32).reshape(L, s[0] // 4, s[1]))

    def dot_fp8packed(a, wp):
        acc = jnp.zeros((a.shape[0], wp.shape[1]), jnp.float32)
        for b in range(4):
            byte = ((wp >> (8 * b)) & 0xFF).astype(jnp.uint8)
            wb = jax.lax.bitcast_convert_type(
                byte, jnp.float8_e4m3fn).astype(jnp.bfloat16)
            acc = acc + jnp.dot(a[:, b::4], wb,
                                preferred_element_type=jnp.float32)
        return acc.astype(jnp.bfloat16)

    @jax.jit
    def sweep_fp8packed(x, lp):
        def body(hc, wl):
            a = dot_fp8packed(hc, wl["q"])
            _k = dot_fp8packed(hc, wl["k"])
            _v = dot_fp8packed(hc, wl["v"])
            hc = hc + dot_fp8packed(a, wl["o"])
            g = dot_fp8packed(hc, wl["g"])
            u = dot_fp8packed(hc, wl["u"])
            hc = hc + dot_fp8packed(g * u, wl["d"])
            return hc + jnp.sum(_k) + jnp.sum(_v), None
        hc, _ = jax.lax.scan(body, x, lp)
        return hc
    time_sweep(sweep_fp8packed, x, lpf32, nbytes, "fp8 K-packed 4-dot")

    # correctness spot check of K-packed int8 dot vs reference
    a = jax.random.normal(jax.random.PRNGKey(0), (1, H), jnp.bfloat16)
    wref = jnp.asarray(w8["q"][0])
    ref = jnp.dot(a, wref.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    got = jnp.zeros((1, H), jnp.float32)
    wp = pack_k(w8["q"][0])
    for b in range(4):
        got = got + jnp.dot(a[:, b::4], unpack_b(wp, b).astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print("K-packed dot rel err vs direct:", err, flush=True)


if __name__ == "__main__":
    main()
