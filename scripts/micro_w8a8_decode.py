"""Decode-shaped scan microbench: int8 weight consumption formulations.

VERDICT r3 task #1: int8 decode streams at ~30% of HBM peak because the
current path converts int8 weights to bf16 for the MXU (x_bf16 @ W_bf16).
Raw int8 HBM streaming is ELEMENT-rate limited (a pure jnp.sum over int8
reads ~255 GB/s vs bf16's 410 — same elements/s), so the convert path can
never beat bf16 time by more than the convert savings. The MXU, however,
consumes int8 NATIVELY (int8 GEMM measures 300 TOPS): if the int8 operand
feeds the MXU without a bf16 materialization, the VMEM stream halves.

Formulations, each a 22-layer scan over the 1B fused-decode shapes
(qkv 2048x2560, o 2048x2048, gate|up 2048x11264, down 5632x2048):
  bf16     x_bf16 @ W_bf16                          (baseline)
  cvt      x_bf16 @ W_int8.astype(bf16)             (current quant path)
  w8a8     quant(x) int8 @ W_int8 -> int32 -> scale (native MXU int8)
  w8a8_rq  same but activation re-quantized before EVERY dot
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

L, H, QKV, INTER2, INTER = 22, 2048, 2560, 11264, 5632
M = 8      # padded rows; M=1 lowers pathologically


def _sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0]).ravel()[:1])


def mk_params(dtype):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    shapes = [(L, H, QKV), (L, H, H), (L, H, INTER2), (L, INTER, H)]
    if dtype == "bf16":
        return [jax.random.normal(k, s, jnp.bfloat16) * 0.02
                for k, s in zip(ks, shapes)]
    return [jax.random.randint(k, s, -127, 127, jnp.int8)
            for k, s in zip(ks, shapes)]


def quant_act(x):
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    xi = jnp.round(x / s).astype(jnp.int8)
    return xi, s.astype(jnp.float32)


def body_bf16(x, ws):
    wq, wo, wg, wd = ws
    a = jnp.dot(x, wq, preferred_element_type=jnp.float32)
    x = x + jnp.dot(a[:, :H].astype(jnp.bfloat16), wo,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    g = jnp.dot(x, wg, preferred_element_type=jnp.float32)
    act = (g[:, :INTER] * jax.nn.sigmoid(g[:, INTER:])).astype(jnp.bfloat16)
    x = x + jnp.dot(act, wd,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return x, None


def body_cvt(x, ws):
    wq, wo, wg, wd = ws
    a = jnp.dot(x, wq.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    x = x + jnp.dot(a[:, :H].astype(jnp.bfloat16), wo.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    g = jnp.dot(x, wg.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    act = (g[:, :INTER] * jax.nn.sigmoid(g[:, INTER:])).astype(jnp.bfloat16)
    x = x + jnp.dot(act, wd.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return x, None


def _i8dot(xi, w):
    return jax.lax.dot_general(xi, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def body_w8a8(x, ws):
    wq, wo, wg, wd = ws
    xi, s = quant_act(x)
    a = _i8dot(xi, wq).astype(jnp.float32) * s
    ai, sa = quant_act(a[:, :H].astype(jnp.bfloat16))
    x = x + (_i8dot(ai, wo).astype(jnp.float32) * sa).astype(jnp.bfloat16)
    xi2, s2 = quant_act(x)
    g = _i8dot(xi2, wg).astype(jnp.float32) * s2
    act = (g[:, :INTER] * jax.nn.sigmoid(g[:, INTER:])).astype(jnp.bfloat16)
    ci, sc = quant_act(act)
    x = x + (_i8dot(ci, wd).astype(jnp.float32) * sc).astype(jnp.bfloat16)
    return x, None


BODIES = {"bf16": (body_bf16, "bf16"), "cvt": (body_cvt, "int8"),
          "w8a8": (body_w8a8, "int8")}


def bench(name, reps=48):
    # reps amortize the ~36 ms tunnel sync: a bf16 sweep is ~2.6 ms, so 16
    # reps under-report GB/s by ~2x; 48 keeps the sync under 25%.
    body, wdt = BODIES[name]
    ws = mk_params(wdt)
    nbytes = sum(int(w.size) * w.dtype.itemsize for w in ws)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, H), jnp.bfloat16)

    @jax.jit
    def sweep(x, ws):
        return jax.lax.scan(body, x, ws)[0]

    y = sweep(x, ws)
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = sweep(y, ws)
    _sync(y)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:8s} {dt*1e3:7.2f} ms  {nbytes/dt/1e9:7.1f} GB/s "
          f"({nbytes/dt/1e9/819*100:4.1f}% peak)  bytes={nbytes/1e9:.2f} GB",
          flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["bf16", "cvt", "w8a8"]
    for n in names:
        bench(n)
