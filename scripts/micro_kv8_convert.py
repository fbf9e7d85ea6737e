"""fp8->bf16 convert-rate probe on TPU (VERDICT r3 #4 closeout).

The batched serving chunk reads the fp8 KV pool and converts to bf16 for
the attention dots; fp8-KV serving measures ~0.66x bf16-KV despite half
the pool bytes, so the convert is the suspect. This times, for a pool-
sized array, the full read+convert+reduce pipeline per element:

  - e4m3 -> bf16 via convert_element_type (the production _kv_load)
  - e5m2 -> bf16 via convert_element_type
  - e5m2 -> bf16 via the EXACT bit trick: e5m2 is fp16 truncated to its
    top 8 bits, so u8 -> u16 << 8 -> bitcast fp16 -> bf16 (lossless;
    e5m2 has 2 mantissa bits, bf16 keeps 7)
  - int8 -> bf16 convert (control: the known-fast integer path)
  - bf16 passthrough (stream ceiling for the same element count)

Each candidate reduces to one scalar inside a fori_loop-carried jit so
XLA cannot hoist the convert; one D2H sync per measurement.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import pygpukit_tpu as gp

assert gp.get_backend().platform == "tpu"

N = 256 * 1024 * 1024        # 256M elements = 256 MB at 1 B/elem
PASSES = 16


def bench(name, make, conv):
    x = make()
    x.block_until_ready()

    @jax.jit
    def run(x):
        def body(i, acc):
            return acc + conv(x).sum(dtype=jnp.float32) * (i + 1)
        return lax.fori_loop(0, PASSES, body, jnp.float32(0.0))

    run(x)                       # compile
    np.asarray(run(x))           # warm
    t0 = time.perf_counter()
    np.asarray(run(x))
    dt = time.perf_counter() - t0
    gbps = N * x.dtype.itemsize * PASSES / dt / 1e9
    per_el_ns = dt / (N * PASSES) * 1e9
    print(f"{name:28s} {gbps:8.1f} GB/s  {per_el_ns:7.4f} ns/elem",
          flush=True)
    return gbps


key = jax.random.PRNGKey(0)
vals = jax.random.normal(key, (N,), jnp.bfloat16)


def e5m2_bit_trick(x):
    u16 = lax.convert_element_type(lax.bitcast_convert_type(x, jnp.uint8),
                                   jnp.uint16)
    h = lax.bitcast_convert_type(u16 << 8, jnp.float16)
    return h.astype(jnp.bfloat16)


bench("bf16 passthrough", lambda: vals, lambda x: x)
bench("int8 -> bf16", lambda: jax.jit(
    lambda v: jnp.clip(v.astype(jnp.float32) * 64, -127, 127)
    .astype(jnp.int8))(vals), lambda x: x.astype(jnp.bfloat16))
bench("e4m3 -> bf16 convert", lambda: jax.jit(
    lambda v: v.astype(jnp.float8_e4m3fn))(vals),
    lambda x: x.astype(jnp.bfloat16))
bench("e5m2 -> bf16 convert", lambda: jax.jit(
    lambda v: v.astype(jnp.float8_e5m2))(vals),
    lambda x: x.astype(jnp.bfloat16))
bench("e5m2 -> bf16 bit trick", lambda: jax.jit(
    lambda v: v.astype(jnp.float8_e5m2))(vals), e5m2_bit_trick)

# exactness of the trick vs the convert
x8 = jax.jit(lambda v: v.astype(jnp.float8_e5m2))(vals[:65536])
a = np.asarray(jax.jit(lambda x: x.astype(jnp.bfloat16))(x8))
b = np.asarray(jax.jit(e5m2_bit_trick)(x8))
print("bit trick exact:", np.array_equal(a, b), flush=True)
