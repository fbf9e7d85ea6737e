"""Decompose 1B quantized-decode overhead (round 3, healthy chip).

Healthy-day bench: bf16 3.80 ms/tok (2.84 theoretical stream), int8 2.65
(1.41), int4 3.30 (0.71), int4_block 4.61 (0.71+scales). Every mode carries
~1.0-1.9 ms/tok that is NOT weight streaming. This script splits that
residual same-process:

  1. per-mode decode (bf16 / int8 w8a8 / int8 w8a16 / int4 pallas /
     int4 xla-dequant / int4_block both ways)
  2. act-quant chain alone (88x amax/div/round/cast at decode shapes)
  3. dots alone (the 4 fused weight dots x 22 layers, M=1, no attention,
     no norms) per format
  4. scan unroll 1 vs 2 vs 4 on the decode layer loop (env
     PYGPUKIT_SCAN_UNROLL)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_quant_decode.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                    init_params_device)
from pygpukit_tpu.llm.quant import quantize_model_params

E, L, I, V = 2048, 22, 5632, 32000
cfg = TransformerConfig(
    vocab_size=V, hidden_size=E, num_layers=L, num_heads=32,
    num_kv_heads=4, intermediate_size=I, max_position_embeddings=2048)

base = init_params_device(cfg, seed=0, dtype=jnp.bfloat16)


def _sync(x):
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0:1])


def decode_ms(params, label, n=128):
    model = CausalTransformerModel(cfg, fuse_params(params),
                                   dtype=jnp.bfloat16)
    model.init_fixed_cache(1024)
    model.generate(list(range(1, 17)), max_new_tokens=33, chunk_size=32)
    model.init_fixed_cache(1024)
    t0 = time.perf_counter()
    out = model.generate(list(range(1, 17)), max_new_tokens=n + 1,
                         chunk_size=64)
    dt = (time.perf_counter() - t0) / len(out) * 1e3
    print(f"{label:28s}: {dt:6.2f} ms/tok  ({1e3/dt:6.1f} tok/s)", flush=True)
    return dt


print("== 1. end-to-end decode modes ==", flush=True)
decode_ms(base, "bf16")
q8 = quantize_model_params(base, "int8")
decode_ms(q8, "int8 w8a8 (default)")
os.environ["PYGPUKIT_INT8_MODE"] = "w8a16"
decode_ms(q8, "int8 w8a16 (convert)")
del os.environ["PYGPUKIT_INT8_MODE"]
q4 = quantize_model_params(base, "int4")
decode_ms(q4, "int4 pallas gemv")
os.environ["PYGPUKIT_INT4_GEMV"] = "xla"
decode_ms(q4, "int4 xla dequant")
del os.environ["PYGPUKIT_INT4_GEMV"]
q4b = quantize_model_params(base, "int4_block")
decode_ms(q4b, "int4_block pallas gemv")
os.environ["PYGPUKIT_INT4_GEMV"] = "xla"
decode_ms(q4b, "int4_block xla dequant")
del os.environ["PYGPUKIT_INT4_GEMV"]

print("== 2. act-quant chain alone (4 sites x 22 layers) ==", flush=True)


@jax.jit
def act_quant_chain(x):
    def site(x, _):
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        sx = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-12)
        xi = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
        # feed something back so nothing is dead code
        return x + xi.astype(jnp.bfloat16) * jnp.bfloat16(1e-6), None

    def layer(x, _):
        x, _ = jax.lax.scan(site, x, None, length=4)
        return x, None

    x, _ = jax.lax.scan(layer, x, None, length=L)
    return x


x = jnp.ones((1, E), jnp.bfloat16)
_sync(act_quant_chain(x))
t0 = time.perf_counter()
for _ in range(64):
    x = act_quant_chain(x)
_sync(x)
print(f"act-quant 88 sites          : {(time.perf_counter()-t0)/64*1e3:6.2f}"
      " ms", flush=True)

print("== 3. weight dots alone (M=1, fused shapes) ==", flush=True)
kk = jax.random.PRNGKey(0)


def dots_only(fmt):
    """The 4 fused decode dots per layer (qkv, o, gate|up, down) with
    realistic intermediate shapes, no attention / norms / embed: isolates
    dot fixed-cost + weight streaming."""
    qkv_n = (32 + 2 * 4) * 64
    shapes = [(E, qkv_n), (E, E), (E, 2 * I), (I, E)]
    if fmt == "bf16":
        ws = [jax.random.normal(kk, s, jnp.bfloat16) for s in shapes]
    else:
        ws = [jax.random.randint(kk, s, -127, 127, jnp.int8) for s in shapes]
    ws = [jnp.stack([w] * L) for w in ws]

    def mm(x, w):
        if fmt == "int8":
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            sx = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-12)
            xi = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
            a = jnp.dot(xi, w, preferred_element_type=jnp.int32)
            return (a.astype(jnp.float32) * sx).astype(jnp.bfloat16)
        return jnp.dot(x, w,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    @jax.jit
    def f(x, ws):
        def layer(x, layer_ws):
            w_qkv, w_o, w_gu, w_down = layer_ws
            qkv = mm(x, w_qkv)                       # [1, qkv_n]
            x = x + mm(qkv[:, :E], w_o)              # o_proj on "attn out"
            gu = mm(x, w_gu)                         # [1, 2I]
            x = x + mm(gu[:, :I] * gu[:, I:], w_down)
            return x, None
        x, _ = jax.lax.scan(layer, x, ws)
        return x

    xx = jnp.ones((1, E), jnp.bfloat16)
    _sync(f(xx, ws))
    t0 = time.perf_counter()
    for _ in range(64):
        xx = f(xx, ws)
    _sync(xx)
    print(f"dots-only {fmt:6s}            : "
          f"{(time.perf_counter()-t0)/64*1e3:6.2f} ms", flush=True)


dots_only("bf16")
dots_only("int8")

print("== 4. scan unroll ==", flush=True)
for u in (2, 4):
    os.environ["PYGPUKIT_SCAN_UNROLL"] = str(u)
    decode_ms(base, f"bf16 unroll={u}")
    decode_ms(q8, f"int8 unroll={u}")
del os.environ["PYGPUKIT_SCAN_UNROLL"]
