"""fp8-KV batched decode attention: find a formulation where XLA folds the
fp8->bf16 convert into the attention dots instead of materialising a bf16
copy of the cache (VERDICT r3 #4; docs/performance.md "fp8 KV cache": the
vmapped serving chunk's slice fusion doubles 96 -> 213 ms at batch 8
MAX=4096).

Measures a vmapped batch-8 attention-only step loop (64 steps inside one
jit, carried accumulator so XLA can't hoist) over [B, MAX, Hk, D] caches:

  v_astype   — production _sdpa_fixed_cache_full: transpose + astype(bf16)
  v_dotdirect— fp8 cache fed straight to dot_general (convert inside the
               dot fusion if XLA allows mixed/fp8 operands)
  v_noT      — astype WITHOUT the transpose (einsum contracts the raw
               layout; isolates transpose-vs-convert interaction)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_kv8_fuse.py [MAX]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, HK, G, D, L = 8, 4, 8, 64, 22
MAX = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
STEPS = 64
F32 = jnp.float32


def attn_astype(q, kc, vc, ctx):
    h = HK * G
    qh = q.reshape(1, HK, G, D).transpose(1, 2, 0, 3)
    kk = jnp.transpose(kc, (1, 0, 2)).astype(jnp.bfloat16)
    vv = jnp.transpose(vc, (1, 0, 2)).astype(jnp.bfloat16)
    scores = jnp.einsum("hgtd,hkd->hgtk", qh, kk,
                        preferred_element_type=F32) * (D ** -0.5)
    mask = jnp.arange(MAX)[None, None, None, :] >= ctx
    probs = jax.nn.softmax(jnp.where(mask, -1e30, scores), axis=-1)
    out = jnp.einsum("hgtk,hkd->hgtd", probs.astype(vv.dtype), vv,
                     preferred_element_type=F32)
    return out.transpose(2, 0, 1, 3).reshape(1, h, D).astype(q.dtype)


def attn_dotdirect(q, kc, vc, ctx):
    h = HK * G
    qh = q.reshape(1, HK, G, D).transpose(1, 2, 0, 3)
    # contract directly against the stored dtype; dimension numbers do the
    # transpose so there is no separate transpose/convert op to materialise
    scores = jax.lax.dot_general(
        qh, kc, (((3,), (2,)), ((0,), (1,))),
        preferred_element_type=F32) * (D ** -0.5)       # [Hk,G,T,MAX]
    mask = jnp.arange(MAX)[None, None, None, :] >= ctx
    probs = jax.nn.softmax(jnp.where(mask, -1e30, scores), axis=-1)
    out = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), vc, (((3,), (0,)), ((0,), (1,))),
        preferred_element_type=F32)                      # [Hk,G,T,D]
    return out.transpose(2, 0, 1, 3).reshape(1, h, D).astype(q.dtype)


def attn_noT(q, kc, vc, ctx):
    h = HK * G
    qh = q.reshape(1, HK, G, D).transpose(1, 2, 0, 3)
    kk = kc.astype(jnp.bfloat16)                          # [MAX,Hk,D]
    vv = vc.astype(jnp.bfloat16)
    scores = jnp.einsum("hgtd,khd->hgtk", qh, kk,
                        preferred_element_type=F32) * (D ** -0.5)
    mask = jnp.arange(MAX)[None, None, None, :] >= ctx
    probs = jax.nn.softmax(jnp.where(mask, -1e30, scores), axis=-1)
    out = jnp.einsum("hgtk,khd->hgtd", probs.astype(vv.dtype), vv,
                     preferred_element_type=F32)
    return out.transpose(2, 0, 1, 3).reshape(1, h, D).astype(q.dtype)


VARIANTS = {"astype": attn_astype, "dotdirect": attn_dotdirect,
            "noT": attn_noT}


@functools.partial(jax.jit, static_argnames=("name",))
def loop(q, kc, vc, ctx, name):
    fn = jax.vmap(VARIANTS[name], in_axes=(0, 0, 0, None))

    def body(i, acc):
        o = fn((q + acc * 1e-6).astype(q.dtype), kc, vc, ctx)
        return acc + o.astype(F32)

    return jax.lax.fori_loop(0, STEPS, body,
                             jnp.zeros((B, 1, HK * G, D), F32))


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, HK * G, D)), jnp.bfloat16)
    k = rng.standard_normal((B, MAX, HK, D)).astype(np.float32)
    ctx = jnp.int32(MAX - 2)
    kv_gb = 2 * B * MAX * HK * D * L  # what a full 22-layer step would read
    for dt, label in ((jnp.bfloat16, "bf16"), (jnp.float8_e4m3fn, "fp8")):
        kc = jnp.asarray(k, dt)
        vc = jnp.asarray(k, dt)
        bytes_step = 2 * B * MAX * HK * D * STEPS * kc.dtype.itemsize
        for name in VARIANTS:
            try:
                r = loop(q, kc, vc, ctx, name)
                r.block_until_ready()
                t0 = time.perf_counter()
                r = loop(q, kc, vc, ctx, name)
                _ = np.asarray(r[0, 0, 0, 0])
                dt_s = time.perf_counter() - t0
                print(f"{label:5s} {name:10s} {dt_s*1e3/STEPS:8.3f} ms/step "
                      f"{bytes_step/dt_s/1e9:7.1f} GB/s", flush=True)
            except Exception as e:
                print(f"{label:5s} {name:10s} FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
