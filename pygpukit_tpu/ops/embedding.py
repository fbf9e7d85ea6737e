"""Embedding lookup + KV-cache ops (reference: src/pygpukit/ops/embedding.py,
native/ops/nn/embedding + kv_cache kernels).

KV caches are fixed preallocated buffers [MAX, Hk, D]; updates are functional
``dynamic_update_slice`` writes which XLA turns into in-place stores when the
cache buffer is donated (the decode executables do exactly that).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.array import Array, as_jax
from ._common import apply_op


def embedding_lookup_fn(table, ids):
    """table [V,E], ids [...]->int — gather rows."""
    return jnp.take(table, ids, axis=0)


def embedding_lookup(table, ids, *, out: Array | None = None) -> Array:
    idsj = as_jax(ids).astype(jnp.int32)
    return apply_op(embedding_lookup_fn, table, idsj, out=out)


def embedding_lookup_batch(table, ids, *, out: Array | None = None) -> Array:
    return embedding_lookup(table, ids, out=out)


# ---------------------------------------------------------------------------
# KV cache (GQA-aware). Functional core used inside jitted decode steps.
# ---------------------------------------------------------------------------

#: fp8 formats usable as a KV-cache storage dtype (reference: FA3 fp8 K/V,
#: native/ops/nn/attention/flash_attention_3_fp8_sm120.cuh; config surface
#: llm/quant.py kv_cache_quant_algo). Finite-max per format — casts beyond
#: it produce NaN (no inf in e4m3fn), so writes clamp first.
KV_FP8_MAX = {
    jnp.float8_e4m3fn.dtype: 448.0,
    jnp.float8_e5m2.dtype: 57344.0,
}


def to_kv_dtype(x, dtype):
    """Cast ``x`` to the cache storage dtype; fp8 targets clamp to the
    format's finite range first (out-of-range casts are NaN, not saturate)."""
    m = KV_FP8_MAX.get(jnp.dtype(dtype))
    if m is not None and x.dtype != dtype:
        x = jnp.clip(x.astype(jnp.float32), -m, m)
    return x.astype(dtype)


def kv_compute_dtype(cache_dtype):
    """Dtype attention math should run the cache operands in: fp8/int8
    storage is dequantised to bf16 at the read (v5e has no fp8 MXU; the
    win is the halved HBM stream, not the dot)."""
    if (jnp.dtype(cache_dtype) in KV_FP8_MAX
            or jnp.dtype(cache_dtype) == jnp.int8):
        return jnp.bfloat16
    return cache_dtype


def kv_cache_zeros(shape, dtype, merged: bool = False):
    """Allocate a KV cache: a plain array, or for int8 storage a pytree
    ``{"q": int8[shape], "s": bf16[rows]}`` carrying one scale per written
    row (per position, per layer, per slot — shared across the row's heads).

    int8-KV is the FAST capacity rung on v5e: integer->bf16 converts run at
    stream rate in Mosaic (the w4a8 GEMVs prove it) where the fp8->bf16 VPU
    convert is ~4x slower per byte (scripts/micro_bda_u8dma.py), and the
    per-row scale (amax/127) carries ~0.4% RMS vs e4m3's ~3%. ``merged``:
    the pool's minor dims are pre-merged ([..., MAX, Hk*D]) so the scale
    rows drop ONE trailing dim instead of two."""
    if jnp.dtype(dtype) != jnp.int8:
        return jnp.zeros(shape, dtype)
    rows = shape[:-1] if merged else shape[:-2]
    return {"q": jnp.zeros(shape, jnp.int8),
            "s": jnp.zeros(rows, jnp.bfloat16)}


def kv_leaf(cache):
    """The storage leaf carrying the cache's shape/layout (dict-safe)."""
    return cache["q"] if isinstance(cache, dict) else cache


def kv_quant_rows(new, n_red: int):
    """Quantize ``new`` to (int8 rows, bf16 row scales) reducing amax over
    the last ``n_red`` dims. Quantizes against the bf16-ROUNDED scale so
    quant and dequant use the identical value."""
    f = new.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f), axis=tuple(range(new.ndim - n_red, new.ndim)))
    s = jnp.maximum(amax / 127.0, 1e-8).astype(jnp.bfloat16)
    sf = s.astype(jnp.float32).reshape(s.shape + (1,) * n_red)
    q = jnp.clip(jnp.round(f / sf), -127, 127).astype(jnp.int8)
    return q, s


def kv_dequant(blk_q, blk_s):
    """bf16 view of an int8 cache block: q * per-row scale (broadcast over
    the trailing dims the scale reduced)."""
    n_red = blk_q.ndim - blk_s.ndim
    return (blk_q.astype(jnp.bfloat16)
            * blk_s.reshape(blk_s.shape + (1,) * n_red))


def kv_write(cache, new, start):
    """dynamic_update_slice with storage-dtype conversion (fp8-safe).

    int8 dict caches quantize ``new`` per row (amax over the dims the
    scale array drops) and write both leaves; ``start``'s leading entries
    index the scale rows."""
    if isinstance(cache, dict):
        q, s = kv_quant_rows(new, cache["q"].ndim - cache["s"].ndim)
        return {"q": lax.dynamic_update_slice(cache["q"], q, start),
                "s": lax.dynamic_update_slice(
                    cache["s"], s, start[:cache["s"].ndim])}
    return lax.dynamic_update_slice(cache, to_kv_dtype(new, cache.dtype),
                                    start)


def kv_cache_update_fn(k_cache, v_cache, k_new, v_new, pos):
    """Write k_new/v_new [T,Hk,D] at cache position ``pos`` (traced scalar)."""
    k_cache = kv_write(k_cache, k_new, (pos, 0, 0))
    v_cache = kv_write(v_cache, v_new, (pos, 0, 0))
    return k_cache, v_cache


def kv_cache_prefill_fn(k_cache, v_cache, k_new, v_new):
    """Prefill from position 0 (reference: kv_cache_prefill_gqa)."""
    return kv_cache_update_fn(k_cache, v_cache, k_new, v_new, 0)


def kv_cache_update(k_cache: Array, v_cache: Array, k_new, v_new, pos: int) -> None:
    """In-place cache update via buffer rebind (reference: kv_cache_update_gqa)."""
    kc, vc = kv_cache_update_fn(as_jax(k_cache), as_jax(v_cache),
                                as_jax(k_new), as_jax(v_new), pos)
    k_cache._set_buffer(kc)
    v_cache._set_buffer(vc)


kv_cache_update_gqa = kv_cache_update


def kv_cache_prefill(k_cache: Array, v_cache: Array, k_new, v_new) -> None:
    kv_cache_update(k_cache, v_cache, k_new, v_new, 0)


kv_cache_prefill_gqa = kv_cache_prefill
