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
    """Dtype attention math should run the cache operands in: fp8 storage
    is dequantised to bf16 at the read (v5e has no fp8 MXU; the win is the
    halved HBM stream, not the dot)."""
    if jnp.dtype(cache_dtype) in KV_FP8_MAX:
        return jnp.bfloat16
    return cache_dtype


def kv_write(cache, new, start):
    """dynamic_update_slice with storage-dtype conversion (fp8-safe)."""
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
