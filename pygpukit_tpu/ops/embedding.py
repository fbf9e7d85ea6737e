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

def kv_cache_update_fn(k_cache, v_cache, k_new, v_new, pos):
    """Write k_new/v_new [T,Hk,D] at cache position ``pos`` (traced scalar)."""
    k_cache = lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype),
                                       (pos, 0, 0))
    v_cache = lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype),
                                       (pos, 0, 0))
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
