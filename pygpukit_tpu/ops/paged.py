"""Paged KV cache + paged attention (reference:
native/ops/attention/paged_attention.cuh:1-283 — vLLM-style block tables,
reshape_and_cache, paged attention v1; see also PAPERS.md "Ragged Paged
Attention for TPU").

TPU-native formulation: the KV pool is a fixed [num_blocks, block_size, Hk,D]
buffer; per-sequence block tables gather the sequence's blocks into a
contiguous [max_blocks*block_size] view inside the compiled program (XLA
turns this into efficient dynamic-gather; a Pallas kernel with scalar
prefetch of the block table is the planned optimisation). All shapes static:
one executable serves every sequence length ≤ the table capacity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_F32 = jnp.float32
_NEG_INF = -1e30


def reshape_and_cache_fn(k_pool, v_pool, k_new, v_new, slot_mapping):
    """Write new K/V rows [T,Hk,D] into pool slots (reference:
    reshape_and_cache). slot = block_id * block_size + offset."""
    nb, bs, hk, d = k_pool.shape
    k_flat = k_pool.reshape(nb * bs, hk, d)
    v_flat = v_pool.reshape(nb * bs, hk, d)
    from .embedding import to_kv_dtype
    k_flat = k_flat.at[slot_mapping].set(to_kv_dtype(k_new, k_flat.dtype))
    v_flat = v_flat.at[slot_mapping].set(to_kv_dtype(v_new, v_flat.dtype))
    return k_flat.reshape(nb, bs, hk, d), v_flat.reshape(nb, bs, hk, d)


def paged_attention_fn(q, k_pool, v_pool, block_table, ctx_len):
    """Decode attention over paged KV (reference: paged_attention v1 kernel).

    q [Hq, D] (single query), pools [NB, BS, Hk, D],
    block_table [max_blocks] int32 (padded with any valid id), ctx_len scalar.
    """
    hq, d = q.shape
    nb, bs, hk, _ = k_pool.shape
    max_blocks = block_table.shape[0]
    # gather this sequence's blocks -> [max_blocks*bs, Hk, D]
    k_seq = jnp.take(k_pool, block_table, axis=0).reshape(max_blocks * bs, hk, d)
    v_seq = jnp.take(v_pool, block_table, axis=0).reshape(max_blocks * bs, hk, d)
    if hk != hq:
        k_seq = jnp.repeat(k_seq, hq // hk, axis=1)
        v_seq = jnp.repeat(v_seq, hq // hk, axis=1)
    kh = k_seq.transpose(1, 0, 2).astype(_F32)        # [H, T, D]
    vh = v_seq.transpose(1, 0, 2).astype(_F32)
    scores = jnp.einsum("hd,htd->ht", q.astype(_F32), kh) / math.sqrt(d)
    idx = jnp.arange(max_blocks * bs)[None, :]
    scores = jnp.where(idx >= ctx_len, _NEG_INF, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("ht,htd->hd", probs, vh)
    return out.astype(q.dtype)


def paged_attention_dispatch(q, k_pool, v_pool, block_table, ctx_len):
    """Backend-gated paged attention: PYGPUKIT_PAGED_ATTENTION=pallas selects
    the scalar-prefetch Pallas kernel (kernels/paged_attention.py); default is
    the XLA gather formulation above."""
    import os
    if os.environ.get("PYGPUKIT_PAGED_ATTENTION", "").lower() == "pallas":
        from ..kernels.paged_attention import paged_attention as _pallas
        return _pallas(q, k_pool, v_pool, block_table, ctx_len)
    return jax.jit(paged_attention_fn)(q, k_pool, v_pool, block_table,
                                       jnp.asarray(ctx_len, jnp.int32))


def paged_attention_batch_fn(q, k_pool, v_pool, block_tables, ctx_lens):
    """q [B,Hq,D], block_tables [B,max_blocks], ctx_lens [B] -> [B,Hq,D].
    Pools are shared across the batch (the whole point of paging)."""
    return jax.vmap(paged_attention_fn, in_axes=(0, None, None, 0, 0))(
        q, k_pool, v_pool, block_tables, ctx_lens)


@dataclass
class PagedKVCache:
    """Block-table allocator + device pools (reference: block table mgmt).

    Host-side free-list allocation (cheap bookkeeping); device pools are
    updated functionally inside jitted steps via reshape_and_cache_fn.
    """

    num_blocks: int
    block_size: int
    num_kv_heads: int
    head_dim: int
    num_layers: int = 1
    dtype: object = jnp.bfloat16
    k_pool: jnp.ndarray | None = None
    v_pool: jnp.ndarray | None = None
    _free: list = field(default_factory=list)
    _tables: dict = field(default_factory=dict)   # seq_id -> list[block_id]
    _lens: dict = field(default_factory=dict)

    def __post_init__(self):
        shape = (self.num_layers, self.num_blocks, self.block_size,
                 self.num_kv_heads, self.head_dim)
        self.k_pool = jnp.zeros(shape, self.dtype)
        self.v_pool = jnp.zeros(shape, self.dtype)
        self._free = list(range(self.num_blocks - 1, -1, -1))

    # -- allocation ----------------------------------------------------------

    def allocate(self, seq_id: int) -> None:
        if seq_id in self._tables:
            raise ValueError(f"sequence {seq_id} already allocated")
        self._tables[seq_id] = []
        self._lens[seq_id] = 0

    def free(self, seq_id: int) -> None:
        blocks = self._tables.pop(seq_id, [])
        self._free.extend(reversed(blocks))
        self._lens.pop(seq_id, None)

    def _ensure_capacity(self, seq_id: int, new_len: int) -> None:
        table = self._tables[seq_id]
        needed = -(-new_len // self.block_size)
        while len(table) < needed:
            if not self._free:
                raise MemoryError("paged KV pool exhausted")
            table.append(self._free.pop())

    def slot_mapping(self, seq_id: int, n_tokens: int) -> np.ndarray:
        """Flat pool slots for the next n_tokens of this sequence."""
        start = self._lens[seq_id]
        self._ensure_capacity(seq_id, start + n_tokens)
        table = self._tables[seq_id]
        pos = np.arange(start, start + n_tokens)
        blocks = np.asarray(table)[pos // self.block_size]
        return (blocks * self.block_size + pos % self.block_size).astype(np.int32)

    def append(self, seq_id: int, layer: int, k_new, v_new) -> None:
        """Write T new tokens' KV for one layer; advances length on the last
        layer."""
        t = k_new.shape[0]
        slots = jnp.asarray(self.slot_mapping(seq_id, t))
        kp, vp = reshape_and_cache_fn(
            self.k_pool[layer], self.v_pool[layer], k_new, v_new, slots)
        self.k_pool = self.k_pool.at[layer].set(kp)
        self.v_pool = self.v_pool.at[layer].set(vp)
        if layer == self.num_layers - 1:
            self._lens[seq_id] += t

    def block_table(self, seq_id: int, max_blocks: int | None = None
                    ) -> np.ndarray:
        table = self._tables[seq_id]
        mb = max_blocks or self.num_blocks
        out = np.zeros(mb, np.int32)
        out[:len(table)] = table
        return out

    def context_len(self, seq_id: int) -> int:
        return self._lens[seq_id]

    def attention(self, seq_id: int, layer: int, q) -> jnp.ndarray:
        """Single-query paged attention for one sequence + layer."""
        bt = jnp.asarray(self.block_table(
            seq_id, max_blocks=max(len(self._tables[seq_id]), 1)))
        return paged_attention_dispatch(
            q, self.k_pool[layer], self.v_pool[layer], bt,
            jnp.int32(self._lens[seq_id]))

    def stats(self) -> dict:
        return {
            "num_blocks": self.num_blocks,
            "free_blocks": len(self._free),
            "sequences": len(self._tables),
            "used_blocks": self.num_blocks - len(self._free),
        }
