"""Decode/prefill buffer management (reference: src/pygpukit/llm/buffers.py:
26,214-310,467 — pre-allocated buffers enabling zero-alloc CUDA-graph capture).

On TPU the AOT decode executables already achieve zero-allocation replay via
buffer donation (XLA reuses the donated KV cache HBM for the outputs), so
these classes track and report the buffers rather than being load-bearing for
correctness. They exist for API parity and for HBM accounting: ``allocate``
materialises the same buffer set the reference pre-allocates (token/position/
logits/sampled-token + per-layer intermediates) and ``nbytes`` feeds the
scheduler's memory quotas.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from .config import TransformerConfig


@dataclass
class DecodeBuffers:
    """Pre-allocated single-token decode buffers."""

    token: jnp.ndarray | None = None       # [1] int32
    position: jnp.ndarray | None = None    # [1] int32
    logits: jnp.ndarray | None = None      # [V] f32
    sampled: jnp.ndarray | None = None     # [1] int32
    hidden: jnp.ndarray | None = None      # [1, E]
    _nbytes: int = 0

    @classmethod
    def allocate(cls, config: TransformerConfig, dtype=jnp.bfloat16
                 ) -> "DecodeBuffers":
        b = cls(
            token=jnp.zeros((1,), jnp.int32),
            position=jnp.zeros((1,), jnp.int32),
            logits=jnp.zeros((config.vocab_size,), jnp.float32),
            sampled=jnp.zeros((1,), jnp.int32),
            hidden=jnp.zeros((1, config.hidden_size), dtype),
        )
        b._nbytes = (4 + 4 + config.vocab_size * 4 + 4
                     + config.hidden_size * jnp.dtype(dtype).itemsize)
        return b

    @property
    def nbytes(self) -> int:
        return self._nbytes


@dataclass
class BatchDecodeBuffers:
    """Batch variant (reference: buffers.py batch buffers)."""

    tokens: jnp.ndarray | None = None      # [B]
    positions: jnp.ndarray | None = None   # [B]
    logits: jnp.ndarray | None = None      # [B, V]
    _nbytes: int = 0

    @classmethod
    def allocate(cls, config: TransformerConfig, batch: int
                 ) -> "BatchDecodeBuffers":
        b = cls(
            tokens=jnp.zeros((batch,), jnp.int32),
            positions=jnp.zeros((batch,), jnp.int32),
            logits=jnp.zeros((batch, config.vocab_size), jnp.float32),
        )
        b._nbytes = batch * (8 + config.vocab_size * 4)
        return b

    @property
    def nbytes(self) -> int:
        return self._nbytes


@dataclass
class PrefillBuffers:
    """Bucketed prompt buffers (reference: PrefillBuffers, buffers.py:467)."""

    max_prefill_len: int = 0
    tokens: jnp.ndarray | None = None
    _nbytes: int = 0

    @classmethod
    def allocate(cls, config: TransformerConfig, max_prefill_len: int
                 ) -> "PrefillBuffers":
        b = cls(max_prefill_len=max_prefill_len,
                tokens=jnp.zeros((max_prefill_len,), jnp.int32))
        b._nbytes = max_prefill_len * 4
        return b

    @property
    def nbytes(self) -> int:
        return self._nbytes


def kv_cache_nbytes(config: TransformerConfig, max_seq_len: int,
                    dtype=jnp.bfloat16, batch: int = 1) -> int:
    """HBM footprint of the fixed KV cache pair (scheduler accounting)."""
    per = (config.num_layers * max_seq_len * config.num_kv_heads *
           config.head_dim * jnp.dtype(dtype).itemsize)
    return 2 * per * batch
