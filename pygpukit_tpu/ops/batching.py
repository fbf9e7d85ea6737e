"""Continuous-batching primitives (reference:
native/bindings/continuous_batching.cpp:6-45, ops.cuh:514-561 —
gather_embeddings, scatter_last_token_logits, prepare_position_ids,
argmax_sample, check_eos, cumsum)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.array import Array, as_jax
from ._common import apply_op


def gather_embeddings_fn(table, ids):
    """Flattened ragged batch token ids -> embeddings [T, E]."""
    return jnp.take(table, ids, axis=0)


def prepare_position_ids_fn(seq_lens, max_tokens: int):
    """seq_lens [B] -> flat position ids [max_tokens] for packed sequences
    (positions restart at 0 at each sequence boundary)."""
    ends = jnp.cumsum(seq_lens)
    starts = ends - seq_lens
    token_idx = jnp.arange(max_tokens)
    # sequence id of each flat token = # starts <= idx  - 1
    seq_id = jnp.sum(token_idx[:, None] >= ends[None, :], axis=1)
    seq_id = jnp.clip(seq_id, 0, seq_lens.shape[0] - 1)
    return token_idx - jnp.take(starts, seq_id)


def scatter_last_token_logits_fn(logits_all, seq_lens):
    """Packed logits [T, V] + seq_lens [B] -> last-token logits [B, V]."""
    last_idx = jnp.cumsum(seq_lens) - 1
    return jnp.take(logits_all, last_idx, axis=0)


def argmax_sample_fn(logits):
    """[B, V] -> [B] greedy tokens."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def check_eos_fn(tokens, eos_token_id):
    """[B] -> bool [B]."""
    return tokens == eos_token_id


def cumsum_fn(x, axis: int = 0):
    return jnp.cumsum(x, axis=axis)


# Array-facing wrappers

def gather_embeddings(table, ids, *, out: Array | None = None) -> Array:
    return apply_op(gather_embeddings_fn, table,
                    as_jax(ids).astype(jnp.int32), out=out)


def prepare_position_ids(seq_lens, max_tokens: int, *,
                         out: Array | None = None) -> Array:
    return apply_op(lambda s: prepare_position_ids_fn(s, max_tokens),
                    as_jax(seq_lens).astype(jnp.int32), out=out)


def scatter_last_token_logits(logits_all, seq_lens, *,
                              out: Array | None = None) -> Array:
    return apply_op(scatter_last_token_logits_fn, logits_all,
                    as_jax(seq_lens).astype(jnp.int32), out=out)


def argmax_sample(logits, *, out: Array | None = None) -> Array:
    return apply_op(argmax_sample_fn, logits, out=out)


def check_eos(tokens, eos_token_id: int, *, out: Array | None = None) -> Array:
    return apply_op(lambda t: check_eos_fn(t, eos_token_id), tokens, out=out)
