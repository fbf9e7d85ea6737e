"""Batched decode (reference: llm/decode/batch.py:27 +
_decode_step_fixed_cache_batch_zero_alloc, causal.py:893).

``vmap`` lifts the single-sequence prefill/decode programs over a batch axis;
the whole batch advances in ONE AOT executable per step (near-linear batch
scaling — the reference measured 6.83x at batch=8, CHANGELOG.md:76; on TPU
the batched matmuls additionally improve MXU utilisation vs M=1 GEMV).
Per-sequence positions are independent traced scalars, so ragged prompts and
early EOS are handled with masking on the host side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.executable import capture
from ..model import _bucket, decode_step_fn, prefill_fn
from .base import DecodeStrategy


class DecodeBatch(DecodeStrategy):
    name = "batch"

    def __init__(self, max_seq_len: int | None = None):
        super().__init__()
        self.max_seq_len = max_seq_len
        self._decode_exe = None
        self._prefill_exes: dict[int, object] = {}
        self.k_cache = None
        self.v_cache = None

    def _init_cache(self, batch: int, max_seq_len: int) -> None:
        model = self.model
        cfg = model.config
        shape = (batch, cfg.num_layers, max_seq_len, cfg.num_kv_heads,
                 cfg.head_dim)
        self.k_cache = jnp.zeros(shape, model.dtype)
        self.v_cache = jnp.zeros(shape, model.dtype)
        self.max_seq_len = max_seq_len

    def _batch_prefill(self, padded: np.ndarray, lens: np.ndarray):
        model = self.model
        bucket = padded.shape[1]
        b = padded.shape[0]
        key = (b, bucket)
        if key not in self._prefill_exes:
            fn = jax.vmap(functools.partial(prefill_fn, model.config),
                          in_axes=(None, 0, 0, 0, 0))
            self._prefill_exes[key] = capture(
                fn, model.params, self.k_cache, self.v_cache,
                jnp.zeros((b, bucket), jnp.int32), jnp.zeros((b,), jnp.int32),
                donate_argnums=(1, 2), name=f"batch_prefill_{b}x{bucket}")
        self.k_cache, self.v_cache, logits = self._prefill_exes[key].replay(
            model.params, self.k_cache, self.v_cache,
            jnp.asarray(padded), jnp.asarray(lens))
        return logits                                   # [B, V]

    def _batch_decode(self, tokens: np.ndarray, poss: np.ndarray):
        model = self.model
        b = tokens.shape[0]
        if self._decode_exe is None:
            fn = jax.vmap(functools.partial(decode_step_fn, model.config),
                          in_axes=(None, 0, 0, 0, 0))
            self._decode_exe = capture(
                fn, model.params, self.k_cache, self.v_cache,
                jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32),
                donate_argnums=(1, 2), name=f"batch_decode_{b}")
        self.k_cache, self.v_cache, logits = self._decode_exe.replay(
            model.params, self.k_cache, self.v_cache,
            jnp.asarray(tokens), jnp.asarray(poss))
        return logits                                   # [B, V]

    def generate(self, input_ids, max_new_tokens: int = 32,
                 eos_token_id: int | None = None) -> list[list[int]]:
        """``input_ids``: list of prompts (list[list[int]]). Returns one
        generated list per prompt; greedy."""
        model = self._require_model()
        prompts = [np.asarray(p, np.int32).reshape(-1) for p in input_ids]
        b = len(prompts)
        lens = np.array([len(p) for p in prompts], np.int32)
        max_len = self.max_seq_len or _bucket(
            int(lens.max()) + max_new_tokens + 1, 256)
        self._init_cache(b, max_len)

        bucket = min(_bucket(int(lens.max())), max_len)
        padded = np.zeros((b, bucket), np.int32)
        for i, p in enumerate(prompts):
            padded[i, :len(p)] = p

        logits = np.asarray(self._batch_prefill(padded, lens))
        poss = lens.copy()
        done = np.zeros(b, bool)
        outs: list[list[int]] = [[] for _ in range(b)]

        for _ in range(max_new_tokens):
            toks = logits.argmax(axis=-1).astype(np.int32)
            for i in range(b):
                if not done[i]:
                    outs[i].append(int(toks[i]))
                    self.stats.tokens_generated += 1
                    if eos_token_id is not None and toks[i] == eos_token_id:
                        done[i] = True
                    if poss[i] + 1 >= max_len:
                        done[i] = True
            self.stats.steps += 1
            if done.all() or len(outs[0]) >= max_new_tokens:
                break
            logits = np.asarray(self._batch_decode(toks, poss))
            poss = poss + 1
        return outs
