"""Continuous-batching serving engine.

Builds the serving loop the reference only shipped primitives for
(reference: bindings/continuous_batching.cpp:6-45 + archived demo): requests
join and leave the batch dynamically; every engine step advances all active
sequences by one token in a single fixed-shape executable.

TPU-native design: a fixed request-slot table (max_batch slots) so the step
executable never recompiles — inactive slots are masked by per-slot context
lengths. KV lives in slot-indexed fixed caches [B, L, MAX, Hk, D].
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax

from ..core.executable import capture
from .model import (
    CausalTransformerModel, _bucket, decode_step_fn, generate_scan_fn,
    prefill_fn,
)


def _prefill_into_slot_fn(cfg, params, k_pool, v_pool, tokens, true_len, slot):
    """Prefill one sequence directly into pool slot ``slot`` (traced scalar).

    One donated executable per prompt bucket — replaces two eager whole-pool
    copies per admission (the serving-throughput bottleneck at small
    batches)."""
    kc, vc, logits = prefill_fn(cfg, params, k_pool[slot], v_pool[slot],
                                tokens, true_len)
    k_pool = lax.dynamic_update_slice(
        k_pool, kc[None], (slot, 0, 0, 0, 0))
    v_pool = lax.dynamic_update_slice(
        v_pool, vc[None], (slot, 0, 0, 0, 0))
    return k_pool, v_pool, logits


@dataclass
class Request:
    request_id: int
    prompt: list[int]
    max_new_tokens: int = 64
    eos_token_id: int | None = None
    generated: list[int] = field(default_factory=list)
    done: bool = False
    slot: int = -1
    submitted_at: float = field(default_factory=time.time)
    first_token_at: float | None = None
    finished_at: float | None = None

    @property
    def ttft_s(self) -> float | None:
        if self.first_token_at is None:
            return None
        return self.first_token_at - self.submitted_at


@dataclass
class EngineStats:
    requests_submitted: int = 0
    requests_completed: int = 0
    steps: int = 0
    tokens_generated: int = 0
    prefills: int = 0


class ContinuousBatchingEngine:
    """Slot-based continuous batching over a CausalTransformerModel."""

    def __init__(self, model: CausalTransformerModel, max_batch: int = 8,
                 max_seq_len: int = 1024, steps_per_dispatch: int = 1,
                 temperature: float = 0.0, top_k: int = 0, seed: int = 0):
        self.model = model
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len
        self.temperature = temperature
        self.top_k = top_k
        self.seed = seed
        # >1 amortises dispatch latency: the whole batch advances N tokens in
        # one device-side loop (tokens past a request's EOS are discarded —
        # bounded overshoot traded for N-fold fewer host roundtrips)
        self.steps_per_dispatch = steps_per_dispatch
        cfg = model.config
        shape = (max_batch, cfg.num_layers, max_seq_len, cfg.num_kv_heads,
                 cfg.head_dim)
        self.k_cache = jnp.zeros(shape, model.dtype)
        self.v_cache = jnp.zeros(shape, model.dtype)
        self._slots: list[Request | None] = [None] * max_batch
        self._queue: list[Request] = []
        self._next_id = 1
        self._last_tokens = np.zeros(max_batch, np.int32)
        self._poss = np.zeros(max_batch, np.int32)
        self.stats = EngineStats()
        self._decode_exe = None
        self._prefill_exes: dict[int, object] = {}

    # -- request lifecycle -----------------------------------------------------

    def submit(self, prompt: list[int], max_new_tokens: int = 64,
               eos_token_id: int | None = None) -> Request:
        if len(prompt) >= self.max_seq_len:
            raise ValueError(
                f"prompt ({len(prompt)} tokens) exceeds engine max_seq_len "
                f"({self.max_seq_len})")
        req = Request(self._next_id, list(prompt), max_new_tokens,
                      eos_token_id)
        self._next_id += 1
        self._queue.append(req)
        self.stats.requests_submitted += 1
        return req

    def _free_slots(self) -> list[int]:
        return [i for i, r in enumerate(self._slots) if r is None]

    def _admit(self) -> None:
        """Move queued requests into free slots, running their prefills."""
        for slot in self._free_slots():
            if not self._queue:
                return
            req = self._queue.pop(0)
            req.slot = slot
            self._slots[slot] = req
            self._prefill_slot(slot, req)

    def _prefill_slot(self, slot: int, req: Request) -> None:
        model = self.model
        ids = np.asarray(req.prompt, np.int32)
        n = len(ids)
        bucket = min(_bucket(max(n, 8)), self.max_seq_len)
        if bucket not in self._prefill_exes:
            fn = functools.partial(_prefill_into_slot_fn, model.config)
            self._prefill_exes[bucket] = capture(
                fn, model.params, self.k_cache, self.v_cache,
                jnp.zeros((bucket,), jnp.int32), jnp.int32(1), jnp.int32(0),
                donate_argnums=(1, 2), name=f"serve_prefill_{bucket}")
        padded = np.zeros((bucket,), np.int32)
        padded[:n] = ids
        self.k_cache, self.v_cache, logits = self._prefill_exes[bucket].replay(
            model.params, self.k_cache, self.v_cache,
            jnp.asarray(padded), jnp.int32(n), jnp.int32(slot))
        if self.temperature > 0:
            from ..ops.sampling import sample_temperature_fn, sample_topk_fn
            key = jax.random.PRNGKey(self.seed + req.request_id)
            if self.top_k > 0:
                tok = int(sample_topk_fn(logits, key, self.top_k,
                                         self.temperature))
            else:
                tok = int(sample_temperature_fn(logits, key, self.temperature))
        else:
            tok = int(np.asarray(jnp.argmax(logits)))
        req.generated.append(tok)
        req.first_token_at = time.time()
        self._last_tokens[slot] = tok
        self._poss[slot] = n
        self.stats.prefills += 1
        self.stats.tokens_generated += 1
        self._maybe_finish(slot, tok)

    def _ensure_decode_exe(self):
        if self._decode_exe is None:
            n = self.steps_per_dispatch
            if n <= 1:
                fn = jax.vmap(
                    functools.partial(decode_step_fn, self.model.config),
                    in_axes=(None, 0, 0, 0, 0))
                self._decode_exe = capture(
                    fn, self.model.params, self.k_cache, self.v_cache,
                    jnp.zeros((self.max_batch,), jnp.int32),
                    jnp.zeros((self.max_batch,), jnp.int32),
                    donate_argnums=(1, 2), name="serve_decode")
            else:
                scan_fn = functools.partial(
                    generate_scan_fn, self.model.config, n,
                    float(self.temperature), int(self.top_k))
                fn = jax.vmap(scan_fn, in_axes=(None, 0, 0, 0, 0, 0))
                keys = jax.random.split(jax.random.PRNGKey(0), self.max_batch)
                self._decode_exe = capture(
                    fn, self.model.params, self.k_cache, self.v_cache,
                    jnp.zeros((self.max_batch,), jnp.int32),
                    jnp.zeros((self.max_batch,), jnp.int32), keys,
                    donate_argnums=(1, 2), name=f"serve_decode_{n}")
        return self._decode_exe

    def _maybe_finish(self, slot: int, tok: int) -> None:
        req = self._slots[slot]
        if req is None:
            return
        if ((req.eos_token_id is not None and tok == req.eos_token_id)
                or len(req.generated) >= req.max_new_tokens
                or self._poss[slot] + 1 >= self.max_seq_len):
            req.done = True
            req.finished_at = time.time()
            self._slots[slot] = None
            self.stats.requests_completed += 1

    # -- engine loop -------------------------------------------------------------

    def step(self) -> int:
        """Admit + advance every active slot by steps_per_dispatch tokens.
        Returns #active."""
        self._admit()
        active = [i for i, r in enumerate(self._slots) if r is not None]
        if not active:
            return 0
        exe = self._ensure_decode_exe()
        n = self.steps_per_dispatch
        if n <= 1:
            self.k_cache, self.v_cache, logits = exe.replay(
                self.model.params, self.k_cache, self.v_cache,
                jnp.asarray(self._last_tokens), jnp.asarray(self._poss))
            toks = np.asarray(jnp.argmax(logits, axis=-1))                 .astype(np.int32)[:, None]
        else:
            keys = jax.random.split(
                jax.random.PRNGKey(self.seed + self.stats.steps),
                self.max_batch)
            self.k_cache, self.v_cache, toks_b = exe.replay(
                self.model.params, self.k_cache, self.v_cache,
                jnp.asarray(self._last_tokens), jnp.asarray(self._poss), keys)
            toks = np.asarray(toks_b).astype(np.int32)     # [B, n]
        self.stats.steps += 1
        for i in active:
            req = self._slots[i]
            for j in range(toks.shape[1]):
                if req is None or req.done:
                    break
                tok = int(toks[i, j])
                self._poss[i] += 1
                req.generated.append(tok)
                self._last_tokens[i] = tok
                self.stats.tokens_generated += 1
                self._maybe_finish(i, tok)
                if self._slots[i] is None:
                    break
        return len(active)

    def run_until_complete(self, max_steps: int = 10000) -> None:
        for _ in range(max_steps):
            if not self._queue and all(r is None for r in self._slots):
                return
            self.step()

    @property
    def has_work(self) -> bool:
        return bool(self._queue) or any(r is not None for r in self._slots)
