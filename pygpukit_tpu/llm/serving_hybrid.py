"""Continuous batching for the standalone hybrid-cache model families.

The slot-table engine in ``serving.py`` is specialised to
``CausalTransformerModel``'s twin ``[B, L, MAX, Hk, D]`` KV pools. The
hybrid/recurrent families (Mamba, LFM2, Qwen3-Next) carry a *single*
per-layer cache pytree instead — conv tails ``[E, K]``, SSM / DeltaNet
recurrent states, and (for the hybrids) fixed KV caches side by side —
so batching them is a different shape problem: stack every cache leaf
with a leading slot axis and ``vmap`` the family's own ``decode_step_fn``
over slots.

That recurrent state is O(1) in context, which makes these families the
*cheapest* to batch-serve: a Mamba slot costs KBs of state regardless of
how long its sequence runs, where a transformer slot pins
``max_seq_len`` KV rows. (Reference ships continuous-batching primitives
only — bindings/continuous_batching.cpp:6-45; this engine and the dense
one in serving.py are the full loops built on that idea.)

Design (mirrors serving.py's non-pipelined engine semantics):
- fixed slot table (``max_batch``), so the chunk executable never
  recompiles; dead slots decode garbage that host bookkeeping discards
  (their positions clamp at ``max_seq_len - 1``);
- admission = one donated prefill-into-slot executable per prompt
  bucket: build the slot's fresh single-sequence cache inside the
  program, run the family's ``prefill_fn``, scatter every leaf into the
  batched pytree at ``slot``, and sample the first token on device;
- decode = one donated chunk executable: ``vmap`` of an
  ``n_steps``-token sampling scan over the family's ``decode_step_fn``.

Works with any ``StandaloneCachedModel`` subclass that exposes the
single-pytree cache hooks (``_decode_step_fn`` in addition to the base
``_prefill_fn``/``_init_caches``): MambaModel, Lfm2Model, Qwen3NextModel.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.executable import capture
from .model import _bucket, batched_trace
from .serving import EngineStats, Request, _sample_logits


def _admit_slot_fn(cfg, prefill_fn, temperature, top_k, seed,
                   params, caches_b, single_zeros, tokens, true_len,
                   slot, rid):
    """Prefill one sequence and scatter its cache pytree into slot ``slot``
    of the batched caches (donated); samples the first token on device.

    ``single_zeros`` (the fresh single-sequence cache) is a RUNTIME argument,
    not ``init_caches`` zeros materialised in-program: the XLA TPU while-loop
    simplifier miscompiles the zeros-init + in-loop dynamic_update_slice +
    scatter-to-batch pattern (flaky "wrong replacement" RET_CHECK at
    hlo_instruction.cc:3572 when caught; an uninitialised cache tail — Inf
    rows that NaN the next decode chunk — when not). The engine keeps one
    never-donated zeros pytree on device and passes it to every admit."""
    single, logits = prefill_fn(cfg, params, single_zeros, tokens, true_len)
    caches_b = jax.tree.map(
        lambda b, s: lax.dynamic_update_index_in_dim(
            b, s.astype(b.dtype), slot, 0),
        caches_b, single)
    key = jax.random.fold_in(jax.random.PRNGKey(seed), rid)
    tok = _sample_logits(logits, key, temperature, top_k)
    return caches_b, tok


def _hybrid_chunk_fn(cfg, step_fn, n_steps, temperature, top_k, seed,
                     max_seq_len, params, caches_b, last, poss, step_idx):
    """Advance every slot ``n_steps`` tokens: vmapped sampling scan over the
    family's single-step decode. Donated caches chain across chunks."""
    keys = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(seed), step_idx),
        last.shape[0])

    def slot_scan(caches, tok, pos, key):
        def body(carry, i):
            caches, tok, pos = carry
            caches, logits = step_fn(cfg, params, caches, tok, pos)
            nxt = _sample_logits(logits, jax.random.fold_in(key, i),
                                 temperature, top_k)
            return (caches, nxt, jnp.minimum(pos + 1, max_seq_len - 1)), nxt

        (caches, tok, pos), toks = lax.scan(
            body, (caches, tok, pos), jnp.arange(n_steps))
        return caches, toks

    caches_b, toks = jax.vmap(slot_scan)(caches_b, last, poss, keys)
    return caches_b, toks                                   # toks [B, n]


class HybridServingEngine:
    """Slot-based continuous batching over a StandaloneCachedModel."""

    def __init__(self, model, max_batch: int = 4, max_seq_len: int = 256,
                 steps_per_dispatch: int = 8, temperature: float = 0.0,
                 top_k: int = 0, seed: int = 0, mesh=None):
        """``mesh``: a jax.sharding.Mesh with a "tp" axis — serve the hybrid
        family TENSOR-PARALLEL (parallel.shard_hybrid_model places attention
        + MLP projections column/row over tp; recurrent mixer leaves stay
        replicated). Chunk/admit executables compile as GSPMD programs;
        token streams match the unsharded engine."""
        cls = type(model)
        for hook in ("_prefill_fn", "_decode_step_fn", "_init_caches"):
            if getattr(cls, hook, None) is None:
                raise TypeError(
                    f"{cls.__name__} does not expose {hook}; the hybrid "
                    "engine serves single-pytree StandaloneCachedModel "
                    "families (Mamba/LFM2/Qwen3Next)")
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import shard_hybrid_model
            shard_hybrid_model(model, mesh)
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len
        self.steps_per_dispatch = max(int(steps_per_dispatch), 1)
        self.temperature = temperature
        self.top_k = top_k
        self.seed = seed
        # stack every cache leaf with a leading slot axis (shape-only proto:
        # no single-sequence allocation)
        proto = jax.eval_shape(
            lambda: cls._init_caches(model.config, max_seq_len, model.dtype))
        self._caches = jax.tree.map(
            lambda s: jnp.zeros((max_batch,) + s.shape, s.dtype), proto)
        # fresh-slot cache passed into every admit replay (never donated);
        # see _admit_slot_fn for why this cannot be built in-program
        self._single_zeros = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), proto)
        self._slots: list[Request | None] = [None] * max_batch
        self._queue: list[Request] = []
        self._next_id = 1
        self._last_tokens = np.zeros(max_batch, np.int32)
        self._poss = np.zeros(max_batch, np.int32)
        self.stats = EngineStats()
        self._chunk_exe = None
        self._prefill_exes: dict[int, object] = {}

    # -- request lifecycle --------------------------------------------------

    def submit(self, prompt: list[int], max_new_tokens: int = 64,
               eos_token_id: int | None = None,
               on_token=None) -> Request:
        if len(prompt) >= self.max_seq_len:
            raise ValueError(
                f"prompt ({len(prompt)} tokens) exceeds engine max_seq_len "
                f"({self.max_seq_len})")
        req = Request(self._next_id, list(prompt), max_new_tokens,
                      eos_token_id, on_token=on_token)
        self._next_id += 1
        self._queue.append(req)
        self.stats.requests_submitted += 1
        return req

    def _emit(self, req: Request, tok: int) -> None:
        req.generated.append(tok)
        self.stats.tokens_generated += 1
        if req.on_token is not None:
            try:
                req.on_token(req, tok)
            except Exception:
                req.on_token = None

    def _free_slots(self) -> list[int]:
        return [i for i, r in enumerate(self._slots) if r is None]

    def _admit(self) -> None:
        for slot in self._free_slots():
            if not self._queue:
                break
            req = self._queue.pop(0)
            req.slot = slot
            self._slots[slot] = req
            self._prefill_slot(slot, req)

    def _prefill_slot(self, slot: int, req: Request) -> None:
        model = self.model
        cls = type(model)
        ids = np.asarray(req.prompt, np.int32)
        n = len(ids)
        bucket = min(_bucket(max(n, 8)), self.max_seq_len)
        if bucket not in self._prefill_exes:
            fn = functools.partial(
                _admit_slot_fn, model.config,
                cls._prefill_fn, float(self.temperature), int(self.top_k),
                int(self.seed))
            self._prefill_exes[bucket] = capture(
                fn, model.params, self._caches, self._single_zeros,
                jnp.zeros((bucket,), jnp.int32), jnp.int32(1), jnp.int32(0),
                jnp.int32(0), donate_argnums=(1,),
                name=f"{cls._name}_serve_prefill_{bucket}")
        padded = np.zeros((bucket,), np.int32)
        padded[:n] = ids
        self._caches, tok = self._prefill_exes[bucket].replay(
            model.params, self._caches, self._single_zeros,
            jnp.asarray(padded), jnp.int32(n),
            jnp.int32(slot), jnp.int32(req.request_id))
        tok = int(np.asarray(tok))
        self._emit(req, tok)
        req.first_token_at = time.time()
        self._last_tokens[slot] = tok
        self._poss[slot] = n
        self.stats.prefills += 1
        self._maybe_finish(slot, tok)

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

    # -- engine loop ----------------------------------------------------------

    def _ensure_chunk_exe(self):
        if self._chunk_exe is None:
            cls = type(self.model)
            fn = functools.partial(
                _hybrid_chunk_fn, self.model.config, cls._decode_step_fn,
                self.steps_per_dispatch, float(self.temperature),
                int(self.top_k), int(self.seed), int(self.max_seq_len))
            with batched_trace():
                self._chunk_exe = capture(
                    fn, self.model.params, self._caches,
                    jnp.zeros((self.max_batch,), jnp.int32),
                    jnp.zeros((self.max_batch,), jnp.int32), jnp.int32(0),
                    donate_argnums=(1,),
                    name=f"{cls._name}_serve_chunk_"
                         f"{self.steps_per_dispatch}")
        return self._chunk_exe

    def step(self) -> int:
        """Admit queued requests, then advance every slot by
        ``steps_per_dispatch`` tokens. Returns #active slots."""
        self._admit()
        active = [i for i, r in enumerate(self._slots) if r is not None]
        if not active:
            return 0
        exe = self._ensure_chunk_exe()
        self._caches, toks_b = exe.replay(
            self.model.params, self._caches,
            jnp.asarray(self._last_tokens), jnp.asarray(self._poss),
            jnp.int32(self.stats.steps))
        toks = np.asarray(toks_b).astype(np.int32)           # [B, n]
        self.stats.steps += 1
        for i in active:
            req = self._slots[i]
            for j in range(toks.shape[1]):
                if req is None or req.done:
                    break
                tok = int(toks[i, j])
                self._poss[i] = min(self._poss[i] + 1, self.max_seq_len - 1)
                self._emit(req, tok)
                self._last_tokens[i] = tok
                self._maybe_finish(i, tok)
                if self._slots[i] is None:
                    break
        return len(active)

    def run_until_complete(self, max_steps: int = 10000) -> None:
        for _ in range(max_steps):
            if not self.has_work():
                return
            self.step()
        raise RuntimeError(f"engine did not drain in {max_steps} steps")

    def has_work(self) -> bool:
        return bool(self._queue) or any(r is not None for r in self._slots)
