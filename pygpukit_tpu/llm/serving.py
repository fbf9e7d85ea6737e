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
from ..ops.embedding import kv_cache_zeros
from .model import (
    CausalTransformerModel, _bucket, batch_decode_step_fn,
    batch_generate_scan_fn, batched_trace, decode_step_fn,
    generate_scan_fn, prefill_fn,
)


def _slot_cache(pool, slot, head_dim):
    """[L, MAX, Hk, D] cache view of dense pool slot ``slot``.

    Merged pools ([B, L, MAX, Hk*D], the batch-rows serving layout) un-merge
    here — a SLOT-sized relayout once per admission, vs per-layer-per-step
    pool-sized copies if the decode step had to merge instead. int8 dict
    pools ({"q","s"}) slice both leaves; the scale rows need no un-merge."""
    if isinstance(pool, dict):
        return {"q": _slot_cache(pool["q"], slot, head_dim),
                "s": pool["s"][slot]}
    c = pool[slot]
    if pool.ndim == 4:
        return c.reshape(c.shape[0], c.shape[1], -1, head_dim)
    return c


def _pool_write_slot(pool, cache, slot):
    """Write a [L, MAX, Hk, D] slot cache back into a dense pool of either
    layout (merged pools re-merge the slot first; int8 dicts write both
    leaves)."""
    if isinstance(pool, dict):
        return {"q": _pool_write_slot(pool["q"], cache["q"], slot),
                "s": _pool_write_slot(pool["s"], cache["s"], slot)}
    if pool.ndim == 4 and cache.ndim == 4:      # merged KV rows
        cache = cache.reshape(cache.shape[0], cache.shape[1], -1)
    return lax.dynamic_update_slice(
        pool, cache[None], (slot,) + (0,) * (pool.ndim - 1))


def _prefill_into_slot_fn(cfg, params, k_pool, v_pool, tokens, true_len, slot):
    """Prefill one sequence directly into pool slot ``slot`` (traced scalar).

    One donated executable per prompt bucket — replaces two eager whole-pool
    copies per admission (the serving-throughput bottleneck at small
    batches)."""
    kc, vc, logits = prefill_fn(cfg, params,
                                _slot_cache(k_pool, slot, cfg.head_dim),
                                _slot_cache(v_pool, slot, cfg.head_dim),
                                tokens, true_len)
    k_pool = _pool_write_slot(k_pool, kc, slot)
    v_pool = _pool_write_slot(v_pool, vc, slot)
    return k_pool, v_pool, logits


def _sample_logits(logits, key, temperature: float, top_k: int):
    if temperature <= 0.0:
        return jnp.argmax(logits).astype(jnp.int32)
    lf = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        topv, _ = lax.top_k(lf, top_k)
        lf = jnp.where(lf < topv[-1], -1e30, lf)
    return jax.random.categorical(key, lf).astype(jnp.int32)


def _prefill_into_slot_pl_fn(cfg, temperature, top_k, seed, params, k_pool,
                             v_pool, last, poss, tokens, true_len, slot, rid):
    """Pipelined-mode prefill: also samples the first token ON DEVICE and
    writes it into the device-resident last/poss slot arrays — admission
    becomes one async dispatch (no eager argmax, no host sync)."""
    kc, vc, logits = prefill_fn(cfg, params,
                                _slot_cache(k_pool, slot, cfg.head_dim),
                                _slot_cache(v_pool, slot, cfg.head_dim),
                                tokens, true_len)
    k_pool = _pool_write_slot(k_pool, kc, slot)
    v_pool = _pool_write_slot(v_pool, vc, slot)
    key = jax.random.fold_in(jax.random.PRNGKey(seed), rid)
    tok = _sample_logits(logits, key, temperature, top_k)
    last = last.at[slot].set(tok)
    poss = poss.at[slot].set(true_len.astype(jnp.int32))
    return k_pool, v_pool, last, poss, tok


def _prefill_wave_pl_fn(cfg, temperature, top_k, seed, n_wave, params,
                        k_pool, v_pool, last, poss, tokens_w, lens_w,
                        slots_w, rids_w):
    """Pipelined admission WAVE: prefill ``n_wave`` same-bucket requests in
    ONE dispatch (VERDICT: prefill wave stagger was ~a quarter of the gap to
    the chunk ceiling — one executable replaces n_wave dispatches)."""
    def body(i, carry):
        k_pool, v_pool, last, poss, toks = carry
        k_pool, v_pool, last, poss, tok = _prefill_into_slot_pl_fn(
            cfg, temperature, top_k, seed, params, k_pool, v_pool, last,
            poss, tokens_w[i], lens_w[i], slots_w[i], rids_w[i])
        return k_pool, v_pool, last, poss, toks.at[i].set(tok)

    toks0 = jnp.zeros((n_wave,), jnp.int32)
    return lax.fori_loop(0, n_wave, body,
                         (k_pool, v_pool, last, poss, toks0))


def _serve_chunk_fn(cfg, n_steps, temperature, top_k, seed, max_seq_len,
                    params, k_pool, v_pool, last, poss, step_idx):
    """Advance every slot ``n_steps`` tokens with DEVICE-resident last/poss.

    The executable chains on its own previous outputs (donated), so the host
    can dispatch chunk N+1 before reading chunk N's tokens — the D2H sync
    (~36 ms over a remote tunnel) overlaps chunk N+1's compute instead of
    serialising with it. Dead slots decode garbage with positions clamped at
    max_seq_len-1; their tokens are discarded by host bookkeeping."""
    b = last.shape[0]
    keys = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(seed), step_idx), b)
    fn = jax.vmap(
        functools.partial(generate_scan_fn, cfg, n_steps, temperature, top_k),
        in_axes=(None, 0, 0, 0, 0, 0))
    k_pool, v_pool, toks = fn(params, k_pool, v_pool, last, poss, keys)
    last = toks[:, -1].astype(jnp.int32)
    poss = jnp.minimum(poss + n_steps, max_seq_len - 1)
    return k_pool, v_pool, last, poss, toks


def _serve_chunk_batch_fn(cfg, n_steps, temperature, top_k, seed,
                          max_seq_len, params, k_pool, v_pool, last, poss,
                          step_idx):
    """_serve_chunk_fn with the BATCH-ROWS step (batch_generate_scan_fn):
    all slots' hidden rows ride one weight stream per matmul instead of a
    vmapped per-slot re-trace. Token streams are identical (same per-slot
    PRNG sequence); kernel routing differs — the Pallas quantized GEMVs
    stay eligible, with the batch rows carried as extra sublane rows in the
    SAME kernel invocation (rows<=8), where vmap forced the XLA fallback."""
    b = last.shape[0]
    keys = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(seed), step_idx), b)
    k_pool, v_pool, toks = batch_generate_scan_fn(
        cfg, n_steps, temperature, top_k, params, k_pool, v_pool, last,
        poss, keys)
    last = toks[:, -1].astype(jnp.int32)
    poss = jnp.minimum(poss + n_steps, max_seq_len - 1)
    return k_pool, v_pool, last, poss, toks


@dataclass
class Request:
    request_id: int
    prompt: list[int]
    max_new_tokens: int = 64
    eos_token_id: int | None = None
    generated: list[int] = field(default_factory=list)
    done: bool = False
    slot: int = -1
    pos: int = 0                 # this request's own sequence position
    on_token: Callable | None = None   # streaming callback(request, token)
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
                 temperature: float = 0.0, top_k: int = 0, seed: int = 0,
                 pipelined: bool = False, paged: bool = False,
                 block_size: int = 16, num_blocks: int | None = None,
                 mesh=None):
        """``mesh``: a jax.sharding.Mesh with a "tp" axis — serve a
        TENSOR-PARALLEL model (params sharded via parallel.shard_model, KV
        pools sharded over kv heads). The step executables compile as GSPMD
        programs with XLA-inserted collectives; token streams are identical
        to the unsharded engine (BASELINE.md v5e-8 north star wiring)."""
        self.model = model
        self.mesh = mesh
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len
        self.temperature = temperature
        self.top_k = top_k
        self.seed = seed
        # >1 amortises dispatch latency: the whole batch advances N tokens in
        # one device-side loop (tokens past a request's EOS are discarded —
        # bounded overshoot traded for N-fold fewer host roundtrips)
        self.steps_per_dispatch = steps_per_dispatch
        # pipelined: last_tokens/poss live ON DEVICE and chunk N+1 dispatches
        # before chunk N's tokens are read back — the D2H sync overlaps
        # compute. Token streams are identical; bookkeeping (EOS detection,
        # admissions, TTFT) lags one chunk behind the device.
        self.pipelined = pipelined
        cfg = model.config
        self.paged = paged
        # batch-rows vs vmapped chunk step (PYGPUKIT_SERVING_STEP=
        # batch|vmap|auto). auto: batch-rows on TPU — measured faster for
        # every format (same-process batch-8 A/B, scripts/
        # micro_serving_batchrows.py: int4 1827 vs 1403-1516 vmapped — the
        # stacked Pallas w4a8 GEMV carries all 8 slot rows in ONE call where
        # vmap forced the XLA dequant fallback — and int8 1711 vs 1655).
        # Paged mode: the paged step ALREADY batches the weight matmuls
        # over all slot rows (paged_decode_step_fn takes [B] tokens and is
        # never vmapped over slots) — there the flag only controls whether
        # the chunk capture is marked batched_trace(), i.e. whether _mm
        # routes packed-int4 leaves to the stacked Pallas GEMV (batch) or
        # the XLA dequant dot (vmap). batch-rows is the default on TPU for
        # paged too (VERDICT r4 #1: int4 throughput riding paged KV).
        # (Computed before pool allocation: batch-rows decides the dense
        # pool layout below.)
        import os
        _mode = os.environ.get("PYGPUKIT_SERVING_STEP", "auto")
        if _mode == "auto":
            from ..core.backend import get_backend
            self._batch_rows = get_backend().platform == "tpu"
        else:
            self._batch_rows = _mode == "batch"
        if mesh is not None or getattr(model, "xla_mm_only", False):
            # mesh serving compiles GSPMD programs: keep the vmapped chunk
            # with batched_trace-marked captures so every matmul stays a
            # plain XLA dot the partitioner can cut (the batch-rows Pallas
            # kernels are single-chip; model.xla_mm_only guards the model's
            # own captures the same way — and a model whose params were
            # sharded via parallel.shard_model sets it even when the engine
            # is built WITHOUT mesh=, so the single-chip Pallas step must
            # not capture over GSPMD-sharded leaves)
            self._batch_rows = False
        # merged dense pools [B, L, MAX, Hk*D] for the batch-rows step at
        # MAX >= 1024 (the Pallas batched-attention regime): the kernel's
        # operand IS the merged view, so no relayout ever materialises.
        # Merging the 5-d pools per attention call instead costs XLA two
        # full-pool layout-conversion copies per pool PER LAYER (device-
        # traced at batch-8 MAX=4096: 122 ms/step — 20x the whole step).
        self._merged_pools = (self._batch_rows and not paged
                              and max_seq_len >= 1024)
        if paged:
            # paged mode: ONE shared block pool + per-slot block tables —
            # KV HBM scales with allocated blocks, not max_batch*max_seq
            # (reference: paged_attention.cuh block tables, never wired
            # there; serving_paged.py). Block 0 = trash for dead slots.
            from .serving_paged import BlockAllocator
            self.block_size = block_size
            self.max_blocks = -(-max_seq_len // block_size)
            # default pool covers the worst case (admission reserves each
            # request's full need up front); size num_blocks to the expected
            # ACTUAL usage to realise the paged-HBM savings
            nb = num_blocks or (max_batch * self.max_blocks + 2)
            pool_shape = (cfg.num_layers, nb, cfg.num_kv_heads, block_size,
                          cfg.head_dim)
            if jnp.dtype(model.kv_dtype) == jnp.int8:
                # int8 dict block pools: scale rows [L, NB, BS]
                # (serving_paged._paged_write_rows / _paged_gather)
                self.k_cache = {
                    "q": jnp.zeros(pool_shape, jnp.int8),
                    "s": jnp.zeros((cfg.num_layers, nb, block_size),
                                   jnp.bfloat16)}
                self.v_cache = jax.tree.map(jnp.zeros_like, self.k_cache)
            else:
                self.k_cache = jnp.zeros(pool_shape, model.kv_dtype)
                self.v_cache = jnp.zeros(pool_shape, model.kv_dtype)
            self._alloc = BlockAllocator(nb, block_size)
            self._tables_np = np.zeros((max_batch, self.max_blocks), np.int32)
            self._tables_dev = jnp.asarray(self._tables_np)
            self._tables_dirty = False
        else:
            if self._merged_pools:
                shape = (max_batch, cfg.num_layers, max_seq_len,
                         cfg.num_kv_heads * cfg.head_dim)
            else:
                shape = (max_batch, cfg.num_layers, max_seq_len,
                         cfg.num_kv_heads, cfg.head_dim)
            self.k_cache = kv_cache_zeros(shape, model.kv_dtype,
                                          merged=self._merged_pools)
            self.v_cache = kv_cache_zeros(shape, model.kv_dtype,
                                          merged=self._merged_pools)
        self._slots: list[Request | None] = [None] * max_batch
        self._queue: list[Request] = []
        self._next_id = 1
        self._last_tokens = np.zeros(max_batch, np.int32)
        self._poss = np.zeros(max_batch, np.int32)
        self.stats = EngineStats()
        self._decode_exe = None
        self._prefill_exes: dict[int, object] = {}
        # chunked-512 decode attention for dense-pool captures at
        # MAX >= 1024: the kv-chunk LSE path reads (and fp8-converts) only
        # live chunks where the full softmax streams the whole preallocated
        # pool every step (batch-8 MAX=4096 same-process A/B: bf16
        # 1010 -> 1234 tok/s, fp8-KV 665 -> 820; scripts/
        # micro_serving_kv8.py). PYGPUKIT_FLASH_DECODING[_CHUNK] env
        # overrides still take precedence inside ops.nn.attention.
        self._attn_pref = (("chunked", 512)
                           if not paged and max_seq_len >= 1024 else None)
        if pipelined:
            self._last_dev = jnp.zeros(max_batch, jnp.int32)
            self._poss_dev = jnp.zeros(max_batch, jnp.int32)
            self._inflight = None            # (toks_dev, [(slot, req), ...])
            self._pending_first: list = []   # [(req, prompt_len, tok_dev)]
        if mesh is not None:
            self._shard_pools(mesh)

    def _mm_guard_ctx(self):
        """batched_trace when captures must avoid the single-chip Pallas
        matmul kernels: mesh serving / sharded model params compile GSPMD
        programs whose dots the partitioner cuts — a pallas_call would be
        replicated with all-gathered weights. Applied to prefill captures
        (the chunk captures route through _paged_trace_ctx / the vmapped
        branch, already marked)."""
        import contextlib
        if self.mesh is not None or getattr(self.model, "xla_mm_only",
                                            False):
            return batched_trace()
        return contextlib.nullcontext()

    def _shard_pools(self, mesh) -> None:
        """Shard the KV pools over the mesh "tp" axis along kv heads (dense
        pool [B,L,MAX,Hk,D] / paged pool [L,NB,Hk,BS,D]); kv-head TP matches
        the column-parallel q/k/v projections so attention stays local."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        hk = self.model.config.num_kv_heads
        tp = mesh.shape.get("tp", 1)
        if hk % tp != 0:
            raise ValueError(
                f"num_kv_heads ({hk}) must divide by mesh tp ({tp}) for "
                "sharded serving")
        spec = (P(None, None, "tp", None, None) if self.paged
                else P(None, None, None, "tp", None))
        sh = NamedSharding(mesh, spec)

        def put(pool):
            if isinstance(pool, dict):       # int8: scale rows replicate
                return {"q": jax.device_put(pool["q"], sh),
                        "s": jax.device_put(
                            pool["s"], NamedSharding(mesh, P(None)))}
            return jax.device_put(pool, sh)
        self.k_cache = put(self.k_cache)
        self.v_cache = put(self.v_cache)
        rep = NamedSharding(mesh, P(None))
        if self.pipelined:
            self._last_dev = jax.device_put(self._last_dev, rep)
            self._poss_dev = jax.device_put(self._poss_dev, rep)
        if self.paged:
            self._tables_dev = jax.device_put(self._tables_dev,
                                              NamedSharding(mesh, P(None, None)))

    # -- request lifecycle -----------------------------------------------------

    def submit(self, prompt: list[int], max_new_tokens: int = 64,
               eos_token_id: int | None = None,
               on_token: Callable | None = None) -> Request:
        if len(prompt) >= self.max_seq_len:
            raise ValueError(
                f"prompt ({len(prompt)} tokens) exceeds engine max_seq_len "
                f"({self.max_seq_len})")
        req = Request(self._next_id, list(prompt), max_new_tokens,
                      eos_token_id, on_token=on_token)
        if self.paged:
            need = self._paged_need(req)
            if need > self._alloc.num_blocks - 1:
                raise MemoryError(
                    f"request needs {need} KV blocks; pool has "
                    f"{self._alloc.num_blocks - 1} usable — raise num_blocks"
                    f" or lower max_new_tokens")
        self._next_id += 1
        self._queue.append(req)
        self.stats.requests_submitted += 1
        return req

    def _emit(self, req: Request, tok: int) -> None:
        """Append a token and fire the streaming callback (a raising
        callback is disabled, never allowed to kill the batch loop)."""
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
        """Move queued requests into free slots, running their prefills.
        Pipelined mode batches same-bucket admissions into one wave
        dispatch (_prefill_wave_pl_fn)."""
        pairs = []
        for slot in self._free_slots():
            if not self._queue:
                break
            if self.paged and not self._can_admit_paged(self._queue[0]):
                break                      # pool busy: admit when blocks free
            req = self._queue.pop(0)
            req.slot = slot
            self._slots[slot] = req
            pairs.append((slot, req))
        self._dispatch_prefills(pairs)

    def _dispatch_prefills(self, pairs: list) -> None:
        """Run prefills for (slot, request) pairs, wave-batching same-bucket
        groups into one executable in pipelined mode (one dispatch + one
        batched forward instead of N serialized ones)."""
        if not pairs:
            return
        if self.pipelined and len(pairs) >= 2:
            by_bucket: dict[int, list] = {}
            for slot, req in pairs:
                b = min(_bucket(max(len(req.prompt), 8)), self.max_seq_len)
                by_bucket.setdefault(b, []).append((slot, req))
            for bucket, group in by_bucket.items():
                # power-of-two sub-waves bound the executable key space to
                # {2, 4, 8, ...} per bucket: each fresh wave SIZE compiles a
                # fresh wave executable, and on mixed traffic those compiles
                # land MID-WORKLOAD (traced at 1.7-4.6 s spikes per size,
                # scripts/micro_mixed_chunkwall.py — the difference between
                # 516 and ~1700 tok/s on the honest-traffic bench row).
                # Splitting trades one extra async dispatch per odd-sized
                # wave for a bounded, warmup()-able key set.
                i = 0
                while len(group) - i >= 2:
                    w = 1 << ((len(group) - i).bit_length() - 1)
                    sub = group[i:i + w]
                    if self.paged:
                        self._prefill_wave_paged_pl(bucket, sub)
                    else:
                        self._prefill_wave_pl(bucket, sub)
                    i += w
                for pair in group[i:]:
                    self._prefill_slot(*pair)
            return
        for slot, req in pairs:
            self._prefill_slot(slot, req)

    def _ensure_wave_exe_pl(self, w: int, bucket: int):
        key = ("plw", w, bucket)
        if key not in self._prefill_exes:
            fn = functools.partial(_prefill_wave_pl_fn, self.model.config,
                                   float(self.temperature), int(self.top_k),
                                   int(self.seed), w)
            with self._mm_guard_ctx():
                self._prefill_exes[key] = capture(
                fn, self.model.params, self.k_cache, self.v_cache,
                self._last_dev, self._poss_dev,
                jnp.zeros((w, bucket), jnp.int32),
                jnp.ones((w,), jnp.int32), jnp.zeros((w,), jnp.int32),
                jnp.zeros((w,), jnp.int32), donate_argnums=(1, 2, 3, 4),
                name=f"serve_prefill_wave_{w}_{bucket}")
        return self._prefill_exes[key]

    def _prefill_wave_pl(self, bucket: int, group: list) -> None:
        w = len(group)
        exe = self._ensure_wave_exe_pl(w, bucket)
        padded = np.zeros((w, bucket), np.int32)
        lens = np.zeros((w,), np.int32)
        slots = np.zeros((w,), np.int32)
        rids = np.zeros((w,), np.int32)
        for i, (slot, req) in enumerate(group):
            ids = np.asarray(req.prompt, np.int32)
            padded[i, :len(ids)] = ids
            lens[i] = len(ids)
            slots[i] = slot
            rids[i] = req.request_id
        (self.k_cache, self.v_cache, self._last_dev, self._poss_dev,
         toks_dev) = exe.replay(
            self.model.params, self.k_cache, self.v_cache,
            self._last_dev, self._poss_dev, jnp.asarray(padded),
            jnp.asarray(lens), jnp.asarray(slots), jnp.asarray(rids))
        for i, (slot, req) in enumerate(group):
            self._poss[slot] = int(lens[i])
            req.pos = int(lens[i])
            self._pending_first.append((req, toks_dev[i]))
            self.stats.prefills += 1

    def _prefill_slot(self, slot: int, req: Request) -> None:
        if self.pipelined:
            return self._prefill_slot_pl(slot, req)
        if self.paged:
            return self._prefill_slot_paged(slot, req)
        model = self.model
        ids = np.asarray(req.prompt, np.int32)
        n = len(ids)
        bucket = min(_bucket(max(n, 8)), self.max_seq_len)
        if bucket not in self._prefill_exes:
            fn = functools.partial(_prefill_into_slot_fn, model.config)
            with self._mm_guard_ctx():
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
        self._emit(req, tok)
        req.first_token_at = time.time()
        self._last_tokens[slot] = tok
        self._poss[slot] = n
        self.stats.prefills += 1
        self._maybe_finish(slot, tok)

    def _ensure_prefill_exe_pl(self, bucket: int):
        key = ("pl", bucket)
        if key not in self._prefill_exes:
            model = self.model
            fn = functools.partial(_prefill_into_slot_pl_fn, model.config,
                                   float(self.temperature), int(self.top_k),
                                   int(self.seed))
            with self._mm_guard_ctx():
                self._prefill_exes[key] = capture(
                fn, model.params, self.k_cache, self.v_cache,
                self._last_dev, self._poss_dev,
                jnp.zeros((bucket,), jnp.int32), jnp.int32(1), jnp.int32(0),
                jnp.int32(0), donate_argnums=(1, 2, 3, 4),
                name=f"serve_prefill_pl_{bucket}")
        return self._prefill_exes[key]

    def _prefill_slot_pl(self, slot: int, req: Request) -> None:
        """Pipelined admission: one async dispatch; the first token is read
        back lazily at the next chunk resolution (by then it is long
        computed, so the D2H is a cheap buffer fetch, not a sync)."""
        if self.paged:
            return self._prefill_slot_paged_pl(slot, req)
        model = self.model
        ids = np.asarray(req.prompt, np.int32)
        n = len(ids)
        bucket = min(_bucket(max(n, 8)), self.max_seq_len)
        exe = self._ensure_prefill_exe_pl(bucket)
        padded = np.zeros((bucket,), np.int32)
        padded[:n] = ids
        (self.k_cache, self.v_cache, self._last_dev, self._poss_dev,
         tok_dev) = exe.replay(
            model.params, self.k_cache, self.v_cache,
            self._last_dev, self._poss_dev,
            jnp.asarray(padded), jnp.int32(n), jnp.int32(slot),
            jnp.int32(req.request_id))
        self._poss[slot] = n
        req.pos = n          # per-request (slots may be reused before the
        self._pending_first.append((req, tok_dev))   # old request resolves)
        self.stats.prefills += 1

    def _ensure_prefill_exe_paged_pl(self, bucket: int):
        from .serving_paged import paged_prefill_pl_fn
        key = ("paged-pl", bucket)
        if key not in self._prefill_exes:
            model = self.model
            fn = functools.partial(paged_prefill_pl_fn, model.config,
                                   float(self.temperature), int(self.top_k),
                                   int(self.seed))
            with self._mm_guard_ctx():
                self._prefill_exes[key] = capture(
                fn, model.params, self.k_cache, self.v_cache,
                self._last_dev, self._poss_dev, self._tables_dev[0],
                jnp.zeros((bucket,), jnp.int32), jnp.int32(1), jnp.int32(0),
                jnp.int32(0), donate_argnums=(1, 2, 3, 4),
                name=f"serve_prefill_paged_pl_{bucket}")
        return self._prefill_exes[key]

    def _prefill_slot_paged_pl(self, slot: int, req: Request) -> None:
        """Pipelined + paged admission: reserve blocks, sync tables, then
        one async prefill dispatch that samples the first token on device
        (VERDICT r2 #2 — the paged twin of _prefill_slot_pl)."""
        model = self.model
        ids = np.asarray(req.prompt, np.int32)
        n = len(ids)
        self._ensure_blocks(
            req, slot, len(req.prompt) + req.max_new_tokens + 1)
        self._sync_tables()
        bucket = min(_bucket(max(n, 8)), self.max_seq_len)
        exe = self._ensure_prefill_exe_paged_pl(bucket)
        padded = np.zeros((bucket,), np.int32)
        padded[:n] = ids
        (self.k_cache, self.v_cache, self._last_dev, self._poss_dev,
         tok_dev) = exe.replay(
            model.params, self.k_cache, self.v_cache,
            self._last_dev, self._poss_dev, self._tables_dev[slot],
            jnp.asarray(padded), jnp.int32(n), jnp.int32(slot),
            jnp.int32(req.request_id))
        self._poss[slot] = n
        req.pos = n
        self._pending_first.append((req, tok_dev))
        self.stats.prefills += 1

    def _ensure_wave_exe_paged_pl(self, w: int, bucket: int):
        from .serving_paged import paged_prefill_wave_pl_fn
        key = ("paged-plw", w, bucket)
        if key not in self._prefill_exes:
            fn = functools.partial(paged_prefill_wave_pl_fn,
                                   self.model.config,
                                   float(self.temperature), int(self.top_k),
                                   int(self.seed), w)
            with self._mm_guard_ctx():
                self._prefill_exes[key] = capture(
                fn, self.model.params, self.k_cache, self.v_cache,
                self._last_dev, self._poss_dev,
                jnp.zeros((w, self.max_blocks), jnp.int32),
                jnp.zeros((w, bucket), jnp.int32),
                jnp.ones((w,), jnp.int32), jnp.zeros((w,), jnp.int32),
                jnp.zeros((w,), jnp.int32), donate_argnums=(1, 2, 3, 4),
                name=f"serve_prefill_paged_plw_{w}_{bucket}")
        return self._prefill_exes[key]

    def _prefill_wave_paged_pl(self, bucket: int, group: list) -> None:
        """Wave admission into blocks: n same-bucket paged prefills in one
        dispatch (VERDICT r2 #2: 'wave prefill into blocks')."""
        w = len(group)
        for slot, req in group:
            self._ensure_blocks(
                req, slot, len(req.prompt) + req.max_new_tokens + 1)
        self._sync_tables()
        exe = self._ensure_wave_exe_paged_pl(w, bucket)
        padded = np.zeros((w, bucket), np.int32)
        lens = np.zeros((w,), np.int32)
        slots = np.zeros((w,), np.int32)
        rids = np.zeros((w,), np.int32)
        tables_w = np.zeros((w, self.max_blocks), np.int32)
        for i, (slot, req) in enumerate(group):
            ids = np.asarray(req.prompt, np.int32)
            padded[i, :len(ids)] = ids
            lens[i] = len(ids)
            slots[i] = slot
            rids[i] = req.request_id
            tables_w[i] = self._tables_np[slot]
        (self.k_cache, self.v_cache, self._last_dev, self._poss_dev,
         toks_dev) = exe.replay(
            self.model.params, self.k_cache, self.v_cache,
            self._last_dev, self._poss_dev, jnp.asarray(tables_w),
            jnp.asarray(padded), jnp.asarray(lens), jnp.asarray(slots),
            jnp.asarray(rids))
        for i, (slot, req) in enumerate(group):
            self._poss[slot] = int(lens[i])
            req.pos = int(lens[i])
            self._pending_first.append((req, toks_dev[i]))
            self.stats.prefills += 1

    # -- paged mode --------------------------------------------------------------

    def _sync_tables(self) -> None:
        if self._tables_dirty:
            self._tables_dev = jnp.asarray(self._tables_np)
            self._tables_dirty = False

    def _paged_need(self, req: Request) -> int:
        """Worst-case blocks this request can ever need (context-clamped)."""
        n = min(len(req.prompt) + req.max_new_tokens + 1, self.max_seq_len)
        return -(-n // self.block_size)

    def _can_admit_paged(self, req: Request) -> bool:
        """Reserve the FULL worst case at admission: mid-flight growth then
        never exhausts the pool (grow-on-demand dies with a MemoryError in
        the middle of a serve chunk). Never-fitting requests are rejected
        at submit()."""
        return self._paged_need(req) <= self._alloc.free_blocks

    def _ensure_blocks(self, req: Request, slot: int, n_tokens: int) -> None:
        n_tokens = min(n_tokens, self.max_seq_len)   # table capacity
        blocks = self._alloc.alloc_for(req.request_id, n_tokens)
        row = self._tables_np[slot]
        if not np.array_equal(row[:len(blocks)], blocks):
            row[:] = 0
            row[:len(blocks)] = blocks
            self._tables_dirty = True

    def _release_paged(self, req: Request, slot: int) -> None:
        self._alloc.free(req.request_id)
        self._tables_np[slot] = 0          # clamped writes land in trash
        self._tables_dirty = True

    def _prefill_slot_paged(self, slot: int, req: Request) -> None:
        from .serving_paged import paged_prefill_fn
        model = self.model
        ids = np.asarray(req.prompt, np.int32)
        n = len(ids)
        # reserve the full worst case up front (see _can_admit_paged)
        self._ensure_blocks(
            req, slot, len(req.prompt) + req.max_new_tokens + 1)
        self._sync_tables()
        bucket = min(_bucket(max(n, 8)), self.max_seq_len)
        key = ("paged", bucket)
        if key not in self._prefill_exes:
            fn = functools.partial(paged_prefill_fn, model.config)
            with self._mm_guard_ctx():
                self._prefill_exes[key] = capture(
                fn, model.params, self.k_cache, self.v_cache,
                self._tables_dev[0], jnp.zeros((bucket,), jnp.int32),
                jnp.int32(1), donate_argnums=(1, 2),
                name=f"serve_prefill_paged_{bucket}")
        padded = np.zeros((bucket,), np.int32)
        padded[:n] = ids
        self.k_cache, self.v_cache, logits = self._prefill_exes[key].replay(
            model.params, self.k_cache, self.v_cache,
            self._tables_dev[slot], jnp.asarray(padded), jnp.int32(n))
        if self.temperature > 0:
            key_s = jax.random.PRNGKey(self.seed + req.request_id)
            tok = int(np.asarray(_sample_logits(
                logits, key_s, self.temperature, self.top_k)))
        else:
            tok = int(np.asarray(jnp.argmax(logits)))
        self._emit(req, tok)
        req.first_token_at = time.time()
        self._last_tokens[slot] = tok
        self._poss[slot] = n
        self.stats.prefills += 1
        self._maybe_finish(slot, tok)

    def _paged_trace_ctx(self):
        """batched_trace marking for paged chunk captures: batch-rows mode
        leaves the trace unmarked — the paged step feeds real [B, E] rows
        to _mm, so the stacked Pallas quantized GEMVs stay eligible and
        carry all slot rows in one call (the dense batch-rows rung riding
        the paged pool). vmap mode keeps the conservative XLA routing."""
        import contextlib
        return contextlib.nullcontext() if self._batch_rows \
            else batched_trace()

    def _ensure_paged_chunk_exe(self):
        if self._decode_exe is None:
            from .serving_paged import paged_serve_chunk_fn
            n = max(self.steps_per_dispatch, 1)
            fn = functools.partial(
                paged_serve_chunk_fn, self.model.config, n,
                float(self.temperature), int(self.top_k), int(self.seed),
                int(self.max_seq_len))
            with self._paged_trace_ctx():
                self._decode_exe = capture(
                    fn, self.model.params, self.k_cache, self.v_cache,
                    self._tables_dev,
                    jnp.zeros((self.max_batch,), jnp.int32),
                    jnp.zeros((self.max_batch,), jnp.int32), jnp.int32(0),
                    donate_argnums=(1, 2), name=f"serve_chunk_paged_{n}")
        return self._decode_exe

    def _step_paged(self) -> int:
        self._admit()
        active = [i for i, r in enumerate(self._slots) if r is not None]
        if not active:
            return 0
        n = max(self.steps_per_dispatch, 1)
        for i in active:
            req = self._slots[i]
            # never demand past the request's admission-time reservation
            # (a near-finished slot at poss+n+1 > worst case would otherwise
            # exhaust a tightly-packed pool mid-serve; overflow positions
            # land in the trash block anyway)
            self._ensure_blocks(req, i, min(
                int(self._poss[i]) + n + 1,
                len(req.prompt) + req.max_new_tokens + 1))
        self._sync_tables()
        exe = self._ensure_paged_chunk_exe()
        (self.k_cache, self.v_cache, last_d, _poss_d, toks_b) = exe.replay(
            self.model.params, self.k_cache, self.v_cache, self._tables_dev,
            jnp.asarray(self._last_tokens), jnp.asarray(self._poss),
            jnp.int32(self.stats.steps))
        toks = np.asarray(toks_b).astype(np.int32)       # [B, n]
        self.stats.steps += 1
        for i in active:
            req = self._slots[i]
            for j in range(toks.shape[1]):
                if req is None or req.done:
                    break
                tok = int(toks[i, j])
                self._poss[i] += 1
                self._emit(req, tok)
                self._last_tokens[i] = tok
                self._maybe_finish(i, tok)
                if self._slots[i] is None:
                    break
        return len(active)

    def _attn_pref_ctx(self):
        """Trace-scope context applying this engine's decode-attention
        preference (see __init__) to a dense chunk/decode capture."""
        import contextlib
        if self._attn_pref is None:
            return contextlib.nullcontext()
        from ..ops.nn.attention import decode_pref
        return decode_pref(*self._attn_pref)

    def _ensure_chunk_exe(self):
        if self._decode_exe is None:
            n = max(self.steps_per_dispatch, 1)
            if self.paged:
                # pipelined + paged: same donated chunk contract, pools +
                # device last/poss donated, block tables a per-replay input
                # (tables only change at admission/release — full worst-case
                # reservation happens at admission — so a host-side sync at
                # the chunk boundary is enough; VERDICT r2 #2)
                from .serving_paged import paged_serve_chunk_fn
                fn = functools.partial(
                    paged_serve_chunk_fn, self.model.config, n,
                    float(self.temperature), int(self.top_k), int(self.seed),
                    int(self.max_seq_len))
                with self._paged_trace_ctx():
                    self._decode_exe = capture(
                        fn, self.model.params, self.k_cache, self.v_cache,
                        self._tables_dev, self._last_dev, self._poss_dev,
                        jnp.int32(0), donate_argnums=(1, 2, 4, 5),
                        name=f"serve_chunk_paged_pl_{n}")
            elif self._batch_rows:
                # batch-rows chunk: NOT under batched_trace — _mm sees the
                # real [B, E] rows in one call, so the stacked Pallas GEMVs
                # stay eligible (rows<=8 ride one weight stream)
                fn = functools.partial(
                    _serve_chunk_batch_fn, self.model.config, n,
                    float(self.temperature), int(self.top_k), int(self.seed),
                    int(self.max_seq_len))
                with self._attn_pref_ctx():
                    self._decode_exe = capture(
                        fn, self.model.params, self.k_cache, self.v_cache,
                        self._last_dev, self._poss_dev, jnp.int32(0),
                        donate_argnums=(1, 2, 3, 4),
                        name=f"serve_chunk_br_{n}")
            else:
                fn = functools.partial(
                    _serve_chunk_fn, self.model.config, n,
                    float(self.temperature), int(self.top_k), int(self.seed),
                    int(self.max_seq_len))
                with batched_trace(), self._attn_pref_ctx():
                    self._decode_exe = capture(
                        fn, self.model.params, self.k_cache, self.v_cache,
                        self._last_dev, self._poss_dev, jnp.int32(0),
                        donate_argnums=(1, 2, 3, 4),
                        name=f"serve_chunk_pl_{n}")
        return self._decode_exe

    def _ensure_decode_exe(self):
        if self._decode_exe is None:
            n = self.steps_per_dispatch
            if n <= 1:
                if self._batch_rows:
                    fn = functools.partial(batch_decode_step_fn,
                                           self.model.config)
                    with self._attn_pref_ctx():
                        self._decode_exe = capture(
                            fn, self.model.params, self.k_cache, self.v_cache,
                            jnp.zeros((self.max_batch,), jnp.int32),
                            jnp.zeros((self.max_batch,), jnp.int32),
                            donate_argnums=(1, 2), name="serve_decode_br")
                    return self._decode_exe
                fn = jax.vmap(
                    functools.partial(decode_step_fn, self.model.config),
                    in_axes=(None, 0, 0, 0, 0))
                with batched_trace(), self._attn_pref_ctx():
                    self._decode_exe = capture(
                        fn, self.model.params, self.k_cache, self.v_cache,
                        jnp.zeros((self.max_batch,), jnp.int32),
                        jnp.zeros((self.max_batch,), jnp.int32),
                        donate_argnums=(1, 2), name="serve_decode")
            elif self._batch_rows:
                fn = functools.partial(
                    batch_generate_scan_fn, self.model.config, n,
                    float(self.temperature), int(self.top_k))
                keys = jax.random.split(jax.random.PRNGKey(0), self.max_batch)
                with self._attn_pref_ctx():
                    self._decode_exe = capture(
                        fn, self.model.params, self.k_cache, self.v_cache,
                        jnp.zeros((self.max_batch,), jnp.int32),
                        jnp.zeros((self.max_batch,), jnp.int32), keys,
                        donate_argnums=(1, 2), name=f"serve_decode_br_{n}")
            else:
                scan_fn = functools.partial(
                    generate_scan_fn, self.model.config, n,
                    float(self.temperature), int(self.top_k))
                fn = jax.vmap(scan_fn, in_axes=(None, 0, 0, 0, 0, 0))
                keys = jax.random.split(jax.random.PRNGKey(0), self.max_batch)
                with batched_trace(), self._attn_pref_ctx():
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
        self._maybe_finish_req(req, slot, tok)

    def _maybe_finish_req(self, req: Request, slot: int, tok: int,
                          pos: int | None = None) -> None:
        """Request-bound finish check — in pipelined mode resolution lags a
        chunk behind, so ``slot`` may already host a newer request; only the
        request identity decides completion, and the slot is freed only if
        this request still owns it."""
        if pos is None:
            pos = self._poss[slot]
        if ((req.eos_token_id is not None and tok == req.eos_token_id)
                or len(req.generated) >= req.max_new_tokens
                or pos + 1 >= self.max_seq_len):
            req.done = True
            req.finished_at = time.time()
            if self._slots[slot] is req:
                self._slots[slot] = None
                if self.paged:
                    self._release_paged(req, slot)
            elif self.paged:
                # pipelined resolution lags a chunk: the slot may already
                # host a newer request (whose table row replaced ours) —
                # free the finished request's blocks by identity so they
                # don't leak
                self._alloc.free(req.request_id)
            self.stats.requests_completed += 1

    # -- engine loop -------------------------------------------------------------

    def step(self) -> int:
        """Admit + advance every active slot by steps_per_dispatch tokens.
        Returns #active."""
        if self.pipelined:
            return self._step_pipelined()
        if self.paged:
            return self._step_paged()
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
                self._emit(req, tok)
                self._last_tokens[i] = tok
                self._maybe_finish(i, tok)
                if self._slots[i] is None:
                    break
        return len(active)

    def _step_pipelined(self) -> int:
        """One pipelined engine step:

        1. dispatch a chunk over the current device state (admissions from
           the previous call are already applied on device) — UNLESS every
           active request is length-certain to finish inside the chunk
           already in flight (_tail_covered): that dispatch would be a
           fully dead chunk (trace-measured at 27% of device time on
           aligned workloads; docs/performance.md "dead tail chunk"),
        2. resolve the PREVIOUS chunk's tokens — the np.asarray readback
           overlaps the chunk just dispatched,
        3. bookkeeping frees slots, then admissions prefill into them
           (ordered after this chunk, picked up by the next one).
        """
        import os
        if (os.environ.get("PYGPUKIT_SERVE_PREADMIT", "1") != "0"
                and self._queue and any(r is None for r in self._slots)):
            # fill ALREADY-free slots before dispatching (no sync needed —
            # the prefills are device-ordered ahead of the next chunk).
            # NOTE: an earlier version resolved the inflight chunk here
            # whenever the queue was non-empty; that serialised every chunk
            # boundary and HALVED throughput (481 vs 652 tok/s) — the
            # readback sync must stay off the dispatch path.
            self._admit()
        active = [(i, self._slots[i]) for i in range(self.max_batch)
                  if self._slots[i] is not None]
        dispatched = None
        if active and self._tail_covered(active):
            # Every active request is length-CERTAIN to complete within the
            # chunk already in flight (len + chunk >= max_new; EOS can only
            # finish sooner), so a dispatch now would be a fully-dead chunk
            # — the pipelined tail that cost 128/384 iterations (27% of
            # device time) in the per-fusion serving trace. Resolve instead;
            # admissions below refill the slots and the next call dispatches
            # useful work. Streams are unchanged: dead-chunk tokens were
            # discarded by the req.done break in _resolve_inflight.
            active = []
        if active:
            exe = self._ensure_chunk_exe()
            if self.paged:
                self._sync_tables()
                (self.k_cache, self.v_cache, self._last_dev, self._poss_dev,
                 toks_dev) = exe.replay(
                    self.model.params, self.k_cache, self.v_cache,
                    self._tables_dev, self._last_dev, self._poss_dev,
                    jnp.int32(self.stats.steps))
            else:
                (self.k_cache, self.v_cache, self._last_dev, self._poss_dev,
                 toks_dev) = exe.replay(
                    self.model.params, self.k_cache, self.v_cache,
                    self._last_dev, self._poss_dev,
                    jnp.int32(self.stats.steps))
            dispatched = (toks_dev, active)
            self.stats.steps += 1
        self._resolve_inflight()
        self._inflight = dispatched
        self._admit()
        self._early_admit()
        return len(active)

    def _tail_covered(self, active) -> bool:
        """True when EVERY active slot holds a request that was already
        scheduled in the inflight chunk AND is length-bound to complete
        there — dispatching another chunk over these slots produces zero
        useful tokens. Early-admitted replacements are NOT in the inflight
        snapshot, so their presence correctly forces a dispatch."""
        import os
        if os.environ.get("PYGPUKIT_SERVE_TAILSKIP", "1") == "0":
            return False
        infl = getattr(self, "_inflight", None)
        if infl is None:
            return False
        n = max(self.steps_per_dispatch, 1)
        inflight_ids = {id(r) for _, r in infl[1]}
        return all(id(req) in inflight_ids
                   and len(req.generated) + n >= req.max_new_tokens
                   for _, req in active)

    def _early_admit(self) -> None:
        """Admission lookahead: a length-bound request that is CERTAIN to
        complete within the inflight chunk (len + chunk_size >= max_new;
        EOS can only finish it sooner) gets its replacement prefilled NOW —
        the prefill is device-ordered after the inflight chunk, so the slot
        decodes useful tokens in the very next chunk instead of idling one.
        EOS-bound finishes are unpredictable and keep the one-chunk lag."""
        if getattr(self, "_inflight", None) is None or not self._queue:
            return
        n = max(self.steps_per_dispatch, 1)
        pairs = []
        for slot, req in self._inflight[1]:
            if not self._queue:
                break
            if (self._slots[slot] is req and not req.done
                    and len(req.generated) + n >= req.max_new_tokens):
                if self.paged and not self._can_admit_paged(self._queue[0]):
                    break
                nxt = self._queue.pop(0)
                nxt.slot = slot
                self._slots[slot] = nxt
                pairs.append((slot, nxt))
        # wave boundary: all length-bound slots free at once — batch their
        # replacement prefills into ONE wave executable instead of N
        # serialized per-slot dispatches (the round-2 stagger residual)
        self._dispatch_prefills(pairs)

    def _resolve_inflight(self) -> None:
        if getattr(self, "_inflight", None) is None and not getattr(
                self, "_pending_first", None):
            return
        # prefill first-tokens were dispatched BEFORE the inflight chunk —
        # resolve them first so request.generated stays in stream order
        for req, tok_dev in self._pending_first:
            tok = int(np.asarray(tok_dev))
            self._emit(req, tok)
            req.first_token_at = time.time()
            self._last_tokens[req.slot] = tok
            self._maybe_finish_req(req, req.slot, tok, pos=req.pos)
        self._pending_first = []
        if self._inflight is None:
            return
        toks_dev, snapshot = self._inflight
        self._inflight = None
        toks = np.asarray(toks_dev).astype(np.int32)
        for slot, req in snapshot:
            for j in range(toks.shape[1]):
                if req.done:
                    break
                tok = int(toks[slot, j])
                req.pos += 1
                if self._slots[slot] is req:   # slot may be early-readmitted
                    self._poss[slot] = req.pos
                self._emit(req, tok)
                self._last_tokens[slot] = tok
                self._maybe_finish_req(req, slot, tok, pos=req.pos)

    def run_until_complete(self, max_steps: int = 10000) -> None:
        for _ in range(max_steps):
            if not self.has_work:
                return
            self.step()

    @property
    def has_work(self) -> bool:
        return (bool(self._queue) or any(r is not None for r in self._slots)
                or getattr(self, "_inflight", None) is not None
                or bool(getattr(self, "_pending_first", None)))

    def warmup(self, prompt_lens=(16,), wave_sizes=None) -> None:
        """Precompile the serving executables (decode chunk + single-slot
        prefill + power-of-two admission waves) for the given prompt-length
        buckets, so no XLA compile lands mid-workload.

        Lazy compilation is correct but UNTIMELY under mixed traffic: each
        fresh admission-wave size compiles a full prefill program while
        requests wait (1.7-4.6 s per size on a 1B model over the tunnel,
        scripts/micro_mixed_chunkwall.py — the difference between 516 and
        ~1700 tok/s on the mixed bench row). Production serving warms at
        startup; _dispatch_prefills keeps the wave-size key space to
        powers of two so this warmup covers every size the engine can hit.
        """
        ws = (wave_sizes if wave_sizes is not None else
              [w for w in (2, 4, 8, 16, 32, 64, 128) if w <= self.max_batch])
        buckets = sorted({min(_bucket(max(int(n), 8)), self.max_seq_len)
                          for n in prompt_lens})
        if not self.pipelined:
            self._ensure_decode_exe()
            return
        if self.paged:
            self._ensure_paged_chunk_exe()
            for b in buckets:
                self._ensure_prefill_exe_paged_pl(b)
                for w in ws:
                    self._ensure_wave_exe_paged_pl(w, b)
        else:
            self._ensure_chunk_exe()
            for b in buckets:
                self._ensure_prefill_exe_pl(b)
                for w in ws:
                    self._ensure_wave_exe_pl(w, b)
