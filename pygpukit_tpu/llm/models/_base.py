"""Shared scaffolding for standalone (non-ModelSpec) model families whose
caches are a single per-layer pytree (hybrid families: lfm2, qwen3next).

The earlier standalone models (llama4/deepseek/gptoss) carry (k_cache,
v_cache) as two positional args; the hybrid families carry ONE cache
pytree of per-layer dicts — this module holds their common math helpers
and the chunked device-side generate driver so the pair cannot drift.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...core.executable import capture

_F32 = jnp.float32


def prec_f32(*arrs):
    """precision=HIGHEST when every operand is genuinely f32 (TPU DEFAULT
    bf16-izes f32 dots — model._pf32 semantics)."""
    if all(a.dtype == _F32 for a in arrs):
        from ...ops.matmul import _f32_precision
        return _f32_precision()
    return None


def mm(x, w):
    return jnp.dot(x, w, precision=prec_f32(x, w))


def qk_headnorm(x, w, eps):
    """Per-head RMS norm over the last dim (qwen3 q_norm/k_norm shape)."""
    xf = x.astype(_F32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * lax.rsqrt(var + eps) * w.astype(_F32)).astype(x.dtype)


def attn_block_causal(q, k, v, true_len):
    """Causal attention within a padded [S, H*, D] block (positions >=
    true_len masked); returns [S, Hq*D]."""
    import math
    s, hq, d = q.shape
    hk = k.shape[1]
    if hk != hq:
        k = jnp.repeat(k, hq // hk, axis=1)
        v = jnp.repeat(v, hq // hk, axis=1)
    prec = prec_f32(q, k)
    qh = jnp.transpose(q, (1, 0, 2)).astype(_F32)
    kh = jnp.transpose(k, (1, 0, 2)).astype(_F32)
    vh = jnp.transpose(v, (1, 0, 2)).astype(_F32)
    scores = jnp.einsum("hqd,hkd->hqk", qh, kh, precision=prec) \
        / math.sqrt(d)
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    mask = (j > i) | (j[None] >= true_len)
    scores = jnp.where(mask, -1e30, scores)
    out = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, axis=-1), vh,
                     precision=prec)
    return jnp.transpose(out, (1, 0, 2)).reshape(s, hq * d).astype(q.dtype)


def causal_depthwise_conv(x, w, bias=None):
    """Depthwise causal conv over [S, C] with kernel w [C, K] (newest input
    multiplies the LAST weight column); f32 accumulation, no activation.
    Shared by the lfm2/qwen3next/mamba conv mixers."""
    s = x.shape[0]
    K = w.shape[1]
    out = jnp.zeros(x.shape, _F32)
    for j in range(K):
        shift = K - 1 - j
        rolled = jnp.pad(x, ((shift, 0), (0, 0)))[:s]
        out = out + rolled.astype(_F32) * w[:, j].astype(_F32)
    if bias is not None:
        out = out + bias.astype(_F32)
    return out


def conv_state_tail(x, true_len, K, dtype):
    """Last K VALID rows of x [S, C], right-aligned as [C, K] (the decode
    conv state; zero-filled when true_len < K — the HF left-pad)."""
    s = x.shape[0]
    idx = true_len - K + jnp.arange(K)
    rows = jnp.take(x, jnp.clip(idx, 0, s - 1), axis=0)
    rows = jnp.where((idx >= 0)[:, None], rows, 0)
    return rows.T.astype(dtype)


def lm_head(p, h):
    head = p["lm_head"] if p.get("lm_head") is not None else p["embed"].T
    return jnp.dot(h, head, preferred_element_type=_F32,
                   precision=prec_f32(h, head))


class StandaloneCachedModel:
    """Chunked device-side generation over a single caches pytree.

    Subclasses set: self.config, self.params, self.dtype, and the module
    hooks ``_prefill_fn(cfg, p, caches, tokens, true_len)``,
    ``_generate_scan_fn(cfg, n_steps, p, caches, token, pos)``,
    ``_forward_fn(cfg, p, tokens)``, ``_init_caches(cfg, max_seq, dtype)``,
    and ``_name`` (executable label prefix)."""

    _prefill_fn = None
    _generate_scan_fn = None
    _forward_fn = None
    _init_caches = None
    # single-step decode hook (enables llm.serving_hybrid batch serving)
    _decode_step_fn = None
    # _stateful_prefill: the family's prefill_fn CONTINUES from the caches
    # argument (zero caches == from-scratch), so long prompts may stream
    # through it in fixed blocks of _prefill_block tokens — bounds the
    # prefill working set for recurrences whose parallel scan materialises
    # [S, ...] operands (mamba's [S, E, N]).
    _stateful_prefill = False
    _prefill_block: int | None = None
    _name = "model"

    def _setup(self):
        self._fwd = jax.jit(functools.partial(
            type(self)._forward_fn, self.config))
        self.caches = None
        self.max_seq_len = None
        self.pos = 0
        self._prefill_exes: dict = {}
        self._gen_exes: dict = {}

    def forward(self, input_ids):
        return self._fwd(self.params,
                         jnp.asarray(np.asarray(input_ids, np.int32)))

    def get_logits(self, input_ids) -> np.ndarray:
        return np.asarray(self.forward(input_ids), np.float32)

    def init_fixed_cache(self, max_seq_len: int):
        self.max_seq_len = max_seq_len
        self.caches = type(self)._init_caches(self.config, max_seq_len,
                                              self.dtype)
        self.pos = 0

    def _replay_prefill(self, ids: np.ndarray):
        """One bucketed prefill dispatch over ``ids`` (donated caches)."""
        n = len(ids)
        bucket = max(1 << (n - 1).bit_length(), 16)
        if bucket not in self._prefill_exes:
            fn = functools.partial(type(self)._prefill_fn, self.config)
            self._prefill_exes[bucket] = capture(
                fn, self.params, self.caches,
                jnp.zeros((bucket,), jnp.int32), jnp.int32(1),
                donate_argnums=(1,),
                name=f"{self._name}_prefill_{bucket}")
        padded = np.zeros((bucket,), np.int32)
        padded[:n] = ids
        self.caches, logits = self._prefill_exes[bucket].replay(
            self.params, self.caches, jnp.asarray(padded), jnp.int32(n))
        return logits

    def generate(self, input_ids, max_new_tokens: int = 32,
                 chunk_size: int = 64,
                 prefill_block: int | None = None) -> list[int]:
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        n = len(ids)
        if self.caches is None:
            need = n + max_new_tokens + 1
            self.init_fixed_cache(max(1 << (need - 1).bit_length(), 64))
        blk = (prefill_block if prefill_block is not None
               else type(self)._prefill_block)
        if type(self)._stateful_prefill and blk and n > blk:
            # blocked prefill: stream the prompt through the stateful
            # prefill executable in fixed blocks (full blocks share ONE
            # executable; the remainder reuses the bucketed ones)
            for off in range(0, n, blk):
                logits = self._replay_prefill(ids[off:off + blk])
        else:
            logits = self._replay_prefill(ids)
        self.pos = n
        cur = jnp.argmax(logits).astype(jnp.int32)
        out: list[int] = []
        first = True
        while len(out) < max_new_tokens:
            steps = min(max_new_tokens - len(out) - (1 if first else 0),
                        chunk_size, self.max_seq_len - self.pos)
            if steps <= 0:
                if first:
                    out.append(int(np.asarray(cur)))
                break
            if steps not in self._gen_exes:
                fn = functools.partial(type(self)._generate_scan_fn,
                                       self.config, steps)
                self._gen_exes[steps] = capture(
                    fn, self.params, self.caches, jnp.int32(0), jnp.int32(0),
                    donate_argnums=(1,),
                    name=f"{self._name}_generate_{steps}")
            self.caches, toks = self._gen_exes[steps].replay(
                self.params, self.caches, jnp.int32(cur), jnp.int32(self.pos))
            self.pos += steps
            if first:
                toks = np.asarray(
                    jnp.concatenate([jnp.reshape(cur, (1,)), toks]))
                first = False
            else:
                toks = np.asarray(toks)
            out.extend(int(t) for t in toks)
            cur = out[-1]
        return out[:max_new_tokens]
