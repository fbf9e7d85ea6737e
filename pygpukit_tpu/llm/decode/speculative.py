"""Speculative decode: a draft proposes, the full model verifies
(reference: llm/decode/speculative.py:20 +
decode_step_self_speculative_lookahead, causal.py:1096).

Two draft sources:
* self-speculative (default): the first ``n_draft_layers`` of the target
  (no separate draft weights),
* a SEPARATE draft model (``draft_model=``): any CausalTransformerModel
  with the same vocabulary (e.g. a distilled 0.5B drafting for a 7B).

Each round:
  1. draft greedily proposes ``gamma`` tokens (its own KV cache),
  2. the target runs ONE lookahead window over [cur, d1..dγ] producing γ+1
     logits and writing target KV,
  3. the longest prefix where target argmax agrees is accepted (+1 bonus
     token on full acceptance).
Rejected KV rows need no rollback: later steps mask beyond their ctx_len and
overwrite them (TPU replacement for the reference's confirmed/speculative
position bookkeeping, attention.py:152-169). Greedy-equivalent to M1 by
construction.

Self-speculative mode runs the ENTIRE loop on device
(model.decode_spec_chunk -> speculative_scan_fn): rounds are a lax.scan,
the draft is the target's first-``n_draft_layers`` slice sharing the
target's KV cache, and the verify window costs the same MXU time as a
single decode step (M<=16 dots are flat). The host loop below remains for
the separate-draft-model case, whose distinct config/cache doesn't fold
into one program; over a remote transport it pays ~2 synced roundtrips
per round.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..model import (
    CausalTransformerModel, decode_step_fn, decode_window_fn,
    generate_scan_fn, prefill_fn, slice_layers,
)
from ...core.executable import capture
from .base import DecodeStrategy

import jax


class DecodeSpeculative(DecodeStrategy):
    name = "speculative"

    def __init__(self, n_draft_layers: int = 2, gamma: int = 4,
                 draft_model: CausalTransformerModel | None = None):
        super().__init__()
        self.n_draft_layers = n_draft_layers
        self.gamma = gamma
        self.draft_model = draft_model
        self._draft_params = None
        self._draft_cfg = None
        self._draft_layers = n_draft_layers
        self._draft_k = None
        self._draft_v = None
        self._draft_pos = 0
        self._draft_decode = None
        self._draft_scans: dict[tuple, object] = {}
        self._draft_prefills: dict[int, object] = {}

    def bind(self, model: CausalTransformerModel) -> "DecodeSpeculative":
        super().bind(model)
        if self.draft_model is not None:
            if self.draft_model.config.vocab_size != model.config.vocab_size:
                raise ValueError(
                    "draft model vocabulary "
                    f"({self.draft_model.config.vocab_size}) must match the "
                    f"target's ({model.config.vocab_size})")
            self._draft_params = self.draft_model.params
            self._draft_cfg = self.draft_model.config
            self._draft_layers = self.draft_model.config.num_layers
        else:
            self._draft_params = slice_layers(model.params,
                                              self.n_draft_layers)
            self._draft_cfg = model.config
            self._draft_layers = self.n_draft_layers
        return self

    # -- draft model plumbing ------------------------------------------------

    def _init_draft_cache(self) -> None:
        model = self.model
        cfg = self._draft_cfg
        shape = (self._draft_layers, model.max_seq_len, cfg.num_kv_heads,
                 cfg.head_dim)
        self._draft_k = jnp.zeros(shape, model.dtype)
        self._draft_v = jnp.zeros(shape, model.dtype)
        self._draft_pos = 0

    def _draft_step(self, token: int) -> np.ndarray:
        model = self.model
        if self._draft_decode is None:
            fn = functools.partial(decode_step_fn, self._draft_cfg)
            self._draft_decode = capture(
                fn, self._draft_params, self._draft_k, self._draft_v,
                jnp.int32(0), jnp.int32(0), donate_argnums=(1, 2),
                name="draft_decode")
        self._draft_k, self._draft_v, logits = self._draft_decode.replay(
            self._draft_params, self._draft_k, self._draft_v,
            jnp.int32(token), jnp.int32(self._draft_pos))
        self._draft_pos += 1
        return np.asarray(logits)

    def _draft_propose(self, token: int, gamma: int) -> list[int]:
        """All gamma greedy draft steps in ONE device-side loop (the draft
        analog of the chunked generation executable — one dispatch instead
        of gamma)."""
        key = (gamma,)
        if key not in self._draft_scans:
            fn = functools.partial(generate_scan_fn, self._draft_cfg,
                                   gamma, 0.0, 0)
            self._draft_scans[key] = capture(
                fn, self._draft_params, self._draft_k, self._draft_v,
                jnp.int32(0), jnp.int32(0), jax.random.PRNGKey(0),
                donate_argnums=(1, 2), name=f"draft_scan_{gamma}")
        self._draft_k, self._draft_v, toks = self._draft_scans[key].replay(
            self._draft_params, self._draft_k, self._draft_v,
            jnp.int32(token), jnp.int32(self._draft_pos),
            jax.random.PRNGKey(0))
        self._draft_pos += gamma
        return [int(t) for t in np.asarray(toks)]

    def _draft_prefill(self, ids: np.ndarray) -> None:
        from ..model import _bucket
        model = self.model
        n = len(ids)
        bucket = min(_bucket(n), model.max_seq_len)
        if bucket not in self._draft_prefills:
            fn = functools.partial(prefill_fn, self._draft_cfg)
            self._draft_prefills[bucket] = capture(
                fn, self._draft_params, self._draft_k, self._draft_v,
                jnp.zeros((bucket,), jnp.int32), jnp.int32(1),
                donate_argnums=(1, 2), name=f"draft_prefill_{bucket}")
        padded = np.zeros((bucket,), np.int32)
        padded[:n] = ids
        self._draft_k, self._draft_v, _ = self._draft_prefills[bucket].replay(
            self._draft_params, self._draft_k, self._draft_v,
            jnp.asarray(padded), jnp.int32(n))
        self._draft_pos = n

    # -- generation ----------------------------------------------------------

    def _generate_device_loop(self, ids: np.ndarray, max_new_tokens: int,
                              eos_token_id: int | None) -> list[int]:
        """Self-speculative generation with the WHOLE draft->verify->accept
        loop on device (model.decode_spec_chunk / speculative_scan_fn):
        one dispatch per ``rounds_per_chunk`` rounds instead of two synced
        roundtrips per round — the difference between losing and winning
        over a remote transport."""
        model = self.model
        gamma = self.gamma
        logits = model.prefill(ids)
        cur = int(np.asarray(jnp.argmax(logits)))
        out: list[int] = [cur]
        self.stats.tokens_generated += 1
        self.stats.steps += 1
        rounds_per_chunk = max(1, 32 // (gamma + 1))
        while len(out) < max_new_tokens:
            if eos_token_id is not None and cur == eos_token_id:
                break
            rounds = min(rounds_per_chunk,
                         (model.max_seq_len - model.pos) // (gamma + 1))
            if rounds < 1:
                if model.pos >= model.max_seq_len:
                    break
                logits = model.decode_step(cur)
                cur = int(np.asarray(jnp.argmax(logits)))
                out.append(cur)
                self.stats.tokens_generated += 1
                self.stats.steps += 1
                continue
            toks, counts = model.decode_spec_chunk(
                cur, rounds, gamma, self.n_draft_layers)
            for r in range(rounds):
                c = int(counts[r])
                self.stats.steps += 1
                self.stats.accepted += c - 1
                self.stats.rejected += gamma - (c - 1)
                for t in toks[r, :c]:
                    out.append(int(t))
                    self.stats.tokens_generated += 1
                    if ((eos_token_id is not None and int(t) == eos_token_id)
                            or len(out) >= max_new_tokens):
                        return out[:max_new_tokens]
            cur = out[-1]
        return out[:max_new_tokens]

    def generate(self, input_ids, max_new_tokens: int = 32,
                 eos_token_id: int | None = None) -> list[int]:
        model = self._require_model()
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        if model.k_cache is None:
            model.init_fixed_cache(
                max(2 * (len(ids) + max_new_tokens + self.gamma + 2), 256))
        if self.draft_model is None:
            return self._generate_device_loop(ids, max_new_tokens,
                                              eos_token_id)
        self._init_draft_cache()

        logits = model.prefill(ids)
        self._draft_prefill(ids)
        cur = int(np.asarray(logits).argmax())
        out: list[int] = [cur]
        self.stats.tokens_generated += 1
        self.stats.steps += 1

        while len(out) < max_new_tokens:
            if eos_token_id is not None and cur == eos_token_id:
                break
            gamma = min(self.gamma,
                        model.max_seq_len - model.pos - 2,
                        max_new_tokens - len(out))
            if gamma < 1:
                # no room to speculate: plain step
                if model.pos >= model.max_seq_len:
                    break
                logits = model.decode_step(cur)
                cur = int(np.asarray(logits).argmax())
                out.append(cur)
                self.stats.tokens_generated += 1
                self.stats.steps += 1
                continue

            # 1. draft proposes gamma tokens starting from cur — one
            # device-side loop dispatch
            self._draft_pos = model.pos  # keep draft aligned with target
            proposals = self._draft_propose(cur, gamma)

            # 2. target verifies window [cur, d1..dγ] in one pass
            window = [cur] + proposals
            start_pos = model.pos
            wlogits = np.asarray(model.decode_window(window, advance=0))
            preds = wlogits.argmax(axis=-1)           # preds[i] follows window[i]

            # 3. accept longest agreeing prefix
            accepted = 0
            for i in range(gamma):
                if proposals[i] == int(preds[i]):
                    accepted += 1
                else:
                    break
            self.stats.accepted += accepted
            self.stats.rejected += gamma - accepted
            self.stats.steps += 1

            emitted = proposals[:accepted]
            if accepted == gamma:
                bonus = int(preds[gamma])
                emitted = emitted + [bonus]
            else:
                emitted = emitted + [int(preds[accepted])]

            model.pos = start_pos + accepted + 1       # cur + accepted now cached
            for tk in emitted:
                out.append(tk)
                self.stats.tokens_generated += 1
                if eos_token_id is not None and tk == eos_token_id:
                    return out[:max_new_tokens]
                if len(out) >= max_new_tokens:
                    return out[:max_new_tokens]
            cur = out[-1]
        return out[:max_new_tokens]
