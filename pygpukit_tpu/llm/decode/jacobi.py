"""Jacobi decoding: parallel iterative decode without a draft model
(reference: llm/decode/jacobi.py:20 + decode_step_jacobi_lookahead,
causal.py:1357).

A window of W guessed tokens is iterated to a fixpoint: each pass feeds
[cur, g1..g_{W-1}] through one lookahead window, takes argmax predictions,
and accepts the longest prefix that has converged (prediction == guess).
Greedy-equivalent to M1: every accepted token is the target argmax given its
true prefix.
"""

from __future__ import annotations

import numpy as np

from .base import DecodeStrategy


class DecodeJacobi(DecodeStrategy):
    name = "jacobi"

    def __init__(self, window: int = 6):
        super().__init__()
        self.window = window

    def generate(self, input_ids, max_new_tokens: int = 32,
                 eos_token_id: int | None = None) -> list[int]:
        model = self._require_model()
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        if model.k_cache is None:
            model.init_fixed_cache(
                max(2 * (len(ids) + max_new_tokens + self.window + 2), 256))

        logits = model.prefill(ids)
        cur = int(np.asarray(logits).argmax())
        out: list[int] = [cur]
        self.stats.tokens_generated += 1
        self.stats.steps += 1

        # guess init: repeat cur (Jacobi init, reference jacobi.py)
        guesses = [cur] * (self.window - 1)

        while len(out) < max_new_tokens:
            if eos_token_id is not None and cur == eos_token_id:
                break
            w = min(self.window,
                    model.max_seq_len - model.pos,
                    max_new_tokens - len(out) + 1)
            if w < 2:
                if model.pos >= model.max_seq_len:
                    break
                logits = model.decode_step(cur)
                cur = int(np.asarray(logits).argmax())
                out.append(cur)
                self.stats.tokens_generated += 1
                self.stats.steps += 1
                continue

            window = [cur] + guesses[:w - 1]
            start_pos = model.pos
            wlogits = np.asarray(model.decode_window(window, advance=0))
            preds = wlogits.argmax(axis=-1)            # preds[i] follows window[i]
            self.stats.steps += 1

            # accept converged prefix: guess g_i is correct iff it equals the
            # prediction following the (already-correct) prefix before it
            accepted = 0
            for i in range(w - 1):
                if window[i + 1] == int(preds[i]):
                    accepted += 1
                else:
                    break
            self.stats.accepted += accepted
            self.stats.rejected += (w - 1) - accepted

            emitted = [int(p) for p in preds[:accepted + 1]]  # converged + next
            model.pos = start_pos + accepted + 1
            for tk in emitted:
                out.append(tk)
                self.stats.tokens_generated += 1
                if eos_token_id is not None and tk == eos_token_id:
                    return out[:max_new_tokens]
                if len(out) >= max_new_tokens:
                    return out[:max_new_tokens]
            cur = out[-1]
            # next guesses: shift the unconverged tail (Jacobi iteration state)
            tail = [int(p) for p in preds[accepted + 1:]]
            guesses = (tail + [cur] * self.window)[:self.window - 1]
        return out[:max_new_tokens]
