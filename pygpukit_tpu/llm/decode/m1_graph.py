"""M1Graph: replay-executable decode (reference: llm/decode/m1_graph.py:45).

The reference captures CUDA graphs per phase (embed / pre-SDPA / post-SDPA /
final) and runs SDPA + KV-update OUTSIDE the graph because graphs can't
handle growing context. On TPU the whole decode step — including attention
over the fixed cache and the KV write — is ONE AOT executable with a traced
``pos`` scalar, so ``init_graph`` simply pre-compiles that executable and
``step_graph`` replays it. Donated cache buffers give zero-allocation replay;
replay is bitwise deterministic.
"""

from __future__ import annotations

import numpy as np

from .base import DecodeStrategy


class DecodeM1Graph(DecodeStrategy):
    name = "m1_graph"

    def init_graph(self, max_seq_len: int) -> None:
        """Pre-compile prefill + decode executables (reference: init_graph,
        m1_graph.py:248)."""
        model = self._require_model()
        model.init_fixed_cache(max_seq_len)
        model._ensure_decode_exe()

    @property
    def node_count(self) -> int:
        model = self._require_model()
        exe = model._ensure_decode_exe()
        return exe.node_count

    def step_graph(self, token: int) -> np.ndarray:
        """One replay (reference: step_graph, m1_graph.py:463)."""
        model = self._require_model()
        self.stats.steps += 1
        return np.asarray(model.decode_step(token))

    def generate(self, input_ids, max_new_tokens: int = 32,
                 eos_token_id: int | None = None) -> list[int]:
        model = self._require_model()
        if model.k_cache is None:
            self.init_graph(max(2 * (len(np.ravel(input_ids)) + max_new_tokens), 256))
        logits = model.prefill(input_ids)
        out: list[int] = []
        for _ in range(max_new_tokens):
            tok = int(np.asarray(logits).argmax())
            out.append(tok)
            self.stats.tokens_generated += 1
            if eos_token_id is not None and tok == eos_token_id:
                break
            if model.pos >= model.max_seq_len:
                break
            logits = self.step_graph(tok)
        return out
