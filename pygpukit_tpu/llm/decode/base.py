"""Decode strategy framework (reference: src/pygpukit/llm/decode/base.py:19).

A strategy binds to a CausalTransformerModel and drives token generation.
All strategies are greedy-equivalent: for temperature=0 every strategy
produces the same token sequence (the reference's cross-strategy token-match
guarantee, SURVEY §4) — this is what the equivalence tests assert.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field

import numpy as np

from ..model import CausalTransformerModel


@dataclass
class DecodeStats:
    tokens_generated: int = 0
    steps: int = 0           # model invocations
    accepted: int = 0        # speculative/jacobi: tokens accepted per window
    rejected: int = 0

    @property
    def tokens_per_step(self) -> float:
        return self.tokens_generated / max(self.steps, 1)


class DecodeStrategy(abc.ABC):
    """Base strategy: bind → generate."""

    name = "base"

    def __init__(self):
        self.model: CausalTransformerModel | None = None
        self.stats = DecodeStats()

    def bind(self, model: CausalTransformerModel) -> "DecodeStrategy":
        self.model = model
        return self

    @abc.abstractmethod
    def generate(self, input_ids, max_new_tokens: int = 32,
                 eos_token_id: int | None = None) -> list[int]:
        ...

    def _require_model(self) -> CausalTransformerModel:
        if self.model is None:
            raise RuntimeError(f"{self.name}: call bind(model) first")
        return self.model
