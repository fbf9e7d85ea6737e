"""Host-side sampling utilities (reference: src/pygpukit/llm/sampling.py:11).

Device-side sampling lives in ops/sampling.py; this module is the CPU parity
path operating on numpy logits (used by tests and CPU-only flows).
"""

from __future__ import annotations

import numpy as np


def sample_token(logits: np.ndarray, temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 0.0, rng: np.random.Generator | None = None
                 ) -> int:
    logits = np.asarray(logits, np.float32).reshape(-1)
    if temperature <= 0.0:
        return int(logits.argmax())
    rng = rng or np.random.default_rng()
    logits = logits / temperature
    if top_k > 0:
        thresh = np.partition(logits, -top_k)[-top_k]
        logits = np.where(logits < thresh, -np.inf, logits)
    if 0.0 < top_p < 1.0:
        order = np.argsort(logits)[::-1]
        probs = _softmax(logits[order])
        cum = np.cumsum(probs)
        cutoff = np.searchsorted(cum, top_p) + 1
        mask = np.full_like(logits, -np.inf)
        mask[order[:cutoff]] = logits[order[:cutoff]]
        logits = mask
    probs = _softmax(logits)
    return int(rng.choice(len(probs), p=probs))


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - np.max(x[np.isfinite(x)]))
    e[~np.isfinite(x)] = 0.0
    return e / e.sum()
