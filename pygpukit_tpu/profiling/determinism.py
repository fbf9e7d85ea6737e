"""Determinism / replay-parity harness.

The reference's substitute for race detection is determinism discipline:
fixed seeds, replay-stability checks, strategy-equivalence token matching
(SURVEY §5.2; reference: bench_graph_replay_only.py, debug_fa3_determinism.py).
This module makes those checks first-class utilities:

  verify_bitwise_replay  — same executable, same inputs → same bits
  verify_recompile_parity — fresh compile of the same program → same bits
  verify_strategy_equivalence — all decode strategies emit identical greedy
  tokens
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np


@dataclass
class DeterminismReport:
    name: str
    passed: bool
    runs: int = 0
    detail: str = ""

    def __bool__(self) -> bool:
        return self.passed


def _leaves_equal(a, b) -> bool:
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def verify_bitwise_replay(fn, *args, runs: int = 3,
                          name: str = "replay") -> DeterminismReport:
    """Run a jitted/compiled fn repeatedly; assert bitwise-identical output."""
    first = fn(*args)
    for i in range(runs - 1):
        out = fn(*args)
        if not _leaves_equal(first, out):
            return DeterminismReport(name, False, i + 2,
                                     "outputs diverged across replays")
    return DeterminismReport(name, True, runs)


def verify_recompile_parity(make_fn, *args, runs: int = 2,
                            name: str = "recompile") -> DeterminismReport:
    """``make_fn()`` returns a freshly-built callable; fresh compiles of the
    same program must produce identical bits (XLA determinism guarantee)."""
    first = make_fn()(*args)
    for i in range(runs - 1):
        out = make_fn()(*args)
        if not _leaves_equal(first, out):
            return DeterminismReport(name, False, i + 2,
                                     "fresh compile changed the bits")
    return DeterminismReport(name, True, runs)


def verify_strategy_equivalence(model, prompt, n_tokens: int = 16,
                                strategies: list[str] | None = None,
                                max_seq_len: int = 256) -> DeterminismReport:
    """All decode strategies must emit the same greedy tokens
    (the reference's cross-strategy 'Match' check, bench_jacobi_lookahead)."""
    from ..llm.decode import STRATEGIES
    names = strategies or ["m1", "m1_graph", "speculative", "jacobi"]
    outputs = {}
    for nm in names:
        model.init_fixed_cache(max_seq_len)
        strat = STRATEGIES[nm]().bind(model)
        outputs[nm] = strat.generate(list(prompt), n_tokens)
    ref = outputs[names[0]]
    bad = [nm for nm, out in outputs.items() if out != ref]
    if bad:
        return DeterminismReport("strategy_equivalence", False, len(names),
                                 f"mismatch: {bad}")
    return DeterminismReport("strategy_equivalence", True, len(names))
