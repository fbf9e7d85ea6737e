"""Benchmark framework (reference: src/pygpukit/benchmark/base.py:76 —
Benchmark base with markdown reporting + device info header)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class BenchResult:
    name: str
    ms: float
    flops: int = 0
    bytes: int = 0
    extra: dict = field(default_factory=dict)

    @property
    def tflops(self) -> float:
        return self.flops / (self.ms * 1e-3) / 1e12 if self.ms else 0.0

    @property
    def gbps(self) -> float:
        return self.bytes / (self.ms * 1e-3) / 1e9 if self.ms else 0.0


def _hard_sync(out) -> None:
    """D2H barrier (block_until_ready is unreliable over tunnels)."""
    import jax
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def time_fn(fn, *args, iters: int = 20, warmup: int = 3) -> float:
    """Steady-state mean ms for a jitted fn."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _hard_sync(out)
    return (time.perf_counter() - t0) * 1e3 / iters


class Benchmark:
    """Base suite: subclasses implement run() appending to self.results."""

    title = "benchmark"

    def __init__(self):
        self.results: list[BenchResult] = []

    def run(self) -> None:
        raise NotImplementedError

    def report_markdown(self) -> str:
        from ..core.device import get_device_info
        info = get_device_info()
        lines = [
            f"## {self.title}",
            "",
            f"Device: {info.device_kind} (peak {info.peak_bf16_tflops:.0f} "
            f"bf16 TFLOPS, {info.peak_hbm_gbps:.0f} GB/s HBM)",
            "",
            "| name | ms | TFLOPS | GB/s | % peak |",
            "|---|---|---|---|---|",
        ]
        for r in self.results:
            pct = (100 * r.tflops / info.peak_bf16_tflops if r.flops
                   else 100 * r.gbps / info.peak_hbm_gbps)
            lines.append(
                f"| {r.name} | {r.ms:.3f} | {r.tflops:.1f} | {r.gbps:.0f} "
                f"| {pct:.0f}% |")
        return "\n".join(lines)
