"""Kernel/op profiler (reference: native/core/profiler.hpp:20-60 +
src/pygpukit/profiling/profiler.py:182 — KernelRecord with derived
TFLOPS / GB/s, enable flag, minimal overhead when disabled).

On TPU, op timing = host wall clock around a hard device barrier (a
1-element D2H read — block_until_ready is unreliable over tunneled
transports; see .claude/skills/verify). For deeper traces, ``trace``
wraps jax.profiler (xprof) when available.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class KernelRecord:
    """Per-op record (reference: KernelRecord{name, ms, us, flops, bytes})."""
    name: str
    ms: float
    flops: int = 0
    bytes: int = 0
    count: int = 1

    @property
    def us(self) -> float:
        return self.ms * 1e3

    @property
    def tflops(self) -> float:
        return self.flops / (self.ms * 1e-3) / 1e12 if self.ms > 0 else 0.0

    @property
    def gbps(self) -> float:
        return self.bytes / (self.ms * 1e-3) / 1e9 if self.ms > 0 else 0.0


def _sync(result=None) -> None:
    """Hard device barrier."""
    if result is not None:
        try:
            leaves = None
            import jax
            leaves = jax.tree.leaves(result)
            if leaves:
                arr = leaves[0]
                np.asarray(arr.ravel()[:1] if hasattr(arr, "ravel") else arr)
                return
        except Exception:
            pass
    import jax
    jax.device_put(0.0).block_until_ready()


class Profiler:
    """Enable/record/report profiler (reference: Profiler, profiler.py:182)."""

    def __init__(self):
        self.enabled = False
        self.records: list[KernelRecord] = []

    def enable(self) -> None:
        self.enabled = True

    def disable(self) -> None:
        self.enabled = False

    def reset(self) -> None:
        self.records.clear()

    @contextlib.contextmanager
    def record(self, name: str, flops: int = 0, bytes: int = 0):  # noqa: A002
        if not self.enabled:
            yield
            return
        _sync()
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            _sync(holder.get("result"))
            ms = (time.perf_counter() - t0) * 1e3
            self.records.append(KernelRecord(name, ms, flops, bytes))

    def profile_fn(self, name: str, fn, *args, flops: int = 0,
                   bytes: int = 0, iters: int = 10, warmup: int = 2):  # noqa: A002
        """Time a jitted function: warmup, then steady-state mean."""
        for _ in range(warmup):
            out = fn(*args)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ms = (time.perf_counter() - t0) * 1e3 / iters
        rec = KernelRecord(name, ms, flops, bytes, count=iters)
        self.records.append(rec)
        return rec

    def stats(self) -> dict[str, KernelRecord]:
        """Aggregate by name."""
        agg: dict[str, KernelRecord] = {}
        for r in self.records:
            if r.name in agg:
                a = agg[r.name]
                a.ms += r.ms
                a.flops += r.flops
                a.bytes += r.bytes
                a.count += r.count
            else:
                agg[r.name] = KernelRecord(r.name, r.ms, r.flops, r.bytes,
                                           r.count)
        return agg

    def summary(self) -> str:
        lines = [f"{'name':<32}{'count':>6}{'total ms':>10}{'TFLOPS':>9}"
                 f"{'GB/s':>9}"]
        for name, r in sorted(self.stats().items(), key=lambda kv: -kv[1].ms):
            lines.append(f"{name:<32}{r.count:>6}{r.ms:>10.3f}"
                         f"{r.tflops:>9.2f}{r.gbps:>9.1f}")
        return "\n".join(lines)

    @contextlib.contextmanager
    def trace(self, logdir: str):
        """xprof trace context (jax.profiler)."""
        import jax
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()


_global = Profiler()


def get_profiler() -> Profiler:
    return _global


def enable_profiling() -> None:
    _global.enable()


def disable_profiling() -> None:
    _global.disable()


def get_profile_stats() -> dict[str, KernelRecord]:
    return _global.stats()


def profile_matmul(m: int = 4096, n: int = 4096, k: int = 4096,
                   dtype="bfloat16") -> KernelRecord:
    """Convenience helper (reference: profile_matmul, profiler.py:376)."""
    import jax
    import jax.numpy as jnp
    dt = jnp.dtype(dtype)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.float32).astype(dt)
    b = jax.random.normal(key, (k, n), jnp.float32).astype(dt)
    f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
    return _global.profile_fn(
        f"matmul_{m}x{n}x{k}_{dtype}", f, a, b,
        flops=2 * m * n * k,
        bytes=(m * k + k * n) * dt.itemsize + m * n * 4)
