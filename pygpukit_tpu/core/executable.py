"""AOT-compiled executables with bitwise-identical replay.

This is the TPU equivalent of the reference's CUDA Graph capture/replay
(reference: native/core/cuda_graph.hpp:31-190, src/pygpukit/llm/decode/m1_graph.py:45):
a function is traced + compiled ONCE for fixed shapes, then replayed with new
inputs. Where CUDA graphs freeze kernel launch sequences, XLA AOT executables
freeze the whole fused program — replay is bitwise deterministic because the
executable (including reduction orders and fusion decisions) never changes
between calls.

Donated argnums map to the reference's pre-allocated decode buffers: XLA reuses
the donated input's HBM for the output, giving zero-allocation replay.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field
from typing import Any, Callable

import jax


@dataclass
class ExecutableStats:
    captures: int = 0
    replays: int = 0
    hlo_instruction_count: int = 0


def _xla_options() -> dict | None:
    """Per-executable XLA compiler options from PYGPUKIT_XLA_OPTS
    ("key=value,key=value"). Passed to lowered.compile(compiler_options=)
    so they reach the (possibly remote) TPU compiler without touching the
    process-wide XLA_FLAGS — the axon client rejects unknown XLA_FLAGS
    fatally, while unknown compiler_options fail only the one compile.
    Example: PYGPUKIT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536."""
    spec = os.environ.get("PYGPUKIT_XLA_OPTS", "").strip()
    if not spec:
        return None
    out = {}
    for kv in spec.split(","):
        if "=" in kv:
            k, _, v = kv.partition("=")
            out[k.strip()] = v.strip()
    return out or None


class Executable:
    """A compiled, fixed-shape XLA executable (CUDA Graph analog)."""

    def __init__(self, fn: Callable, *example_args,
                 donate_argnums: tuple[int, ...] = (),
                 static_argnums: tuple[int, ...] = (),
                 name: str = "executable"):
        self.name = name
        self._jitted = jax.jit(
            fn, donate_argnums=donate_argnums, static_argnums=static_argnums
        )
        lowered = self._jitted.lower(*example_args)
        self._compiled = lowered.compile(compiler_options=_xla_options())
        self.stats = ExecutableStats(captures=1)
        try:
            hlo = lowered.as_text()
            self.stats.hlo_instruction_count = hlo.count("\n")
        except Exception:
            pass

    def replay(self, *args) -> Any:
        """Execute the pre-compiled program. Never retraces, never recompiles."""
        self.stats.replays += 1
        return self._compiled(*args)

    __call__ = replay

    @property
    def node_count(self) -> int:
        """Rough analog of the CUDA-graph node count."""
        return self.stats.hlo_instruction_count

    def cost_analysis(self) -> dict:
        try:
            ca = self._compiled.cost_analysis()
            return dict(ca[0] if isinstance(ca, (list, tuple)) else ca)
        except Exception:
            return {}

    def memory_analysis(self):
        try:
            return self._compiled.memory_analysis()
        except Exception:
            return None


def capture(fn: Callable, *example_args, donate_argnums=(), static_argnums=(),
            name: str = "executable") -> Executable:
    """Capture ``fn`` at the example args' shapes into a replayable executable."""
    return Executable(
        fn, *example_args,
        donate_argnums=tuple(donate_argnums),
        static_argnums=tuple(static_argnums),
        name=name,
    )


class ExecutableCache:
    """Keyed executable cache (analog of the GEMM-descriptor / kernel cache,
    reference: native/jit/cublaslt_loader.cpp:593-641, rust/dispatch/cache.rs:210)."""

    def __init__(self, max_entries: int = 256):
        self._cache: dict[Any, Executable] = {}
        self._lock = threading.Lock()
        self._max = max_entries
        self.hits = 0
        self.misses = 0

    def get_or_capture(self, key, fn, *example_args, **kw) -> Executable:
        with self._lock:
            exe = self._cache.get(key)
        if exe is not None:
            self.hits += 1
            return exe
        self.misses += 1
        exe = capture(fn, *example_args, **kw)
        with self._lock:
            if len(self._cache) >= self._max:
                self._cache.pop(next(iter(self._cache)))
            self._cache[key] = exe
        return exe

    def stats(self) -> dict:
        return {"entries": len(self._cache), "hits": self.hits, "misses": self.misses}


_global_cache = ExecutableCache()


def global_executable_cache() -> ExecutableCache:
    return _global_cache
