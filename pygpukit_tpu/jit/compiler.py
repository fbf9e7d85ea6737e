"""Runtime kernel JIT front end (reference: src/pygpukit/jit/compiler.py:
20-772 — JITKernel, jit decorator, warmup, structured NvrtcError codes,
transient-error retry with backoff, driver compatibility check).

TPU mapping: the "kernel source" is a Python function over jnp/Pallas; the
"NVRTC compile" is XLA/Mosaic compilation via jax.jit. This module adds the
reference's operational layer on top: per-signature compile caching,
structured errors with codes, retry-with-backoff on transient compile
failures, background warmup, and platform compatibility probing.
"""

from __future__ import annotations

import enum
import functools
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax


class CompileErrorCode(enum.Enum):
    """Structured error codes (reference: NvrtcErrorCode, compiler.py:20)."""
    COMPILATION_FAILED = "compilation_failed"
    INVALID_INPUT = "invalid_input"
    OUT_OF_MEMORY = "out_of_memory"
    PLATFORM_UNAVAILABLE = "platform_unavailable"
    TRANSIENT = "transient"
    INTERNAL = "internal"


class CompileError(RuntimeError):
    """reference: NvrtcError, compiler.py:45."""

    def __init__(self, code: CompileErrorCode, message: str,
                 log: str = ""):
        super().__init__(f"[{code.value}] {message}")
        self.code = code
        self.log = log


_TRANSIENT_MARKERS = ("RESOURCE_EXHAUSTED", "UNAVAILABLE", "DEADLINE_EXCEEDED",
                      "connection", "timeout")


def _classify(exc: Exception) -> CompileErrorCode:
    msg = str(exc)
    if any(m.lower() in msg.lower() for m in _TRANSIENT_MARKERS):
        return CompileErrorCode.TRANSIENT
    if "out of memory" in msg.lower() or "OOM" in msg:
        return CompileErrorCode.OUT_OF_MEMORY
    if isinstance(exc, (TypeError, ValueError)):
        return CompileErrorCode.INVALID_INPUT
    return CompileErrorCode.COMPILATION_FAILED


@dataclass
class KernelStats:
    compiles: int = 0
    cache_hits: int = 0
    launches: int = 0
    total_compile_s: float = 0.0


class JITKernel:
    """A runtime-compiled kernel with per-signature executable caching
    (reference: JITKernel, compiler.py:270).

    Compilation retries with exponential backoff on transient errors
    (reference retry loop, compiler.py:343-456).
    """

    def __init__(self, fn: Callable, name: str | None = None,
                 static_argnums: tuple = (), donate_argnums: tuple = (),
                 max_retries: int = 3, backoff_s: float = 0.5):
        self.fn = fn
        self.name = name or getattr(fn, "__name__", "kernel")
        self.static_argnums = static_argnums
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.stats = KernelStats()
        self._jitted = jax.jit(fn, static_argnums=static_argnums,
                               donate_argnums=donate_argnums)
        self._compiled: dict[Any, Any] = {}
        self._lock = threading.Lock()

    def _signature(self, args) -> tuple:
        sig = []
        for i, a in enumerate(args):
            if i in self.static_argnums:
                sig.append(("static", a))
            else:
                sig.append((tuple(getattr(a, "shape", ())),
                            str(getattr(a, "dtype", type(a).__name__))))
        return tuple(sig)

    def compile(self, *example_args) -> None:
        """Eager AOT compile for the example signature."""
        sig = self._signature(example_args)
        with self._lock:
            if sig in self._compiled:
                self.stats.cache_hits += 1
                return
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                t0 = time.perf_counter()
                compiled = self._jitted.lower(*example_args).compile()
                self.stats.total_compile_s += time.perf_counter() - t0
                self.stats.compiles += 1
                with self._lock:
                    self._compiled[sig] = compiled
                return
            except Exception as e:  # noqa: BLE001
                last = e
                code = _classify(e)
                if code is not CompileErrorCode.TRANSIENT or \
                        attempt == self.max_retries:
                    raise CompileError(code, f"{self.name}: {e}") from e
                time.sleep(self.backoff_s * (2 ** attempt))
        raise CompileError(CompileErrorCode.INTERNAL,
                           f"{self.name}: {last}")

    def __call__(self, *args):
        sig = self._signature(args)
        compiled = self._compiled.get(sig)
        self.stats.launches += 1
        if compiled is not None:
            return compiled(*[a for i, a in enumerate(args)
                              if i not in self.static_argnums])
        self.compile(*args)
        return self._compiled[sig](*[a for i, a in enumerate(args)
                                     if i not in self.static_argnums])

    launch = __call__


def jit(fn: Callable | None = None, *, static_argnums: tuple = (),
        donate_argnums: tuple = (), name: str | None = None):
    """Kernel decorator (reference: jit, compiler.py:601)."""
    def wrap(f):
        return JITKernel(f, name=name, static_argnums=static_argnums,
                         donate_argnums=donate_argnums)
    return wrap(fn) if fn is not None else wrap


_warmup_state = {"threads": [], "error": None}
_warmup_lock = threading.Lock()


def warmup(kernel: JITKernel, *example_args) -> threading.Thread:
    """Background warmup compile (reference: warmup, compiler.py:654)."""
    def run():
        try:
            kernel.compile(*example_args)
        except Exception as e:  # noqa: BLE001 - surfaced via get_warmup_error
            with _warmup_lock:
                if _warmup_state["error"] is None:   # keep the FIRST error
                    _warmup_state["error"] = e

    t = threading.Thread(target=run, daemon=True)
    with _warmup_lock:
        # prune finished threads so long-lived processes don't accumulate
        _warmup_state["threads"] = [
            x for x in _warmup_state["threads"] if x.is_alive()]
        if not _warmup_state["threads"]:
            # a new warmup batch starts: clear any stale error from a prior
            # batch so get_warmup_error() reports THIS batch (ADVICE r2)
            _warmup_state["error"] = None
        _warmup_state["threads"].append(t)
    t.start()
    return t


def is_warmup_done() -> bool:
    """True when every background warmup still tracked has finished
    (reference: is_warmup_done, compiler.py)."""
    with _warmup_lock:
        return all(not t.is_alive() for t in _warmup_state["threads"])


def get_warmup_error() -> Exception | None:
    """The FIRST error raised by a background warmup, if any."""
    with _warmup_lock:
        return _warmup_state["error"]


def reset_warmup_state() -> None:
    with _warmup_lock:
        _warmup_state["threads"] = []
        _warmup_state["error"] = None


def check_platform_compatibility() -> dict:
    """Platform probe (reference: check_driver_compatibility,
    compiler.py:223)."""
    info = {"platform": None, "devices": 0, "compatible": False, "error": ""}
    try:
        devs = jax.devices()
        info["platform"] = devs[0].platform
        info["devices"] = len(devs)
        info["compatible"] = True
    except Exception as e:  # noqa: BLE001
        info["error"] = str(e)
    return info
