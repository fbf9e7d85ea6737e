"""Backend selection: real TPU vs CPU simulation.

The reference selects between a NativeBackend (CUDA) and a CPUSimulationBackend
used by all CI tests (reference: src/pygpukit/core/backend.py:217-510). On TPU
the JAX runtime already abstracts the device, so "backend" here means:

  * which platform the default device lives on (tpu / cpu),
  * whether Pallas kernels run compiled (Mosaic) or in interpreter mode
    (the CPU-simulation analog — bit-identical semantics, no TPU needed).

``set_backend("cpu")`` is the test hook, mirroring the reference's
``set_backend(CPUSimulationBackend())``.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass

import jax


@dataclass
class Backend:
    """Resolved execution backend."""

    platform: str          # "tpu" | "cpu" | "gpu"
    interpret: bool        # run Pallas kernels in interpreter mode

    @property
    def is_simulation(self) -> bool:
        return self.platform != "tpu"

    @property
    def device(self):
        return jax.devices(self.platform)[0]

    def devices(self):
        return jax.devices(self.platform)

    @property
    def device_count(self) -> int:
        return len(jax.devices(self.platform))


_lock = threading.Lock()
_backend: Backend | None = None


def _detect_platform() -> str:
    forced = os.environ.get("PYGPUKIT_BACKEND")
    if forced:
        return forced
    platforms = {d.platform for d in jax.devices()}
    for p in ("tpu", "gpu", "cpu"):
        if p in platforms:
            return p
    return jax.default_backend()


def get_backend() -> Backend:
    """Auto-select the backend: TPU if present, else CPU interpreter mode."""
    global _backend
    with _lock:
        if _backend is None:
            platform = _detect_platform()
            # axon tunnels expose the chip with platform "axon"? normalize:
            if platform not in ("tpu", "cpu", "gpu"):
                platform = jax.devices()[0].platform
            _backend = Backend(platform=platform, interpret=(platform == "cpu"))
        return _backend


def set_backend(platform: str, *, interpret: bool | None = None) -> Backend:
    """Test hook: force a backend (e.g. ``set_backend("cpu")`` in CI)."""
    global _backend
    with _lock:
        _backend = Backend(
            platform=platform,
            interpret=(platform == "cpu") if interpret is None else interpret,
        )
        return _backend


def reset_backend() -> None:
    global _backend
    with _lock:
        _backend = None


def default_device():
    return get_backend().device


def interpret_mode() -> bool:
    """True when Pallas kernels should run interpreted (CPU simulation)."""
    return get_backend().interpret
