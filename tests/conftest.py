"""Test config: force CPU backend with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh), Pallas kernels in interpreter mode.

Mirrors the reference's CPUSimulationBackend autouse fixture
(reference: tests/conftest.py:8-15) — the full suite runs without TPU hardware.
"""
import os

_TPU_TESTS = os.environ.get("PYGPUKIT_TPU_TESTS") == "1"
if not _TPU_TESTS:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS with "axon,cpu"; force CPU-only
# before any backend initialisation so the 8 virtual devices take effect.
# PYGPUKIT_TPU_TESTS=1 keeps the real TPU (tests/test_pallas_kernels.py).
if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _cpu_backend():
    from pygpukit_tpu.core import backend
    if not _TPU_TESTS:
        backend.set_backend("cpu")
    yield
    backend.reset_backend()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires real TPU hardware (Mosaic kernels)")
