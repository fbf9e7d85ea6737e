"""Device / topology queries (reference: src/pygpukit/core/device.py:31-79).

On TPU the interesting facts are: chip generation, core count, HBM capacity,
mesh topology. Peak numbers are used by the profiler to derive utilisation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax

from .backend import get_backend

# Published peak specs per chip generation (bf16 MXU TFLOPS, HBM GB/s, HBM GiB).
# Used for roofline/utilisation reporting only.
_CHIP_SPECS = {
    "v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0, "hbm_gib": 32.0},
    "v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0, "hbm_gib": 16.0},
    "v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0, "hbm_gib": 16.0},
    "v5p": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0, "hbm_gib": 95.0},
    "v6e": {"bf16_tflops": 918.0, "hbm_gbps": 1640.0, "hbm_gib": 32.0},
    "cpu": {"bf16_tflops": 1.0, "hbm_gbps": 50.0, "hbm_gib": 8.0},
}


@dataclass
class DeviceInfo:
    platform: str
    device_kind: str
    index: int
    num_devices: int
    peak_bf16_tflops: float
    peak_hbm_gbps: float
    hbm_gib: float
    coords: tuple = field(default_factory=tuple)

    @property
    def name(self) -> str:
        return f"{self.device_kind} #{self.index}"


def _spec_for(kind: str) -> dict:
    kl = kind.lower()
    for key, spec in _CHIP_SPECS.items():
        if key in kl:
            return spec
    return _CHIP_SPECS["cpu"]


def get_device_info(index: int = 0) -> DeviceInfo:
    backend = get_backend()
    devs = backend.devices()
    d = devs[index]
    spec = _spec_for(getattr(d, "device_kind", d.platform))
    return DeviceInfo(
        platform=d.platform,
        device_kind=getattr(d, "device_kind", d.platform),
        index=index,
        num_devices=len(devs),
        peak_bf16_tflops=spec["bf16_tflops"],
        peak_hbm_gbps=spec["hbm_gbps"],
        hbm_gib=spec["hbm_gib"],
        coords=tuple(getattr(d, "coords", ()) or ()),
    )


def device_count() -> int:
    return get_backend().device_count


def is_tpu_available() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:  # pragma: no cover
        return False
