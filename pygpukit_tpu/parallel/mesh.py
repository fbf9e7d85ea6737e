"""Device mesh construction for multi-chip execution.

The reference is single-GPU (SURVEY §2.4); multi-chip on TPU is native:
models and batches are laid out over a ``jax.sharding.Mesh`` and XLA inserts
ICI collectives. This module builds meshes and the standard axis layout:

  dp — data parallel (batch)
  tp — tensor parallel (attention heads / FFN columns)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int | None = None,
              axis_names: tuple[str, ...] = ("dp", "tp")) -> Mesh:
    """2D dp×tp mesh over the first ``n_devices`` devices.

    ``tp`` defaults to the largest power of two ≤ n_devices (tensor
    parallelism rides ICI best); dp gets the rest.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if tp is None:
        tp = 1
        while tp * 2 <= n and n % (tp * 2) == 0:
            tp *= 2
    dp = n // tp
    arr = np.array(devs[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
