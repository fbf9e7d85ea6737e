"""Work slicing: split large device operations into tiles with yield points
(reference: rust dispatch/slicing.rs:10-407 SliceScheduler — kernel
micro-slicing so long-running launches can't monopolise the device).

On TPU, a monolithic jitted op cannot be preempted; slicing means issuing the
work as a sequence of smaller programs with scheduler yield points between
them — exactly what the reference's tile loop does at kernel level.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Callable

import jax.numpy as jnp


@dataclass
class SliceConfig:
    slice_rows: int = 1024             # rows per slice
    yield_fn: Callable | None = None   # called between slices


@dataclass
class SliceStats:
    operations: int = 0
    slices: int = 0
    yields: int = 0


class SliceScheduler:
    def __init__(self, config: SliceConfig | None = None):
        self.config = config or SliceConfig()
        self.stats = SliceStats()
        self._lock = threading.Lock()

    def run_sliced(self, fn: Callable, x, *args, axis: int = 0):
        """Apply ``fn`` over ``x`` in row slices; concatenate results.

        fn must be row-independent along ``axis`` (elementwise/rowwise ops,
        matmul over the M dimension, …).
        """
        n = x.shape[axis]
        rows = self.config.slice_rows
        with self._lock:
            self.stats.operations += 1
        if n <= rows:
            with self._lock:
                self.stats.slices += 1
            return fn(x, *args)
        outs = []
        for start in range(0, n, rows):
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(start, min(start + rows, n))
            outs.append(fn(x[tuple(idx)], *args))
            with self._lock:
                self.stats.slices += 1
            if self.config.yield_fn is not None:
                self.config.yield_fn()
                with self._lock:
                    self.stats.yields += 1
        return jnp.concatenate(outs, axis=axis)
