"""Layer-streaming strategies for VRAM/HBM-constrained loading (reference:
src/pygpukit/llm/streaming.py:33-320 — SimpleStreaming / SlidingWindow /
AutoLRU over LazyModelLoader).

On TPU the same pattern holds: a model larger than HBM keeps weights mmap'd
on host and streams layer groups to the device around each block's execution.
The streaming context yields per-layer params; eviction follows the strategy.
"""

from __future__ import annotations

import enum
from contextlib import contextmanager
from dataclasses import dataclass

from .safetensors import LazyModelLoader


class LoadingStrategy(enum.Enum):
    EAGER = "eager"                  # everything up front
    SIMPLE = "simple"                # load layer, evict after use
    SLIDING_WINDOW = "sliding"       # prefetch next, keep window
    AUTO_LRU = "auto_lru"            # budget-driven LRU (LazyModelLoader)


@dataclass
class StreamingConfig:
    strategy: LoadingStrategy = LoadingStrategy.AUTO_LRU
    window: int = 2
    max_device_bytes: int | None = None


class LayerStreamingContext:
    """Iterate layers, materialising each layer's tensors on device per the
    strategy (reference: LayerStreamingContext, streaming.py:209)."""

    def __init__(self, loader: LazyModelLoader, layer_names: list[list[str]],
                 config: StreamingConfig | None = None):
        self.loader = loader
        self.layer_names = layer_names
        self.config = config or StreamingConfig()
        self._engine = None
        self._pending: list = []

    def _prefetch(self, names) -> None:
        """Stage the next layer's H2D through the async transfer engine so
        the uploads overlap the consumer's compute on the current layer
        (reference: rust transfer/engine.rs double-buffered streaming;
        the loader's internal lock makes worker-thread get() safe)."""
        from ..transfer.engine import AsyncTransferEngine
        if self._engine is None:
            self._engine = AsyncTransferEngine(num_workers=1)
        for name in names:
            self._pending.append(self._engine._submit(
                lambda n=name: self.loader.get(n), AsyncTransferEngine.LOW))

    def _drain_pending(self) -> None:
        """Surface prefetch errors instead of swallowing them (OOM during a
        worker-thread loader.get would otherwise vanish)."""
        pending, self._pending = self._pending, []
        for fut in pending:
            fut.result()

    def close(self) -> None:
        if self._engine is not None:
            self._engine.shutdown()
            self._engine = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self):
        n = len(self.layer_names)
        strat = self.config.strategy
        for i, names in enumerate(self.layer_names):
            self._drain_pending()
            tensors = {name: self.loader.get(name) for name in names}
            if strat == LoadingStrategy.SLIDING_WINDOW and i + 1 < n:
                self._prefetch(self.layer_names[i + 1])
            yield i, tensors
            if strat == LoadingStrategy.SIMPLE:
                for name in names:
                    self.loader.evict(name)
            elif strat == LoadingStrategy.SLIDING_WINDOW and i >= self.config.window - 1:
                for name in self.layer_names[i - self.config.window + 1]:
                    self.loader.evict(name)


@contextmanager
def create_streaming_context(path, layer_names: list[list[str]],
                             strategy: LoadingStrategy = LoadingStrategy.AUTO_LRU,
                             max_device_bytes: int | None = None,
                             dtype=None):
    """Context-manager entry point (reference: create_streaming_context,
    streaming.py:320)."""
    loader = LazyModelLoader(path, max_device_bytes=max_device_bytes,
                             dtype=dtype)
    try:
        yield LayerStreamingContext(
            loader, layer_names,
            StreamingConfig(strategy=strategy,
                            max_device_bytes=max_device_bytes))
    finally:
        loader.evict_all()
