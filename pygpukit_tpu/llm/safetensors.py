"""Safetensors loading: mmap parser, sharded files, lazy model loader.

Rebuilds the capability of the reference's Rust tensor loader + Python
wrappers (reference: rust/pygpukit-core/src/llm/tensor_loader.rs:48-154,
lazy_tensor.rs:68-310, src/pygpukit/llm/safetensors.py:122-495) in
numpy-mmap form: the file is memory-mapped once; tensor bytes are zero-copy
views into the map until device upload. Sharded checkpoints
(model.safetensors.index.json) and lazy per-tensor GPU loading with LRU
eviction are supported.
"""

from __future__ import annotations

import json
import mmap
import os
import threading
import struct
from collections import OrderedDict
from dataclasses import dataclass
from pathlib import Path

import numpy as np

try:  # ml_dtypes ships with jax; gives numpy views for bf16/fp8
    import ml_dtypes
    _BF16 = np.dtype(ml_dtypes.bfloat16)
    _F8E4M3 = np.dtype(ml_dtypes.float8_e4m3fn)
    _F8E5M2 = np.dtype(ml_dtypes.float8_e5m2)
except ImportError:  # pragma: no cover
    _BF16 = _F8E4M3 = _F8E5M2 = None

_DTYPE_MAP: dict[str, np.dtype] = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": _BF16,
    "F8_E4M3": _F8E4M3,
    "F8_E5M2": _F8E5M2,
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "BOOL": np.dtype(np.bool_),
}


@dataclass(frozen=True)
class TensorInfo:
    name: str
    dtype_str: str
    shape: tuple[int, ...]
    data_offsets: tuple[int, int]

    @property
    def np_dtype(self) -> np.dtype:
        d = _DTYPE_MAP.get(self.dtype_str)
        if d is None:
            raise ValueError(f"unsupported safetensors dtype {self.dtype_str}")
        return d

    @property
    def nbytes(self) -> int:
        return self.data_offsets[1] - self.data_offsets[0]


class SafeTensorsFile:
    """Single-file mmap safetensors reader (reference: SafeTensorsFile,
    llm/safetensors.py:122)."""

    def __init__(self, path: str | os.PathLike):
        self.path = str(path)
        self._file = open(self.path, "rb")
        self._mmap = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        header_len = int.from_bytes(self._mmap[:8], "little")
        header = json.loads(self._mmap[8:8 + header_len].decode("utf-8"))
        self.metadata: dict = header.pop("__metadata__", {})
        self._data_start = 8 + header_len
        self._tensors: dict[str, TensorInfo] = {}
        for name, info in header.items():
            self._tensors[name] = TensorInfo(
                name=name,
                dtype_str=info["dtype"],
                shape=tuple(info["shape"]),
                data_offsets=tuple(info["data_offsets"]),
            )

    # -- introspection -------------------------------------------------------

    def keys(self) -> list[str]:
        return list(self._tensors.keys())

    tensor_names = property(keys)

    def __contains__(self, name: str) -> bool:
        return name in self._tensors

    def info(self, name: str) -> TensorInfo:
        return self._tensors[name]

    def tensor_shape(self, name: str) -> tuple[int, ...]:
        return self._tensors[name].shape

    def tensor_dtype(self, name: str) -> str:
        return self._tensors[name].dtype_str

    # -- data access ---------------------------------------------------------

    def tensor_bytes(self, name: str) -> memoryview:
        """Zero-copy view of the raw tensor bytes in the mmap."""
        t = self._tensors[name]
        s, e = t.data_offsets
        return memoryview(self._mmap)[self._data_start + s:self._data_start + e]

    def tensor_numpy(self, name: str) -> np.ndarray:
        """Zero-copy numpy view (host memory stays mmap'd until touched)."""
        t = self._tensors[name]
        return np.frombuffer(self.tensor_bytes(name), dtype=t.np_dtype).reshape(t.shape)

    def close(self) -> None:
        try:
            self._mmap.close()
            self._file.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class ShardedSafeTensorsFile:
    """Sharded checkpoint via model.safetensors.index.json
    (reference: ShardedSafeTensorsFile, llm/safetensors.py:237)."""

    def __init__(self, index_path: str | os.PathLike):
        index_path = Path(index_path)
        with open(index_path) as f:
            index = json.load(f)
        self.weight_map: dict[str, str] = index["weight_map"]
        self.metadata = index.get("metadata", {})
        base = index_path.parent
        self._shards: dict[str, SafeTensorsFile] = {}
        for shard_name in sorted(set(self.weight_map.values())):
            self._shards[shard_name] = SafeTensorsFile(base / shard_name)

    def keys(self) -> list[str]:
        return list(self.weight_map.keys())

    tensor_names = property(keys)

    def __contains__(self, name: str) -> bool:
        return name in self.weight_map

    def _shard(self, name: str) -> SafeTensorsFile:
        return self._shards[self.weight_map[name]]

    def info(self, name: str) -> TensorInfo:
        return self._shard(name).info(name)

    def tensor_shape(self, name: str) -> tuple[int, ...]:
        return self._shard(name).tensor_shape(name)

    def tensor_dtype(self, name: str) -> str:
        return self._shard(name).tensor_dtype(name)

    def tensor_bytes(self, name: str) -> memoryview:
        return self._shard(name).tensor_bytes(name)

    def tensor_numpy(self, name: str) -> np.ndarray:
        return self._shard(name).tensor_numpy(name)

    def close(self) -> None:
        for s in self._shards.values():
            s.close()


def load_safetensors(path: str | os.PathLike):
    """Auto-detect single vs sharded checkpoint (reference: load_safetensors,
    llm/safetensors.py:383).

    ``path`` may be a .safetensors file, an index.json, or a directory
    containing either.
    """
    p = Path(path)
    if p.is_dir():
        idx = p / "model.safetensors.index.json"
        if idx.exists():
            return ShardedSafeTensorsFile(idx)
        single = p / "model.safetensors"
        if single.exists():
            return SafeTensorsFile(single)
        cands = sorted(p.glob("*.safetensors"))
        if len(cands) == 1:
            return SafeTensorsFile(cands[0])
        raise FileNotFoundError(f"no safetensors checkpoint found in {p}")
    if p.suffix == ".json":
        return ShardedSafeTensorsFile(p)
    return SafeTensorsFile(p)


# ---------------------------------------------------------------------------
# Lazy loading with LRU eviction (reference: LazyModelLoader / LazyTensor,
# rust/lazy_tensor.rs:68-310)
# ---------------------------------------------------------------------------

class TensorState:
    """Lifecycle of a lazily loaded tensor (reference: TensorState)."""
    UNLOADED = "unloaded"
    LOADED = "loaded"
    EVICTED = "evicted"


class LazyModelLoader:
    """Tensors stay mmap'd on host until device access; LRU-evicts device
    copies when the HBM budget is exceeded."""

    def __init__(self, st, max_device_bytes: int | None = None, dtype=None):
        from ..core.dtypes import to_dtype
        self.st = st if not isinstance(st, (str, os.PathLike)) else load_safetensors(st)
        self.max_device_bytes = max_device_bytes
        self.target_dtype = to_dtype(dtype) if dtype is not None else None
        self._device: OrderedDict[str, object] = OrderedDict()
        self._device_bytes = 0
        self._lock = threading.RLock()   # async prefetch workers call get()
        self.stats = {"loads": 0, "hits": 0, "evictions": 0}

    def keys(self) -> list[str]:
        return self.st.keys()

    def state(self, name: str) -> str:
        return TensorState.LOADED if name in self._device else TensorState.UNLOADED

    def get(self, name: str):
        """Device tensor for ``name``, loading + possibly LRU-evicting.
        Thread-safe: the streaming context's engine prefetches from worker
        threads."""
        with self._lock:
            return self._get_locked(name)

    def _get_locked(self, name: str):
        import jax
        from ..core.backend import get_backend
        if name in self._device:
            self.stats["hits"] += 1
            self._device.move_to_end(name)
            return self._device[name][0]
        host = self.st.tensor_numpy(name)
        if self.target_dtype is not None:
            host = host.astype(self.target_dtype.np_dtype)
        buf = jax.device_put(host, get_backend().device)
        nbytes = host.nbytes
        if self.max_device_bytes is not None:
            while self._device and self._device_bytes + nbytes > self.max_device_bytes:
                _, (old_buf, old_bytes) = self._device.popitem(last=False)
                self._device_bytes -= old_bytes
                self.stats["evictions"] += 1
                del old_buf
        self._device[name] = (buf, nbytes)
        self._device_bytes += nbytes
        self.stats["loads"] += 1
        return buf

    get_array = get

    def evict(self, name: str) -> None:
        with self._lock:
            self._evict_locked(name)

    def _evict_locked(self, name: str) -> None:
        if name in self._device:
            _, nbytes = self._device.pop(name)
            self._device_bytes -= nbytes
            self.stats["evictions"] += 1

    def evict_all(self) -> None:
        for k in list(self._device):
            self.evict(k)


# ---------------------------------------------------------------------------
# Writer — checkpoint save (reference loads safetensors; saving closes the
# checkpoint/resume loop, e.g. persisting quantized weights: SURVEY §5.4)
# ---------------------------------------------------------------------------

_NP_TO_ST = {v: k for k, v in _DTYPE_MAP.items() if v is not None}


def save_safetensors(path: str | os.PathLike, tensors: dict) -> None:
    """Write {name: array} to a safetensors file (JSON header + raw
    little-endian buffers, 8-byte-aligned header as per the format spec)."""
    header: dict = {}
    blobs: list[bytes] = []
    offset = 0
    for name, arr in tensors.items():
        a = np.ascontiguousarray(np.asarray(arr))
        st_dtype = _NP_TO_ST.get(a.dtype)
        if st_dtype is None:
            raise ValueError(f"unsupported dtype {a.dtype} for {name!r}")
        raw = a.tobytes()
        header[name] = {"dtype": st_dtype, "shape": list(a.shape),
                        "data_offsets": [offset, offset + len(raw)]}
        blobs.append(raw)
        offset += len(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode()
    pad = (8 - (len(hjson) % 8)) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for raw in blobs:
            f.write(raw)


def _flatten_params(params: dict, prefix: str = "") -> dict:
    flat: dict = {}
    for k, v in params.items():
        name = f"{prefix}{k}"
        if v is None:
            continue
        if isinstance(v, dict):
            flat.update(_flatten_params(v, f"{name}."))
        else:
            flat[name] = v
    return flat


def save_model_params(path: str | os.PathLike, params: dict) -> None:
    """Persist a model param pytree (incl. quantized {"q","scale"} leaves —
    dict nesting flattens to dotted names) as one safetensors file."""
    save_safetensors(path, _flatten_params(params))


def load_model_params(path: str | os.PathLike) -> dict:
    """Inverse of save_model_params: dotted names unflatten back into the
    nested pytree; leaves come back as jax arrays."""
    import jax.numpy as jnp
    st = SafeTensorsFile(path)
    out: dict = {}
    for name in st.keys():
        parts = name.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(st.tensor_numpy(name)))
    st.close()
    return out
