from . import dtypes
from .array import Array, as_jax, wrap
from .backend import Backend, get_backend, set_backend, reset_backend, interpret_mode
from .device import DeviceInfo, device_count, get_device_info, is_tpu_available
from .dtypes import DataType, DataTypeKind, to_dtype
from .executable import Executable, ExecutableCache, capture, global_executable_cache
from .factory import (
    arange, empty, from_numpy, full, ones, ones_like, randn, zeros, zeros_like,
)
from .memory import MemoryInfo, get_memory_info, synchronize
from .stream import Event, Stream, StreamManager, StreamPriority, default_stream

__all__ = [
    "Array", "as_jax", "wrap", "dtypes", "DataType", "DataTypeKind", "to_dtype",
    "Backend", "get_backend", "set_backend", "reset_backend", "interpret_mode",
    "DeviceInfo", "device_count", "get_device_info", "is_tpu_available",
    "Executable", "ExecutableCache", "capture", "global_executable_cache",
    "zeros", "ones", "empty", "full", "arange", "from_numpy", "zeros_like",
    "ones_like", "randn",
    "MemoryInfo", "get_memory_info", "synchronize",
    "Event", "Stream", "StreamManager", "StreamPriority", "default_stream",
]
