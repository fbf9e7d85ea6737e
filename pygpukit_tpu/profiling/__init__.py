from .memory import MemoryProfiler, MemorySnapshot, print_memory_summary
from .profiler import (
    KernelRecord, Profiler, disable_profiling, enable_profiling,
    get_profile_stats, get_profiler, profile_matmul,
)

__all__ = [
    "MemoryProfiler", "MemorySnapshot", "print_memory_summary",
    "KernelRecord", "Profiler", "disable_profiling", "enable_profiling",
    "get_profile_stats", "get_profiler", "profile_matmul",
]
