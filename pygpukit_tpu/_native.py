"""ctypes loader for the native runtime services library.

Replaces the reference's PyO3 module access (reference: core/backend.py:510
get_rust_module). The library is optional: every consumer has a pure-Python
fallback (reference pattern: memory/pool.py:22-32 PYGPUKIT_USE_RUST toggle).
Auto-builds via make on first use if a toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_NAME = "libpygpukit_native.so"

_lib = None
_tried = False


class PkPoolStats(ctypes.Structure):
    _fields_ = [(n, ctypes.c_uint64) for n in (
        "quota_bytes", "used_bytes", "peak_bytes", "allocations", "frees",
        "reuses", "evictions", "failures", "free_list_bytes")]


class PkSchedConfig(ctypes.Structure):
    _fields_ = [("total_memory", ctypes.c_uint64),
                ("overcommit_ratio", ctypes.c_double),
                ("max_pending", ctypes.c_uint32),
                ("total_bandwidth", ctypes.c_double)]


class PkTaskDesc(ctypes.Structure):
    _fields_ = [("memory_bytes", ctypes.c_uint64),
                ("bandwidth", ctypes.c_double),
                ("qos", ctypes.c_int32),
                ("priority", ctypes.c_int32),
                ("partition_id", ctypes.c_uint64)]


class PkAdmitResult(ctypes.Structure):
    _fields_ = [("decision", ctypes.c_int32),
                ("eta_seconds", ctypes.c_double),
                ("available_memory", ctypes.c_uint64)]


class PkSchedStats(ctypes.Structure):
    _fields_ = [(n, ctypes.c_uint64) for n in (
        "submitted", "completed", "failed", "rejected", "queued", "running",
        "reserved_memory")]


class PkPartitionLimits(ctypes.Structure):
    _fields_ = [("memory_bytes", ctypes.c_uint64),
                ("compute_fraction", ctypes.c_double),
                ("bandwidth", ctypes.c_double),
                ("max_streams", ctypes.c_uint32)]


class PkPartitionUsage(ctypes.Structure):
    _fields_ = [("memory_used", ctypes.c_uint64),
                ("bandwidth_used", ctypes.c_double),
                ("streams_used", ctypes.c_uint32),
                ("tasks_admitted", ctypes.c_uint64),
                ("tasks_rejected", ctypes.c_uint64)]


class PkTransferStats(ctypes.Structure):
    _fields_ = [(n, ctypes.c_uint64) for n in (
        "submitted", "completed", "bytes_h2d", "bytes_d2h", "queue_depth")]


TRANSFER_CALLBACK = ctypes.CFUNCTYPE(None, ctypes.c_uint64, ctypes.c_void_p)


def _configure(lib) -> None:
    lib.pk_pool_create.restype = ctypes.c_void_p
    lib.pk_pool_create.argtypes = [ctypes.c_uint64]
    lib.pk_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.pk_pool_alloc.restype = ctypes.c_uint64
    lib.pk_pool_alloc.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int]
    lib.pk_pool_free.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pk_pool_host_ptr.restype = ctypes.c_void_p
    lib.pk_pool_host_ptr.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pk_pool_block_size.restype = ctypes.c_uint64
    lib.pk_pool_block_size.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pk_pool_touch.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pk_pool_trim.restype = ctypes.c_uint64
    lib.pk_pool_trim.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pk_pool_stats.argtypes = [ctypes.c_void_p, ctypes.POINTER(PkPoolStats)]

    lib.pk_sched_create.restype = ctypes.c_void_p
    lib.pk_sched_create.argtypes = [ctypes.POINTER(PkSchedConfig)]
    lib.pk_sched_destroy.argtypes = [ctypes.c_void_p]
    lib.pk_sched_submit.restype = ctypes.c_uint64
    lib.pk_sched_submit.argtypes = [ctypes.c_void_p, ctypes.POINTER(PkTaskDesc),
                                    ctypes.POINTER(PkAdmitResult)]
    lib.pk_sched_next.restype = ctypes.c_uint64
    lib.pk_sched_next.argtypes = [ctypes.c_void_p]
    lib.pk_sched_complete.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                      ctypes.c_int]
    lib.pk_sched_cancel.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pk_sched_task_state.restype = ctypes.c_int32
    lib.pk_sched_task_state.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pk_sched_stats.argtypes = [ctypes.c_void_p, ctypes.POINTER(PkSchedStats)]

    lib.pk_part_create.restype = ctypes.c_uint64
    lib.pk_part_create.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(PkPartitionLimits)]
    lib.pk_part_destroy.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pk_part_acquire.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                    ctypes.c_uint64, ctypes.c_double]
    lib.pk_part_release.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                    ctypes.c_uint64, ctypes.c_double]
    lib.pk_part_usage.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                  ctypes.POINTER(PkPartitionUsage)]

    lib.pk_transfer_create.restype = ctypes.c_void_p
    lib.pk_transfer_create.argtypes = [ctypes.c_int]
    lib.pk_transfer_destroy.argtypes = [ctypes.c_void_p]
    lib.pk_transfer_submit.restype = ctypes.c_uint64
    lib.pk_transfer_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, TRANSFER_CALLBACK, ctypes.c_void_p]
    lib.pk_transfer_wait.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pk_transfer_sync.argtypes = [ctypes.c_void_p]
    lib.pk_transfer_stats.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(PkTransferStats)]
    lib.pk_version.restype = ctypes.c_char_p


def get_native():
    """The loaded native library, or None (pure-Python fallbacks engage)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("PYGPUKIT_USE_NATIVE", "1") == "0":
        return None
    lib_path = _NATIVE_DIR / _LIB_NAME
    if not lib_path.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        _lib = ctypes.CDLL(str(lib_path))
        _configure(_lib)
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return get_native() is not None
