"""pygpukit_tpu — TPU-native deterministic inference runtime.

A from-scratch rebuild of the capabilities of PyGPUkit (m96-chan/PyGPUkit) for
TPU: JAX/XLA/Pallas compute, AOT-compiled replayable executables, QoS-aware
scheduling, and model stacks (LLM / diffusion / TTS / ASR / audio).

Public API mirrors the reference's ``pygpukit/__init__.py`` stability table:
factory, elementwise, math, matmul, reductions, neural ops, dtypes, llm.
"""

from __future__ import annotations

import os as _os

# Persistent XLA compilation cache: compiles (especially Mosaic/Pallas) are
# expensive on tunneled TPU hosts; cache survives process restarts.
_cache_dir = _os.environ.get("PYGPUKIT_COMPILE_CACHE",
                             _os.path.expanduser("~/.cache/pygpukit_tpu/xla"))
if _cache_dir and _cache_dir != "0":
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        import jax as _jax
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

__version__ = "0.1.0"

from . import (
    asr, core, diffusion, dispatch, jit, kernels, llm, memory, ops, parallel,
    pipeline, profiling, scheduler, transfer, tts,
)
from .core import (
    Array, DataType, DataTypeKind, Event, Stream, StreamManager, StreamPriority,
    arange, capture, default_stream, device_count, dtypes, empty, from_numpy,
    full, get_backend, get_device_info, get_memory_info, interpret_mode,
    is_tpu_available, ones, ones_like, randn, set_backend, synchronize,
    to_dtype, zeros, zeros_like,
)
from .core.dtypes import (
    bfloat16, bool_, float8_e4m3, float8_e5m2, float16, float32, float64, fp8,
    int4, int8, int16, int32, int64, uint8, uint16, uint32,
)
from .ops import (
    add, add_scaled, argmax, argmin, batched_matmul, cast, clamp, concat, cos,
    cumsum, div, embedding_lookup, exp, flash_attention, gelu, geglu, gemv,
    grouped_matmul, l2norm, layernorm, log, log_softmax, matmul, matmul_fp8,
    matmul_int8, matmul_nt, matmul_w8a16, max, maximum, mean, min, minimum,
    mul, neg, relu, relu2, rmsnorm, rope_init, rope_inplace, rsqrt,
    sample_token_gpu, sdpa_causal, sdpa_causal_fixed_cache, set_sampling_seed,
    sigmoid, silu, sin, softmax, sqrt, sub, sum, sum_axis, swiglu, tanh, where,
)
from .ops.unary import abs  # noqa: A004 - reference API name
from .ops.tensor import transpose_2d as transpose
from .ops.nn.fused import linear_bias_gelu
from .ops.nn.recurrent import lstm as lstm_forward
from .jit.compiler import (
    JITKernel, get_warmup_error, is_warmup_done, warmup,
)

# Reference-name compatibility: the NumPy-like device array and the
# replayable executable keep the reference's class names importable
# (reference __init__.py stability table: GPUArray, CudaGraph ~ capture).
GPUArray = Array
