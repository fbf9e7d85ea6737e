from .compiler import (
    CompileError, CompileErrorCode, JITKernel, check_platform_compatibility,
    jit, warmup,
)

__all__ = ["CompileError", "CompileErrorCode", "JITKernel",
           "check_platform_compatibility", "jit", "warmup"]
