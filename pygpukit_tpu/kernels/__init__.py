"""Pallas kernel library (the "native" layer).

Kernels here are explicit opt-ins on top of the XLA-first ops layer — used
where hand control of VMEM/DMA/fusion beats the XLA default (quantized GEMV,
attention variants, MoE ragged matmul). Each kernel has an XLA reference
implementation in ops/ used for CPU-simulation tests.
"""

from . import gemm

__all__ = ["gemm"]
