"""Quantization configs + model weight quantization (reference:
src/pygpukit/llm/quant.py:30-376 — FP8QuantConfig, QAT/pruning/sparsity
metadata, FP8 E4M3 dequant, direct FP8 weight load).

TPU-native quantized inference: projection weights are stored fp8/int8 with
per-column f32 scales ({"q","scale"} leaves consumed by model._mm). HBM
weight traffic drops 2x (fp8) — the decode bottleneck — while the MXU
computes in bf16. No LUT dequant kernel is needed: XLA fuses the on-chip
upconvert into the dot.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Config metadata (parity with reference quant.py:30-233)
# ---------------------------------------------------------------------------

@dataclass
class FP8QuantConfig:
    fmt: Literal["e4m3", "e5m2"] = "e4m3"
    scale_granularity: Literal["tensor", "channel", "block"] = "channel"
    block_size: int = 128


@dataclass
class QATConfig:
    enabled: bool = False
    bits: int = 8
    symmetric: bool = True


@dataclass
class PruningConfig:
    sparsity: float = 0.0
    structured: bool = False
    pattern: str = "2:4"


@dataclass
class SparsityConfig:
    """Structured-sparsity metadata (reference: SparsityConfig,
    llm/quant.py — carried on checkpoints; inference treats it as
    descriptive)."""
    pattern: str = "2:4"
    sparsity: float = 0.5
    structured: bool = True


@dataclass
class ModelOptimizationInfo:
    """Aggregate optimization metadata for a checkpoint (reference:
    ModelOptimizationInfo)."""
    quantization: "FP8QuantConfig | None" = None
    qat: "QATConfig | None" = None
    pruning: "PruningConfig | None" = None
    sparsity: "SparsityConfig | None" = None


@dataclass
class QuantizationMetadata:
    method: str = "none"
    fp8: FP8QuantConfig = field(default_factory=FP8QuantConfig)
    qat: QATConfig = field(default_factory=QATConfig)
    pruning: PruningConfig = field(default_factory=PruningConfig)
    #: KV-cache quantization algo from the checkpoint's quantization_config
    #: (reference: kv_cache_quant_algo, src/pygpukit/llm/quant.py:76). "FP8"
    #: maps to a float8_e4m3fn cache (model.resolve_kv_dtype).
    kv_cache_quant_algo: str | None = None


def kv_dtype_from_quant_config(qc: dict | None) -> str | None:
    """Map a HF quantization_config's kv_cache_quant_algo to a kv_dtype
    name accepted by model.resolve_kv_dtype (None = no KV quantization)."""
    algo = (qc or {}).get("kv_cache_quant_algo")
    if algo is None:
        return None
    a = str(algo).lower()
    if "e5m2" in a:
        return "fp8_e5m2"
    if "fp8" in a or "e4m3" in a:
        return "fp8_e4m3"
    if "int8" in a:
        # ModelOpt INT8 schema -> per-row-scaled int8 dict caches — on v5e
        # this is the FAST capacity rung (integer converts run at stream
        # rate where the fp8 VPU convert costs 2x the attention kernel;
        # docs/performance.md "int8-KV")
        return "int8"
    # unsupported algo: fall back to the dense cache rather than failing
    # the whole load — the weights are loadable either way, the KV algo is
    # an optimisation hint
    import warnings
    warnings.warn(f"unsupported kv_cache_quant_algo {algo!r}; "
                  "using the model dtype for the KV cache")
    return None


# ---------------------------------------------------------------------------
# Weight quantization
# ---------------------------------------------------------------------------

_QUANT_KEYS = {
    "w_q", "w_k", "w_v", "w_o", "w_qkv", "w_gate", "w_up", "w_gate_up",
    "w_down", "w_fc1", "w_fc2",
}

# MoE expert stacks [L, E, in, out]: quantized as {"q","scale"} consumed by
# ops.moe._expert_dot (scale-after-dot) / _dequant_stack (gmm path). fp8/int8
# only — the int4 packed-transposed layout targets the decode GEMV, which the
# grouped expert matmuls don't use.
_MOE_QUANT_KEYS = {"w_experts_gate", "w_experts_up", "w_experts_down"}


def quantize_weight(w: jnp.ndarray, mode: str = "fp8",
                    block_size: int = 32) -> dict:
    """One weight [..., in, out] → {"q", "scale"} with per-column scales.

    ``int4_block`` (alias ``nvf4`` — the reference's block-scaled 4-bit
    format, native/ops/matmul/gemm/w4a16_bf16/): per-(K-block, column)
    scales [..., K/B, out] instead of one scale per column. The finer
    scale granularity shrinks the quantization step everywhere the weight
    is locally small — the quality rung between int4 and int8 on the
    reference's ladder.
    """
    wf = w.astype(jnp.float32)
    if mode in ("int4_block", "nvf4"):
        B = block_size
        *lead, K, N = wf.shape
        kpad = (-K) % B
        if kpad:
            wf = jnp.pad(wf, [(0, 0)] * len(lead) + [(0, kpad), (0, 0)])
            K += kpad
        blk = wf.reshape(*lead, K // B, B, N)
        amax_b = jnp.max(jnp.abs(blk), axis=-2, keepdims=True)
        # round the scale to its bf16 STORAGE value before quantizing so
        # quant and dequant use the identical scale (quantizing against the
        # f32 scale added ~0.4% relative error per block on top of the
        # rung's quant error)
        scale_b = jnp.maximum(amax_b / 7.0, 1e-12).astype(
            jnp.bfloat16).astype(jnp.float32)                 # [...,K/B,1,N]
        q = jnp.clip(jnp.round(blk / scale_b), -7, 7).astype(jnp.int8)
        q = q.reshape(*lead, K, N)
        # K-MAJOR split-half packed storage [..., K/2, N] (unlike plain
        # int4's transposed [N, K/2]): with K on sublanes, the Pallas GEMV
        # expands the per-block scales with a SUBLANE broadcast + major-dim
        # reshape — pure VPU ops — instead of the MXU expansion dots the
        # N-major layout forced (those cost 2x the main GEMV's MXU work
        # and made int4_block 1.85x slower than int4). Row r carries
        # W[r] (low nibble) and W[K/2 + r] (high nibble).
        half = K // 2
        packed = ((q[..., :half, :] & 0xF)
                  | ((q[..., half:, :] & 0xF) << 4)).astype(jnp.uint8)
        # scales store BF16: at blk=32 an f32 [K/B, N] stack adds 25% to
        # the packed byte stream the decode GEMV reads every token (bf16:
        # 12.5%); the ~0.4% relative scale rounding is noise under the
        # rung's 10% RMS envelope. Kernels upcast in-register.
        return {"q_packed": packed,                           # [..., K/2, N]
                "scale_block": scale_b[..., 0, :].astype(jnp.bfloat16)}
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)       # [..., 1, out]
    if mode == "fp8":
        fmax = float(jnp.finfo(jnp.float8_e4m3fn).max)
        scale = jnp.maximum(amax / fmax, 1e-12)
        q = (wf / scale).astype(jnp.float8_e4m3fn)
    elif mode == "int8":
        scale = jnp.maximum(amax / 127.0, 1e-12)
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    elif mode == "int4":
        # packed storage: two 4-bit values per uint8 along the in-dim
        # (reference: int4 packed-uint8 dtype, core/dtypes.py — jax's native
        # S4 arrays cannot round-trip AOT executables on this runtime)
        scale = jnp.maximum(amax / 7.0, 1e-12)
        q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
        if q.shape[-2] % 2:
            pad = [(0, 0)] * q.ndim
            pad[-2] = (0, 1)
            q = jnp.pad(q, pad)
        # split-half packing in TRANSPOSED [out, in/2] layout: low nibble =
        # first half of K, high = second half. Transposed storage feeds the
        # Pallas GEMV directly (no per-step transpose); the unpack is free of
        # sub-32-bit interleaves, which Mosaic rejects.
        qt = jnp.swapaxes(q, -1, -2)                     # [..., N, K]
        half = qt.shape[-1] // 2
        lo = qt[..., :half] & 0xF
        hi = qt[..., half:] & 0xF
        packed = (lo | (hi << 4)).astype(jnp.uint8)      # [..., N, K/2]
        return {"q_packed": packed, "scale": scale}
    else:
        raise ValueError(f"unknown quant mode {mode!r}")
    return {"q": q, "scale": scale}


def unpack_int4(packed, axis: int = -1):
    """Split-half nibble unpack along ``axis``: low nibble = first half,
    high nibble = second half. Plain int4 stores [..., N, K/2] (axis=-1 ->
    [..., N, K]); int4_block stores K-major [..., K/2, N] (axis=-2 ->
    [..., K, N]). The unpacked dim includes any pack padding; callers
    zero-pad activations to match."""
    lo = ((packed << 4).astype(jnp.int8) >> 4)
    hi = packed.astype(jnp.int8) >> 4
    return jnp.concatenate([lo, hi], axis=axis)


def dequantize_weight(wq: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    if "q_packed" in wq:
        if "scale_block" in wq:
            q = unpack_int4(wq["q_packed"], axis=-2)           # [..., K, N]
            s = wq["scale_block"]                              # [..., K/B, N]
            *lead, K, N = q.shape
            nb = s.shape[-2]
            blk = q.reshape(*lead, nb, K // nb, N).astype(jnp.float32)
            return (blk * s[..., :, None, :]).reshape(*lead, K, N
                                                      ).astype(dtype)
        q = jnp.swapaxes(unpack_int4(wq["q_packed"]), -1, -2)  # -> [..., K, N]
        return (q.astype(jnp.float32) * wq["scale"]).astype(dtype)
    return (wq["q"].astype(jnp.float32) * wq["scale"]).astype(dtype)


def quantize_model_params(params: dict, mode: str = "fp8",
                          keys: set[str] | None = None,
                          head: bool | str = True) -> dict:
    """Quantize the projection weights of a model param pytree in place of
    their dense leaves (reference: load_fp8_weight_direct, quant.py:376 —
    here quantization happens post-load; direct-load of fp8 checkpoints
    arrives via loader dtype passthrough)."""
    if keys is None:
        packed4 = mode in ("int4", "int4_block", "nvf4")
        keys = _QUANT_KEYS | (set() if packed4 else _MOE_QUANT_KEYS)
    out = dict(params)
    layers = dict(params["layers"])
    for k in list(layers.keys()):
        if k in keys and not isinstance(layers[k], dict):
            layers[k] = quantize_weight(layers[k], mode)
    out["layers"] = layers
    if head and isinstance(out.get("lm_head"), jnp.ndarray):
        # Untied lm head: the largest single weight read per decoded token
        # (vocab x hidden — ~170 us/tok at HBM rate on the 1B bench model,
        # round-3 device trace). Per-column scales keep greedy tokens stable
        # (~0.1% logit RMS); packed-int4 modes take an INT8 head — int4
        # logit error shifts greedy order, int8 is the already-accepted
        # tradeoff and halves the dense-head read. head=False opts out, a
        # mode string (head="fp8") overrides. Tied-embed models are
        # untouched (the embed gather shares the table).
        head_mode = head if isinstance(head, str) else (
            "int8" if mode in ("int4", "int4_block", "nvf4") else mode)
        out["lm_head"] = quantize_weight(out["lm_head"], head_mode)
    return out


def dequantize_model_params(params: dict, dtype=jnp.bfloat16) -> dict:
    out = dict(params)
    layers = dict(params["layers"])
    for k, v in layers.items():
        if isinstance(v, dict) and ("q" in v or "q_packed" in v):
            layers[k] = dequantize_weight(v, dtype)
    out["layers"] = layers
    if isinstance(out.get("lm_head"), dict):
        out["lm_head"] = dequantize_weight(out["lm_head"], dtype)
    return out


def model_quant_bytes(params: dict) -> tuple[int, int]:
    """(quantized_bytes, dense_equivalent_bytes) for the layer stack."""
    qb = db = 0
    leaves = dict(params["layers"])
    if isinstance(params.get("lm_head"), dict):
        leaves["lm_head"] = params["lm_head"]
    for k, v in leaves.items():
        if isinstance(v, dict) and ("q" in v or "q_packed" in v):
            q = v.get("q", v.get("q_packed"))
            n = q.size
            qb += int(n * jnp.dtype(q.dtype).itemsize)
            db += (n * 2 if "q" in v else n * 4)  # packed holds 2 values/byte
        else:
            sz = int(v.size * jnp.dtype(v.dtype).itemsize)
            qb += sz
            db += sz
    return qb, db


# reference alias
QATQuantConfig = QATConfig
