"""Unified causal transformer model (GPT-2 / LLaMA / Qwen2 / Qwen3 / MoE).

Rebuilds the reference's CausalTransformerModel (reference:
src/pygpukit/llm/models/causal.py:79 — forward, generate/generate_stream,
zero-alloc decode, fixed-cache decode, KV snapshot/restore) TPU-first:

* Parameters are a pytree of stacked per-layer jnp arrays; the layer loop is
  ``lax.scan``, so the whole forward is one fused XLA program.
* KV cache is a fixed preallocated [L, MAX, Hk, D] buffer pair; decode is ONE
  AOT-compiled executable with donated cache buffers (the CUDA-Graph replay
  analog — but attention and cache update live INSIDE the executable, since
  fixed shapes + masking remove the reference's need to keep them outside,
  m1_graph.py:29-35).
* Same executable serves every context length: ``pos`` is a traced scalar,
  attention masks beyond it. Prefill is bucketed to powers of two to bound
  recompiles.
* Determinism: greedy decode is argmax on f32 logits inside the executable;
  seeded sampling uses explicit jax PRNG keys.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from dataclasses import dataclass
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.executable import Executable, capture
from ..ops.embedding import kv_cache_zeros, kv_leaf, kv_write
from ..ops.nn.activation import gelu_fn, swiglu_fn
from ..ops.nn.attention import (flash_attention_fn, sdpa_batch_pools_fn,
                                sdpa_fixed_cache_fn)
from ..ops.nn.norm import layernorm_fn, l2norm_fn, rmsnorm_fn
from ..ops.nn.rope import apply_rope_fn
from .config import ModelSpec, TransformerConfig

_F32 = jnp.float32

#: see batched_trace() — consulted by _mm at trace time. A ContextVar (not
#: a module global) so a capture() tracing on one thread cannot leak batched
#: kernel routing into a single-stream trace running on another.
_batched_trace_depth: contextvars.ContextVar[int] = contextvars.ContextVar(
    "pygpukit_batched_trace_depth", default=0)


@contextlib.contextmanager
def batched_trace():
    """Mark the enclosing capture as a BATCHED decode trace (vmapped over
    serving slots). Kernel selection in _mm happens at Python trace time,
    but vmap's scan/body batching rules re-trace with per-example tracers,
    so batching is invisible from inside — the serving engines wrap their
    chunk-executable captures in this context instead. Single-stream-only
    kernels (the Pallas packed-int4 GEMVs, which would re-stream the whole
    weight stack once per slot under vmap) defer to XLA inside it."""
    tok = _batched_trace_depth.set(_batched_trace_depth.get() + 1)
    try:
        yield
    finally:
        _batched_trace_depth.reset(tok)


def _pf32(*arrs):
    """precision=HIGHEST when every operand is genuinely f32 — JAX's DEFAULT
    matmul precision runs f32 dots through bf16 MXU passes on TPU (measured
    4.5e-3 logits rel err vs transformers on an f32 load; HIGHEST restores
    ~1e-5). Gate on the PRE-cast dtypes: bf16 models cast to f32 for softmax
    stability carry only bf16 information, so DEFAULT is free and exact for
    them. PYGPUKIT_ALLOW_TF32=1 opts back into fast mode (ops/matmul.py)."""
    if all(a.dtype == _F32 for a in arrs):
        from ..ops.matmul import _f32_precision
        return _f32_precision()
    return None


def resolve_kv_dtype(kv_dtype, model_dtype):
    """KV-cache storage dtype: explicit arg > PYGPUKIT_KV_DTYPE env >
    the model dtype. Accepted names: fp8 / fp8_e4m3 (aliases), fp8_e5m2,
    int8 (per-row-scaled dict caches — the FAST capacity rung on v5e, see
    ops/embedding.kv_cache_zeros), bf16 / bfloat16, f32 / float32."""
    import os
    if kv_dtype is None:
        kv_dtype = os.environ.get("PYGPUKIT_KV_DTYPE", "") or None
    if kv_dtype is None:
        return model_dtype
    if isinstance(kv_dtype, str):
        names = {
            "fp8": jnp.float8_e4m3fn, "fp8_e4m3": jnp.float8_e4m3fn,
            "e4m3": jnp.float8_e4m3fn, "fp8_e5m2": jnp.float8_e5m2,
            "e5m2": jnp.float8_e5m2, "int8": jnp.int8,
            "bf16": jnp.bfloat16,
            "bfloat16": jnp.bfloat16, "f32": jnp.float32,
            "float32": jnp.float32,
        }
        if kv_dtype not in names:
            raise ValueError(f"unknown kv_dtype {kv_dtype!r}; "
                             f"one of {sorted(names)}")
        return names[kv_dtype]
    return kv_dtype


def _mm(x, w, out_dtype=None, int8_mode=None):
    """Matmul against a possibly-quantized weight leaf.

    Dense leaf: jnp array [in, out]. Quantized leaf (reference LinearFP8 /
    W8A16, llm/layers/linear.py:25,106): {"q": fp8/int8 [in,out],
    "scale": f32 scalar or [1, out]} — fp8 bytes stream from HBM (half/quarter
    the traffic), the MXU computes in bf16, XLA fuses upconvert + scale.
    ``out_dtype`` overrides the result dtype (default: x.dtype) — the logits
    head passes f32 so a quantized lm_head keeps full-precision logits.
    ``int8_mode`` ("w8a8"/"w8a16") overrides the PYGPUKIT_INT8_MODE env
    selection per call site.
    """
    out_dtype = out_dtype or x.dtype
    if isinstance(w, dict):
        if "q_packed" in w:
            import os
            from ..core.backend import get_backend
            packed = w["q_packed"]    # plain int4: [N, K/2] transposed;
            # int4_block: K-MAJOR [K/2, N] (sublane scales need no MXU
            # expansion — kernels/gemv_quant._block_scale_expand)
            idx = w.get("_idx")       # set by _slice_layer_params: packed
            # leaves arrive STACKED [L, ...] with the layer index, so the
            # Pallas kernel can select the layer via scalar prefetch instead
            # of a materialized dynamic-slice copy (761 us/tok on 1B int4)
            blocked = "scale_block" in w               # NVF4-analog leaves
            # The Pallas GEMV is a SINGLE-STREAM kernel: under vmap (the
            # serving engine's batched chunk) the batch becomes a leading
            # grid dim whose weight index_map ignores the batch index, so
            # the kernel re-streams the whole weight stack once PER SLOT —
            # measured batch-8 serving 1065 tok/s Pallas vs 1584-1616 XLA
            # vs int8's 1798-1816 (scripts/micro_serving_int4.py). Batched
            # traces auto-route to the XLA dequant dot (weights stream
            # once for all rows); PYGPUKIT_INT4_BATCHED=pallas opts out.
            # (An explicit trace-scope flag, not a BatchTracer check: the
            # scan/vmap batching rules trace the body with PER-EXAMPLE
            # tracers, so vmap is invisible from inside _mm — the serving
            # engine wraps its chunk captures in ``batched_trace()``.)
            batched = (_batched_trace_depth.get() > 0
                       and os.environ.get("PYGPUKIT_INT4_BATCHED", "xla")
                       != "pallas")
            env_pallas = (not batched
                          and os.environ.get("PYGPUKIT_INT4_GEMV", "pallas")
                          == "pallas")
            # w4a8 default on TPU: per-row int8 activation quant + NATIVE
            # int8 MXU dots — the bf16-unpack GEMV was VPU-bound (traced
            # ~53 us/layer vs ~36 stream-ideal; w4a8 streamed 725 vs 574
            # GB/s packed). PYGPUKIT_INT4_MODE=w4a16 opts out (bf16 acts,
            # no activation quant error). Blocked leaves default to the
            # w4a8 Z-decomposition kernel too (_block_w4a8_tile_dots):
            # after the Mosaic gather fixes it measures 528 vs v1's 406
            # tok/s on the 1B decode (scripts/micro_block_v2.py, round 4);
            # PYGPUKIT_INT4_BLOCK=w4a16 opts back to the bf16-unpack form.
            w4a8 = os.environ.get("PYGPUKIT_INT4_MODE", "w4a8") == "w4a8"
            if blocked:
                w4a8 = os.environ.get("PYGPUKIT_INT4_BLOCK", "w4a8") \
                    == "w4a8"
            on_tpu = get_backend().platform == "tpu"
            kh_ax, n_ax = (-2, -1) if blocked else (-1, -2)
            if idx is not None and packed.ndim == 3:
                kh3, n3 = packed.shape[kh_ax], packed.shape[n_ax]
                if blocked:
                    from ..kernels.gemv_quant import stacked_tiles_exact_km
                    blk3 = 2 * kh3 // w["scale_block"].shape[-2]
                    tiles_ok = stacked_tiles_exact_km(kh3, n3, blk3)
                else:
                    from ..kernels.gemv_quant import stacked_tiles_exact
                    tiles_ok = stacked_tiles_exact(n3, kh3)
                if (env_pallas and on_tpu
                        and x.shape[0] <= 8
                        and x.shape[-1] == 2 * kh3
                        and n3 * kh3 >= (1 << 19)
                        and tiles_ok):
                    if blocked and w4a8:
                        from ..kernels.gemv_quant import (
                            gemv_int4_block_w4a8_stacked,
                        )
                        y = gemv_int4_block_w4a8_stacked(
                            packed, idx, x, w["scale_block"],
                            slo_stack=w.get("scale_lo"),
                            shi_stack=w.get("scale_hi"))
                    elif blocked:
                        from ..kernels.gemv_quant import (
                            gemv_int4_block_stacked,
                        )
                        y = gemv_int4_block_stacked(
                            packed, idx, x, w["scale_block"],
                            slo_stack=w.get("scale_lo"),
                            shi_stack=w.get("scale_hi"))
                    elif w4a8:
                        from ..kernels.gemv_quant import (
                            gemv_int4_w4a8_stacked,
                        )
                        y = gemv_int4_w4a8_stacked(packed, idx, x,
                                                   w["scale"])
                    else:
                        from ..kernels.gemv_quant import (
                            gemv_int4_packed_stacked,
                        )
                        y = gemv_int4_packed_stacked(packed, idx, x,
                                                     w["scale"])
                    return y.astype(out_dtype)
                # fallback: slice the layer here (same as the caller would
                # have) and continue through the 2-D paths below. Mark it:
                # a pallas_call CANNOT absorb this dynamic slice the way an
                # XLA dot does — feeding the sliced operand to the w4a8 GEMM
                # below would materialize a full per-call copy of the
                # layer's packed weight (the 761 us/tok class of cost), so
                # sliced in-loop M>8 operands must stay on the XLA dequant
                # dot until a scalar-prefetch STACKED GEMM exists.
                sliced_here = True
                packed = lax.dynamic_index_in_dim(packed, idx, 0,
                                                  keepdims=False)
                w = {k: (lax.dynamic_index_in_dim(v, idx, 0, keepdims=False)
                         if k != "_idx" and v.ndim > 2 else v)
                     for k, v in w.items() if k != "_idx"}
            else:
                sliced_here = False
            if blocked:
                from ..kernels.gemv_quant import block_tiles_aligned
                blk_ok = (packed.ndim == 2 and block_tiles_aligned(
                    packed.shape[-2], packed.shape[-1],
                    x.shape[-1] // w["scale_block"].shape[-2]))
            else:
                blk_ok = True
            if (env_pallas
                    and x.shape[0] <= 8 and packed.ndim == 2
                    and x.shape[-1] == 2 * packed.shape[kh_ax]  # no padding
                    and packed.size >= (1 << 19)   # tiny mats: XLA (a Mosaic
                    # compile costs ~3 min over the tunnel; sub-512KB weights
                    # are dispatch-bound either way)
                    and blk_ok and on_tpu):
                # Pallas in-register nibble unpack: streams packed uint8 from
                # HBM (4x less traffic than bf16), unpacks in VMEM
                if blocked:
                    from ..kernels.gemv_quant import gemv_int4_block
                    y = gemv_int4_block(packed, x, w["scale_block"])
                elif w4a8:
                    from ..kernels.gemv_quant import gemv_int4_w4a8
                    y = gemv_int4_w4a8(packed, x, jnp.ravel(w["scale"]))
                else:
                    from ..kernels.gemv_quant import gemv_int4_packed
                    y = gemv_int4_packed(packed, x, jnp.ravel(w["scale"]))
                return y.astype(out_dtype)
            if (on_tpu and not blocked and w4a8 and not batched
                    and (not sliced_here or x.shape[0] >= 256)
                    and packed.ndim == 2 and x.ndim == 2 and x.shape[0] > 8
                    and 0 <= 2 * packed.shape[-1] - x.shape[-1] <= 1
                    and packed.size >= (1 << 19)
                    and os.environ.get("PYGPUKIT_INT4_GEMM", "pallas")
                    == "pallas"):
                # M>1 rows on UNSLICED 2-D weights (lm head, direct calls):
                # the w4a8 int4 GEMM's native int8 MXU tile dots measured
                # 218.3 vs the XLA dequant dot's 152.8 TOPS (bench.py
                # int4_gemm_tops). Auto-selected on TPU per the
                # measured-better rule; PYGPUKIT_INT4_GEMM=xla opts out.
                # Layer-sliced in-loop operands are excluded BELOW M=256
                # (sliced_here): the Pallas call makes XLA materialize a
                # per-call copy of the layer's weight (~3x its stream
                # bytes), which dominates in the stream-bound small-M
                # regime (admission prefills, batch-rows at max_batch>8) —
                # those stay on the XLA dequant dot, which absorbs the
                # slice. At M >= 256 the GEMM is compute-bound and its
                # 218.3-vs-152.8 TOPS advantage beats the copy tax
                # (crossover ~M=133: 2M·K·N/218e12 vs 2·(K·N/2)/819e9),
                # so long prefills keep the kernel.
                from ..kernels.gemv_quant import gemm_int4_w4a8
                y = gemm_int4_w4a8(packed, x, jnp.ravel(w["scale"]))
                return y.astype(out_dtype)
            from .quant import unpack_int4
            xb = x.astype(jnp.bfloat16)
            if blocked:
                # dequantize per block into the dot operand (XLA fuses the
                # broadcast-multiply into the contraction feed); K-major
                # storage unpacks straight to [K, N]
                q = unpack_int4(packed, axis=-2)       # [K(+pad), N]
                k_un = q.shape[-2]
                if xb.shape[-1] < k_un:   # pack padding: zero-extend acts
                    xb = jnp.pad(xb, ((0, 0), (0, k_un - xb.shape[-1])))
                s = w["scale_block"]                   # [K/B, N]
                nb = s.shape[-2]
                wd = (q.reshape(nb, k_un // nb, -1).astype(jnp.bfloat16)
                      * s[:, None, :].astype(jnp.bfloat16)
                      ).reshape(k_un, -1)
                return jnp.dot(xb, wd,
                               preferred_element_type=_F32).astype(out_dtype)
            q_t = unpack_int4(packed)                  # [N, K(+pad)]
            k_un = q_t.shape[-1]
            if xb.shape[-1] < k_un:   # pack padding: zero-extend activations
                xb = jnp.pad(xb, ((0, 0), (0, k_un - xb.shape[-1])))
            acc = jax.lax.dot_general(
                xb, q_t.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=_F32)
            return (acc * w["scale"]).astype(out_dtype)
        q = w["q"]
        idx = w.get("_idx")
        if idx is not None and q.ndim == 3:
            # stacked fp8 leaf: the converting Pallas GEMV
            # (gemv_conv_stacked) converts fp8->bf16 in-register after the
            # tile DMA. MEASURED NEGATIVE on v5e (scripts/micro_fp8_gemv.py,
            # 2026-08-19): 72.2 tok/s vs the XLA dot's 456.4 on 1B decode —
            # Mosaic's fp8->bf16 convert lowers pathologically (no native
            # fp8 on v5e), while XLA fuses its convert into the bf16 dot.
            # Default stays "xla"; the kernel remains for future gens with
            # native fp8 VPU converts (PYGPUKIT_FP8_GEMV=pallas).
            import os
            from ..core.backend import get_backend
            from ..kernels.gemv_quant import (
                conv_stacked_tiles_exact, gemv_conv_stacked,
            )
            k3, n3 = q.shape[-2], q.shape[-1]
            if (get_backend().platform == "tpu"
                    and os.environ.get("PYGPUKIT_FP8_GEMV", "xla")
                    == "pallas"
                    and _batched_trace_depth.get() == 0
                    and x.shape[0] <= 8
                    and x.shape[-1] == k3
                    and q.size >= (1 << 19)
                    and conv_stacked_tiles_exact(k3, n3)):
                sc = jnp.broadcast_to(
                    w["scale"].reshape(w["scale"].shape[0], 1, -1),
                    (q.shape[0], 1, n3))
                y = gemv_conv_stacked(q, idx, x, sc)
                return y.astype(out_dtype)
            # fallback: slice the layer and continue through the 2-D paths
            q = lax.dynamic_index_in_dim(q, idx, 0, keepdims=False)
            w = {k: (lax.dynamic_index_in_dim(v, idx, 0, keepdims=False)
                     if k != "_idx" and v.ndim > 2 else v)
                 for k, v in w.items() if k != "_idx"}
        if q.dtype == jnp.int8:
            import os
            from ..core.backend import get_backend
            default = ("w8a8" if get_backend().platform == "tpu"
                       else "w8a16")
            if (int8_mode or os.environ.get("PYGPUKIT_INT8_MODE",
                                            default)) == "w8a8":
                # native int8 MXU dot (int32 accumulation, ~300 TOPS
                # measured): the int8 operand feeds the MXU WITHOUT a bf16
                # materialization — 4.5x over the int8->bf16 convert path
                # same-process (15.2 vs 68.7 ms/tok 1B decode; measured on
                # a degraded-HBM day, ratio expected smaller when healthy).
                # TPU default; PYGPUKIT_INT8_MODE=w8a16 opts out (quantizing
                # the activation per-row adds ~0.4% matvec RMS error).
                if os.environ.get("PYGPUKIT_ACT_QUANT", "f32") == "bf16":
                    # EXPERIMENTAL lean chain: no f32 materialization of the
                    # activation vector; multiply-by-reciprocal; 126 (not
                    # 127) headroom so bf16 product rounding (rel 2^-8)
                    # cannot push round(x*inv) past int8 range. Measured
                    # 2.2x SLOWER end-to-end than the f32 chain on a
                    # degraded-HBM day (8.6 vs 3.9 ms/tok 1B, same process,
                    # RMS 0.94% vs 0.97%) — the formulation changes how the
                    # int8 dot itself lowers. Off by default; re-A/B on a
                    # healthy chip before promoting.
                    xb = x.astype(jnp.bfloat16)
                    amax = jnp.maximum(
                        jnp.max(jnp.abs(xb), axis=-1, keepdims=True),
                        jnp.bfloat16(1e-8))
                    inv = jnp.bfloat16(126.0) / amax
                    xi = jnp.round(xb * inv).astype(jnp.int8)
                    acc = jnp.dot(xi, q, preferred_element_type=jnp.int32)
                    sx = amax.astype(_F32) * (1.0 / 126.0)
                    return (acc.astype(_F32) * (sx * w["scale"])
                            ).astype(out_dtype)
                amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                sx = jnp.maximum(amax.astype(_F32) / 127.0, 1e-12)
                xi = jnp.round(x.astype(_F32) / sx).astype(jnp.int8)
                acc = jnp.dot(xi, q, preferred_element_type=jnp.int32)
                return (acc.astype(_F32) * sx * w["scale"]).astype(out_dtype)
        xb = x.astype(jnp.bfloat16)
        acc = jnp.dot(xb, q.astype(jnp.bfloat16), preferred_element_type=_F32)
        return (acc * w["scale"]).astype(out_dtype)
    return jnp.dot(x, w, preferred_element_type=_F32,
                   precision=_pf32(x, w)).astype(out_dtype)


def _rope_rows_for(params, pos, t, total_len):
    """Rope table rows [t, D] starting at ``pos`` for a forward whose TOTAL
    sequence length is ``total_len`` (traced). LongRoPE models (Phi-3) carry
    a second table pair used when total_len exceeds the checkpoint's
    original_max (HF's dynamic factor switch); everyone else has one pair.
    """
    c = lax.dynamic_slice_in_dim(params["rope_cos"], pos, t, axis=0)
    s = lax.dynamic_slice_in_dim(params["rope_sin"], pos, t, axis=0)
    if "rope_cos_long" in params:
        use_long = total_len > params["rope_long_threshold"]
        c = jnp.where(
            use_long,
            lax.dynamic_slice_in_dim(params["rope_cos_long"], pos, t, axis=0),
            c)
        s = jnp.where(
            use_long,
            lax.dynamic_slice_in_dim(params["rope_sin_long"], pos, t, axis=0),
            s)
    return c, s


def _norm(cfg: TransformerConfig, x, w, b):
    if cfg.norm_type == "rmsnorm":
        return rmsnorm_fn(x, w, cfg.norm_eps)
    return layernorm_fn(x, w, b, cfg.norm_eps)


def _attn_in(cfg: TransformerConfig, lp, h):
    """Attention sublayer input: pre-norm of the residual stream, or the
    raw stream for post-norm-only models (OLMo-2,
    HF modeling_olmo2.Olmo2DecoderLayer — no input_layernorm)."""
    if not cfg.pre_norms:
        return h
    return _norm(cfg, h, lp["attn_norm_w"], lp.get("attn_norm_b"))


def _qk_headnorm(x, w, eps, subtract_mean: bool = False):
    """Per-head norm over head_dim (Qwen3 q_norm/k_norm), w [D] (or [H, D]
    for per-head weights — Cohere). ``subtract_mean``: LayerNorm flavour
    (mean-centred, no bias — CohereLayerNorm) instead of RMS."""
    xf = x.astype(_F32)
    if subtract_mean:
        xf = xf - jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * lax.rsqrt(var + eps) * w.astype(_F32)).astype(x.dtype)


def _mlp(cfg: TransformerConfig, lp, y):
    if cfg.is_moe:
        return _moe_mlp(cfg, lp, y)
    if "w_gate_up" in lp or "w_gate" in lp:
        if "w_gate_up" in lp:
            gu = _mm(y, lp["w_gate_up"])
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = _mm(y, lp["w_gate"])
            up = _mm(y, lp["w_up"])
        if cfg.activation == "gelu_tanh":
            # gemma GeGLU: tanh-approx gelu on the gate (HF
            # gelu_pytorch_tanh), f32 for parity with the f32 HF compute
            act = (jax.nn.gelu(gate.astype(_F32), approximate=True)
                   * up.astype(_F32)).astype(y.dtype)
        else:
            act = swiglu_fn(gate, up)
        return _mm(act, lp["w_down"])
    h = _mm(y, lp["w_fc1"]).astype(_F32)
    if "b_fc1" in lp:
        h = h + lp["b_fc1"].astype(_F32)
    if cfg.activation == "relu2":
        # nemotron gateless MLP: relu(x)^2 (HF ACT2FN["relu2"])
        h = jnp.square(jax.nn.relu(h)).astype(y.dtype)
    elif cfg.activation == "xielu":
        # apertus xIELU (HF XIELUActivation._xielu_python): learned
        # alpha_p/alpha_n per layer, beta/eps checkpoint buffers
        ap = jax.nn.softplus(lp["act_alpha_p"].astype(_F32))
        an = lp["act_beta"].astype(_F32) + jax.nn.softplus(
            lp["act_alpha_n"].astype(_F32))
        beta = lp["act_beta"].astype(_F32)
        eps = lp["act_eps"].astype(_F32)
        h = jnp.where(
            h > 0,
            ap * h * h + beta * h,
            (jnp.expm1(jnp.minimum(h, eps)) - h) * an + beta * h,
        ).astype(y.dtype)
    else:
        h = gelu_fn(h.astype(y.dtype))
    out = _mm(h, lp["w_fc2"]).astype(_F32)
    if "b_fc2" in lp:
        out = out + lp["b_fc2"].astype(_F32)
    return out.astype(y.dtype)


def _moe_mlp(cfg: TransformerConfig, lp, y):
    """Top-k routed expert MLP (reference: llm/layers/moe.py:29,153).

    Path selection by token count (ops/moe.select_moe_fn): megablox gmm on
    TPU at prefill scale (>=128 replicated rows — its tiling minimum),
    bandwidth-minimal expert-gather for decode-sized T (reads ONLY the
    top-k experts' weights), dense one-hot otherwise (also the CPU/parity
    path; PYGPUKIT_MOE=dense forces it).
    """
    from ..ops.moe import select_moe_fn
    router = jnp.dot(y.astype(_F32), lp["w_router"],
                     precision=_pf32(y, lp["w_router"]))       # [T, E]
    fn = select_moe_fn(y.shape[0], cfg.num_experts_per_tok)
    out = fn(y, lp["w_experts_gate"], lp["w_experts_up"],
             lp["w_experts_down"], router, cfg.num_experts_per_tok)
    return out.astype(y.dtype)


def _project_qkv(cfg: TransformerConfig, lp, x):
    s = x.shape[0]
    hq, hk, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "w_qkv" in lp:
        # fused projection: one matmul instead of three (decode is
        # launch/bandwidth bound; fusion reads x once and fills the MXU)
        qkv = _mm(x, lp["w_qkv"]).astype(_F32)
        q = qkv[:, :hq * d]
        k = qkv[:, hq * d:hq * d + hk * d]
        v = qkv[:, hq * d + hk * d:]
    else:
        q = _mm(x, lp["w_q"]).astype(_F32)
        k = _mm(x, lp["w_k"]).astype(_F32)
        v = _mm(x, lp["w_v"]).astype(_F32)
    if "b_qkv" in lp:
        b = lp["b_qkv"].astype(_F32)
        q = q + b[:hq * d]
        k = k + b[hq * d:hq * d + hk * d]
        v = v + b[hq * d + hk * d:]
    elif "b_q" in lp:
        q = q + lp["b_q"].astype(_F32)
        k = k + lp["b_k"].astype(_F32)
        v = v + lp["b_v"].astype(_F32)
    if cfg.use_qk_norm and cfg.qk_norm_wide:
        # OLMo-2: RMS norm over the WHOLE projection width (Hq*D / Hk*D)
        # before the head reshape (Olmo2Attention.q_norm) — the mean runs
        # across all heads, unlike the per-head Qwen3 convention
        q = _qk_headnorm(q.astype(x.dtype), lp["w_q_norm"], cfg.norm_eps)
        k = _qk_headnorm(k.astype(x.dtype), lp["w_k_norm"], cfg.norm_eps)
    q = q.astype(x.dtype).reshape(s, hq, d)
    k = k.astype(x.dtype).reshape(s, hk, d)
    v = v.astype(x.dtype).reshape(s, hk, d)
    if cfg.use_qk_norm and not cfg.qk_norm_wide:
        # cohere's optional q/k norms are LayerNorm-flavoured (mean-centred)
        sm = cfg.norm_type == "layernorm"
        q = _qk_headnorm(q, lp["w_q_norm"], cfg.norm_eps, subtract_mean=sm)
        k = _qk_headnorm(k, lp["w_k_norm"], cfg.norm_eps, subtract_mean=sm)
    return q, k, v


def _out_proj(lp, attn, s, dtype):
    o = _mm(attn.reshape(s, -1), lp["w_o"]).astype(_F32)
    if "b_o" in lp:
        o = o + lp["b_o"].astype(_F32)
    return o.astype(dtype)


def _logits(cfg: TransformerConfig, params, h):
    if params.get("lm_head") is not None:
        if isinstance(params["lm_head"], dict):
            # quantized head ({"q","scale"} leaf): at decode the head is the
            # single biggest weight read after the layer stack (131 MB bf16
            # on the 1B bench model = ~170 us/tok at HBM rate, measured in
            # the round-3 device trace); streaming it int8 halves that.
            # f32 out keeps sampling numerics.
            import os
            logits = _mm(h, params["lm_head"], out_dtype=_F32,
                         int8_mode=os.environ.get("PYGPUKIT_INT8_HEAD"))
        else:
            logits = jnp.dot(h, params["lm_head"], preferred_element_type=_F32,
                             precision=_pf32(h, params["lm_head"]))
    else:
        # tied embeddings: h @ embed.T (XLA transposes for free)
        logits = lax.dot_general(
            h, params["embed"], (((h.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=_F32,
            precision=_pf32(h, params["embed"]))
    if params.get("lm_head_b") is not None:
        logits = logits + params["lm_head_b"].astype(_F32)    # phi-2
    if cfg.logit_scale is not None:
        logits = logits * cfg.logit_scale    # cohere: logits * 0.0625
    if cfg.final_logit_softcap is not None:
        cap = cfg.final_logit_softcap
        logits = cap * jnp.tanh(logits * (1.0 / cap))
    return logits


def _embed_tokens(cfg: TransformerConfig, params, tokens):
    h = jnp.take(params["embed"], tokens, axis=0)
    if cfg.embed_scale is not None:
        # HF gemma casts the scalar normalizer to the activation dtype
        # BEFORE multiplying — match it exactly
        h = h * jnp.asarray(cfg.embed_scale, h.dtype)
    return h


def _rope(cfg: TransformerConfig, x, cos, sin):
    """Rope apply in the model's convention: split-half (default) or
    interleaved even/odd pairs (Cohere/GLM-4; same convention as Llama-4).
    Partial rotary (GLM-4, rope_partial_factor<1): only the first
    cfg.rope_dim dims rotate, the tail passes through — the tables are
    built [S, rope_dim]."""
    rd = cfg.rope_dim
    x_rot, x_pass = (x, None) if rd == x.shape[-1] else \
        (x[..., :rd], x[..., rd:])
    if cfg.rope_interleaved:
        from ..ops.nn.rope import apply_rope_interleaved_fn
        out = apply_rope_interleaved_fn(x_rot, cos, sin)
    else:
        out = apply_rope_fn(x_rot, cos, sin)
    if x_pass is not None:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


def _layer_rope(lp, cos, sin, cos_l, sin_l):
    """Per-layer rope table choice. gemma3: sliding layers use the LOCAL
    theta tables; SmolLM3/llama4-style NoPE layers (use_rope_layer leaf = 0)
    take IDENTITY tables (cos=1, sin=0 — a rotation by zero), so one traced
    program serves both layer kinds. cos/sin pre-sliced to the step's
    positions."""
    if isinstance(lp, dict) and cos_l is not None and "use_local_rope" in lp:
        use_l = lp["use_local_rope"] > 0
        cos = jnp.where(use_l, cos_l, cos)
        sin = jnp.where(use_l, sin_l, sin)
    if isinstance(lp, dict) and "use_rope_layer" in lp:
        use_r = lp["use_rope_layer"] > 0
        cos = jnp.where(use_r, cos, jnp.ones_like(cos))
        sin = jnp.where(use_r, sin, jnp.zeros_like(sin))
    return cos, sin


# ---------------------------------------------------------------------------
# Forward (no cache) — training/eval path and logits parity tests
# ---------------------------------------------------------------------------

def _residual_tail(cfg: TransformerConfig, lp, h, attn, s, x=None):
    """out-proj + residual + MLP sublayer, with gemma sandwich norms on the
    sublayer OUTPUTS when cfg.use_post_norms. ``x`` (the attention input,
    i.e. the shared pre-norm output) is required for cfg.parallel_block:
    Cohere runs attention and MLP in PARALLEL off the same norm —
    h += attn(x) + mlp(x) (HF modeling_cohere.CohereDecoderLayer)."""
    o = _out_proj(lp, attn, s, h.dtype)
    rm = cfg.residual_multiplier     # granite: h += rm * sublayer(...)
    if cfg.parallel_block:
        m = _mlp(cfg, lp, x)
        return (h + o + m) if rm is None else (h + rm * (o + m))
    if cfg.use_post_norms:
        o = _norm(cfg, o, lp["post_attn_norm_w"], None)
    h = h + o if rm is None else h + rm * o
    # OLMo-2 (pre_norms=False): the MLP reads the raw residual stream —
    # only the post norms exist
    y = (_norm(cfg, h, lp["mlp_norm_w"], lp.get("mlp_norm_b"))
         if cfg.pre_norms else h)
    m = _mlp(cfg, lp, y)
    if cfg.use_post_norms:
        m = _norm(cfg, m, lp["post_mlp_norm_w"], None)
    return h + m if rm is None else h + rm * m


def layer_stack_fn(cfg: TransformerConfig, layers, h, rope_cos, rope_sin,
                   rope_cos_local=None, rope_sin_local=None):
    """Run h [S, E] through a stacked-layer pytree (any [L', ...] slice of
    the full stack). Shared by forward_fn and the pipeline-parallel stage
    executor (parallel/pipeline.py), where each 'pp' stage scans its local
    contiguous layer slice."""
    s = h.shape[0]
    softcap = cfg.attn_logit_softcap
    scale = cfg.attn_scale

    def block(h, lp):
        x = _attn_in(cfg, lp, h)
        q, k, v = _project_qkv(cfg, lp, x)
        if cfg.use_rope:
            c, sn = _layer_rope(
                lp, rope_cos[:s], rope_sin[:s],
                None if rope_cos_local is None else rope_cos_local[:s],
                None if rope_sin_local is None else rope_sin_local[:s])
            q = _rope(cfg, q, c, sn)
            k = _rope(cfg, k, c, sn)
        attn = flash_attention_fn(q, k, v, scale=scale, softcap=softcap,
                                  window=lp.get("attn_window"))
        h = _residual_tail(cfg, lp, h, attn, s, x)
        return h, None

    h, _ = lax.scan(block, h, layers)
    return h


def forward_fn(cfg: TransformerConfig, params, tokens):
    """tokens [S] int32 -> logits [S, V] f32."""
    s = tokens.shape[0]
    h = _embed_tokens(cfg, params, tokens)
    if cfg.use_position_embed:
        h = h + params["pos_embed"][:s]
    if cfg.use_rope and "rope_cos_long" in params:
        rc, rs = _rope_rows_for(params, 0, s, jnp.int32(s))
    else:
        rc, rs = params.get("rope_cos"), params.get("rope_sin")
    h = layer_stack_fn(cfg, params["layers"], h, rc, rs,
                       params.get("rope_cos_local"),
                       params.get("rope_sin_local"))
    h = _norm(cfg, h, params["final_norm_w"], params.get("final_norm_b"))
    return _logits(cfg, params, h)


# ---------------------------------------------------------------------------
# Cached prefill + decode
# ---------------------------------------------------------------------------

def prefill_fn(cfg: TransformerConfig, params, k_cache, v_cache, tokens,
               true_len):
    """Prefill padded ``tokens`` [S_pad]; write caches; return last logits.

    k_cache/v_cache: [L, MAX, Hk, D]. true_len: traced scalar — positions
    >= true_len are masked out of attention and ignored for the last-logit.
    """
    s = tokens.shape[0]
    h = _embed_tokens(cfg, params, tokens)
    if cfg.use_position_embed:
        h = h + params["pos_embed"][:s]
    rope_cos = params.get("rope_cos")
    rope_sin = params.get("rope_sin")
    rope_cos_l = params.get("rope_cos_local")
    rope_sin_l = params.get("rope_sin_local")

    # fori_loop carrying the caches (not scan ys) so XLA updates the
    # donated buffers in place instead of copying both full [L, MAX, Hk, D]
    # arrays per call — see decode_step_fn for the trace that found this.
    def body(i, st):
        h, kc_all, vc_all = st
        lp = _slice_layer_params(params["layers"], i)
        x = _attn_in(cfg, lp, h)
        q, k, v = _project_qkv(cfg, lp, x)
        if cfg.use_rope:
            rc, rs = _rope_rows_for(params, 0, s, true_len)
            c, sn = _layer_rope(
                lp, rc, rs,
                None if rope_cos_l is None else rope_cos_l[:s],
                None if rope_sin_l is None else rope_sin_l[:s])
            q = _rope(cfg, q, c, sn)
            k = _rope(cfg, k, c, sn)
        kc_all = kv_write(kc_all, k[None], (i, 0, 0, 0))
        vc_all = kv_write(vc_all, v[None], (i, 0, 0, 0))
        # causal attention within the padded prompt; pad region masked
        attn = _prefill_attn(q, k, v, true_len, cfg.attn_scale,
                             cfg.attn_logit_softcap, lp.get("attn_window"))
        h = _residual_tail(cfg, lp, h, attn, s, x)
        return (h, kc_all, vc_all)

    h, k_cache, v_cache = lax.fori_loop(0, kv_leaf(k_cache).shape[0], body,
                                        (h, k_cache, v_cache))
    h = _norm(cfg, h, params["final_norm_w"], params.get("final_norm_b"))
    last = jnp.take(h, true_len - 1, axis=0)
    return k_cache, v_cache, _logits(cfg, params, last)


def _prefill_attn(q, k, v, true_len, scale=None, softcap=None, window=None):
    import math
    s, hq, d = q.shape
    hk = k.shape[1]
    if hk != hq:
        k = jnp.repeat(k, hq // hk, axis=1)
        v = jnp.repeat(v, hq // hk, axis=1)
    prec = _pf32(q, k)          # pre-cast dtypes: f32 models need HIGHEST
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    qh = jnp.transpose(q, (1, 0, 2)).astype(_F32)
    kh = jnp.transpose(k, (1, 0, 2)).astype(_F32)
    vh = jnp.transpose(v, (1, 0, 2)).astype(_F32)
    scores = jnp.einsum("hqd,hkd->hqk", qh, kh, precision=prec) * scale
    if softcap is not None:
        scores = softcap * jnp.tanh(scores * (1.0 / softcap))
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    mask = (j > i) | (j[None] >= true_len)
    if window is not None:
        w = jnp.where(jnp.asarray(window, jnp.int32) > 0,
                      jnp.asarray(window, jnp.int32), jnp.int32(1 << 30))
        mask = mask | (j <= i - w)
    scores = jnp.where(mask, -1e30, scores)
    out = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, axis=-1), vh,
                     precision=prec)
    return jnp.transpose(out, (1, 0, 2)).astype(q.dtype)


def use_fused_decode(cfg: TransformerConfig, params, max_seq: int) -> bool:
    """True when the whole-model Pallas decode kernel should run: opt-in via
    PYGPUKIT_DECODE=fused, TPU backend, eligible architecture, separate dense
    bf16 projection leaves (kernels/fused_decode.supports)."""
    import os
    if os.environ.get("PYGPUKIT_DECODE", "") != "fused":
        return False
    from ..core.backend import get_backend
    if get_backend().platform != "tpu":
        return False
    return fused_decode_eligible(cfg, params, max_seq)


def fused_decode_eligible(cfg: TransformerConfig, params, max_seq: int) -> bool:
    if (cfg.use_post_norms or cfg.attn_logit_softcap is not None
            or cfg.final_logit_softcap is not None
            or cfg.sliding_window is not None
            or cfg.embed_scale is not None or cfg.query_scale is not None):
        return False    # gemma-family features the kernel never learned
    if (not cfg.pre_norms or cfg.parallel_block or cfg.rope_interleaved
            or cfg.rope_partial_factor != 1.0
            or cfg.residual_multiplier is not None or cfg.logit_scale
            is not None):
        return False    # olmo2/cohere/glm4/granite conventions, ditto
    lp = params["layers"]
    for leaf in ("w_q", "w_k", "w_v", "w_o", "w_gate", "w_up", "w_down"):
        if leaf not in lp or isinstance(lp[leaf], dict):
            return False
        if lp[leaf].dtype != jnp.bfloat16:
            return False
    if "b_q" in lp or "b_qkv" in lp:
        return False
    from ..kernels.fused_decode import supports
    return supports(
        hidden=cfg.hidden_size, intermediate=cfg.intermediate_size,
        n_heads=cfg.num_heads, n_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, max_seq=max_seq, norm_type=cfg.norm_type,
        activation=cfg.activation, use_rope=cfg.use_rope,
        has_bias=False, use_qk_norm=cfg.use_qk_norm, is_moe=cfg.is_moe)


def prepare_fused_decode_params(cfg: TransformerConfig, params: dict) -> dict:
    """Add contiguous tile arenas for the fused decode kernel over the
    CONSOLIDATED projections: w_qkv_t (q|k|v fused column-wise), w_o_t,
    w_gu_t (gate|up fused), w_down_t as [L, NT, K, TN]. The originals stay
    (prefill and the XLA fallback consume them) — decode trades ~1x weight
    HBM for contiguous single-block DMAs and FEWER, LARGER Mosaic dots
    (each dot carries ~13 us fixed cost; see kernels/fused_decode.py)."""
    from ..kernels.fused_decode import plan_tiles, tile_weight
    kv_d = cfg.num_kv_heads * cfg.head_dim
    plans = plan_tiles(cfg.hidden_size, cfg.intermediate_size, kv_d)
    layers = dict(params["layers"])
    layers["w_qkv_t"] = tile_weight(
        jnp.concatenate([layers["w_q"], layers["w_k"], layers["w_v"]],
                        axis=-1), plans["qkv"][1])
    layers["w_o_t"] = tile_weight(layers["w_o"], plans["o"][1])
    layers["w_gu_t"] = tile_weight(
        jnp.concatenate([layers["w_gate"], layers["w_up"]], axis=-1),
        plans["gu"][1])
    layers["w_down_t"] = tile_weight(layers["w_down"], plans["d"][1])
    out = dict(params)
    out["layers"] = layers
    return out


def fused_decode_step_fn(cfg: TransformerConfig, params, k_cache, v_cache,
                         token, pos, interpret: bool = False):
    """decode_step_fn semantics via the whole-model Pallas kernel
    (kernels/fused_decode.py): embed + LM head + cache scatter stay in XLA,
    everything between runs as one hand-streamed kernel. Requires the tile
    arenas from prepare_fused_decode_params."""
    from ..kernels.fused_decode import fused_decode_step
    lp = params["layers"]
    h = jnp.take(params["embed"], token[None], axis=0).astype(jnp.bfloat16)
    cos = lax.dynamic_slice_in_dim(
        params["rope_cos"], pos, 1, axis=0).astype(_F32)
    sin = lax.dynamic_slice_in_dim(
        params["rope_sin"], pos, 1, axis=0).astype(_F32)
    l, max_seq, hk, d = k_cache.shape
    kc = k_cache.reshape(l, max_seq, hk * d)
    vc = v_cache.reshape(l, max_seq, hk * d)
    h_out, k_new, v_new = fused_decode_step(
        h, cos, sin, jnp.reshape(pos, (1,)).astype(jnp.int32),
        lp["w_qkv_t"], lp["w_o_t"], lp["w_gu_t"], lp["w_down_t"],
        lp["attn_norm_w"].astype(_F32), lp["mlp_norm_w"].astype(_F32),
        params["final_norm_w"].astype(_F32).reshape(1, -1),
        kc, vc, n_heads=cfg.num_heads, n_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, eps=cfg.norm_eps, interpret=interpret)
    kc = lax.dynamic_update_slice(
        kc, k_new[:, None, :].astype(kc.dtype), (0, pos, 0))
    vc = lax.dynamic_update_slice(
        vc, v_new[:, None, :].astype(vc.dtype), (0, pos, 0))
    logits = _logits(cfg, params, h_out[0].astype(k_cache.dtype))
    return (kc.reshape(l, max_seq, hk, d), vc.reshape(l, max_seq, hk, d),
            logits)


def _scan_unroll() -> int:
    """Unroll factor for the decode layer scan (PYGPUKIT_SCAN_UNROLL,
    default 1). Read at trace time — executables captured under a setting
    keep it."""
    import os
    return max(1, int(os.environ.get("PYGPUKIT_SCAN_UNROLL", "1")))


def _slice_layer_params(layers, i):
    """Per-layer view of the stacked [L, ...] leaves.

    Packed-int4 dicts stay STACKED with the layer index attached
    (``_idx``): a Pallas operand cannot absorb a dynamic layer slice the
    way XLA dots do, so the sliced form materializes a full copy of every
    projection every decode step — device-traced at 761 us/tok of the 1B
    int4 decode's 1.94 ms. _mm routes stacked dicts through the
    scalar-prefetch GEMV instead (bitwise-identical to the sliced kernel,
    measured — including under the serving engine's vmap)."""
    def sl(a):
        return lax.dynamic_index_in_dim(a, i, 0, keepdims=False)

    def keep_stacked_fp8(v):
        # fp8 dicts stay stacked for the converting Pallas GEMV — only when
        # that kernel is opted IN (it measured 6x SLOWER than the XLA dot
        # on v5e, see _mm; the default path slices here as always and XLA
        # absorbs the dynamic slice into the dot).
        import os
        if os.environ.get("PYGPUKIT_FP8_GEMV", "xla") != "pallas":
            return False
        if not (isinstance(v, dict) and "q" in v and "scale" in v):
            return False
        if v["q"].dtype not in (jnp.float8_e4m3fn, jnp.float8_e5m2):
            return False
        return v["q"].ndim == 3 and v["scale"].ndim == 3

    out = {}
    for k, v in layers.items():
        if isinstance(v, dict) and "q_packed" in v:
            out[k] = dict(v, _idx=i)
        elif keep_stacked_fp8(v):
            out[k] = dict(v, _idx=i)
        else:
            out[k] = jax.tree.map(sl, v)
    return out


def _kv_write_backend() -> str:
    """Row-write backend for the batch-rows step: "pallas" (one RMW
    pallas_call per layer, kernels/kv_row_write.py) or "xla" (vmapped
    per-slot scatters — a serial 8-iteration loop per pool leaf,
    1.46 ms/step at batch-8 bf16, double for int8 dicts).
    PYGPUKIT_KV_WRITE overrides; auto = pallas on TPU (measured on every
    serving config, scripts/micro_krw_ab.py same-process 2026-08-20:
    int4 MAX=512 2263 -> 2523, bf16-KV MAX=4096 1429 -> 1817, int8-KV
    1203 -> 1946 tok/s)."""
    import os
    mode = os.environ.get("PYGPUKIT_KV_WRITE", "auto")
    if mode in ("pallas", "xla"):
        return mode
    from ..core.backend import get_backend
    return "pallas" if get_backend().platform == "tpu" else "xla"


def _kv_layer(cache, i):
    """Layer ``i``'s slice of a stacked [L, ...] cache (int8-dict-safe:
    both leaves carry L as their leading dim)."""
    return jax.tree.map(
        lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False), cache)


def decode_step_fn(cfg: TransformerConfig, params, k_cache, v_cache, token,
                   pos, allow_fused: bool = True):
    """One decode step: token scalar, pos scalar -> (k_cache, v_cache, logits).

    Caches are donated by the caller's executable — XLA updates them in place
    (the zero-alloc decode analog, reference causal.py:324).
    PYGPUKIT_DECODE=fused routes eligible configs through the whole-model
    Pallas kernel (fused_decode_step_fn) instead (``allow_fused=False``
    opts a call site out — the speculative draft runs on sliced layer
    stacks the fused kernel was never prepared for).
    """
    if (allow_fused and not isinstance(k_cache, dict)
            and k_cache.dtype == jnp.bfloat16
            and use_fused_decode(cfg, params, k_cache.shape[1])):
        return fused_decode_step_fn(cfg, params, k_cache, v_cache, token, pos)
    h = _embed_tokens(cfg, params, token[None])                  # [1, E]
    if cfg.use_position_embed:
        h = h + lax.dynamic_slice_in_dim(params["pos_embed"], pos, 1, axis=0)
    rope_cos = params.get("rope_cos")
    rope_sin = params.get("rope_sin")
    rope_cos_l = params.get("rope_cos_local")
    rope_sin_l = params.get("rope_sin_local")

    # Layer loop is a fori_loop CARRYING the caches, not a scan emitting
    # them as stacked ys: scan ys are fresh outputs, so XLA copied BOTH
    # full [L, MAX, Hk, D] caches every decode step (cost scales with
    # capacity — device-traced at 2x556 us/tok at MAX=16384, 2x18 at 1024).
    # While-loop carries alias in place; each layer writes its (i, pos)
    # row into the donated buffers and attends against its own slice.
    def body(i, st):
        h, kc_all, vc_all = st
        lp = _slice_layer_params(params["layers"], i)
        x = _attn_in(cfg, lp, h)
        q, k, v = _project_qkv(cfg, lp, x)                       # [1,H,D]
        if cfg.use_rope:
            c, sn = _rope_rows_for(params, pos, 1, pos + 1)
            c, sn = _layer_rope(
                lp, c, sn,
                None if rope_cos_l is None else
                lax.dynamic_slice_in_dim(rope_cos_l, pos, 1, axis=0),
                None if rope_sin_l is None else
                lax.dynamic_slice_in_dim(rope_sin_l, pos, 1, axis=0))
            q = _rope(cfg, q, c, sn)
            k = _rope(cfg, k, c, sn)
        kc_all = kv_write(kc_all, k[None], (i, pos, 0, 0))
        vc_all = kv_write(vc_all, v[None], (i, pos, 0, 0))
        attn = sdpa_fixed_cache_fn(
            q, _kv_layer(kc_all, i), _kv_layer(vc_all, i),
            pos + 1, scale=cfg.attn_scale,
            softcap=cfg.attn_logit_softcap,
            window=lp.get("attn_window"))
        h = _residual_tail(cfg, lp, h, attn, 1, x)
        return (h, kc_all, vc_all)

    # bound by the CACHE's layer dim, not cfg.num_layers: the speculative
    # draft passes sliced n_draft-layer params/caches into this same fn —
    # a cfg-bound loop would clamp to the last draft layer and silently run
    # full-depth (full cost, garbage proposals)
    h, k_cache, v_cache = lax.fori_loop(
        0, kv_leaf(k_cache).shape[0], body, (h, k_cache, v_cache),
        unroll=_scan_unroll())
    h = _norm(cfg, h, params["final_norm_w"], params.get("final_norm_b"))
    logits = _logits(cfg, params, h[0])
    return k_cache, v_cache, logits


def decode_window_fn(cfg: TransformerConfig, params, k_cache, v_cache,
                     tokens, pos):
    """Lookahead decode: ``tokens`` [T] written at positions pos..pos+T-1,
    logits for all T positions returned.

    The speculative/Jacobi workhorse (reference:
    decode_step_self_speculative_lookahead, causal.py:1096): token t attends
    cache positions < pos+t+1. On partial acceptance the extra KV rows beyond
    the accepted position are garbage — harmless, because every later step
    masks beyond its own ctx_len and overwrites them (the TPU version of the
    reference's lookahead commit/rollback bookkeeping, attention.py:152-169).
    """
    t = tokens.shape[0]
    h = _embed_tokens(cfg, params, tokens)                       # [T, E]
    if cfg.use_position_embed:
        h = h + lax.dynamic_slice_in_dim(params["pos_embed"], pos, t, axis=0)
    rope_cos = params.get("rope_cos")
    rope_sin = params.get("rope_sin")
    rope_cos_l = params.get("rope_cos_local")
    rope_sin_l = params.get("rope_sin_local")

    # fori_loop carrying the caches — in-place row writes, no per-call
    # full-cache copies (see decode_step_fn)
    def body(i, st):
        h, kc_all, vc_all = st
        lp = _slice_layer_params(params["layers"], i)
        x = _attn_in(cfg, lp, h)
        q, k, v = _project_qkv(cfg, lp, x)                       # [T,H,D]
        if cfg.use_rope:
            c, sn = _rope_rows_for(params, pos, t, pos + t)
            c, sn = _layer_rope(
                lp, c, sn,
                None if rope_cos_l is None else
                lax.dynamic_slice_in_dim(rope_cos_l, pos, t, axis=0),
                None if rope_sin_l is None else
                lax.dynamic_slice_in_dim(rope_sin_l, pos, t, axis=0))
            q = _rope(cfg, q, c, sn)
            k = _rope(cfg, k, c, sn)
        kc_all = kv_write(kc_all, k[None], (i, pos, 0, 0))
        vc_all = kv_write(vc_all, v[None], (i, pos, 0, 0))
        attn = sdpa_fixed_cache_fn(
            q, _kv_layer(kc_all, i), _kv_layer(vc_all, i),
            pos + t, scale=cfg.attn_scale,
            softcap=cfg.attn_logit_softcap,
            window=lp.get("attn_window"))
        h = _residual_tail(cfg, lp, h, attn, t, x)
        return (h, kc_all, vc_all)

    h, k_cache, v_cache = lax.fori_loop(0, kv_leaf(k_cache).shape[0], body,
                                        (h, k_cache, v_cache))
    h = _norm(cfg, h, params["final_norm_w"], params.get("final_norm_b"))
    return k_cache, v_cache, _logits(cfg, params, h)


def generate_scan_fn(cfg: TransformerConfig, n_steps: int, temperature: float,
                     top_k: int, params, k_cache, v_cache, token, pos, key):
    """Device-side generation loop: ``n_steps`` decode steps in ONE program.

    The host-driven per-token loop pays a dispatch+sync roundtrip per token
    (tens of ms over remote transports); folding the loop into ``lax.scan``
    amortises one dispatch over n_steps tokens — the TPU equivalent of what
    CUDA-graph replay buys the reference (m1_graph.py), taken further: even
    sampling runs on device (jax PRNG in the carry), so the only D2H is the
    final token block.
    """
    def step(carry, _):
        kc, vc, tok, p, k = carry
        kc, vc, logits = decode_step_fn(cfg, params, kc, vc, tok, p)
        if temperature <= 0.0:
            nxt = jnp.argmax(logits).astype(jnp.int32)
        else:
            k, sub = jax.random.split(k)
            lf = logits.astype(_F32) / temperature
            if top_k > 0:
                topv, _ = lax.top_k(lf, top_k)
                lf = jnp.where(lf < topv[-1], -1e30, lf)
            nxt = jax.random.categorical(sub, lf).astype(jnp.int32)
        return (kc, vc, nxt, p + 1, k), nxt

    (k_cache, v_cache, token, pos, key), toks = lax.scan(
        step, (k_cache, v_cache, token, pos, key), None, length=n_steps)
    return k_cache, v_cache, toks


def _batch_pools_attn(cfg: TransformerConfig, lp, q2, kp, vp, layer, lens):
    """Attention for the batch-rows decode step: all B slot rows against
    layer ``layer`` of the full [B, L, MAX, Hk, D] pools.

    Routes to the Pallas kernel (kernels/batch_decode_attention.py) on TPU
    for chunked-preference traces (the serving engines' large-pool regime):
    every XLA formulation either gathers chunk reads at 63 GB/s bf16 /
    ~14 GB/s fp8 (vmapped cursor) or pays full-pool layout-conversion
    copies (batched while loop, 74 ms/step) — the kernel reads live chunks
    as contiguous DMAs in the pools' natural layout and converts fp8
    in-kernel. PYGPUKIT_BATCH_ATTN=pallas forces the kernel (any backend,
    interpret on CPU), =xla forces the XLA path."""
    import os

    from ..ops.nn.attention import _decode_backend, _flash_chunk
    mode = os.environ.get("PYGPUKIT_BATCH_ATTN", "")
    window = lp.get("attn_window")
    use_pallas = False
    kpl = kv_leaf(kp)
    hk = kpl.shape[3] // q2.shape[3] if kpl.ndim == 4 else kpl.shape[3]
    if mode != "xla":
        from ..core.backend import get_backend
        max_len = kpl.shape[2]
        chunk = min(_flash_chunk(), max_len)
        eligible = (q2.shape[1] == 1 and max_len % chunk == 0
                    and q2.shape[2] % hk == 0)
        auto = (get_backend().platform == "tpu"
                and _decode_backend(max_len) == "chunked")
        use_pallas = eligible and (mode == "pallas" or auto)
    if use_pallas:
        from ..kernels.batch_decode_attention import batch_decode_attention
        attn = batch_decode_attention(
            q2, kp, vp, layer, lens, scale=cfg.attn_scale, chunk=chunk,
            softcap=cfg.attn_logit_softcap, window=window)
        return attn, kp, vp
    return sdpa_batch_pools_fn(
        q2, kp, vp, layer, lens, scale=cfg.attn_scale,
        softcap=cfg.attn_logit_softcap, window=window)


def batch_decode_step_fn(cfg: TransformerConfig, params, k_pool, v_pool,
                         tokens, poss):
    """One decode step for ALL serving slots with the hidden rows BATCHED
    through the weight matmuls.

    ``vmap(decode_step_fn)`` re-traces the body with per-example tracers, so
    every ``_mm`` sees a rows=1 operand: XLA still streams shared weights
    once, but the Pallas quantized GEMVs become ineligible (vmap turns their
    batch into a leading grid dim whose weight index_map ignores the batch —
    the kernel would re-stream the whole stack once PER SLOT, measured 1065
    vs 1574 tok/s on int4 batch-8 serving). This formulation keeps the
    weight matmuls on real [B, E] rows — ONE kernel invocation per weight
    stream, batch rows riding the same tiles (the TPU analog of the
    reference's batched decode, CHANGELOG.md:76 "6.83x at batch=8") — and
    vmaps only the per-slot work (rope at each slot's position, the KV row
    write, attention over the slot's cache).

    k_pool/v_pool: [B, L, MAX, Hk, D], or MERGED [B, L, MAX, Hk*D]
    (ndim-detected; the serving engines allocate merged pools for this
    step at MAX >= 1024 — the Pallas batched-attention kernel's operand
    is the merged view, and merging a 5-d carry per layer costs XLA two
    full-pool relayout copies per pool, 122 ms/step at batch-8 MAX=4096).
    Donated. tokens/poss: [B] int32. Returns (k_pool, v_pool, logits
    [B, V]).
    """
    b = tokens.shape[0]
    h = _embed_tokens(cfg, params, tokens)                       # [B, E]
    if cfg.use_position_embed:
        h = h + jnp.take(params["pos_embed"], poss, axis=0)
    rope_cos_l = params.get("rope_cos_local")
    rope_sin_l = params.get("rope_sin_local")

    use_krw = _kv_write_backend() == "pallas"

    def body(i, st):
        h, kp, vp = st
        lp = _slice_layer_params(params["layers"], i)
        x = _attn_in(cfg, lp, h)
        q, k, v = _project_qkv(cfg, lp, x)                       # [B, H, D]

        def slot(q_b, k_b, v_b, pos_b):
            # per-slot head of the attention sublayer (rope at the slot's
            # position); everything here is tiny (no weight reads), so
            # vmap costs nothing while the matmuls above stay batch-rows
            q_b, k_b = q_b[None], k_b[None]                      # t = 1
            if cfg.use_rope:
                c, sn = _rope_rows_for(params, pos_b, 1, pos_b + 1)
                c, sn = _layer_rope(
                    lp, c, sn,
                    None if rope_cos_l is None else
                    lax.dynamic_slice_in_dim(rope_cos_l, pos_b, 1, axis=0),
                    None if rope_sin_l is None else
                    lax.dynamic_slice_in_dim(rope_sin_l, pos_b, 1, axis=0))
                q_b = _rope(cfg, q_b, c, sn)
                k_b = _rope(cfg, k_b, c, sn)
            return q_b, k_b[0], v_b

        def write_slot(k_b, v_b, kc_b, vc_b, pos_b):
            # XLA fallback row write: per-slot dynamic_update_slice. Under
            # vmap the per-slot positions force a SERIAL scatter loop per
            # pool leaf (~4 us/slot/layer fixed regardless of the 512-byte
            # payload — 1.46 ms/step at batch-8 for bf16's two leaves,
            # double for int8's four; kernels/kv_row_write.py replaces it
            # on TPU with ONE RMW pallas_call per layer).
            if kv_leaf(kc_b).ndim == 3:   # merged pool slot [L, MAX, Hk*D]
                kc_b = kv_write(kc_b, k_b.reshape(1, 1, -1), (i, pos_b, 0))
                vc_b = kv_write(vc_b, v_b.reshape(1, 1, -1), (i, pos_b, 0))
            else:
                kc_b = kv_write(kc_b, k_b[None, None], (i, pos_b, 0, 0))
                vc_b = kv_write(vc_b, v_b[None, None], (i, pos_b, 0, 0))
            return kc_b, vc_b

        q2, k_rows, v_rows = jax.vmap(slot)(q, k, v, poss)
        if use_krw:
            from ..kernels.kv_row_write import kv_rows_write
            kp, vp = kv_rows_write(kp, vp, k_rows, v_rows, i, poss)
        else:
            kp, vp = jax.vmap(write_slot)(k_rows, v_rows, kp, vp, poss)
        # attention runs BATCHED over the pools: under vmap the chunked
        # LSE loop's per-slot chunk cursor turns every cache slice into a
        # gather (traced at 63 GB/s bf16 / ~14 GB/s fp8 at batch-8
        # MAX=4096 — the top serving fusion); the batched form shares one
        # scalar cursor so chunk reads stay contiguous slices. The layer
        # index rides INTO the attention loop (slicing the pool carry
        # outside it materialises a [B,MAX,Hk,D] copy per layer), and the
        # layer carry takes the pools RETURNED by the attention loop —
        # carrying the pre-attention values keeps them live across the
        # while loop and XLA copy-inserts 2x full-pool copies per layer
        # (74 ms/step at batch-8 MAX=4096 on 1B, device-traced).
        attn, kp, vp = _batch_pools_attn(cfg, lp, q2, kp, vp, i, poss + 1)
        h = _residual_tail(cfg, lp, h, attn[:, 0].reshape(b, -1), b, x)
        return (h, kp, vp)

    h, k_pool, v_pool = lax.fori_loop(
        0, kv_leaf(k_pool).shape[1], body, (h, k_pool, v_pool),
        unroll=_scan_unroll())
    h = _norm(cfg, h, params["final_norm_w"], params.get("final_norm_b"))
    return k_pool, v_pool, _logits(cfg, params, h)


def batch_generate_scan_fn(cfg: TransformerConfig, n_steps: int,
                           temperature: float, top_k: int, params, k_pool,
                           v_pool, tokens, poss, keys):
    """Device-side generation loop over batch_decode_step_fn: the batch-rows
    form of ``vmap(generate_scan_fn)``. Per-slot PRNG split sequences match
    the vmapped form exactly (split/categorical vmapped per row), so token
    streams are identical — only kernel routing differs. Returns
    (k_pool, v_pool, toks [B, n_steps])."""
    def step(carry, _):
        kp, vp, toks, ps, ks = carry
        kp, vp, logits = batch_decode_step_fn(cfg, params, kp, vp, toks, ps)
        if temperature <= 0.0:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            split = jax.vmap(jax.random.split)(ks)           # [B, 2, key]
            ks, subs = split[:, 0], split[:, 1]
            lf = logits.astype(_F32) / temperature
            if top_k > 0:
                topv = lax.top_k(lf, top_k)[0][:, -1:]
                lf = jnp.where(lf < topv, -1e30, lf)
            nxt = jax.vmap(jax.random.categorical)(subs, lf).astype(jnp.int32)
        return (kp, vp, nxt, ps + 1, ks), nxt

    (k_pool, v_pool, tokens, poss, keys), toks = lax.scan(
        step, (k_pool, v_pool, tokens, poss, keys), None, length=n_steps)
    return k_pool, v_pool, toks.T


def speculative_scan_fn(cfg: TransformerConfig, n_rounds: int, gamma: int,
                        n_draft: int, params, k_cache, v_cache, token, pos):
    """Device-side self-speculative generation: ``n_rounds`` rounds of
    draft -> verify -> accept in ONE program (greedy).

    TPU redesign of the reference's host-driven speculative loop
    (decode_step_self_speculative_lookahead, causal.py:1096 +
    llm/decode/speculative.py): over a remote transport every host round
    pays two dispatch+sync roundtrips (~70 ms here), which buries the
    speedup; folding the whole loop into ``lax.scan`` costs one dispatch
    per n_rounds rounds. The MXU economics make the verify nearly free:
    an M=gamma+1 window dot costs the same as M=1 (measured: M 1..16
    identical), so a round is ~(1 + gamma*n_draft/L) step-equivalents for
    up to gamma+1 tokens.

    Cache discipline: the draft (first ``n_draft`` layers of the target)
    reads a snapshot of its layer rows at round start and its per-step KV
    writes live only in the round's scan carry — the verify window then
    writes the CANONICAL rows for all layers at positions pos..pos+gamma
    (same prefix weights => same values for accepted tokens), so the
    shared cache has a single writer and the correction/bonus token's
    draft-layer KV is always present for later rounds. Rows beyond the
    accepted prefix are garbage that later steps mask and overwrite
    (see decode_window_fn).

    Greedy-equivalent to step-by-step decoding by construction: emitted
    tokens are always the target's own argmax continuations.

    Returns (k_cache, v_cache, toks [n_rounds, gamma+1] int32 (-1 padded),
    counts [n_rounds] int32, pos_out). Caller must guarantee
    pos + n_rounds*(gamma+1) <= cache capacity (worst case all-accept).
    """
    # slice ONCE (outside both scans) so XLA keeps one hoisted draft copy
    # (~n_draft/L of param HBM), not a per-step slice
    draft_params = dict(params)
    draft_params["layers"] = jax.tree.map(lambda a: a[:n_draft],
                                          params["layers"])

    def round_fn(carry, _):
        kc, vc, cur, p = carry

        kcd = jax.tree.map(lambda a: lax.slice_in_dim(a, 0, n_draft,
                                                      axis=0), kc)
        vcd = jax.tree.map(lambda a: lax.slice_in_dim(a, 0, n_draft,
                                                      axis=0), vc)

        def dstep(c, _):
            kcd, vcd, tok, pp = c
            kcd, vcd, logits = decode_step_fn(cfg, draft_params, kcd, vcd,
                                              tok, pp, allow_fused=False)
            nxt = jnp.argmax(logits).astype(jnp.int32)
            return (kcd, vcd, nxt, pp + 1), nxt

        (_, _, _, _), proposals = lax.scan(
            dstep, (kcd, vcd, cur, p), None, length=gamma)

        window = jnp.concatenate([cur[None], proposals])
        kc, vc, logits = decode_window_fn(cfg, params, kc, vc, window, p)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [gamma+1]

        agree = (proposals == preds[:gamma]).astype(jnp.int32)
        accepted = jnp.sum(jnp.cumprod(agree))          # leading agreements
        idx = jnp.arange(gamma + 1)
        props_pad = jnp.concatenate(
            [proposals, jnp.zeros((1,), jnp.int32)])
        nxt = preds[accepted]          # correction, or bonus on full accept
        emit = jnp.where(idx < accepted, props_pad,
                         jnp.where(idx == accepted, nxt, -1))
        return (kc, vc, nxt, p + accepted + 1), (emit, accepted + 1)

    (k_cache, v_cache, token, pos), (toks, counts) = lax.scan(
        round_fn, (k_cache, v_cache, token, pos), None, length=n_rounds)
    return k_cache, v_cache, toks, counts, pos


def fuse_params(params: dict) -> dict:
    """Pack per-layer q/k/v and gate/up projections into fused matrices.

    Decode is launch/bandwidth bound: one [E, (Hq+2Hk)D] matmul beats three,
    and one [E, 2I] beats two. Dense leaves concatenate directly; quantized
    {"q","scale"} leaves fuse too (per-column scales concatenate along the
    out dim — _mm applies the scale after the dot, so the fused scale row
    stays exact). int4 ``q_packed`` leaves fuse along their OUT axis
    ([L, N, K/2] → concat on N for plain int4; K-major [L, K/2, N] →
    concat on N=-1 for int4_block; split-half K packing is per-out-column,
    so out-axis concatenation is layout-exact), halving the per-token
    Pallas GEMV dispatch count. Biases are fused likewise.
    """
    layers = dict(params["layers"])

    def fusable(keys):
        if not all(k in layers for k in keys):
            return False
        leaves = [layers[k] for k in keys]
        if all(not isinstance(v, dict) for v in leaves):
            return True
        if all(isinstance(v, dict) and "q" in v for v in leaves):
            return len({v["q"].dtype for v in leaves}) == 1
        if all(isinstance(v, dict) and "q_packed" in v for v in leaves):
            # same in-dim and same scale granularity concatenate exactly
            # (plain int4 stores [N, K/2] — in-dim is axis -1; int4_block
            # stores K-major [K/2, N] — in-dim is axis -2)
            if len({("scale_block" in v) for v in leaves}) != 1:
                return False
            if "scale_block" in leaves[0]:
                return (len({v["q_packed"].shape[-2] for v in leaves}) == 1
                        and len({v["scale_block"].shape[-2]
                                 for v in leaves}) == 1)
            return len({v["q_packed"].shape[-1] for v in leaves}) == 1
        return False

    def cat(keys):
        leaves = [layers.pop(k) for k in keys]
        if isinstance(leaves[0], dict) and "q_packed" in leaves[0]:
            if "scale_block" in leaves[0]:
                # K-major [.., K/2, N]: OUT is the last axis for weight
                # and scales alike
                return {"q_packed": jnp.concatenate(
                            [v["q_packed"] for v in leaves], axis=-1),
                        "scale_block": jnp.concatenate(
                            [v["scale_block"] for v in leaves], axis=-1)}
            fused = {"q_packed": jnp.concatenate(
                [v["q_packed"] for v in leaves], axis=-2)}
            fused["scale"] = jnp.concatenate(
                [v["scale"].astype(jnp.float32) for v in leaves],
                axis=-1)
            return fused
        if isinstance(leaves[0], dict):
            out_dims = [v["q"].shape[-1] for v in leaves]
            scales = [jnp.broadcast_to(
                v["scale"], v["q"].shape[:-2] + (1, d)).astype(jnp.float32)
                for v, d in zip(leaves, out_dims)]
            return {"q": jnp.concatenate([v["q"] for v in leaves], axis=-1),
                    "scale": jnp.concatenate(scales, axis=-1)}
        return jnp.concatenate(leaves, axis=-1)

    if fusable(("w_q", "w_k", "w_v")):
        layers["w_qkv"] = cat(("w_q", "w_k", "w_v"))
        if "b_q" in layers:
            layers["b_qkv"] = jnp.concatenate(
                [layers.pop("b_q"), layers.pop("b_k"), layers.pop("b_v")],
                axis=-1)
    if fusable(("w_gate", "w_up")):
        layers["w_gate_up"] = cat(("w_gate", "w_up"))
    out = dict(params)
    out["layers"] = layers
    return out


def prepare_block_scales(params: dict) -> dict:
    """Add pre-split ``scale_lo``/``scale_hi`` leaves to every stacked
    int4_block dict ({"q_packed", "scale_block"} with 3-D leaves).

    The stacked block GEMVs need the lo/hi scale halves as SEPARATE
    operands: passing the same [L, K/B, N] array twice made XLA's
    scoped-VMEM pass re-copy the down-proj stack (15.9 MB) HBM->VMEM every
    decode layer step (traced 171 us/tok), and slicing inside the chunk
    executable is worse (XLA does not hoist the slices out of the loop —
    2.3 ms/tok of per-step slice fusions). Splitting ONCE at model build
    into real device arrays makes them plain executable inputs. The
    original ``scale_block`` leaf stays for the XLA dequant fallbacks
    (prefill / batched traces), costing ~1.5x scale bytes in HBM
    (~60 MB on the 1B int4_block model). Idempotent; no-op for models
    without stacked block leaves."""
    layers = params.get("layers")
    if not isinstance(layers, dict):
        return params
    changed = False
    new_layers = dict(layers)
    for name, v in layers.items():
        if (isinstance(v, dict) and "q_packed" in v and "scale_block" in v
                and "scale_lo" not in v
                and getattr(v["scale_block"], "ndim", 0) == 3):
            s = v["scale_block"]
            half = s.shape[1] // 2
            new_layers[name] = dict(v, scale_lo=jnp.asarray(s[:, :half]),
                                    scale_hi=jnp.asarray(s[:, half:]))
            changed = True
    if not changed:
        return params
    out = dict(params)
    out["layers"] = new_layers
    return out


def slice_layers(params: dict, n_layers: int) -> dict:
    """First ``n_layers`` of a stacked param pytree — the self-speculative
    draft model (reference: draft via early layers, causal.py:1096)."""
    import jax
    out = dict(params)
    out["layers"] = jax.tree.map(lambda x: x[:n_layers], params["layers"])
    return out


# ---------------------------------------------------------------------------
# Random initialisation (benchmarks / dry runs; no checkpoint needed)
# ---------------------------------------------------------------------------

def _build_random_params(cfg: TransformerConfig, w, dtype) -> dict:
    """Shared stacked-pytree layout for random init: ``w(*shape, dt=)`` is
    the weight-init closure (host numpy or device jax.random). One builder
    so the host and device variants cannot drift (each new architecture
    flag used to be hand-added twice)."""
    e, hq, hk, d = (cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads,
                    cfg.head_dim)
    inter = cfg.intermediate_size
    lp: dict = {
        "w_q": w(cfg.num_layers, e, hq * d),
        "w_k": w(cfg.num_layers, e, hk * d),
        "w_v": w(cfg.num_layers, e, hk * d),
        "w_o": w(cfg.num_layers, hq * d, e),
    }
    if cfg.pre_norms:
        lp["attn_norm_w"] = jnp.ones((cfg.num_layers, e), _F32)
        if not cfg.parallel_block:
            lp["mlp_norm_w"] = jnp.ones((cfg.num_layers, e), _F32)
        if cfg.norm_type == "layernorm":
            lp["attn_norm_b"] = jnp.zeros((cfg.num_layers, e), _F32)
            if not cfg.parallel_block:
                lp["mlp_norm_b"] = jnp.zeros((cfg.num_layers, e), _F32)
    if cfg.use_qk_norm:
        qn = cfg.num_heads * d if cfg.qk_norm_wide else d
        kn = cfg.num_kv_heads * d if cfg.qk_norm_wide else d
        lp["w_q_norm"] = jnp.ones((cfg.num_layers, qn), _F32)
        lp["w_k_norm"] = jnp.ones((cfg.num_layers, kn), _F32)
    if cfg.use_post_norms:
        lp["post_attn_norm_w"] = jnp.ones((cfg.num_layers, e), _F32)
        lp["post_mlp_norm_w"] = jnp.ones((cfg.num_layers, e), _F32)
    _wins = cfg.layer_windows()
    if _wins is not None:
        lp["attn_window"] = jnp.asarray(_wins, jnp.int32)
    if cfg.rope_local_theta is not None and cfg.layer_types is not None:
        lp["use_local_rope"] = jnp.asarray(
            [1 if t == "sliding_attention" else 0 for t in cfg.layer_types],
            jnp.int32)
    if cfg.rope_layers is not None:
        lp["use_rope_layer"] = jnp.asarray(cfg.rope_layers, jnp.int32)
    if cfg.is_moe:
        lp["w_router"] = w(cfg.num_layers, e, cfg.num_experts, dt=_F32)
        mi = cfg.moe_intermediate_size
        lp["w_experts_gate"] = w(cfg.num_layers, cfg.num_experts, e, mi)
        lp["w_experts_up"] = w(cfg.num_layers, cfg.num_experts, e, mi)
        lp["w_experts_down"] = w(cfg.num_layers, cfg.num_experts, mi, e)
    elif cfg.activation in ("silu", "gelu_tanh"):
        lp["w_gate"] = w(cfg.num_layers, e, inter)
        lp["w_up"] = w(cfg.num_layers, e, inter)
        lp["w_down"] = w(cfg.num_layers, inter, e)
    else:
        lp["w_fc1"] = w(cfg.num_layers, e, inter)
        lp["w_fc2"] = w(cfg.num_layers, inter, e)
        lp["b_fc1"] = jnp.zeros((cfg.num_layers, inter), dtype)
        lp["b_fc2"] = jnp.zeros((cfg.num_layers, e), dtype)
        if cfg.activation == "xielu":
            # apertus learned-activation leaves (XIELUActivation inits)
            import numpy as _np
            ap = float(_np.log(_np.expm1(0.8)))
            an = float(_np.log(_np.expm1(0.3)))
            lp["act_alpha_p"] = jnp.full((cfg.num_layers, 1), ap, _F32)
            lp["act_alpha_n"] = jnp.full((cfg.num_layers, 1), an, _F32)
            lp["act_beta"] = jnp.full((cfg.num_layers, 1), 0.5, _F32)
            lp["act_eps"] = jnp.full((cfg.num_layers, 1), -1e-6, _F32)

    params: dict = {
        "embed": w(cfg.vocab_size, e),
        "final_norm_w": jnp.ones((e,), _F32),
        "lm_head": None if cfg.tie_word_embeddings else w(e, cfg.vocab_size),
        "layers": lp,
    }
    if cfg.norm_type == "layernorm":
        params["final_norm_b"] = jnp.zeros((e,), _F32)
    if cfg.use_position_embed:
        params["pos_embed"] = w(cfg.max_position_embeddings, e)
    return params


def init_params(cfg: TransformerConfig, seed: int = 0, dtype=jnp.bfloat16) -> dict:
    """Random param pytree in the stacked-layer layout loader.py produces."""
    rng = np.random.default_rng(seed)
    std = 0.02

    def w(*shape, dt=dtype):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * std, dt)

    return _build_random_params(cfg, w, dtype)


def init_params_device(cfg: TransformerConfig, seed: int = 0,
                       dtype=jnp.bfloat16) -> dict:
    """init_params built ON DEVICE with jax.random — host-numpy init of a
    1B model takes ~14 min on a 1-CPU host vs ~6 s here (CLAUDE.md). Same
    pytree layout (shared _build_random_params); values differ from
    init_params (different RNG)."""
    key = jax.random.PRNGKey(seed)
    std = 0.02
    counter = [0]

    def w(*shape, dt=dtype):
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dt)

    return _build_random_params(cfg, w, dtype)


# ---------------------------------------------------------------------------
# Model class
# ---------------------------------------------------------------------------

def _bucket(n: int, minimum: int = 32) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclass
class KVSnapshot:
    """Host-side KV snapshot (reference: snapshot_kv_cache, causal.py:1003)."""
    k: np.ndarray
    v: np.ndarray
    pos: int


class CausalTransformerModel:
    """Unified causal LM with AOT-compiled cached decode."""

    def __init__(self, config: TransformerConfig, params: dict,
                 spec: ModelSpec | None = None, dtype=jnp.bfloat16,
                 kv_dtype=None):
        self.config = config
        self.spec = spec
        self.dtype = dtype
        # KV-cache storage dtype (reference: kv_cache_quant_algo,
        # src/pygpukit/llm/quant.py:76 + the FA3 fp8-KV kernel family).
        # fp8 halves cache HBM traffic and doubles paged capacity; writes
        # clamp to the format range, reads dequantise to bf16
        # (ops/embedding.to_kv_dtype / ops.nn.attention._kv_load).
        # PYGPUKIT_KV_DTYPE=fp8|fp8_e4m3|fp8_e5m2 sets it process-wide.
        self.kv_dtype = resolve_kv_dtype(kv_dtype, dtype)
        params = prepare_block_scales(params)
        self.params = params
        self.max_seq_len: int | None = None
        self.k_cache = None
        self.v_cache = None
        self.pos = 0
        self._decode_exe: Executable | None = None
        self._prefill_exes: dict[int, Executable] = {}
        self._window_exes: dict[int, Executable] = {}
        self._gen_exes: dict[tuple, Executable] = {}
        # set by parallel.shard_model: TP/EP-sharded params must route _mm
        # through plain XLA dots (GSPMD partitions those; the single-chip
        # Pallas GEMV/GEMM kernels would be replicated with gathered
        # operands) — capture sites wrap traces in batched_trace()
        self.xla_mm_only = False
        self._forward_jit = jax.jit(functools.partial(forward_fn, config))

        # RoPE tables once, f32 (reference: precompute_freqs_cis)
        if config.use_rope and "rope_cos" not in params:
            from ..ops.nn import rope as rope_mod
            scaling = config.rope_scaling or {}
            st = scaling.get("type", scaling.get("rope_type", ""))
            n = config.max_position_embeddings
            d = config.rope_dim     # == head_dim unless partial rotary
            if st in ("yarn",):
                cos, sin = rope_mod.rope_init_yarn(
                    n, d, config.rope_theta, scaling.get("factor", 1.0),
                    scaling.get("original_max_position_embeddings", n),
                    beta_fast=scaling.get("beta_fast") or 32.0,
                    beta_slow=scaling.get("beta_slow") or 1.0,
                    mscale=scaling.get("mscale"),
                    mscale_all_dim=scaling.get("mscale_all_dim"),
                    attention_factor=scaling.get("attention_factor"),
                    truncate=scaling.get("truncate", True))
            elif st in ("llama3",):
                cos, sin = rope_mod.rope_init_llama3(
                    n, d, config.rope_theta, scaling.get("factor", 8.0),
                    scaling.get("original_max_position_embeddings", 8192),
                    scaling.get("low_freq_factor", 1.0),
                    scaling.get("high_freq_factor", 4.0))
            elif st in ("longrope",):
                # Phi-3 family: per-dim short/long factor lists. HF switches
                # factor sets per FORWARD when total length exceeds
                # original_max — we build both tables and select by traced
                # length (rope_long_threshold leaf) so cached decode matches
                # transformers in both regimes.
                import math as _math
                orig = int(scaling.get(
                    "original_max_position_embeddings", n))
                factor = n / orig
                attn_f = scaling.get("attention_factor")
                if attn_f is None:
                    attn_f = (1.0 if factor <= 1.0 else _math.sqrt(
                        1 + _math.log(factor) / _math.log(orig)))
                cos, sin = rope_mod.rope_init_longrope(
                    n, d, config.rope_theta,
                    scaling.get("short_factor", [1.0] * (d // 2)), attn_f)
                if n > orig and "long_factor" in scaling:
                    cos_l, sin_l = rope_mod.rope_init_longrope(
                        n, d, config.rope_theta, scaling["long_factor"],
                        attn_f)
                    params["rope_cos_long"] = cos_l.jax
                    params["rope_sin_long"] = sin_l.jax
                    params["rope_long_threshold"] = jnp.int32(orig)
            elif st in ("linear",):
                cos, sin = rope_mod.rope_init_linear(
                    n, d, config.rope_theta, scaling.get("factor", 1.0))
            elif st in ("ntk", "dynamic"):
                cos, sin = rope_mod.rope_init_ntk_aware(
                    n, d, config.rope_theta, scaling.get("factor", 1.0))
            else:
                cos, sin = rope_mod.rope_init(n, d, config.rope_theta)
            params["rope_cos"] = cos.jax
            params["rope_sin"] = sin.jax
            if config.rope_local_theta is not None:
                # gemma3: sliding layers rotate with the LOCAL theta and no
                # scaling; the global tables above keep theta+rope_scaling
                cos_l, sin_l = rope_mod.rope_init(
                    n, d, config.rope_local_theta)
                params["rope_cos_local"] = cos_l.jax
                params["rope_sin_local"] = sin_l.jax

    # -- forward (no cache) --------------------------------------------------

    def __call__(self, input_ids) -> jax.Array:
        tokens = jnp.asarray(np.asarray(input_ids), jnp.int32)
        return self._forward_jit(self.params, tokens)

    def get_logits(self, input_ids) -> np.ndarray:
        return np.asarray(self(input_ids), np.float32)

    # -- fixed cache management ---------------------------------------------

    def init_fixed_cache(self, max_seq_len: int) -> None:
        """Preallocate KV caches [L, MAX, Hk, D]
        (reference: Attention.init_fixed_cache, llm/layers/attention.py:128).

        Re-initialising at the SAME capacity (the per-request reset
        pattern) keeps every captured executable: they are lowered against
        shapes, not buffers, and donation consumes the old cache arrays
        anyway. Dropping them cost ~2 s of re-capture per reset on the 1B
        model — the round-3 "13 ms/tok decode" was exactly this, not the
        chip."""
        cfg = self.config
        shape = (cfg.num_layers, max_seq_len, cfg.num_kv_heads, cfg.head_dim)
        same = (self.k_cache is not None and self.max_seq_len == max_seq_len
                and kv_leaf(self.k_cache).dtype == jnp.dtype(self.kv_dtype))
        self.k_cache = kv_cache_zeros(shape, self.kv_dtype)
        self.v_cache = kv_cache_zeros(shape, self.kv_dtype)
        self.max_seq_len = max_seq_len
        self.pos = 0
        if same:
            return
        # all executables were lowered against the old cache shape
        self._decode_exe = None
        self._prefill_exes = {}
        self._window_exes = {}
        self._gen_exes = {}
        if (use_fused_decode(cfg, self.params, max_seq_len)
                and "w_qkv_t" not in self.params["layers"]):
            self.params = prepare_fused_decode_params(cfg, self.params)

    def _mm_ctx(self):
        """Trace context for this model's captures: sharded params
        (xla_mm_only, set by parallel.shard_model) mark the trace so _mm
        keeps every matmul a plain XLA dot GSPMD can partition."""
        import contextlib
        return batched_trace() if self.xla_mm_only \
            else contextlib.nullcontext()

    def _ensure_decode_exe(self) -> Executable:
        if self._decode_exe is None:
            fn = functools.partial(decode_step_fn, self.config)
            with self._mm_ctx():
                self._decode_exe = capture(
                    fn, self.params, self.k_cache, self.v_cache,
                    jnp.int32(0), jnp.int32(0),
                    donate_argnums=(1, 2),
                    name="decode_step",
                )
        return self._decode_exe

    def _ensure_prefill_exe(self, bucket: int) -> Executable:
        if bucket not in self._prefill_exes:
            fn = functools.partial(prefill_fn, self.config)
            with self._mm_ctx():
                self._prefill_exes[bucket] = capture(
                    fn, self.params, self.k_cache, self.v_cache,
                    jnp.zeros((bucket,), jnp.int32), jnp.int32(1),
                    donate_argnums=(1, 2),
                    name=f"prefill_{bucket}",
                )
        return self._prefill_exes[bucket]

    # -- generation ----------------------------------------------------------

    def prefill(self, input_ids) -> jax.Array:
        """Run prompt through cached prefill; returns last-position logits."""
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        n = len(ids)
        if self.k_cache is None:
            self.init_fixed_cache(_bucket(max(n * 2, 256)))
        if n > self.max_seq_len:
            raise ValueError(f"prompt ({n}) exceeds cache ({self.max_seq_len})")
        bucket = min(_bucket(n), self.max_seq_len)
        exe = self._ensure_prefill_exe(bucket)
        padded = np.zeros((bucket,), np.int32)
        padded[:n] = ids
        self.k_cache, self.v_cache, logits = exe.replay(
            self.params, self.k_cache, self.v_cache,
            jnp.asarray(padded), jnp.int32(n))
        self.pos = n
        return logits

    def decode_step(self, token: int) -> jax.Array:
        """One cached decode step; returns logits for the next position."""
        exe = self._ensure_decode_exe()
        self.k_cache, self.v_cache, logits = exe.replay(
            self.params, self.k_cache, self.v_cache,
            jnp.int32(token), jnp.int32(self.pos))
        self.pos += 1
        return logits

    def decode_window(self, tokens, advance: int | None = None) -> jax.Array:
        """Lookahead window decode: T tokens in, [T, V] logits out.

        Advances ``pos`` by ``advance`` (default T); callers that reject part
        of the window pass the accepted count — rejected KV rows are masked by
        later steps (see decode_window_fn). One executable per window size.
        """
        t = len(tokens)
        if t not in self._window_exes:
            fn = functools.partial(decode_window_fn, self.config)
            with self._mm_ctx():
                self._window_exes[t] = capture(
                    fn, self.params, self.k_cache, self.v_cache,
                    jnp.zeros((t,), jnp.int32), jnp.int32(0),
                    donate_argnums=(1, 2), name=f"decode_window_{t}")
        exe = self._window_exes[t]
        self.k_cache, self.v_cache, logits = exe.replay(
            self.params, self.k_cache, self.v_cache,
            jnp.asarray(np.asarray(tokens, np.int32)), jnp.int32(self.pos))
        self.pos += t if advance is None else advance
        return logits

    def decode_chunk(self, token: int, n_steps: int, temperature: float = 0.0,
                     top_k: int = 0, seed: int = 0) -> np.ndarray:
        """Run ``n_steps`` decode steps in one device program; returns the
        generated tokens. One executable per (n_steps, sampling-mode)."""
        return np.asarray(
            self.decode_chunk_device(token, n_steps, temperature, top_k,
                                     seed))

    def decode_chunk_device(self, token, n_steps: int,
                            temperature: float = 0.0, top_k: int = 0,
                            seed: int = 0) -> jax.Array:
        """decode_chunk without the D2H sync: returns the generated tokens
        as a DEVICE array, and accepts ``token`` as a device scalar — so the
        prefill->first-chunk handoff never touches the host (each tunnel
        roundtrip costs ~30 ms; round-3 wall-split measured prefill at 54 ms
        of which the device work is ~2)."""
        key = (n_steps, float(temperature), int(top_k))
        if key not in self._gen_exes:
            fn = functools.partial(generate_scan_fn, self.config, n_steps,
                                   float(temperature), int(top_k))
            with self._mm_ctx():
                self._gen_exes[key] = capture(
                    fn, self.params, self.k_cache, self.v_cache,
                    jnp.int32(0), jnp.int32(0), jax.random.PRNGKey(0),
                    donate_argnums=(1, 2), name=f"generate_{n_steps}")
        exe = self._gen_exes[key]
        self.k_cache, self.v_cache, toks = exe.replay(
            self.params, self.k_cache, self.v_cache,
            jnp.int32(token), jnp.int32(self.pos),
            jax.random.PRNGKey(seed + self.pos))
        self.pos += n_steps
        return toks

    def decode_spec_chunk(self, token: int, n_rounds: int, gamma: int,
                          n_draft: int) -> tuple[np.ndarray, np.ndarray]:
        """Run ``n_rounds`` device-side self-speculative rounds in one
        program (speculative_scan_fn). Returns (toks [n_rounds, gamma+1]
        with -1 padding, counts [n_rounds]); advances ``pos`` by the
        accepted totals. One executable per (n_rounds, gamma, n_draft).

        Caller must leave room for the all-accept worst case:
        pos + n_rounds*(gamma+1) <= max_seq_len.
        """
        if self.pos + n_rounds * (gamma + 1) > self.max_seq_len:
            raise ValueError(
                f"speculative chunk worst case ({n_rounds}x{gamma + 1} from "
                f"pos {self.pos}) exceeds cache ({self.max_seq_len})")
        key = ("spec", n_rounds, gamma, n_draft)
        if key not in self._gen_exes:
            fn = functools.partial(speculative_scan_fn, self.config,
                                   n_rounds, gamma, n_draft)
            with self._mm_ctx():
                self._gen_exes[key] = capture(
                    fn, self.params, self.k_cache, self.v_cache,
                    jnp.int32(0), jnp.int32(0), donate_argnums=(1, 2),
                    name=f"spec_{n_rounds}x{gamma}_d{n_draft}")
        exe = self._gen_exes[key]
        self.k_cache, self.v_cache, toks, counts, pos = exe.replay(
            self.params, self.k_cache, self.v_cache,
            jnp.int32(token), jnp.int32(self.pos))
        counts = np.asarray(counts)
        self.pos = int(pos)
        return np.asarray(toks), counts

    def generate(self, input_ids, max_new_tokens: int = 32,
                 temperature: float = 0.0, top_k: int = 0, top_p: float = 0.0,
                 eos_token_id: int | None = None, seed: int = 0,
                 use_cache: bool = True, chunk_size: int = 32) -> list[int]:
        """Greedy/sampled generation (reference: generate, causal.py:179).

        Cached greedy/top-k paths run the device-side chunked loop (one
        dispatch per ``chunk_size`` tokens); top-p and uncached fall back to
        the per-token stream.
        """
        if not use_cache or (temperature > 0 and not (top_k > 0 or top_p == 0.0)):
            return list(self.generate_stream(
                input_ids, max_new_tokens, temperature, top_k, top_p,
                eos_token_id, seed, use_cache))

        ids = np.asarray(input_ids, np.int32).reshape(-1)
        if self.k_cache is None:
            self.init_fixed_cache(_bucket(max(len(ids) + max_new_tokens + 1, 256)))
        logits = self.prefill(ids)
        # First token stays ON DEVICE: reading it here costs a full tunnel
        # roundtrip (~30 ms) before the first chunk can even dispatch. The
        # first decode chunk consumes the device scalar directly and the
        # token value comes back with the chunk's own readback (one sync).
        # Trade-off: an immediate-EOS first token decodes one wasted chunk
        # before the host sees it — same one-chunk EOS lag the serving
        # engine accepts by construction.
        if temperature <= 0:
            cur = jnp.argmax(logits).astype(jnp.int32)
        else:
            from ..ops.sampling import sample_topk_fn, sample_temperature_fn
            k0 = jax.random.PRNGKey(seed)
            if top_k > 0:
                cur = sample_topk_fn(logits, k0, top_k, temperature)
            else:
                cur = sample_temperature_fn(logits, k0, temperature)
            cur = jnp.asarray(cur).astype(jnp.int32)
        out: list[int] = []
        first = True
        # (EOS can only surface inside a chunk's readback, which returns
        # from the loop body directly — no loop-top EOS check needed)
        while len(out) < max_new_tokens:
            # the first chunk's readback also delivers the deferred token,
            # so it only needs max_new_tokens-1 steps
            n = min(max_new_tokens - len(out) - (1 if first else 0),
                    chunk_size, self.max_seq_len - self.pos)
            if n <= 0:
                if first:
                    out.append(int(np.asarray(cur)))
                break
            toks_d = self.decode_chunk_device(cur, n, temperature, top_k,
                                              seed)
            if first:
                toks = np.asarray(
                    jnp.concatenate([jnp.reshape(cur, (1,)), toks_d]))
                first = False
            else:
                toks = np.asarray(toks_d)
            toks_l = [int(t) for t in toks]
            if eos_token_id is not None and eos_token_id in toks_l:
                idx = toks_l.index(eos_token_id)
                out.extend(toks_l[:idx + 1])
                return out[:max_new_tokens]
            out.extend(toks_l)
            cur = toks_l[-1]
        return out[:max_new_tokens]

    def generate_stream(self, input_ids, max_new_tokens: int = 32,
                        temperature: float = 0.0, top_k: int = 0,
                        top_p: float = 0.0, eos_token_id: int | None = None,
                        seed: int = 0, use_cache: bool = True
                        ) -> Iterator[int]:
        from ..ops.sampling import (
            sample_greedy_fn, sample_temperature_fn, sample_topk_fn,
            sample_topp_fn,
        )
        key = jax.random.PRNGKey(seed)

        def sample(logits, key):
            if temperature <= 0.0:
                return sample_greedy_fn(logits)
            if top_k > 0:
                return sample_topk_fn(logits, key, top_k, temperature)
            if 0.0 < top_p < 1.0:
                return sample_topp_fn(logits, key, top_p, temperature)
            return sample_temperature_fn(logits, key, temperature)

        if not use_cache:
            ids = list(np.asarray(input_ids, np.int32).reshape(-1))
            for _ in range(max_new_tokens):
                logits = self(ids)[-1]
                key, sub = jax.random.split(key)
                tok = int(sample(logits, sub))
                yield tok
                ids.append(tok)
                if eos_token_id is not None and tok == eos_token_id:
                    return
            return

        logits = self.prefill(input_ids)
        for _ in range(max_new_tokens):
            key, sub = jax.random.split(key)
            tok = int(sample(logits, sub))
            yield tok
            if eos_token_id is not None and tok == eos_token_id:
                return
            if self.pos >= self.max_seq_len:
                return
            logits = self.decode_step(tok)

    # -- KV snapshot / restore (reference: causal.py:1003,1017) --------------

    def snapshot_kv_cache(self) -> KVSnapshot:
        host = lambda c: jax.tree.map(np.asarray, c)
        return KVSnapshot(
            k=host(self.k_cache), v=host(self.v_cache), pos=self.pos)

    def restore_kv_cache(self, snap: KVSnapshot) -> None:
        # np.asarray preserves fp8 (ml_dtypes) and int8-dict leaves —
        # restore in the cache's storage dtypes, not the model dtype.
        # Structure must match the model's kv_dtype (a bf16 snapshot can't
        # feed executables captured over int8 dict pools and vice versa —
        # donation would fail with an opaque pytree mismatch downstream);
        # plain-array snapshots coerce to the model's storage dtype as the
        # pre-round-5 code did.
        want_dict = jnp.dtype(self.kv_dtype) == jnp.int8
        have_dict = isinstance(snap.k, dict)
        if want_dict != have_dict:
            raise TypeError(
                f"KV snapshot structure ({'int8 dict' if have_dict else 'array'}) "
                f"does not match model kv_dtype={self.kv_dtype} "
                f"({'int8 dict' if want_dict else 'array'} pools); "
                "re-quantize or rebuild the model with the matching kv_dtype")
        if want_dict:
            self.k_cache = jax.tree.map(jnp.asarray, snap.k)
            self.v_cache = jax.tree.map(jnp.asarray, snap.v)
        else:
            self.k_cache = jnp.asarray(snap.k, self.kv_dtype)
            self.v_cache = jnp.asarray(snap.v, self.kv_dtype)
        self.pos = snap.pos
