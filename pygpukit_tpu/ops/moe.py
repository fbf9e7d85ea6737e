"""MoE dispatch ops (reference: native/ops/moe/* — top-k routing, permute,
grouped GEMM with per-row expert IDs; llm/layers/moe.py:29,153).

Three exact (no token dropping) formulations, routed by token count
(``select_moe_fn``):

* ragged gmm: tokens sorted by expert, grouped matmul over contiguous expert
  segments via the Mosaic ``megablox.gmm`` kernel (TPU only, needs >=128
  replicated rows) — minimal top-k× FLOPs; the prefill path.
* expert-gather: k dynamic expert-weight slices per matrix — minimal HBM
  traffic at decode-sized T (reads only the selected experts).
* dense one-hot: every expert processes every token — always available,
  the CPU/parity path (PYGPUKIT_MOE=dense forces it).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_F32 = jnp.float32


def topk_route_fn(router_logits, k: int):
    """[T, E] logits -> (weights [T,k] softmaxed, expert ids [T,k])."""
    topv, topi = jax.lax.top_k(router_logits, k)
    return jax.nn.softmax(topv, axis=-1), topi


def _expert_dot(x, w):
    """x [T, in] @ expert weight [in, out]; w may be a quantized
    {"q","scale"} leaf (per-column scales) — the scale is applied AFTER the
    dot, so the quantized bytes stream from HBM and no dequantized copy is
    materialised (same trick as llm/model._mm)."""
    if isinstance(w, dict):
        acc = jnp.dot(x.astype(jnp.bfloat16), w["q"].astype(jnp.bfloat16),
                      preferred_element_type=_F32)
        return (acc * w["scale"]).astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=_F32).astype(x.dtype)


def _dequant_stack(w, dtype):
    """Materialise a dense [E, in, out] stack from a quantized leaf (the
    megablox gmm kernel consumes dense rhs; dequant happens once per step
    inside jit — still halves the *resident* HBM for expert weights)."""
    if isinstance(w, dict):
        return (w["q"].astype(_F32) * w["scale"]).astype(dtype)
    return w


def moe_gmm_fn(y, w_gate, w_up, w_down, router_logits, k: int):
    """Exact ragged MoE forward via megablox grouped matmul.

    y [T, H]; w_* [E, H, I] / [E, I, H]; router_logits [T, E].
    Tokens are replicated top-k times, sorted by expert, run through
    contiguous grouped matmuls, then combined with routing weights.
    """
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    w_gate = _dequant_stack(w_gate, y.dtype)
    w_up = _dequant_stack(w_up, y.dtype)
    w_down = _dequant_stack(w_down, y.dtype)
    t, h = y.shape
    e = w_gate.shape[0]
    weights, topi = topk_route_fn(router_logits.astype(_F32), k)

    flat_expert = topi.reshape(-1)                       # [T*k]
    flat_token = jnp.repeat(jnp.arange(t), k)            # [T*k]
    flat_w = weights.reshape(-1)
    order = jnp.argsort(flat_expert)                     # stable
    sorted_tokens = flat_token[order]
    sorted_w = flat_w[order]
    group_sizes = jnp.bincount(flat_expert, length=e).astype(jnp.int32)

    lhs = y[sorted_tokens]                               # [T*k, H]
    gate = gmm(lhs, w_gate, group_sizes)                 # [T*k, I]
    up = gmm(lhs, w_up, group_sizes)
    act = (jax.nn.sigmoid(gate.astype(_F32)) * gate.astype(_F32)
           * up.astype(_F32)).astype(lhs.dtype)
    down = gmm(act, w_down, group_sizes)                 # [T*k, H]

    out = jnp.zeros((t, h), _F32)
    out = out.at[sorted_tokens].add(down.astype(_F32) * sorted_w[:, None])
    return out


def moe_gather_fn(y, w_gate, w_up, w_down, router_logits, k: int):
    """Bandwidth-minimal small-T formulation (decode): gather ONLY the
    selected experts' weights (k dynamic slices per matrix instead of
    streaming all E experts). For T=1 this reads exactly the top-k experts
    — the minimal HBM traffic; use for T <= ~4 (the gather materialises T
    copies). Exact (same math as dense)."""
    t = y.shape[0]
    weights, topi = topk_route_fn(router_logits.astype(_F32), k)   # [T,k]

    def leaf(w):
        return w["q"] if isinstance(w, dict) else w

    def dot_gathered(x_rows, w_stack, eids):
        """x_rows [T, in]; gathered expert mats [T, in, out] -> [T, out]."""
        if isinstance(w_stack, dict):
            q = w_stack["q"][eids]                        # [T, in, out]
            acc = jnp.einsum("ti,tio->to", x_rows.astype(jnp.bfloat16),
                             q.astype(jnp.bfloat16),
                             preferred_element_type=_F32)
            scale = w_stack["scale"]
            per_expert = (getattr(scale, "ndim", 0) >= 1
                          and scale.shape[0] == leaf(w_stack).shape[0])
            sc = scale[eids] if per_expert else scale
            return acc * jnp.squeeze(jnp.asarray(sc))
        wg = w_stack[eids]                                # [T, in, out]
        return jnp.einsum("ti,tio->to", x_rows, wg,
                          preferred_element_type=_F32)

    out = jnp.zeros((t, leaf(w_down).shape[-1]), _F32)
    for j in range(k):
        eids = topi[:, j]                                 # [T]
        g = dot_gathered(y, w_gate, eids)
        u = dot_gathered(y, w_up, eids)
        act = (jax.nn.sigmoid(g) * g * u).astype(y.dtype)
        d = dot_gathered(act, w_down, eids)
        out = out + d * weights[:, j:j + 1]
    return out


def moe_dense_fn(y, w_gate, w_up, w_down, router_logits, k: int):
    """Dense one-hot formulation (always available; the CPU/parity path).
    Expert stacks may be quantized {"q","scale"} leaves [E, in, out]."""
    t = y.shape[0]
    e = (w_gate["q"] if isinstance(w_gate, dict) else w_gate).shape[0]
    weights, topi = topk_route_fn(router_logits.astype(_F32), k)
    combine = jnp.zeros((t, e), _F32)
    combine = combine.at[jnp.arange(t)[:, None], topi].set(weights)

    def expert_fwd(wg, wu, wd):
        g = _expert_dot(y, wg)
        u = _expert_dot(y, wu)
        act = (jax.nn.sigmoid(g.astype(_F32)) * g.astype(_F32)
               * u.astype(_F32)).astype(y.dtype)
        return _expert_dot(act, wd).astype(_F32)

    per_expert = jax.vmap(expert_fwd)(w_gate, w_up, w_down)   # [E, T, H]
    return jnp.einsum("te,eth->th", combine, per_expert)


def use_gmm() -> bool:
    """Ragged megablox gmm is the DEFAULT on TPU for prefill-scale token
    counts (the reference's MoE is always grouped-GEMM —
    llm/layers/moe.py:153; the dense one-hot path pays num_experts/top_k×
    extra FLOPs). PYGPUKIT_MOE=dense opts out; elsewhere (CPU/interpret)
    the dense formulation is the only exact option. NOTE: megablox tiling
    needs >=128 replicated-token rows — callers must route small T to
    moe_gather_fn/moe_dense_fn (see select_moe_fn)."""
    from ..core.backend import get_backend
    if os.environ.get("PYGPUKIT_MOE", "") == "dense":
        return False
    return get_backend().platform == "tpu"


def select_moe_fn(n_tokens: int, top_k: int):
    """Route by token count: gmm (TPU, >=128 rows after top-k replication),
    expert-gather (decode-sized T), dense one-hot otherwise.
    PYGPUKIT_MOE=dense forces the dense formulation for EVERY size (the
    debugging escape hatch)."""
    if os.environ.get("PYGPUKIT_MOE", "") == "dense":
        return moe_dense_fn
    if use_gmm() and n_tokens * top_k >= 128:
        return moe_gmm_fn
    if n_tokens <= 4:
        return moe_gather_fn
    return moe_dense_fn
