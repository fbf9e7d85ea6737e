"""Build models from safetensors checkpoints (reference: src/pygpukit/llm/
loader.py:63-132 — spec-driven assembly, GPT-2 transpose + fused-QKV split,
per-arch convenience loaders).

Output is the stacked-pytree layout consumed by model.py: per-layer weights
stacked on a leading layer axis so the layer loop compiles to ``lax.scan``.
Projections are stored [in, out] (x @ W); norm weights stay f32.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .config import (
    MODEL_SPECS, ModelSpec, TransformerConfig, detect_model_spec,
)
from .model import CausalTransformerModel
from .safetensors import load_safetensors


# ---------------------------------------------------------------------------
# H2D staging: every tensor conversion+upload routes through the async
# transfer engine (reference: rust transfer/engine.rs:14-144 — ALL H2D goes
# through the engine there too). Two worker threads overlap the host-side
# mmap read/transpose/astype with the device upload of the previous tensor —
# double-buffering the 20 MB/s tunnel. PYGPUKIT_ASYNC_LOAD=0 opts out.
# Thread-local so concurrent load_model_from_safetensors calls (multi-model
# serving startup from threads) each get their own engine instead of
# clobbering a module global (ADVICE r2).
# ---------------------------------------------------------------------------

import threading

_stager_tls = threading.local()


def _stage(produce):
    eng = getattr(_stager_tls, "engine", None)
    if eng is None:
        return produce()
    return eng._submit(produce, eng.NORMAL)


def _resolve(tree):
    import jax
    from ..transfer.engine import TransferFuture
    is_fut = lambda x: isinstance(x, TransferFuture)
    return jax.tree.map(lambda x: x.result() if is_fut(x) else x, tree,
                        is_leaf=is_fut)


class _staging:
    """Context manager activating the loader's transfer engine.

    ``min_bytes``: below this checkpoint size the engine overhead (worker
    startup + per-tensor handoff) exceeds the overlap win — stay inline."""

    def __init__(self, total_bytes: int = 1 << 62):
        self.total_bytes = total_bytes

    def __enter__(self):
        min_bytes = int(os.environ.get("PYGPUKIT_ASYNC_LOAD_MIN_BYTES",
                                       str(256 << 20)))
        if (os.environ.get("PYGPUKIT_ASYNC_LOAD", "1") != "0"
                and self.total_bytes >= min_bytes):
            from ..transfer.engine import AsyncTransferEngine
            _stager_tls.engine = AsyncTransferEngine(num_workers=2)
        return self

    def __exit__(self, *exc):
        eng = getattr(_stager_tls, "engine", None)
        if eng is not None:
            _stager_tls.engine = None
            eng.synchronize()
            eng.shutdown()


def _to_jnp(arr, dtype):
    return _stage(lambda: jnp.asarray(np.asarray(arr)).astype(dtype))


def _linear(st, name: str, dtype, transpose: bool):
    def produce():
        w = np.asarray(st.tensor_numpy(name))
        if transpose:
            w = np.ascontiguousarray(w.T)
        return jnp.asarray(w).astype(dtype)
    return _stage(produce)


def _find_config_json(path) -> dict | None:
    p = Path(path)
    base = p if p.is_dir() else p.parent
    cj = base / "config.json"
    if cj.exists():
        with open(cj) as f:
            return json.load(f)
    return None


def _infer_config(st, spec: ModelSpec, hf_cfg: dict | None) -> TransformerConfig:
    if hf_cfg is not None:
        cfg = TransformerConfig.from_hf_config(hf_cfg, spec)
        return cfg
    # heuristic inference from tensor shapes (no config.json)
    names = st.keys()
    n_layers = 0
    probe = spec.attn_norm or spec.post_attn_norm   # olmo2: post-only norms
    while probe.format(layer=n_layers) in st:
        n_layers += 1
    vocab, hidden = st.tensor_shape(spec.embed_tokens)
    qn = spec.q_proj.format(layer=0)
    kn = spec.k_proj.format(layer=0)
    q_shape = st.tensor_shape(qn)
    if spec.qkv_combined:
        if spec.name == "phi3":
            # the fused qkv/gate_up shapes cannot disambiguate the head
            # split (Phi-3-mini uses 96-dim heads; hidden//64 would infer
            # 48 heads that reshape "successfully" into garbage) — demand
            # the config.json that every HF phi3 checkpoint ships
            raise ValueError(
                "phi3 checkpoints need config.json next to the weights: "
                "the fused qkv_proj cannot disambiguate num_heads/head_dim")
        num_heads = max(1, hidden // 64)
        num_kv = num_heads
    else:
        q_out = q_shape[0] if spec.hf_linear_layout else q_shape[1]
        k_out = st.tensor_shape(kn)[0] if spec.hf_linear_layout else st.tensor_shape(kn)[1]
        # head_dim is not recoverable from projection shapes alone; q_norm
        # weight (Qwen3-family) is exactly [head_dim] when present, else
        # default 64 (config.json is the reliable source)
        if (spec.q_norm and not spec.qk_norm_wide
                and spec.q_norm.format(layer=0) in st):
            # last dim: qwen3 q_norm is [D], cohere's is per-head [Hq, D]
            head_dim = st.tensor_shape(spec.q_norm.format(layer=0))[-1]
        else:
            # olmo2's q_norm is the WHOLE projection width, not [head_dim]
            head_dim = 64
        num_heads = q_out // head_dim
        num_kv = k_out // head_dim
    inter = None
    if spec.gate_proj:
        g = st.tensor_shape(spec.gate_proj.format(layer=0))
        inter = g[0] if spec.hf_linear_layout else g[1]
        if spec.gate_up_combined:
            inter //= 2                   # fused gate_up tensor is [2I, E]
    elif spec.fc1:
        g = st.tensor_shape(spec.fc1.format(layer=0))
        inter = g[1] if not spec.hf_linear_layout else g[0]
    max_pos = 1024
    if spec.position_embed and spec.position_embed in st:
        max_pos = st.tensor_shape(spec.position_embed)[0]
    if spec.name in ("gemma2", "gemma3"):
        # no config.json: fall back to the published arch defaults so the
        # sandwich norms / softcaps / sliding pattern still apply
        hf = {"model_type": spec.hf_model_type, "vocab_size": vocab,
              "hidden_size": hidden, "num_hidden_layers": n_layers,
              "num_attention_heads": num_heads,
              "num_key_value_heads": num_kv, "intermediate_size": inter,
              "head_dim": head_dim}
        return TransformerConfig.from_hf_config(hf, spec)
    return TransformerConfig(
        vocab_size=vocab, hidden_size=hidden, num_layers=n_layers,
        num_heads=num_heads, num_kv_heads=num_kv, intermediate_size=inter,
        head_dim_override=(head_dim if not spec.qkv_combined else None),
        norm_type=spec.norm_type, activation=spec.activation,
        use_rope=spec.use_rope, use_qk_norm=spec.use_qk_norm,
        pre_norms=spec.pre_norms, qk_norm_wide=spec.qk_norm_wide,
        use_post_norms=(spec.post_attn_norm is not None
                        or not spec.pre_norms),
        parallel_block=spec.parallel_block,
        rope_interleaved=spec.rope_interleaved,
        # arch constants the config.json would normally carry — fall back
        # to the published family defaults so a bare checkpoint still
        # computes the right function (glm4 partial rotary, cohere logit
        # scale)
        rope_partial_factor=(
            0.5 if spec.name in ("glm4", "nemotron", "phi") else 1.0),
        logit_scale=0.0625 if spec.name == "cohere" else None,
        use_position_embed=spec.use_position_embed,
        max_position_embeddings=max_pos,
        norm_eps=spec.default_norm_eps, rope_theta=spec.default_rope_theta,
        tie_word_embeddings=spec.lm_head is None,
    )


def load_model_from_safetensors(path, dtype=jnp.bfloat16,
                                spec: ModelSpec | None = None,
                                config: TransformerConfig | None = None,
                                max_seq_len: int | None = None,
                                fuse: bool = True,
                                kv_dtype=None,
                                ) -> CausalTransformerModel:
    """Load any supported checkpoint into a CausalTransformerModel
    (reference: load_model_from_safetensors, llm/loader.py:132).

    ``fuse`` (default True) packs q/k/v and gate/up into fused leaves —
    measured 3.7 vs 4.9 ms/tok on 1B decode (docs/performance.md). Pass
    fuse=False to keep separate leaves (required for the experimental
    PYGPUKIT_DECODE=fused Pallas kernel, which is slower anyway)."""
    st = load_safetensors(path)
    if spec is None:
        spec = detect_model_spec(st.keys())
    hf_cfg = _find_config_json(path)
    if config is None:
        config = _infer_config(st, spec, hf_cfg)

    try:
        total = sum(st.info(k).nbytes for k in st.keys())
    except Exception:
        total = 1 << 62
    with _staging(total):
        params = _build_params(st, spec, config, dtype)
    if fuse:
        from .model import fuse_params
        params = fuse_params(params)
    if kv_dtype is None and hf_cfg:
        # checkpoint-declared KV quantization (reference:
        # kv_cache_quant_algo, src/pygpukit/llm/quant.py:76)
        from .quant import kv_dtype_from_quant_config
        kv_dtype = kv_dtype_from_quant_config(
            hf_cfg.get("quantization_config"))
    model = CausalTransformerModel(config, params, spec=spec, dtype=dtype,
                                   kv_dtype=kv_dtype)
    if max_seq_len is not None:
        model.init_fixed_cache(max_seq_len)
    return model


def _build_params(st, spec, config, dtype) -> dict:
    norm_dtype = jnp.float32
    tr = spec.hf_linear_layout
    hq, hk, d = config.num_heads, config.num_kv_heads, config.head_dim
    params: dict = {}
    params["embed"] = _to_jnp(st.tensor_numpy(spec.embed_tokens), dtype)
    if spec.use_position_embed and spec.position_embed:
        params["pos_embed"] = _to_jnp(st.tensor_numpy(spec.position_embed), dtype)
    params["final_norm_w"] = _to_jnp(st.tensor_numpy(spec.final_norm), norm_dtype)
    if spec.final_norm_bias and spec.final_norm_bias in st:
        params["final_norm_b"] = _to_jnp(
            st.tensor_numpy(spec.final_norm_bias), norm_dtype)
    if spec.lm_head and spec.lm_head in st:
        # store [E, V] so logits = h @ lm_head
        params["lm_head"] = _linear(st, spec.lm_head, dtype, transpose=True)
        if spec.lm_head_bias and spec.lm_head_bias in st:
            params["lm_head_b"] = _to_jnp(
                st.tensor_numpy(spec.lm_head_bias), jnp.float32)
    else:
        params["lm_head"] = None

    layers = []
    for l in range(config.num_layers):
        lp: dict = {}
        if spec.attn_norm:            # None = OLMo-2 post-norm-only scheme
            lp["attn_norm_w"] = _to_jnp(
                st.tensor_numpy(spec.attn_norm.format(layer=l)), norm_dtype)
        if spec.attn_norm_bias:
            lp["attn_norm_b"] = _to_jnp(
                st.tensor_numpy(spec.attn_norm_bias.format(layer=l)), norm_dtype)
        if spec.mlp_norm:
            lp["mlp_norm_w"] = _to_jnp(
                st.tensor_numpy(spec.mlp_norm.format(layer=l)), norm_dtype)
        if spec.mlp_norm_bias:
            lp["mlp_norm_b"] = _to_jnp(
                st.tensor_numpy(spec.mlp_norm_bias.format(layer=l)), norm_dtype)
        if spec.post_attn_norm:
            lp["post_attn_norm_w"] = _to_jnp(
                st.tensor_numpy(spec.post_attn_norm.format(layer=l)), norm_dtype)
            lp["post_mlp_norm_w"] = _to_jnp(
                st.tensor_numpy(spec.post_mlp_norm.format(layer=l)), norm_dtype)
        wins = config.layer_windows()
        if wins is not None:
            lp["attn_window"] = jnp.int32(wins[l])
        if (config.rope_local_theta is not None
                and config.layer_types is not None):
            lp["use_local_rope"] = jnp.int32(
                1 if config.layer_types[l] == "sliding_attention" else 0)
        if config.rope_layers is not None:
            lp["use_rope_layer"] = jnp.int32(config.rope_layers[l])

        if spec.qkv_combined:
            w = np.asarray(st.tensor_numpy(spec.q_proj.format(layer=l)))
            if tr:
                w = w.T                               # → [in, 3E]
            e = w.shape[0]
            qd, kd = hq * d, hk * d
            lp["w_q"] = _to_jnp(w[:, :qd], dtype)
            lp["w_k"] = _to_jnp(w[:, qd:qd + kd], dtype)
            lp["w_v"] = _to_jnp(w[:, qd + kd:qd + 2 * kd], dtype)
            if spec.q_bias:
                b = np.asarray(st.tensor_numpy(spec.q_bias.format(layer=l)))
                lp["b_q"] = _to_jnp(b[:qd], dtype)
                lp["b_k"] = _to_jnp(b[qd:qd + kd], dtype)
                lp["b_v"] = _to_jnp(b[qd + kd:qd + 2 * kd], dtype)
        else:
            lp["w_q"] = _linear(st, spec.q_proj.format(layer=l), dtype, tr)
            lp["w_k"] = _linear(st, spec.k_proj.format(layer=l), dtype, tr)
            lp["w_v"] = _linear(st, spec.v_proj.format(layer=l), dtype, tr)
            if spec.q_bias and spec.q_bias.format(layer=l) in st:
                lp["b_q"] = _to_jnp(st.tensor_numpy(spec.q_bias.format(layer=l)), dtype)
                lp["b_k"] = _to_jnp(st.tensor_numpy(spec.k_bias.format(layer=l)), dtype)
                lp["b_v"] = _to_jnp(st.tensor_numpy(spec.v_bias.format(layer=l)), dtype)
        lp["w_o"] = _linear(st, spec.o_proj.format(layer=l), dtype, tr)
        if spec.o_bias and spec.o_bias.format(layer=l) in st:
            lp["b_o"] = _to_jnp(st.tensor_numpy(spec.o_bias.format(layer=l)), dtype)
        if spec.use_qk_norm or (config.use_qk_norm and spec.q_norm
                                and spec.q_norm.format(layer=l) in st):
            # cohere: q/k norms are config-OPTIONAL (use_qk_norm in
            # config.json); qwen3/olmo2 always carry them (spec flag)
            lp["w_q_norm"] = _to_jnp(
                st.tensor_numpy(spec.q_norm.format(layer=l)), norm_dtype)
            lp["w_k_norm"] = _to_jnp(
                st.tensor_numpy(spec.k_norm.format(layer=l)), norm_dtype)

        if spec.is_moe:
            lp["w_router"] = _linear(st, spec.moe_gate.format(layer=l),
                                     jnp.float32, tr)
            gates, ups, downs = [], [], []
            for e_i in range(config.num_experts):
                gates.append(_linear(
                    st, spec.expert_gate_proj.format(layer=l, expert=e_i), dtype, tr))
                ups.append(_linear(
                    st, spec.expert_up_proj.format(layer=l, expert=e_i), dtype, tr))
                downs.append(_linear(
                    st, spec.expert_down_proj.format(layer=l, expert=e_i), dtype, tr))
            lp["w_experts_gate"] = jnp.stack(_resolve(gates))
            lp["w_experts_up"] = jnp.stack(_resolve(ups))
            lp["w_experts_down"] = jnp.stack(_resolve(downs))
        elif spec.gate_proj and spec.gate_up_combined:
            # Phi-3: one gate_up_proj tensor, gate rows first
            w = np.asarray(st.tensor_numpy(spec.gate_proj.format(layer=l)))
            if tr:
                w = w.T                                  # → [in, 2I]
            ii = w.shape[1] // 2
            lp["w_gate"] = _to_jnp(w[:, :ii], dtype)
            lp["w_up"] = _to_jnp(w[:, ii:], dtype)
            lp["w_down"] = _linear(st, spec.down_proj.format(layer=l), dtype, tr)
        elif spec.gate_proj:
            lp["w_gate"] = _linear(st, spec.gate_proj.format(layer=l), dtype, tr)
            lp["w_up"] = _linear(st, spec.up_proj.format(layer=l), dtype, tr)
            lp["w_down"] = _linear(st, spec.down_proj.format(layer=l), dtype, tr)
        else:
            lp["w_fc1"] = _linear(st, spec.fc1.format(layer=l), dtype, tr)
            lp["w_fc2"] = _linear(st, spec.fc2.format(layer=l), dtype, tr)
            if spec.fc1_bias:
                lp["b_fc1"] = _to_jnp(
                    st.tensor_numpy(spec.fc1_bias.format(layer=l)), dtype)
                lp["b_fc2"] = _to_jnp(
                    st.tensor_numpy(spec.fc2_bias.format(layer=l)), dtype)
            if spec.activation == "xielu" and spec.act_params:
                # apertus learned activation params + checkpoint buffers
                pre = spec.act_params.format(layer=l)
                for leaf, key in (("act_alpha_p", "alpha_p"),
                                  ("act_alpha_n", "alpha_n"),
                                  ("act_beta", "beta"), ("act_eps", "eps")):
                    lp[leaf] = _to_jnp(st.tensor_numpy(pre + key),
                                       jnp.float32)
        layers.append(lp)

    import jax
    layers = _resolve(layers)
    params = _resolve(params)
    if spec.norm_plus_one:
        # gemma RMSNorm stores w with effective weight (1+w) — fold the +1
        # into the f32 stored weights so the shared rmsnorm path is exact
        norm_keys = ("attn_norm_w", "mlp_norm_w", "post_attn_norm_w",
                     "post_mlp_norm_w", "w_q_norm", "w_k_norm")
        for lp in layers:
            for k in norm_keys:
                if k in lp:
                    lp[k] = lp[k] + 1.0
        params["final_norm_w"] = params["final_norm_w"] + 1.0
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return params


# per-arch convenience loaders (reference: loader.py:63-111)

def load_gpt2_from_safetensors(path, dtype=jnp.float32, **kw):
    return load_model_from_safetensors(path, dtype, spec=MODEL_SPECS["gpt2"], **kw)


def load_llama_from_safetensors(path, dtype=jnp.bfloat16, **kw):
    return load_model_from_safetensors(path, dtype, spec=MODEL_SPECS["llama"], **kw)


def load_qwen3_from_safetensors(path, dtype=jnp.bfloat16, **kw):
    return load_model_from_safetensors(path, dtype, spec=MODEL_SPECS["qwen3"], **kw)


def load_mixtral_from_safetensors(path, dtype=jnp.bfloat16, **kw):
    return load_model_from_safetensors(path, dtype, spec=MODEL_SPECS["mixtral"], **kw)
