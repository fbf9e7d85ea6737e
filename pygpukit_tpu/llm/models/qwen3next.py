"""Qwen3-Next family (Qwen3-Next-80B-A3B class): hybrid gated-DeltaNet
linear attention + gated full attention, MoE with a shared expert.

Beyond-reference family (standalone-model pattern like llama4.py /
deepseek.py / lfm2.py, transformers-parity contract against HF
modeling_qwen3_next.py). The headline capability is the LINEAR-attention
cache: 3 of every 4 layers carry a fixed [nv, Dk, Dv] recurrent state +
a [conv_dim, K] conv state instead of a KV cache — decode cost and cache
memory are O(1) in context length for those layers.

Mechanisms (transformers-exact):
- **Gated DeltaNet** (Qwen3NextGatedDeltaNet): in_proj_qkvz packs
  q|k|v|z per K-HEAD group; a depthwise causal conv (kernel 4) + SiLU
  runs over cat(q,k,v); beta = sigmoid(b); decay
  g = -exp(A_log) * softplus(a + dt_bias) (f32); q/k are L2-normalised
  (sum-of-squares + 1e-6, the FLA convention) and the delta rule updates
  a per-v-head [Dk, Dv] state:
      S_t = S_{t-1} * exp(g_t);  delta = (v_t - k_t·S_t) * beta_t
      S_t += k_t ⊗ delta;        o_t = (q_t/√Dk)·S_t
  The output runs through a GATED RMSNorm (norm first, then * silu(z))
  and out_proj. Prefill uses the CHUNKED formulation (_delta_chunked —
  the UT-transform closed form, S/64 matmul steps instead of S rank-1
  updates; all-f32 einsums at HIGHEST precision because the intra-chunk
  triangular inverse amplifies dot error ~1000x); decode takes single
  recurrent steps.
- **Gated full attention**: q_proj emits 2x width (query | gate per
  head); per-head q/k RMS norms; PARTIAL split-half rope (factor 0.25);
  output * sigmoid(gate) before o_proj.
- **MoE**: softmax over ALL experts -> top-k -> renormalise
  (norm_topk_prob), PLUS a shared expert scaled by
  sigmoid(shared_expert_gate(x)).

Layers are heterogeneous -> per-layer LIST pytrees, statically unrolled
(same design as lfm2.py).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...core.executable import capture
from ...ops.nn.norm import rmsnorm_fn
from ...ops.nn.rope import apply_rope_fn, rope_init

_F32 = jnp.float32


@dataclass
class Qwen3NextConfig:
    vocab_size: int = 151936
    hidden_size: int = 2048
    num_layers: int = 48
    num_heads: int = 16
    num_kv_heads: int = 2
    head_dim: int = 256
    intermediate_size: int = 5120
    layer_types: tuple = ()
    # linear-attention geometry
    linear_num_value_heads: int = 32
    linear_num_key_heads: int = 16
    linear_key_head_dim: int = 128
    linear_value_head_dim: int = 128
    linear_conv_kernel_dim: int = 4
    # MoE
    num_experts: int = 0
    num_experts_per_tok: int = 10
    moe_intermediate_size: int = 512
    shared_expert_intermediate_size: int = 512
    norm_topk_prob: bool = True
    mlp_only_layers: tuple = ()
    decoder_sparse_step: int = 1
    # rope
    rope_theta: float = 10000000.0
    partial_rotary_factor: float = 0.25
    norm_eps: float = 1e-6
    max_position_embeddings: int = 262144
    tie_word_embeddings: bool = False

    @classmethod
    def from_hf(cls, hf: dict) -> "Qwen3NextConfig":
        n_layers = hf.get("num_hidden_layers", 48)
        heads = hf.get("num_attention_heads", 16)
        hidden = hf.get("hidden_size", 2048)
        return cls(
            vocab_size=hf.get("vocab_size", 151936),
            hidden_size=hidden,
            num_layers=n_layers,
            num_heads=heads,
            num_kv_heads=hf.get("num_key_value_heads", 2),
            head_dim=hf.get("head_dim") or hidden // heads,
            intermediate_size=hf.get("intermediate_size", 5120),
            layer_types=tuple(hf.get("layer_types")
                              or ["full_attention"] * n_layers),
            linear_num_value_heads=hf.get("linear_num_value_heads", 32),
            linear_num_key_heads=hf.get("linear_num_key_heads", 16),
            linear_key_head_dim=hf.get("linear_key_head_dim", 128),
            linear_value_head_dim=hf.get("linear_value_head_dim", 128),
            linear_conv_kernel_dim=hf.get("linear_conv_kernel_dim", 4),
            num_experts=hf.get("num_experts", 0) or 0,
            num_experts_per_tok=hf.get("num_experts_per_tok", 10),
            moe_intermediate_size=hf.get("moe_intermediate_size", 512),
            shared_expert_intermediate_size=hf.get(
                "shared_expert_intermediate_size", 512),
            norm_topk_prob=hf.get("norm_topk_prob", True),
            mlp_only_layers=tuple(hf.get("mlp_only_layers", [])),
            decoder_sparse_step=hf.get("decoder_sparse_step", 1),
            rope_theta=hf.get("rope_theta", 10000000.0),
            partial_rotary_factor=hf.get("partial_rotary_factor", 0.25),
            norm_eps=hf.get("rms_norm_eps", 1e-6),
            max_position_embeddings=hf.get("max_position_embeddings",
                                           262144),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
        )

    def is_attn(self, l: int) -> bool:
        return self.layer_types[l] == "full_attention"

    def is_moe_layer(self, l: int) -> bool:
        return (self.num_experts > 0 and l not in self.mlp_only_layers
                and (l + 1) % self.decoder_sparse_step == 0)

    @property
    def rope_dim(self) -> int:
        rd = int(self.head_dim * self.partial_rotary_factor)
        return rd - (rd % 2)

    @property
    def conv_dim(self) -> int:
        return (2 * self.linear_num_key_heads * self.linear_key_head_dim
                + self.linear_num_value_heads * self.linear_value_head_dim)


# ------------------------------------------------------------------ helpers --

from ._base import (StandaloneCachedModel, attn_block_causal,
                    causal_depthwise_conv, conv_state_tail,
                    lm_head as _head_shared, mm as _mm,
                    qk_headnorm as _qk_headnorm)


def _l2norm(x, eps=1e-6):
    """FLA l2norm: x * rsqrt(sum(x^2) + eps) — SUM, not mean."""
    return x * lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def _gated_rmsnorm(x, z, w, eps):
    """Norm BEFORE gate: rms(x) * w, then * silu(z) (Qwen3NextRMSNormGated).
    x/z [.., Dv]."""
    xf = x.astype(_F32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * lax.rsqrt(var + eps) * w.astype(_F32)
    return (y * jax.nn.silu(z.astype(_F32))).astype(x.dtype)


def _rope_partial(cfg: Qwen3NextConfig, x, cos, sin):
    rd = cfg.rope_dim
    out = apply_rope_fn(x[..., :rd], cos, sin)
    return jnp.concatenate([out, x[..., rd:]], axis=-1)


# ------------------------------------------------------------- gated deltanet

def _gdn_project(cfg: Qwen3NextConfig, lp, x):
    """in_proj_qkvz / in_proj_ba with the per-K-head packing
    (fix_query_key_value_ordering)."""
    s = x.shape[0]
    nk, nv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    r = nv // nk
    qkvz = _mm(x, lp["w_qkvz"]).reshape(s, nk, 2 * dk + 2 * r * dv)
    ba = _mm(x, lp["w_ba"]).reshape(s, nk, 2 * r)
    q = qkvz[:, :, :dk]                                       # [S, nk, Dk]
    k = qkvz[:, :, dk:2 * dk]
    v = qkvz[:, :, 2 * dk:2 * dk + r * dv].reshape(s, nv, dv)
    z = qkvz[:, :, 2 * dk + r * dv:].reshape(s, nv, dv)
    b = ba[:, :, :r].reshape(s, nv)
    a = ba[:, :, r:].reshape(s, nv)
    return q, k, v, z, b, a


def _gdn_gates(lp, a, b):
    beta = jax.nn.sigmoid(b.astype(_F32))                     # [S, nv]
    g = -jnp.exp(lp["A_log"].astype(_F32)) * jax.nn.softplus(
        a.astype(_F32) + lp["dt_bias"].astype(_F32))          # [S, nv]
    return beta, g


def _delta_scan(q, k, v, g, beta, state0):
    """Gated delta rule over [S, nv, D*] (all f32); returns out + final
    state [nv, Dk, Dv]. Matches torch_recurrent_gated_delta_rule."""
    dk = q.shape[-1]
    q = _l2norm(q) * (dk ** -0.5)
    k = _l2norm(k)

    def step(state, inp):
        q_t, k_t, v_t, g_t, b_t = inp
        state = state * jnp.exp(g_t)[:, None, None]
        kv_mem = jnp.einsum("hkv,hk->hv", state, k_t)
        delta = (v_t - kv_mem) * b_t[:, None]
        state = state + k_t[:, :, None] * delta[:, None, :]
        out = jnp.einsum("hkv,hk->hv", state, q_t)
        return state, out

    state, out = lax.scan(step, state0, (q, k, v, g, beta))
    return out, state


#: chunk width for the parallel prefill delta rule — MXU-friendly and the
#: same default HF's chunked kernel uses
DELTA_CHUNK = 64


def _es(spec, *ops):
    """f32 einsum at HIGHEST precision — the delta rule runs entirely in
    f32 and the UT inverse amplifies intermediate error ~1000x, so the
    DEFAULT (bf16-ized) dot precision is catastrophic here (measured:
    3e-3 on the k_beta@k^T diagonal -> 2e-3 on final outputs)."""
    return jnp.einsum(spec, *ops, precision=lax.Precision.HIGHEST)


def _delta_chunked(q, k, v, g, beta, state0, chunk: int = DELTA_CHUNK):
    """Chunked gated delta rule — the MXU-parallel prefill formulation
    (exactly torch_chunk_gated_delta_rule): within each chunk the
    recurrence is solved in closed form via a UT transform (a triangular
    inverse built by forward substitution), so the sequential dependency
    collapses from S steps to S/chunk steps of [C, C] / [C, D] matmuls.
    Inputs [S, nv, D*] f32 (padded rows must carry beta=0, g=0 so they are
    identity steps); returns (out [S, nv, Dv], final state [nv, Dk, Dv])."""
    s, nh, dk = q.shape
    dv = v.shape[-1]
    q = _l2norm(q) * (dk ** -0.5)
    k = _l2norm(k)
    pad = (-s) % chunk
    sp = s + pad
    nc = sp // chunk

    def to_chunks(x, d):
        xt = jnp.pad(jnp.transpose(x, (1, 0, 2)), ((0, 0), (0, pad), (0, 0)))
        return xt.reshape(nh, nc, chunk, d)

    qc = to_chunks(q, dk)
    kc = to_chunks(k, dk)
    vc = to_chunks(v, dv)
    gc = jnp.pad(g.T, ((0, 0), (0, pad))).reshape(nh, nc, chunk)
    bc = jnp.pad(beta.T, ((0, 0), (0, pad))).reshape(nh, nc, chunk)
    v_beta = vc * bc[..., None]
    k_beta = kc * bc[..., None]
    gcs = jnp.cumsum(gc, axis=-1)                             # [H,NC,C]
    i = jnp.arange(chunk)
    tril_s = (i[:, None] >= i[None, :])                       # incl diag
    tril = (i[:, None] > i[None, :])                          # strict
    diff = gcs[..., :, None] - gcs[..., None, :]
    decay = jnp.where(tril_s, jnp.exp(jnp.where(tril_s, diff, 0.0)), 0.0)
    # UT transform: T = (I + strict_tril(K_beta K^T * decay))^-1 via
    # forward substitution (the HF row loop) — rows build on earlier rows
    attn = -jnp.where(tril,
                      _es("hnik,hnjk->hnij", k_beta, kc) * decay,
                      0.0)

    def ut_row(ii, a):
        row = a[..., ii, :]                                   # [H,NC,C]
        new_row = row + _es("hnj,hnjk->hnk", row, a)
        return a.at[..., ii, :].set(new_row)

    attn = lax.fori_loop(1, chunk, ut_row, attn)
    attn = attn + jnp.eye(chunk, dtype=attn.dtype)
    value = _es("hnij,hnjv->hniv", attn, v_beta)
    k_cumdecay = _es(
        "hnij,hnjk->hnik", attn, k_beta * jnp.exp(gcs)[..., None])

    def chunk_step(state, inp):
        q_i, k_i, v_i, g_i, kcd_i, dec_i = inp                # [H,C,*]
        # keep the DIAGONAL (HF masks triu(diagonal=1)); decay already
        # carries exp(0)=1 there
        a = jnp.where(tril_s, _es("hik,hjk->hij", q_i, k_i) * dec_i,
                      0.0)
        v_prime = _es("hik,hkv->hiv", kcd_i, state)
        v_new = v_i - v_prime
        attn_inter = _es(
            "hik,hkv->hiv", q_i * jnp.exp(g_i)[..., None], state)
        out_i = attn_inter + _es("hij,hjv->hiv", a, v_new)
        g_last = g_i[:, -1]
        state = (state * jnp.exp(g_last)[:, None, None]
                 + _es(
                     "hik,hiv->hkv",
                     k_i * jnp.exp(g_last[:, None] - g_i)[..., None],
                     v_new))
        return state, out_i

    xs = (jnp.moveaxis(qc, 1, 0), jnp.moveaxis(kc, 1, 0),
          jnp.moveaxis(value, 1, 0), jnp.moveaxis(gcs, 1, 0),
          jnp.moveaxis(k_cumdecay, 1, 0),
          jnp.moveaxis(decay, 1, 0))
    state, outs = lax.scan(chunk_step, state0, xs)            # [NC,H,C,Dv]
    out = jnp.moveaxis(outs, 0, 1).reshape(nh, sp, dv)[:, :s]
    return jnp.transpose(out, (1, 0, 2)), state


def _gdn_conv_full(cfg: Qwen3NextConfig, lp, qkv):
    """Depthwise causal conv (kernel K) + SiLU over [S, conv_dim] ->
    activated [S, conv_dim] (the conv STATE is built separately by
    conv_state_tail from the raw pre-activation inputs)."""
    return jax.nn.silu(
        causal_depthwise_conv(qkv, lp["conv_w"])).astype(qkv.dtype)


_gdn_conv_state = conv_state_tail


def _gdn_full(cfg: Qwen3NextConfig, lp, x, true_len):
    """Full-block gated DeltaNet (prefill/forward). Positions >= true_len
    are zeroed on entry (apply_mask_to_padding_states) so they cannot
    pollute the recurrent state; the scan still runs over the padded
    length but g/beta on zero inputs keep state valid only through
    true_len — the final state is taken at true_len via a masked scan."""
    s = x.shape[0]
    nv = cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    q, k, v, z, b, a = _gdn_project(cfg, lp, x)
    qkv = jnp.concatenate([q.reshape(s, -1), k.reshape(s, -1),
                           v.reshape(s, -1)], axis=-1)
    act = _gdn_conv_full(cfg, lp, qkv)
    conv_state = _gdn_conv_state(qkv, true_len, cfg.linear_conv_kernel_dim,
                                 x.dtype)
    nk = cfg.linear_num_key_heads
    q = act[:, :nk * dk].reshape(s, nk, dk)
    k = act[:, nk * dk:2 * nk * dk].reshape(s, nk, dk)
    v = act[:, 2 * nk * dk:].reshape(s, nv, dv)
    beta, g = _gdn_gates(lp, a, b)
    r = nv // nk
    if r > 1:
        q = jnp.repeat(q, r, axis=1)
        k = jnp.repeat(k, r, axis=1)
    # padded rows must be identity steps for the recurrent state:
    # g=0 (no decay), beta=0 (no write)
    valid = (jnp.arange(s) < true_len)
    g = jnp.where(valid[:, None], g, 0.0)
    beta = jnp.where(valid[:, None], beta, 0.0)
    state0 = jnp.zeros((nv, dk, dv), _F32)
    # chunked (MXU-parallel) delta rule: S/64 sequential steps of [C,C] /
    # [C,D] matmuls instead of S sequential rank-1 updates — matches the
    # recurrent scan to ~1e-6 (test_llm_families.TestQwen3Next)
    out, state = _delta_chunked(q.astype(_F32), k.astype(_F32),
                                v.astype(_F32), g, beta, state0)
    out = _gated_rmsnorm(out.astype(x.dtype), z, lp["norm_w"], cfg.norm_eps)
    y = _mm(out.reshape(s, -1), lp["w_out"])
    return y, conv_state, state


def _gdn_step(cfg: Qwen3NextConfig, lp, x, conv_state, rec_state):
    """One decode step: x [1, E]."""
    nk, nv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    q, k, v, z, b, a = _gdn_project(cfg, lp, x)
    qkv = jnp.concatenate([q.reshape(1, -1), k.reshape(1, -1),
                           v.reshape(1, -1)], axis=-1)[0]     # [conv_dim]
    conv_state = jnp.concatenate(
        [conv_state[:, 1:], qkv[:, None].astype(conv_state.dtype)], axis=-1)
    w = lp["conv_w"]
    act = jax.nn.silu(jnp.sum(
        conv_state.astype(_F32) * w.astype(_F32), axis=-1))   # [conv_dim]
    q = act[:nk * dk].reshape(1, nk, dk)
    k = act[nk * dk:2 * nk * dk].reshape(1, nk, dk)
    v = act[2 * nk * dk:].reshape(1, nv, dv)
    beta, g = _gdn_gates(lp, a, b)
    r = nv // nk
    if r > 1:
        q = jnp.repeat(q, r, axis=1)
        k = jnp.repeat(k, r, axis=1)
    out, rec_state = _delta_scan(q.astype(_F32), k.astype(_F32),
                                 v.astype(_F32), g.astype(_F32),
                                 beta.astype(_F32), rec_state)
    out = _gated_rmsnorm(out.astype(x.dtype), z, lp["norm_w"], cfg.norm_eps)
    y = _mm(out.reshape(1, -1), lp["w_out"])
    return y, conv_state, rec_state


# -------------------------------------------------------------- attention --

def _attn_qkvg(cfg: Qwen3NextConfig, lp, x, cos, sin):
    s = x.shape[0]
    hq, hk, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    qg = _mm(x, lp["w_q"]).reshape(s, hq, 2 * d)
    q, gate = qg[..., :d], qg[..., d:]
    k = _mm(x, lp["w_k"]).reshape(s, hk, d)
    v = _mm(x, lp["w_v"]).reshape(s, hk, d)
    q = _qk_headnorm(q, lp["w_q_norm"], cfg.norm_eps)
    k = _qk_headnorm(k, lp["w_k_norm"], cfg.norm_eps)
    q = _rope_partial(cfg, q, cos, sin)
    k = _rope_partial(cfg, k, cos, sin)
    return q, k, v, gate.reshape(s, hq * d)


def _attn_out(cfg, lp, attn, gate):
    attn = attn * jax.nn.sigmoid(gate.astype(_F32)).astype(attn.dtype)
    return _mm(attn, lp["w_o"])


def _attn_full(cfg: Qwen3NextConfig, q, k, v, true_len):
    return attn_block_causal(q, k, v, true_len)


# -------------------------------------------------------------------- mlp --

def _dense_mlp(lp, y, pre=""):
    gate = _mm(y, lp[pre + "w_gate"])
    up = _mm(y, lp[pre + "w_up"])
    act = (jax.nn.silu(gate.astype(_F32)) * up.astype(_F32)).astype(y.dtype)
    return _mm(act, lp[pre + "w_down"])


def _moe_mlp(cfg: Qwen3NextConfig, lp, y):
    """Softmax-all -> topk -> renorm routing + gated shared expert
    (Qwen3NextSparseMoeBlock; dense one-hot formulation — the parity
    path)."""
    s = y.shape[0]
    logits = _mm(y.astype(_F32), lp["w_router"])              # [S, E]
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    weights = jnp.zeros_like(probs)
    weights = jax.vmap(lambda w, i, v: w.at[i].set(v))(weights, topi, topv)
    # dense expert compute: [S, E_experts] one-hot weights
    g = jnp.einsum("si,eih->seh", y, lp["w_experts_gate"])
    u = jnp.einsum("si,eih->seh", y, lp["w_experts_up"])
    act = (jax.nn.silu(g.astype(_F32)) * u.astype(_F32)).astype(y.dtype)
    out = jnp.einsum("seh,ehi->sei", act, lp["w_experts_down"])
    routed = jnp.einsum("sei,se->si", out.astype(_F32),
                        weights.astype(_F32)).astype(y.dtype)
    shared = _dense_mlp(lp, y, pre="shared_")
    sg = jax.nn.sigmoid(_mm(y.astype(_F32), lp["w_shared_gate"]))
    return routed + (sg.astype(y.dtype) * shared)


def _mlp(cfg: Qwen3NextConfig, l: int, lp, y):
    if cfg.is_moe_layer(l):
        return _moe_mlp(cfg, lp, y)
    return _dense_mlp(lp, y)


# ------------------------------------------------------------------ passes --

def init_caches(cfg: Qwen3NextConfig, max_seq_len: int, dtype=jnp.float32):
    caches = []
    for l in range(cfg.num_layers):
        if cfg.is_attn(l):
            shape = (max_seq_len, cfg.num_kv_heads, cfg.head_dim)
            caches.append({"k": jnp.zeros(shape, dtype),
                           "v": jnp.zeros(shape, dtype)})
        else:
            caches.append({
                "conv": jnp.zeros(
                    (cfg.conv_dim, cfg.linear_conv_kernel_dim), dtype),
                "rec": jnp.zeros(
                    (cfg.linear_num_value_heads, cfg.linear_key_head_dim,
                     cfg.linear_value_head_dim), _F32),
            })
    return caches


def _head(cfg: Qwen3NextConfig, p, h):
    return _head_shared(p, h)


def forward_fn(cfg: Qwen3NextConfig, p, tokens):
    s = tokens.shape[0]
    h = jnp.take(p["embed"], tokens, axis=0)
    cos, sin = p["rope_cos"][:s], p["rope_sin"][:s]
    for l, lp in enumerate(p["layers"]):
        x = rmsnorm_fn(h, lp["attn_norm_w"], cfg.norm_eps)
        if cfg.is_attn(l):
            q, k, v, gate = _attn_qkvg(cfg, lp, x, cos, sin)
            mix = _attn_out(cfg, lp, _attn_full(cfg, q, k, v, jnp.int32(s)),
                            gate)
        else:
            mix, _, _ = _gdn_full(cfg, lp, x, jnp.int32(s))
        h = h + mix
        y = rmsnorm_fn(h, lp["mlp_norm_w"], cfg.norm_eps)
        h = h + _mlp(cfg, l, lp, y)
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    return _head(cfg, p, h)


def prefill_fn(cfg: Qwen3NextConfig, p, caches, tokens, true_len):
    s = tokens.shape[0]
    h = jnp.take(p["embed"], tokens, axis=0)
    # zero padded positions (apply_mask_to_padding_states) so they cannot
    # write into the recurrent/conv states
    valid = (jnp.arange(s) < true_len)[:, None]
    cos, sin = p["rope_cos"][:s], p["rope_sin"][:s]
    new_caches = []
    for l, lp in enumerate(p["layers"]):
        x = rmsnorm_fn(h, lp["attn_norm_w"], cfg.norm_eps)
        cache = caches[l]
        if cfg.is_attn(l):
            q, k, v, gate = _attn_qkvg(cfg, lp, x, cos, sin)
            kc = lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, 0, 0))
            vc = lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, 0, 0))
            new_caches.append({"k": kc, "v": vc})
            mix = _attn_out(cfg, lp, _attn_full(cfg, q, k, v, true_len),
                            gate)
        else:
            mix, conv_state, rec_state = _gdn_full(
                cfg, lp, jnp.where(valid, x, 0), true_len)
            new_caches.append({"conv": conv_state, "rec": rec_state})
        h = h + mix
        y = rmsnorm_fn(h, lp["mlp_norm_w"], cfg.norm_eps)
        h = h + _mlp(cfg, l, lp, y)
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    last = jnp.take(h, true_len - 1, axis=0)
    return new_caches, _head(cfg, p, last)


def decode_step_fn(cfg: Qwen3NextConfig, p, caches, token, pos):
    h = jnp.take(p["embed"], token[None], axis=0)
    cos = lax.dynamic_slice_in_dim(p["rope_cos"], pos, 1, axis=0)
    sin = lax.dynamic_slice_in_dim(p["rope_sin"], pos, 1, axis=0)
    new_caches = []
    for l, lp in enumerate(p["layers"]):
        x = rmsnorm_fn(h, lp["attn_norm_w"], cfg.norm_eps)
        cache = caches[l]
        if cfg.is_attn(l):
            from ...ops.nn.attention import sdpa_fixed_cache_fn
            q, k, v, gate = _attn_qkvg(cfg, lp, x, cos, sin)
            kc = lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (pos, 0, 0))
            vc = lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (pos, 0, 0))
            new_caches.append({"k": kc, "v": vc})
            attn = sdpa_fixed_cache_fn(q, kc, vc, pos + 1).reshape(1, -1)
            mix = _attn_out(cfg, lp, attn, gate)
        else:
            mix, conv_state, rec_state = _gdn_step(
                cfg, lp, x, cache["conv"], cache["rec"])
            new_caches.append({"conv": conv_state, "rec": rec_state})
        h = h + mix
        y = rmsnorm_fn(h, lp["mlp_norm_w"], cfg.norm_eps)
        h = h + _mlp(cfg, l, lp, y)
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    return new_caches, _head(cfg, p, h[0])


def generate_scan_fn(cfg: Qwen3NextConfig, n_steps: int, p, caches, token,
                     pos):
    def step(carry, _):
        caches, tok, ps = carry
        caches, logits = decode_step_fn(cfg, p, caches, tok, ps)
        nxt = jnp.argmax(logits).astype(jnp.int32)
        return (caches, nxt, ps + 1), nxt

    (caches, token, pos), toks = lax.scan(
        step, (caches, token, pos), None, length=n_steps)
    return caches, toks


# ------------------------------------------------------------------- model --

class Qwen3NextModel(StandaloneCachedModel):
    """Parity-grade Qwen3Next with its hybrid cache (shared scaffolding in
    models/_base.py)."""

    _prefill_fn = staticmethod(prefill_fn)
    _generate_scan_fn = staticmethod(generate_scan_fn)
    _forward_fn = staticmethod(forward_fn)
    _init_caches = staticmethod(init_caches)
    _decode_step_fn = staticmethod(decode_step_fn)
    _name = "qwen3next"

    def __init__(self, config: Qwen3NextConfig, params: dict, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        if "rope_cos" not in params:
            cos, sin = rope_init(config.max_position_embeddings,
                                 config.rope_dim, config.rope_theta)
            params["rope_cos"] = cos.jax.astype(_F32)
            params["rope_sin"] = sin.jax.astype(_F32)
        self._setup()

    @classmethod
    def from_safetensors(cls, path, dtype=jnp.float32) -> "Qwen3NextModel":
        from ..safetensors import load_safetensors
        st = load_safetensors(path)
        hf = {}
        cj = Path(path if Path(path).is_dir() else Path(path).parent) \
            / "config.json"
        if cj.exists():
            hf = json.loads(cj.read_text())
        cfg = Qwen3NextConfig.from_hf(hf)

        def t(name, transpose=False, dt=dtype):
            a = np.asarray(st.tensor_numpy(name))
            if transpose:
                a = a.T
            return jnp.asarray(a, dt)

        lps = []
        for l in range(cfg.num_layers):
            pre = f"model.layers.{l}."
            lp = {
                "attn_norm_w": t(pre + "input_layernorm.weight", dt=_F32),
                "mlp_norm_w": t(pre + "post_attention_layernorm.weight",
                                dt=_F32),
            }
            if cfg.is_attn(l):
                lp.update({
                    "w_q": t(pre + "self_attn.q_proj.weight", True),
                    "w_k": t(pre + "self_attn.k_proj.weight", True),
                    "w_v": t(pre + "self_attn.v_proj.weight", True),
                    "w_o": t(pre + "self_attn.o_proj.weight", True),
                    "w_q_norm": t(pre + "self_attn.q_norm.weight", dt=_F32),
                    "w_k_norm": t(pre + "self_attn.k_norm.weight", dt=_F32),
                })
            else:
                conv_w = np.asarray(
                    st.tensor_numpy(pre + "linear_attn.conv1d.weight"))
                lp.update({
                    "w_qkvz": t(pre + "linear_attn.in_proj_qkvz.weight",
                                True),
                    "w_ba": t(pre + "linear_attn.in_proj_ba.weight", True),
                    "conv_w": jnp.asarray(conv_w[:, 0, :], dtype),
                    "dt_bias": t(pre + "linear_attn.dt_bias", dt=_F32),
                    "A_log": t(pre + "linear_attn.A_log", dt=_F32),
                    "norm_w": t(pre + "linear_attn.norm.weight", dt=_F32),
                    "w_out": t(pre + "linear_attn.out_proj.weight", True),
                })
            if cfg.is_moe_layer(l):
                gates, ups, downs = [], [], []
                for e in range(cfg.num_experts):
                    ep = pre + f"mlp.experts.{e}."
                    gates.append(t(ep + "gate_proj.weight", True))
                    ups.append(t(ep + "up_proj.weight", True))
                    downs.append(t(ep + "down_proj.weight", True))
                lp.update({
                    "w_router": t(pre + "mlp.gate.weight", True, _F32),
                    "w_experts_gate": jnp.stack(gates),
                    "w_experts_up": jnp.stack(ups),
                    "w_experts_down": jnp.stack(downs),
                    "shared_w_gate": t(
                        pre + "mlp.shared_expert.gate_proj.weight", True),
                    "shared_w_up": t(
                        pre + "mlp.shared_expert.up_proj.weight", True),
                    "shared_w_down": t(
                        pre + "mlp.shared_expert.down_proj.weight", True),
                    "w_shared_gate": t(
                        pre + "mlp.shared_expert_gate.weight", True, _F32),
                })
            else:
                lp.update({
                    "w_gate": t(pre + "mlp.gate_proj.weight", True),
                    "w_up": t(pre + "mlp.up_proj.weight", True),
                    "w_down": t(pre + "mlp.down_proj.weight", True),
                })
            lps.append(lp)
        # Qwen3NextRMSNorm stores w with effective weight (1 + w) — fold
        # the +1 into every stored norm EXCEPT the gated DeltaNet norm
        # (Qwen3NextRMSNormGated is plain-weight)
        for lp in lps:
            for k in ("attn_norm_w", "mlp_norm_w", "w_q_norm", "w_k_norm"):
                if k in lp:
                    lp[k] = lp[k] + 1.0
        p: dict = {
            "embed": t("model.embed_tokens.weight"),
            "final_norm_w": t("model.norm.weight", dt=_F32) + 1.0,
            "lm_head": (t("lm_head.weight", True)
                        if "lm_head.weight" in st
                        and not cfg.tie_word_embeddings else None),
            "layers": lps,
        }
        return cls(cfg, p, dtype=dtype)
