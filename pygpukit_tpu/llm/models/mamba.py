"""Mamba family (state-spaces mamba-130m..2.8b, FalconMamba class):
selective-state-space (S6) decoder — the SSM architecture class.

Beyond-reference family (standalone pattern, transformers-parity contract
against HF modeling_mamba.slow_forward). Every layer is a single MambaMixer
(no attention, no MLP): norm -> mixer -> residual. The cache is O(1) in
context: a [d_inner, K] conv state + a [d_inner, N] SSM state per layer.

Mechanisms (transformers-exact):
- in_proj -> (x | gate) halves; depthwise causal conv (kernel K, bias) +
  SiLU over x.
- Selection: x_proj -> (dt_rank | N | N) = (time_step, B, C);
  dt = softplus(dt_proj(time_step)); A = -exp(A_log).
- Discretised recurrence per channel/state:
      h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t
      y_t = h_t · C_t + D * x_t;   out = out_proj(y * silu(gate))
- TPU formulation: prefill runs the recurrence as a PARALLEL
  ``lax.associative_scan`` over (a, b) pairs (h_t = a_t h_{t-1} + b_t is
  associative) — log-depth instead of S sequential steps; decode takes
  single recurrent steps off the cached state. The scan materialises
  [S, d_inner, N] f32 operands (~5.4 GB/layer at mamba-2.8b shapes and
  S=16k), so prefill is STATEFUL — it continues from the caches argument
  — and generate() streams long prompts through it in fixed blocks
  (_prefill_block=4096), bounding the working set to [block, E, N].
- FalconMamba variant (model_type falcon_mamba): weightless RMS norms on
  B/C/dt before discretisation (mixer_rms_eps), auto-enabled from
  config.json.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.nn.norm import rmsnorm_fn
from ._base import (StandaloneCachedModel, causal_depthwise_conv,
                    conv_state_tail, lm_head as _head_shared, mm as _mm)

_F32 = jnp.float32


@dataclass
class MambaConfig:
    vocab_size: int = 50280
    hidden_size: int = 768
    num_layers: int = 24
    state_size: int = 16
    intermediate_size: int = 1536
    conv_kernel: int = 4
    time_step_rank: int = 48
    use_conv_bias: bool = True
    use_bias: bool = False           # in/out_proj biases
    # FalconMamba: weightless RMS norms on B/C/dt before the recurrence
    mixer_rms_eps: float | None = None
    norm_eps: float = 1e-5
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 1 << 20   # no positional encoding

    @classmethod
    def from_hf(cls, hf: dict) -> "MambaConfig":
        hidden = hf.get("hidden_size", 768)
        tsr = hf.get("time_step_rank", "auto")
        if tsr == "auto" or tsr is None:
            import math
            tsr = math.ceil(hidden / 16)
        return cls(
            vocab_size=hf.get("vocab_size", 50280),
            hidden_size=hidden,
            num_layers=hf.get("num_hidden_layers", 24),
            state_size=hf.get("state_size", 16),
            intermediate_size=hf.get("intermediate_size", 2 * hidden),
            conv_kernel=hf.get("conv_kernel", 4),
            time_step_rank=int(tsr),
            use_conv_bias=hf.get("use_conv_bias", True),
            use_bias=hf.get("use_bias", False),
            mixer_rms_eps=(hf.get("mixer_rms_eps", 1e-6)
                           if hf.get("model_type") == "falcon_mamba"
                           else None),
            norm_eps=hf.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
        )


# ------------------------------------------------------------------- mixer --

def _conv_silu_full(cfg: MambaConfig, lp, x):
    """Depthwise causal conv + SiLU over [S, d_inner]; returns activated."""
    return jax.nn.silu(causal_depthwise_conv(x, lp["conv_w"],
                                             lp.get("conv_b")))


def _rms_nw(x, eps):
    """Weightless RMS norm (FalconMamba rms_forward)."""
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * lax.rsqrt(var + eps)


def _selection(cfg: MambaConfig, lp, u):
    """u [S, d_inner] (post-conv, f32) -> (dA [S,E,N], dBu [S,E,N], C)."""
    ssm = _mm(u.astype(lp["w_x"].dtype), lp["w_x"])           # [S, R+2N]
    r, n = cfg.time_step_rank, cfg.state_size
    ts = ssm[:, :r]
    b = ssm[:, r:r + n].astype(_F32)                          # [S, N]
    c = ssm[:, r + n:].astype(_F32)
    if cfg.mixer_rms_eps is not None:
        # FalconMamba: weightless RMS on B, C, dt before discretisation
        ts = _rms_nw(ts.astype(_F32), cfg.mixer_rms_eps).astype(ts.dtype)
        b = _rms_nw(b, cfg.mixer_rms_eps)
        c = _rms_nw(c, cfg.mixer_rms_eps)
    dt = _mm(ts, lp["w_dt"]) + lp["b_dt"]
    dt = jax.nn.softplus(dt.astype(_F32))                     # [S, E]
    a = -jnp.exp(lp["A_log"].astype(_F32))                    # [E, N]
    da = jnp.exp(dt[:, :, None] * a[None])                    # [S, E, N]
    dbu = dt[:, :, None] * b[:, None, :] * u[:, :, None]      # [S, E, N]
    return da, dbu, c


def _mixer_full(cfg: MambaConfig, lp, x, true_len, conv_state=None,
                ssm_state=None):
    """Full-block mixer (prefill/forward): parallel associative scan.

    ``conv_state`` [E, K] / ``ssm_state`` [E, N] continue the recurrence
    from a previous block (blocked long-context prefill): the conv reads
    its left context from the carried raw-input tail, and the linear
    recurrence h_t = a_t h_{t-1} + b_t folds the initial state in closed
    form — h_t += (prod_{i<=t} a_i) * h_init — using the cumulative
    coefficient the associative scan already produces. Zero states
    reproduce the unblocked math exactly.

    Returns (out [S, E_model], conv_state, ssm_state)."""
    s = x.shape[0]
    K = cfg.conv_kernel
    proj = _mm(x, lp["w_in"])                                 # [S, 2*d_inner]
    if "b_in" in lp:
        proj = proj + lp["b_in"]
    u_raw, gate = jnp.split(proj, 2, axis=-1)
    # zero padded rows BEFORE the conv/state (HF attention_mask semantics)
    valid = (jnp.arange(s) < true_len)[:, None]
    u_raw = jnp.where(valid, u_raw, 0)
    if conv_state is not None and K > 1:
        # left context = the last K-1 carried raw inputs
        ext = jnp.concatenate(
            [conv_state.T[-(K - 1):].astype(u_raw.dtype), u_raw])
        u = _conv_silu_full(cfg, lp, ext)[K - 1:]             # [S, E] f32
    else:
        u = _conv_silu_full(cfg, lp, u_raw)                   # [S, E] f32
    u = jnp.where(valid, u, 0)
    da, dbu, c = _selection(cfg, lp, u)
    # padded rows must be identity steps: h = 1*h + 0
    da = jnp.where(valid[..., None], da, 1.0)
    dbu = jnp.where(valid[..., None], dbu, 0.0)

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return a2 * a1, a2 * b1 + b2

    a_acc, h = lax.associative_scan(combine, (da, dbu))       # h [S, E, N]
    if ssm_state is not None:
        h = h + a_acc * ssm_state[None]
    y = jnp.einsum("sen,sn->se", h, c,
                   precision=lax.Precision.HIGHEST)           # [S, E] (f32)
    y = y + u * lp["D"].astype(_F32)
    y = y * jax.nn.silu(gate.astype(_F32))
    out = _mm(y.astype(x.dtype), lp["w_out"])
    if "b_out" in lp:
        out = out + lp["b_out"]
    if conv_state is not None:
        # tail over (carried history ++ this block's valid rows)
        ext_raw = jnp.concatenate([conv_state.T.astype(u_raw.dtype), u_raw])
        new_conv = conv_state_tail(ext_raw, true_len + K, K, x.dtype)
    else:
        new_conv = conv_state_tail(u_raw, true_len, K, x.dtype)  # [E, K]
    new_ssm = jnp.take(h, true_len - 1, axis=0)               # [E, N]
    return out, new_conv, new_ssm


def _mixer_step(cfg: MambaConfig, lp, x, conv_state, ssm_state):
    """One decode step: x [1, E_model]."""
    proj = _mm(x, lp["w_in"])
    if "b_in" in lp:
        proj = proj + lp["b_in"]
    u_raw, gate = jnp.split(proj, 2, axis=-1)
    conv_state = jnp.concatenate(
        [conv_state[:, 1:], u_raw.T.astype(conv_state.dtype)], axis=-1)
    w = lp["conv_w"]
    u = jnp.sum(conv_state.astype(_F32) * w.astype(_F32), axis=-1)
    if "conv_b" in lp:
        u = u + lp["conv_b"].astype(_F32)
    u = jax.nn.silu(u)[None]                                  # [1, E]
    da, dbu, c = _selection(cfg, lp, u)
    ssm_state = da[0] * ssm_state + dbu[0]                    # [E, N]
    y = jnp.einsum("en,n->e", ssm_state, c[0],
                   precision=lax.Precision.HIGHEST)[None]
    y = y + u * lp["D"].astype(_F32)
    y = y * jax.nn.silu(gate.astype(_F32))
    out = _mm(y.astype(x.dtype), lp["w_out"])
    if "b_out" in lp:
        out = out + lp["b_out"]
    return out, conv_state, ssm_state


# ------------------------------------------------------------------ passes --

def init_caches(cfg: MambaConfig, max_seq_len: int, dtype=jnp.float32):
    return [{"conv": jnp.zeros((cfg.intermediate_size, cfg.conv_kernel),
                               dtype),
             "ssm": jnp.zeros((cfg.intermediate_size, cfg.state_size),
                              _F32)}
            for _ in range(cfg.num_layers)]


def forward_fn(cfg: MambaConfig, p, tokens):
    s = tokens.shape[0]
    h = jnp.take(p["embed"], tokens, axis=0)
    for lp in p["layers"]:
        x = rmsnorm_fn(h, lp["norm_w"], cfg.norm_eps)
        mix, _, _ = _mixer_full(cfg, lp, x, jnp.int32(s))
        h = h + mix
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    return _head_shared(p, h)


def prefill_fn(cfg: MambaConfig, p, caches, tokens, true_len):
    """STATEFUL prefill: continues the recurrence from ``caches`` (zero
    caches == prefill-from-scratch, bit-identical to the unblocked math).
    Long prompts can therefore stream through this executable in fixed
    blocks — the parallel scan then materialises [block, E, N] instead of
    [S, E, N] (the 16k+ memory note in the module docstring)."""
    h = jnp.take(p["embed"], tokens, axis=0)
    new_caches = []
    for lp, cache in zip(p["layers"], caches):
        x = rmsnorm_fn(h, lp["norm_w"], cfg.norm_eps)
        mix, conv_state, ssm_state = _mixer_full(
            cfg, lp, x, true_len, cache["conv"], cache["ssm"])
        new_caches.append({"conv": conv_state, "ssm": ssm_state})
        h = h + mix
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    last = jnp.take(h, true_len - 1, axis=0)
    return new_caches, _head_shared(p, last)


def decode_step_fn(cfg: MambaConfig, p, caches, token, pos):
    h = jnp.take(p["embed"], token[None], axis=0)
    new_caches = []
    for lp, cache in zip(p["layers"], caches):
        x = rmsnorm_fn(h, lp["norm_w"], cfg.norm_eps)
        mix, conv_state, ssm_state = _mixer_step(
            cfg, lp, x, cache["conv"], cache["ssm"])
        new_caches.append({"conv": conv_state, "ssm": ssm_state})
        h = h + mix
    h = rmsnorm_fn(h, p["final_norm_w"], cfg.norm_eps)
    return new_caches, _head_shared(p, h[0])


def generate_scan_fn(cfg: MambaConfig, n_steps: int, p, caches, token, pos):
    def step(carry, _):
        caches, tok, ps = carry
        caches, logits = decode_step_fn(cfg, p, caches, tok, ps)
        nxt = jnp.argmax(logits).astype(jnp.int32)
        return (caches, nxt, ps + 1), nxt

    (caches, token, pos), toks = lax.scan(
        step, (caches, token, pos), None, length=n_steps)
    return caches, toks


# ------------------------------------------------------------------- model --

class MambaModel(StandaloneCachedModel):
    """Parity-grade Mamba with the O(1) conv+SSM cache."""

    _prefill_fn = staticmethod(prefill_fn)
    _generate_scan_fn = staticmethod(generate_scan_fn)
    _forward_fn = staticmethod(forward_fn)
    _init_caches = staticmethod(init_caches)
    _decode_step_fn = staticmethod(decode_step_fn)
    # stateful prefill: long prompts stream through in 4096-token blocks
    # (bounds the parallel scan's [S, E, N] working set — at mamba-2.8b
    # shapes an unblocked 16k prefill would materialise ~5.4 GB/layer)
    _stateful_prefill = True
    _prefill_block = 4096
    _name = "mamba"

    def __init__(self, config: MambaConfig, params: dict, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self._setup()

    @classmethod
    def from_safetensors(cls, path, dtype=jnp.float32) -> "MambaModel":
        from ..safetensors import load_safetensors
        st = load_safetensors(path)
        hf = {}
        cj = Path(path if Path(path).is_dir() else Path(path).parent) \
            / "config.json"
        if cj.exists():
            hf = json.loads(cj.read_text())
        cfg = MambaConfig.from_hf(hf)

        def t(name, transpose=False, dt=dtype):
            a = np.asarray(st.tensor_numpy(name))
            if transpose:
                a = a.T
            return jnp.asarray(a, dt)

        lps = []
        for l in range(cfg.num_layers):
            pre = f"backbone.layers.{l}."
            conv_w = np.asarray(st.tensor_numpy(pre + "mixer.conv1d.weight"))
            lp = {
                "norm_w": t(pre + "norm.weight", dt=_F32),
                "w_in": t(pre + "mixer.in_proj.weight", True),
                "w_x": t(pre + "mixer.x_proj.weight", True),
                "w_dt": t(pre + "mixer.dt_proj.weight", True),
                "b_dt": t(pre + "mixer.dt_proj.bias"),
                "w_out": t(pre + "mixer.out_proj.weight", True),
                "conv_w": jnp.asarray(conv_w[:, 0, :], dtype),
                "A_log": t(pre + "mixer.A_log", dt=_F32),
                "D": t(pre + "mixer.D", dt=_F32),
            }
            if cfg.use_conv_bias:
                lp["conv_b"] = t(pre + "mixer.conv1d.bias")
            if cfg.use_bias:
                lp["b_in"] = t(pre + "mixer.in_proj.bias")
                lp["b_out"] = t(pre + "mixer.out_proj.bias")
            lps.append(lp)
        p: dict = {
            "embed": t("backbone.embeddings.weight"),
            "final_norm_w": t("backbone.norm_f.weight", dt=_F32),
            "lm_head": (t("lm_head.weight", True)
                        if "lm_head.weight" in st
                        and not cfg.tie_word_embeddings else None),
            "layers": lps,
        }
        return cls(cfg, p, dtype=dtype)
