"""DiT / PixArt transformer with AdaLN-Zero (reference:
src/pygpukit/diffusion/models/dit/ — DiT blocks with AdaLN-Zero modulation,
cross-attention to text for the PixArt variant)."""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .flux import timestep_embedding

_F32 = jnp.float32


@dataclass
class DiTConfig:
    input_size: int = 32            # latent H=W
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 512
    depth: int = 12
    num_heads: int = 8
    mlp_ratio: float = 4.0
    cross_attention: bool = False   # PixArt: cross-attn to text
    context_dim: int = 512
    num_classes: int = 0            # class-conditional DiT

    @property
    def num_patches(self) -> int:
        return (self.input_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _ln_mod(x, shift, scale):
    mu = x.astype(_F32).mean(-1, keepdims=True)
    var = x.astype(_F32).var(-1, keepdims=True)
    y = (x.astype(_F32) - mu) * lax.rsqrt(var + 1e-6)
    return ((1 + scale) * y + shift).astype(x.dtype)


def _mha(q, k, v, n_heads):
    t, e = q.shape
    tk = k.shape[0]
    d = e // n_heads
    qh = q.reshape(t, n_heads, d).transpose(1, 0, 2).astype(_F32)
    kh = k.reshape(tk, n_heads, d).transpose(1, 0, 2).astype(_F32)
    vh = v.reshape(tk, n_heads, d).transpose(1, 0, 2).astype(_F32)
    scores = jnp.einsum("hqd,hkd->hqk", qh, kh) / math.sqrt(d)
    out = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, -1), vh)
    return out.transpose(1, 0, 2).reshape(t, e)


def dit_forward_fn(cfg: DiTConfig, p, x_tokens, timestep, context):
    """x_tokens [T, P*P*C], context [Tc, ctx_dim] (or cond vec) -> [T, P*P*C].

    AdaLN-Zero: per-block modulation (shift/scale/gate x2) regressed from the
    conditioning vector; gates init to zero so blocks start as identity.
    """
    x = jnp.dot(x_tokens, p["x_embed.w"]) + p["x_embed.b"]
    x = x + p["pos_embed"][:x.shape[0]]
    c = _t_embed(p, timestep)
    if cfg.num_classes and context is not None and context.ndim == 0:
        c = c + jnp.take(p["label_embed"], context, axis=0)

    def block(x, lp):
        mod = jnp.dot(jax.nn.silu(c), lp["adaln.w"]) + lp["adaln.b"]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6)
        h = _ln_mod(x, sh1, sc1)
        qkv = jnp.dot(h, lp["qkv.w"]) + lp["qkv.b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = x + g1 * (jnp.dot(_mha(q, k, v, cfg.num_heads), lp["proj.w"])
                      + lp["proj.b"])
        if cfg.cross_attention:
            qx = jnp.dot(x, lp["xq.w"]) + lp["xq.b"]
            kx = jnp.dot(context, lp["xk.w"]) + lp["xk.b"]
            vx = jnp.dot(context, lp["xv.w"]) + lp["xv.b"]
            x = x + jnp.dot(_mha(qx, kx, vx, cfg.num_heads), lp["xproj.w"]) \
                + lp["xproj.b"]
        h = _ln_mod(x, sh2, sc2)
        mlp = jnp.dot(jax.nn.gelu(jnp.dot(h, lp["mlp0.w"]) + lp["mlp0.b"],
                                  approximate=True), lp["mlp2.w"]) + lp["mlp2.b"]
        return x + g2 * mlp, None

    x, _ = lax.scan(block, x, p["blocks"])
    sh, sc = jnp.split(jnp.dot(jax.nn.silu(c), p["final_mod.w"])
                       + p["final_mod.b"], 2)
    x = _ln_mod(x, sh, sc)
    return jnp.dot(x, p["final.w"]) + p["final.b"]


def _t_embed(p, timestep):
    h = jax.nn.silu(jnp.dot(timestep_embedding(timestep, 256),
                            p["t_embed.in.w"]) + p["t_embed.in.b"])
    return jnp.dot(h, p["t_embed.out.w"]) + p["t_embed.out.b"]


class DiT:
    def __init__(self, config: DiTConfig, params: dict):
        self.config = config
        self.params = params
        self._fwd = jax.jit(functools.partial(dit_forward_fn, config))

    def __call__(self, x_tokens, timestep, context=None):
        return self._fwd(self.params, x_tokens,
                         jnp.asarray(timestep, _F32), context)

    @classmethod
    def init_random(cls, config: DiTConfig | None = None, seed: int = 0) -> "DiT":
        cfg = config or DiTConfig()
        rng = np.random.default_rng(seed)
        hid = cfg.hidden_size
        mlp = int(hid * cfg.mlp_ratio)
        patch_dim = cfg.patch_size ** 2 * cfg.in_channels

        def w(ci, co, scale=None):
            return jnp.asarray(rng.standard_normal((ci, co), np.float32)
                               * (scale or 1.0 / math.sqrt(ci)))

        def lin(p, name, ci, co, zero=False):
            p[f"{name}.w"] = (jnp.zeros((ci, co), _F32) if zero else w(ci, co))
            p[f"{name}.b"] = jnp.zeros((co,), _F32)

        p: dict = {"pos_embed": jnp.asarray(
            rng.standard_normal((cfg.num_patches, hid), np.float32) * 0.02)}
        lin(p, "x_embed", patch_dim, hid)
        lin(p, "t_embed.in", 256, hid)
        lin(p, "t_embed.out", hid, hid)
        if cfg.num_classes:
            p["label_embed"] = jnp.asarray(
                rng.standard_normal((cfg.num_classes, hid), np.float32) * 0.02)
        lin(p, "final_mod", hid, 2 * hid, zero=True)
        lin(p, "final", hid, patch_dim, zero=True)

        def blk():
            lp: dict = {}
            lin(lp, "adaln", hid, 6 * hid, zero=True)  # AdaLN-Zero init
            lin(lp, "qkv", hid, 3 * hid)
            lin(lp, "proj", hid, hid)
            lin(lp, "mlp0", hid, mlp)
            lin(lp, "mlp2", mlp, hid)
            if cfg.cross_attention:
                lin(lp, "xq", hid, hid)
                lin(lp, "xk", cfg.context_dim, hid)
                lin(lp, "xv", cfg.context_dim, hid)
                lin(lp, "xproj", hid, hid)
            return lp

        p["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *[blk() for _ in range(cfg.depth)])
        return cls(cfg, p)
