"""FLUX.1 transformer (reference: src/pygpukit/diffusion/models/flux/
model.py:49-217, blocks.py, pipeline.py — 19 joint/double blocks + 38 single
blocks, 3-axis rope, modulation from timestep+pooled-text+guidance).

Functional JAX forward; weight names follow the BFL flux checkpoint layout
(double_blocks.N.img_attn.qkv.weight …) so real FLUX.1-schnell/dev weights
load directly.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_F32 = jnp.float32


@dataclass
class FluxConfig:
    in_channels: int = 64           # 2x2-patchified 16ch latents
    hidden_size: int = 3072
    num_heads: int = 24
    depth: int = 19                 # double blocks
    depth_single: int = 38
    mlp_ratio: float = 4.0
    context_dim: int = 4096         # T5 features
    pooled_dim: int = 768           # CLIP pooled
    axes_dim: tuple = (16, 56, 56)  # rope dims per id axis
    theta: float = 10000.0
    guidance_embed: bool = True     # dev=True, schnell=False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding (t scaled by 1000 as in flux)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=_F32) / half)
    args = t.astype(_F32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _mlp_embed(p, prefix, x):
    h = jax.nn.silu(jnp.dot(x, p[f"{prefix}.in.w"]) + p[f"{prefix}.in.b"])
    return jnp.dot(h, p[f"{prefix}.out.w"]) + p[f"{prefix}.out.b"]


def rope_3d(ids, axes_dim, theta: float):
    """ids [T, n_axes] -> (cos, sin) [T, head_dim/2] concatenated per axis."""
    parts_cos, parts_sin = [], []
    for a, d in enumerate(axes_dim):
        half = d // 2
        freqs = 1.0 / (theta ** (jnp.arange(half, dtype=_F32) / half))
        ang = ids[:, a].astype(_F32)[:, None] * freqs[None]
        parts_cos.append(jnp.cos(ang))
        parts_sin.append(jnp.sin(ang))
    return jnp.concatenate(parts_cos, -1), jnp.concatenate(parts_sin, -1)


def apply_rope_interleaved(x, cos, sin):
    """x [T,H,D] with pair-interleaved rotation (flux convention)."""
    xr = x.reshape(*x.shape[:-1], -1, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    c = cos[:, None, :]
    s = sin[:, None, :]
    out0 = x0 * c - x1 * s
    out1 = x1 * c + x0 * s
    return jnp.stack([out0, out1], axis=-1).reshape(x.shape)


def _qk_rmsnorm(x, scale):
    xf = x.astype(_F32)
    inv = lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
    return (xf * inv * scale.astype(_F32)).astype(x.dtype)


def _attention(q, k, v, cos, sin):
    """q/k/v [T,H,D]; joint rope'd attention -> [T, H*D]."""
    t, h, d = q.shape
    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)
    qh = q.transpose(1, 0, 2).astype(_F32)
    kh = k.transpose(1, 0, 2).astype(_F32)
    vh = v.transpose(1, 0, 2).astype(_F32)
    scores = jnp.einsum("hqd,hkd->hqk", qh, kh) / math.sqrt(d)
    out = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, -1), vh)
    return out.transpose(1, 0, 2).reshape(t, h * d)


def _mod(p, prefix, vec, n: int):
    """Modulation: vec -> n chunks of [shift, scale, gate] params."""
    out = jnp.dot(jax.nn.silu(vec), p[f"{prefix}.w"]) + p[f"{prefix}.b"]
    return jnp.split(out, n, axis=-1)


def _ln_mod(x, shift, scale):
    mu = x.astype(_F32).mean(-1, keepdims=True)
    var = x.astype(_F32).var(-1, keepdims=True)
    y = (x.astype(_F32) - mu) * lax.rsqrt(var + 1e-6)
    return ((1 + scale) * y + shift).astype(x.dtype)


def double_block_fn(cfg: FluxConfig, lp, img, txt, vec, cos, sin):
    """Joint (double-stream) block (reference: flux/blocks.py joint blocks)."""
    h, d = cfg.num_heads, cfg.head_dim
    t_txt = txt.shape[0]
    im1, im2 = jnp.split(jnp.dot(jax.nn.silu(vec), lp["img_mod.w"])
                         + lp["img_mod.b"], 2)
    tm1, tm2 = jnp.split(jnp.dot(jax.nn.silu(vec), lp["txt_mod.w"])
                         + lp["txt_mod.b"], 2)
    i_shift, i_scale, i_gate = jnp.split(im1, 3)
    i_shift2, i_scale2, i_gate2 = jnp.split(im2, 3)
    t_shift, t_scale, t_gate = jnp.split(tm1, 3)
    t_shift2, t_scale2, t_gate2 = jnp.split(tm2, 3)

    img_n = _ln_mod(img, i_shift, i_scale)
    txt_n = _ln_mod(txt, t_shift, t_scale)
    img_qkv = jnp.dot(img_n, lp["img_qkv.w"]) + lp["img_qkv.b"]
    txt_qkv = jnp.dot(txt_n, lp["txt_qkv.w"]) + lp["txt_qkv.b"]
    iq, ik, iv = [a.reshape(-1, h, d) for a in jnp.split(img_qkv, 3, -1)]
    tq, tk, tv = [a.reshape(-1, h, d) for a in jnp.split(txt_qkv, 3, -1)]
    iq = _qk_rmsnorm(iq, lp["img_q_norm"])
    ik = _qk_rmsnorm(ik, lp["img_k_norm"])
    tq = _qk_rmsnorm(tq, lp["txt_q_norm"])
    tk = _qk_rmsnorm(tk, lp["txt_k_norm"])
    q = jnp.concatenate([tq, iq], axis=0)
    k = jnp.concatenate([tk, ik], axis=0)
    v = jnp.concatenate([tv, iv], axis=0)
    att = _attention(q, k, v, cos, sin)
    txt_att, img_att = att[:t_txt], att[t_txt:]
    img = img + i_gate * (jnp.dot(img_att, lp["img_proj.w"]) + lp["img_proj.b"])
    txt = txt + t_gate * (jnp.dot(txt_att, lp["txt_proj.w"]) + lp["txt_proj.b"])

    img_n2 = _ln_mod(img, i_shift2, i_scale2)
    txt_n2 = _ln_mod(txt, t_shift2, t_scale2)
    img_mlp = jnp.dot(jax.nn.gelu(
        jnp.dot(img_n2, lp["img_mlp0.w"]) + lp["img_mlp0.b"], approximate=True),
        lp["img_mlp2.w"]) + lp["img_mlp2.b"]
    txt_mlp = jnp.dot(jax.nn.gelu(
        jnp.dot(txt_n2, lp["txt_mlp0.w"]) + lp["txt_mlp0.b"], approximate=True),
        lp["txt_mlp2.w"]) + lp["txt_mlp2.b"]
    return img + i_gate2 * img_mlp, txt + t_gate2 * txt_mlp


def single_block_fn(cfg: FluxConfig, lp, x, vec, cos, sin):
    """Single-stream block: fused qkv+mlp linear1, parallel attn+mlp
    (reference: flux/blocks.py single blocks)."""
    h, d = cfg.num_heads, cfg.head_dim
    hidden = cfg.hidden_size
    mlp_dim = int(hidden * cfg.mlp_ratio)
    mod = jnp.dot(jax.nn.silu(vec), lp["mod.w"]) + lp["mod.b"]
    shift, scale, gate = jnp.split(mod, 3)
    xn = _ln_mod(x, shift, scale)
    lin1 = jnp.dot(xn, lp["lin1.w"]) + lp["lin1.b"]
    qkv, mlp = lin1[:, :3 * hidden], lin1[:, 3 * hidden:]
    q, k, v = [a.reshape(-1, h, d) for a in jnp.split(qkv, 3, -1)]
    q = _qk_rmsnorm(q, lp["q_norm"])
    k = _qk_rmsnorm(k, lp["k_norm"])
    att = _attention(q, k, v, cos, sin)
    out = jnp.dot(
        jnp.concatenate([att, jax.nn.gelu(mlp, approximate=True)], axis=-1),
        lp["lin2.w"]) + lp["lin2.b"]
    return x + gate * out


def flux_forward_fn(cfg: FluxConfig, p, img, img_ids, txt, txt_ids, timestep,
                    pooled, guidance):
    """img [T_img, 64], txt [T_txt, context_dim] -> velocity [T_img, 64]."""
    img = jnp.dot(img, p["img_in.w"]) + p["img_in.b"]
    txt = jnp.dot(txt, p["txt_in.w"]) + p["txt_in.b"]
    vec = _mlp_embed(p, "time_in", timestep_embedding(timestep * 1000.0, 256))
    vec = vec + _mlp_embed(p, "vector_in", pooled)
    if cfg.guidance_embed:
        vec = vec + _mlp_embed(p, "guidance_in",
                               timestep_embedding(guidance * 1000.0, 256))

    ids = jnp.concatenate([txt_ids, img_ids], axis=0)
    cos, sin = rope_3d(ids, cfg.axes_dim, cfg.theta)

    def dbl(carry, lp):
        img, txt = carry
        img, txt = double_block_fn(cfg, lp, img, txt, vec, cos, sin)
        return (img, txt), None

    (img, txt), _ = lax.scan(dbl, (img, txt), p["double_blocks"])
    x = jnp.concatenate([txt, img], axis=0)

    def sgl(x, lp):
        return single_block_fn(cfg, lp, x, vec, cos, sin), None

    x, _ = lax.scan(sgl, x, p["single_blocks"])
    img = x[txt.shape[0]:]

    shift, scale = jnp.split(
        jnp.dot(jax.nn.silu(vec), p["final_mod.w"]) + p["final_mod.b"], 2)
    img = _ln_mod(img, shift, scale)
    return jnp.dot(img, p["final.w"]) + p["final.b"]


def make_img_ids(h_patches: int, w_patches: int):
    """[T_img, 3] position ids (axis0=0, axis1=row, axis2=col)."""
    ys = np.repeat(np.arange(h_patches), w_patches)
    xs = np.tile(np.arange(w_patches), h_patches)
    return jnp.asarray(
        np.stack([np.zeros_like(ys), ys, xs], axis=-1).astype(np.int32))


def patchify(latents):
    """[C, H, W] -> [H/2*W/2, C*4] 2x2 patches."""
    c, h, w = latents.shape
    x = latents.reshape(c, h // 2, 2, w // 2, 2)
    x = x.transpose(1, 3, 0, 2, 4).reshape(h // 2 * (w // 2), c * 4)
    return x


def unpatchify(tokens, c: int, h: int, w: int):
    """[H/2*W/2, C*4] -> [C, H, W]."""
    x = tokens.reshape(h // 2, w // 2, c, 2, 2)
    return x.transpose(2, 0, 3, 1, 4).reshape(c, h, w)


class FluxTransformer:
    """reference: FluxTransformer, flux/model.py:49."""

    def __init__(self, config: FluxConfig, params: dict):
        self.config = config
        self.params = params
        self._fwd = jax.jit(functools.partial(flux_forward_fn, config))

    def __call__(self, img, img_ids, txt, txt_ids, timestep, pooled,
                 guidance=1.0):
        return self._fwd(self.params, img, img_ids, txt, txt_ids,
                         jnp.asarray(timestep, _F32),
                         pooled, jnp.asarray(guidance, _F32))

    @classmethod
    def init_random(cls, config: FluxConfig | None = None, seed: int = 0
                    ) -> "FluxTransformer":
        cfg = config or FluxConfig()
        rng = np.random.default_rng(seed)
        hid = cfg.hidden_size
        mlp = int(hid * cfg.mlp_ratio)
        hd = cfg.head_dim

        def w(shape, scale=None):
            scale = scale or (1.0 / math.sqrt(shape[0]))
            return jnp.asarray(
                rng.standard_normal(shape, np.float32) * scale)

        def lin(ci, co):
            return {"w": w((ci, co)), "b": jnp.zeros((co,), _F32)}

        def put(p, name, d):
            p[f"{name}.w"] = d["w"]
            p[f"{name}.b"] = d["b"]

        p: dict = {}
        put(p, "img_in", lin(cfg.in_channels, hid))
        put(p, "txt_in", lin(cfg.context_dim, hid))
        put(p, "time_in.in", lin(256, hid))
        put(p, "time_in.out", lin(hid, hid))
        put(p, "vector_in.in", lin(cfg.pooled_dim, hid))
        put(p, "vector_in.out", lin(hid, hid))
        if cfg.guidance_embed:
            put(p, "guidance_in.in", lin(256, hid))
            put(p, "guidance_in.out", lin(hid, hid))
        put(p, "final_mod", lin(hid, 2 * hid))
        put(p, "final", lin(hid, cfg.in_channels))

        def dbl():
            lp = {}
            put(lp, "img_mod", lin(hid, 6 * hid))
            put(lp, "txt_mod", lin(hid, 6 * hid))
            put(lp, "img_qkv", lin(hid, 3 * hid))
            put(lp, "txt_qkv", lin(hid, 3 * hid))
            put(lp, "img_proj", lin(hid, hid))
            put(lp, "txt_proj", lin(hid, hid))
            put(lp, "img_mlp0", lin(hid, mlp))
            put(lp, "img_mlp2", lin(mlp, hid))
            put(lp, "txt_mlp0", lin(hid, mlp))
            put(lp, "txt_mlp2", lin(mlp, hid))
            for nm in ("img_q_norm", "img_k_norm", "txt_q_norm", "txt_k_norm"):
                lp[nm] = jnp.ones((hd,), _F32)
            return lp

        def sgl():
            lp = {}
            put(lp, "mod", lin(hid, 3 * hid))
            put(lp, "lin1", lin(hid, 3 * hid + mlp))
            put(lp, "lin2", lin(hid + mlp, hid))
            lp["q_norm"] = jnp.ones((hd,), _F32)
            lp["k_norm"] = jnp.ones((hd,), _F32)
            return lp

        p["double_blocks"] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[dbl() for _ in range(cfg.depth)])
        p["single_blocks"] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[sgl() for _ in range(cfg.depth_single)])
        return cls(cfg, p)

    @classmethod
    def from_safetensors(cls, path, config: FluxConfig | None = None,
                         dtype=jnp.bfloat16) -> "FluxTransformer":
        """BFL checkpoint layout (double_blocks.N.img_attn.qkv.weight …,
        reference: flux/model.py:82 from_safetensors + config detect :151)."""
        from ...llm.safetensors import load_safetensors
        st = load_safetensors(path)
        names = set(st.keys())
        n_dbl = 0
        while f"double_blocks.{n_dbl}.img_attn.qkv.weight" in names:
            n_dbl += 1
        n_sgl = 0
        while f"single_blocks.{n_sgl}.linear1.weight" in names:
            n_sgl += 1
        cfg = config or FluxConfig(
            depth=n_dbl, depth_single=n_sgl,
            guidance_embed="guidance_in.in_layer.weight" in names)

        def t(name, transpose=True):
            arr = np.asarray(st.tensor_numpy(name))
            if transpose and arr.ndim == 2:
                arr = arr.T
            return jnp.asarray(np.ascontiguousarray(arr), dtype)

        def put_lin(p, ours, theirs):
            p[f"{ours}.w"] = t(f"{theirs}.weight")
            p[f"{ours}.b"] = t(f"{theirs}.bias", False)

        p: dict = {}
        put_lin(p, "img_in", "img_in")
        put_lin(p, "txt_in", "txt_in")
        put_lin(p, "time_in.in", "time_in.in_layer")
        put_lin(p, "time_in.out", "time_in.out_layer")
        put_lin(p, "vector_in.in", "vector_in.in_layer")
        put_lin(p, "vector_in.out", "vector_in.out_layer")
        if cfg.guidance_embed:
            put_lin(p, "guidance_in.in", "guidance_in.in_layer")
            put_lin(p, "guidance_in.out", "guidance_in.out_layer")
        put_lin(p, "final_mod", "final_layer.adaLN_modulation.1")
        put_lin(p, "final", "final_layer.linear")

        dbls, sgls = [], []
        for i in range(cfg.depth):
            b = f"double_blocks.{i}"
            lp: dict = {}
            put_lin(lp, "img_mod", f"{b}.img_mod.lin")
            put_lin(lp, "txt_mod", f"{b}.txt_mod.lin")
            put_lin(lp, "img_qkv", f"{b}.img_attn.qkv")
            put_lin(lp, "txt_qkv", f"{b}.txt_attn.qkv")
            put_lin(lp, "img_proj", f"{b}.img_attn.proj")
            put_lin(lp, "txt_proj", f"{b}.txt_attn.proj")
            put_lin(lp, "img_mlp0", f"{b}.img_mlp.0")
            put_lin(lp, "img_mlp2", f"{b}.img_mlp.2")
            put_lin(lp, "txt_mlp0", f"{b}.txt_mlp.0")
            put_lin(lp, "txt_mlp2", f"{b}.txt_mlp.2")
            lp["img_q_norm"] = t(f"{b}.img_attn.norm.query_norm.scale", False)
            lp["img_k_norm"] = t(f"{b}.img_attn.norm.key_norm.scale", False)
            lp["txt_q_norm"] = t(f"{b}.txt_attn.norm.query_norm.scale", False)
            lp["txt_k_norm"] = t(f"{b}.txt_attn.norm.key_norm.scale", False)
            dbls.append(lp)
        for i in range(cfg.depth_single):
            b = f"single_blocks.{i}"
            lp = {}
            put_lin(lp, "mod", f"{b}.modulation.lin")
            put_lin(lp, "lin1", f"{b}.linear1")
            put_lin(lp, "lin2", f"{b}.linear2")
            lp["q_norm"] = t(f"{b}.norm.query_norm.scale", False)
            lp["k_norm"] = t(f"{b}.norm.key_norm.scale", False)
            sgls.append(lp)
        p["double_blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *dbls)
        p["single_blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *sgls)
        return cls(cfg, p)
