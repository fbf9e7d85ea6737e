"""Stable Diffusion 3 MMDiT with a real diffusers checkpoint mapping.

Reference: src/pygpukit/diffusion/pipeline.py:34 (the reference's SD3 path of
Text2ImagePipeline) and the diffusers ``SD3Transformer2DModel`` on-disk
layout (transformer/ of stabilityai/stable-diffusion-3-medium-diffusers):
joint dual-stream blocks — latent and text tokens each get AdaLayerNormZero
modulation, attend in ONE joint attention, and keep separate MLPs; the final
block drops the context stream; AdaLayerNormContinuous + proj_out head.

``state_dict_spec`` enumerates every key/shape; ``from_state_dict`` consumes
the same names (synthetic-checkpoint tests assert the round trip).
"""

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
class SD3Config:
    sample_size: int = 128          # latent H=W (1024px model: 128)
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 1536        # 24 heads * 64 (sd3-medium)
    depth: int = 24
    num_heads: int = 24
    context_dim: int = 4096        # T5 + CLIP-concat hidden
    pooled_dim: int = 2048         # CLIP-L + CLIP-G pooled
    pos_embed_max_size: int = 192
    qk_norm: bool = False          # SD3.5 uses RMS qk-norm

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# -------------------------------------------------------------- key layout --

def state_dict_spec(cfg: SD3Config | None = None) -> dict[str, tuple]:
    c = cfg or SD3Config()
    h = c.hidden_size
    keys: dict[str, tuple] = {
        "pos_embed.proj.weight": (h, c.in_channels, c.patch_size, c.patch_size),
        "pos_embed.proj.bias": (h,),
        "pos_embed.pos_embed": (1, c.pos_embed_max_size ** 2, h),
        "time_text_embed.timestep_embedder.linear_1.weight": (h, 256),
        "time_text_embed.timestep_embedder.linear_1.bias": (h,),
        "time_text_embed.timestep_embedder.linear_2.weight": (h, h),
        "time_text_embed.timestep_embedder.linear_2.bias": (h,),
        "time_text_embed.text_embedder.linear_1.weight": (h, c.pooled_dim),
        "time_text_embed.text_embedder.linear_1.bias": (h,),
        "time_text_embed.text_embedder.linear_2.weight": (h, h),
        "time_text_embed.text_embedder.linear_2.bias": (h,),
        "context_embedder.weight": (h, c.context_dim),
        "context_embedder.bias": (h,),
        "norm_out.linear.weight": (2 * h, h),
        "norm_out.linear.bias": (2 * h,),
        "proj_out.weight": (c.patch_size ** 2 * c.out_channels, h),
        "proj_out.bias": (c.patch_size ** 2 * c.out_channels,),
    }
    for n in range(c.depth):
        b = f"transformer_blocks.{n}"
        last = n == c.depth - 1
        keys[f"{b}.norm1.linear.weight"] = (6 * h, h)
        keys[f"{b}.norm1.linear.bias"] = (6 * h,)
        if last:
            keys[f"{b}.norm1_context.linear.weight"] = (2 * h, h)
            keys[f"{b}.norm1_context.linear.bias"] = (2 * h,)
        else:
            keys[f"{b}.norm1_context.linear.weight"] = (6 * h, h)
            keys[f"{b}.norm1_context.linear.bias"] = (6 * h,)
        for proj in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                     "add_v_proj"):
            keys[f"{b}.attn.{proj}.weight"] = (h, h)
            keys[f"{b}.attn.{proj}.bias"] = (h,)
        keys[f"{b}.attn.to_out.0.weight"] = (h, h)
        keys[f"{b}.attn.to_out.0.bias"] = (h,)
        if not last:
            keys[f"{b}.attn.to_add_out.weight"] = (h, h)
            keys[f"{b}.attn.to_add_out.bias"] = (h,)
        if c.qk_norm:
            for nq in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
                keys[f"{b}.attn.{nq}.weight"] = (c.head_dim,)
        keys[f"{b}.ff.net.0.proj.weight"] = (4 * h, h)
        keys[f"{b}.ff.net.0.proj.bias"] = (4 * h,)
        keys[f"{b}.ff.net.2.weight"] = (h, 4 * h)
        keys[f"{b}.ff.net.2.bias"] = (h,)
        if not last:
            keys[f"{b}.ff_context.net.0.proj.weight"] = (4 * h, h)
            keys[f"{b}.ff_context.net.0.proj.bias"] = (4 * h,)
            keys[f"{b}.ff_context.net.2.weight"] = (h, 4 * h)
            keys[f"{b}.ff_context.net.2.bias"] = (h,)
    return keys


# ---------------------------------------------------------------- forward --

def _gelu_tanh(x):
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def _ln(x, eps=1e-6):
    mu = x.astype(_F32).mean(-1, keepdims=True)
    var = x.astype(_F32).var(-1, keepdims=True)
    return ((x.astype(_F32) - mu) * lax.rsqrt(var + eps)).astype(x.dtype)


def _rms(x, w, eps=1e-6):
    xf = x.astype(_F32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * lax.rsqrt(var + eps) * w).astype(x.dtype)


def sd3_forward_fn(cfg: SD3Config, p, latent, timestep, context, pooled):
    """latent [C, H, W], timestep scalar (0..1000), context [Tc, ctx_dim],
    pooled [pooled_dim] -> prediction [C, H, W]."""
    c = cfg
    ph = latent.shape[1] // c.patch_size
    pw = latent.shape[2] // c.patch_size
    x = lax.conv_general_dilated(
        latent[None].astype(_F32), p["patch.w"].astype(_F32),
        window_strides=(c.patch_size, c.patch_size), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]
    x = x.reshape(c.hidden_size, ph * pw).T + p["patch.b"]

    # cropped learned pos embed (diffusers cropped_pos_embed)
    m = c.pos_embed_max_size
    top = (m - ph) // 2
    left = (m - pw) // 2
    pe = p["pos_embed"].reshape(m, m, c.hidden_size)
    x = x + pe[top:top + ph, left:left + pw].reshape(ph * pw, c.hidden_size)

    t_emb = timestep_embedding(timestep, 256)
    temb = jnp.dot(jax.nn.silu(
        jnp.dot(t_emb, p["t.in.w"]) + p["t.in.b"]), p["t.out.w"]) + p["t.out.b"]
    pemb = jnp.dot(jax.nn.silu(
        jnp.dot(pooled, p["pool.in.w"]) + p["pool.in.b"]),
        p["pool.out.w"]) + p["pool.out.b"]
    temb = jax.nn.silu(temb + pemb)                          # [hid]

    ctx = jnp.dot(context, p["ctx.w"]) + p["ctx.b"]          # [Tc, hid]

    heads, d = c.num_heads, c.head_dim

    def joint_attn(xh, ch, lp, last):
        t_img, t_ctx = xh.shape[0], ch.shape[0]

        def proj(src, name):
            return (jnp.dot(src, lp[f"{name}.w"]) + lp[f"{name}.b"]).reshape(
                -1, heads, d)

        q_img, k_img = proj(xh, "q"), proj(xh, "k")
        q_ctx, k_ctx = proj(ch, "aq"), proj(ch, "ak")
        if cfg.qk_norm:
            # SD3.5: norm_q/norm_k normalise the IMAGE stream, separate
            # norm_added_q/norm_added_k weights normalise the context stream
            q_img = _rms(q_img, lp["nq"])
            k_img = _rms(k_img, lp["nk"])
            q_ctx = _rms(q_ctx, lp["naq"])
            k_ctx = _rms(k_ctx, lp["nak"])
        q = jnp.concatenate([q_ctx, q_img], axis=0)
        k = jnp.concatenate([k_ctx, k_img], axis=0)
        v = jnp.concatenate([proj(ch, "av"), proj(xh, "v")], axis=0)
        qh = q.transpose(1, 0, 2).astype(_F32)
        kh = k.transpose(1, 0, 2).astype(_F32)
        vh = v.transpose(1, 0, 2).astype(_F32)
        scores = jnp.einsum("hqd,hkd->hqk", qh, kh) / math.sqrt(d)
        out = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, -1), vh)
        out = out.transpose(1, 0, 2).reshape(-1, c.hidden_size)
        ctx_out, img_out = out[:t_ctx], out[t_ctx:]
        img_out = jnp.dot(img_out, lp["o.w"]) + lp["o.b"]
        if not last:
            ctx_out = jnp.dot(ctx_out, lp["ao.w"]) + lp["ao.b"]
        return img_out, ctx_out

    n_blocks = len(p["blocks"])
    for i, lp in enumerate(p["blocks"]):
        last = i == n_blocks - 1
        mod_x = jnp.dot(temb, lp["mod.w"]) + lp["mod.b"]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod_x, 6)
        if last:
            csh, csc = jnp.split(jnp.dot(temb, lp["cmod.w"]) + lp["cmod.b"], 2)
            ch = _ln(ctx) * (1 + csc) + csh
        else:
            cmod = jnp.dot(temb, lp["cmod.w"]) + lp["cmod.b"]
            csh1, csc1, cg1, csh2, csc2, cg2 = jnp.split(cmod, 6)
            ch = _ln(ctx) * (1 + csc1) + csh1
        xh = _ln(x) * (1 + sc1) + sh1
        img_attn, ctx_attn = joint_attn(xh, ch, lp, last)
        x = x + g1 * img_attn
        h = _ln(x) * (1 + sc2) + sh2
        x = x + g2 * (jnp.dot(_gelu_tanh(
            jnp.dot(h, lp["ff.in.w"]) + lp["ff.in.b"]),
            lp["ff.out.w"]) + lp["ff.out.b"])
        if not last:
            ctx = ctx + cg1 * ctx_attn
            hc = _ln(ctx) * (1 + csc2) + csh2
            ctx = ctx + cg2 * (jnp.dot(_gelu_tanh(
                jnp.dot(hc, lp["cff.in.w"]) + lp["cff.in.b"]),
                lp["cff.out.w"]) + lp["cff.out.b"])

    sh, sc = jnp.split(jnp.dot(jax.nn.silu(temb), p["final_mod.w"])
                       + p["final_mod.b"], 2)
    x = _ln(x) * (1 + sc) + sh
    x = jnp.dot(x, p["out.w"]) + p["out.b"]
    x = x.reshape(ph, pw, c.patch_size, c.patch_size, c.out_channels)
    return jnp.einsum("hwpqc->chpwq", x).reshape(
        c.out_channels, ph * c.patch_size, pw * c.patch_size)


# ---------------------------------------------------------------- loading --

def params_from_state_dict(flat: dict, cfg: SD3Config) -> dict:
    def lw(name):
        return jnp.asarray(np.asarray(flat[f"{name}.weight"]).T, _F32)

    def lb(name):
        return jnp.asarray(np.asarray(flat[f"{name}.bias"]), _F32)

    p = {
        "patch.w": jnp.asarray(np.asarray(flat["pos_embed.proj.weight"]), _F32),
        "patch.b": lb("pos_embed.proj"),
        "pos_embed": jnp.asarray(
            np.asarray(flat["pos_embed.pos_embed"])[0], _F32),
        "t.in.w": lw("time_text_embed.timestep_embedder.linear_1"),
        "t.in.b": lb("time_text_embed.timestep_embedder.linear_1"),
        "t.out.w": lw("time_text_embed.timestep_embedder.linear_2"),
        "t.out.b": lb("time_text_embed.timestep_embedder.linear_2"),
        "pool.in.w": lw("time_text_embed.text_embedder.linear_1"),
        "pool.in.b": lb("time_text_embed.text_embedder.linear_1"),
        "pool.out.w": lw("time_text_embed.text_embedder.linear_2"),
        "pool.out.b": lb("time_text_embed.text_embedder.linear_2"),
        "ctx.w": lw("context_embedder"),
        "ctx.b": lb("context_embedder"),
        "final_mod.w": lw("norm_out.linear"),
        "final_mod.b": lb("norm_out.linear"),
        "out.w": lw("proj_out"),
        "out.b": lb("proj_out"),
    }

    blocks = []
    for n in range(cfg.depth):
        b = f"transformer_blocks.{n}"
        last = n == cfg.depth - 1
        lp = {
            "mod.w": lw(f"{b}.norm1.linear"),
            "mod.b": lb(f"{b}.norm1.linear"),
            "cmod.w": lw(f"{b}.norm1_context.linear"),
            "cmod.b": lb(f"{b}.norm1_context.linear"),
            "q.w": lw(f"{b}.attn.to_q"), "q.b": lb(f"{b}.attn.to_q"),
            "k.w": lw(f"{b}.attn.to_k"), "k.b": lb(f"{b}.attn.to_k"),
            "v.w": lw(f"{b}.attn.to_v"), "v.b": lb(f"{b}.attn.to_v"),
            "aq.w": lw(f"{b}.attn.add_q_proj"), "aq.b": lb(f"{b}.attn.add_q_proj"),
            "ak.w": lw(f"{b}.attn.add_k_proj"), "ak.b": lb(f"{b}.attn.add_k_proj"),
            "av.w": lw(f"{b}.attn.add_v_proj"), "av.b": lb(f"{b}.attn.add_v_proj"),
            "o.w": lw(f"{b}.attn.to_out.0"), "o.b": lb(f"{b}.attn.to_out.0"),
            "ff.in.w": lw(f"{b}.ff.net.0.proj"),
            "ff.in.b": lb(f"{b}.ff.net.0.proj"),
            "ff.out.w": lw(f"{b}.ff.net.2"),
            "ff.out.b": lb(f"{b}.ff.net.2"),
        }
        if cfg.qk_norm:
            lp["nq"] = jnp.asarray(np.asarray(flat[f"{b}.attn.norm_q.weight"]), _F32)
            lp["nk"] = jnp.asarray(np.asarray(flat[f"{b}.attn.norm_k.weight"]), _F32)
            lp["naq"] = jnp.asarray(
                np.asarray(flat[f"{b}.attn.norm_added_q.weight"]), _F32)
            lp["nak"] = jnp.asarray(
                np.asarray(flat[f"{b}.attn.norm_added_k.weight"]), _F32)
        if not last:
            lp["ao.w"] = lw(f"{b}.attn.to_add_out")
            lp["ao.b"] = lb(f"{b}.attn.to_add_out")
            lp["cff.in.w"] = lw(f"{b}.ff_context.net.0.proj")
            lp["cff.in.b"] = lb(f"{b}.ff_context.net.0.proj")
            lp["cff.out.w"] = lw(f"{b}.ff_context.net.2")
            lp["cff.out.b"] = lb(f"{b}.ff_context.net.2")
        blocks.append(lp)
    # last block has a different leaf set -> keep blocks as a python list
    # (the loop in sd3_forward_fn is unrolled; depth is small)
    p["blocks"] = blocks
    return p


def init_random_flat(cfg: SD3Config | None = None, seed: int = 0,
                     scale: float = 0.02) -> dict[str, np.ndarray]:
    cfg = cfg or SD3Config()
    rng = np.random.default_rng(seed)
    flat = {}
    for name, shape in state_dict_spec(cfg).items():
        if name.endswith("bias"):
            flat[name] = np.zeros(shape, np.float32)
        elif name.endswith("norm_q.weight") or name.endswith("norm_k.weight") \
                or "norm_added" in name:
            flat[name] = np.ones(shape, np.float32)
        else:
            flat[name] = rng.standard_normal(shape).astype(np.float32) * scale
    return flat


class SD3Transformer:
    """SD3 MMDiT denoiser (diffusers-checkpoint compatible)."""

    def __init__(self, config: SD3Config, params: dict):
        self.config = config
        self.params = params
        self._fwd = jax.jit(functools.partial(sd3_forward_fn, config))

    def __call__(self, latent, timestep, context, pooled):
        return self._fwd(self.params, latent, jnp.asarray(timestep, _F32),
                         context, pooled)

    @classmethod
    def from_state_dict(cls, flat, config: SD3Config | None = None):
        cfg = config or SD3Config()
        return cls(cfg, params_from_state_dict(flat, cfg))

    @classmethod
    def from_safetensors(cls, path, config: SD3Config | None = None):
        from pathlib import Path
        from ...llm.safetensors import SafeTensorsFile
        path = Path(path)
        if path.is_dir():
            cands = sorted(path.glob("*.safetensors"))
            if not cands:
                raise FileNotFoundError(f"no safetensors under {path}")
            path = cands[0]
        st = SafeTensorsFile(str(path))
        flat = {k: st.tensor_numpy(k) for k in st.keys()}
        return cls.from_state_dict(flat, config)

    @classmethod
    def init_random(cls, config: SD3Config | None = None, seed: int = 0):
        cfg = config or SD3Config()
        return cls.from_state_dict(init_random_flat(cfg, seed), cfg)
