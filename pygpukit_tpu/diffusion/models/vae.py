"""VAE (AutoencoderKL) for latent diffusion (reference:
src/pygpukit/diffusion/models/vae.py + native conv2d/group_norm diffusion
kernels). Decoder-first (text-to-image needs decode); encoder included for
img2img parity. Weight names follow the diffusers AutoencoderKL layout.

XLA's conv_general_dilated is the MXU conv path — no im2col needed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.conv import conv2d_fn

_F32 = jnp.float32


@dataclass
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0


def groupnorm_nchw(x, w, b, groups: int, eps: float = 1e-6):
    n, c, h, wd = x.shape
    xg = x.astype(_F32).reshape(n, groups, c // groups, h, wd)
    mu = xg.mean(axis=(2, 3, 4), keepdims=True)
    var = xg.var(axis=(2, 3, 4), keepdims=True)
    y = ((xg - mu) * lax.rsqrt(var + eps)).reshape(n, c, h, wd)
    return (y * w[None, :, None, None] + b[None, :, None, None]).astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def _conv(p, name, x, stride=1, padding=1):
    return conv2d_fn(x, p[f"{name}.w"], p.get(f"{name}.b"), stride=stride,
                     padding=padding)


def resnet_block(p, prefix, x, groups: int):
    h = groupnorm_nchw(x, p[f"{prefix}.norm1.w"], p[f"{prefix}.norm1.b"], groups)
    h = _conv(p, f"{prefix}.conv1", silu(h))
    h = groupnorm_nchw(h, p[f"{prefix}.norm2.w"], p[f"{prefix}.norm2.b"], groups)
    h = _conv(p, f"{prefix}.conv2", silu(h))
    if f"{prefix}.shortcut.w" in p:
        x = conv2d_fn(x, p[f"{prefix}.shortcut.w"], p.get(f"{prefix}.shortcut.b"),
                      padding=0)
    return x + h


def attn_block(p, prefix, x, groups: int):
    """Single-head spatial self-attention mid-block."""
    n, c, h, w = x.shape
    y = groupnorm_nchw(x, p[f"{prefix}.norm.w"], p[f"{prefix}.norm.b"], groups)
    flat = y.reshape(n, c, h * w).transpose(0, 2, 1)          # [N, HW, C]
    q = jnp.dot(flat, p[f"{prefix}.q.w"]) + p[f"{prefix}.q.b"]
    k = jnp.dot(flat, p[f"{prefix}.k.w"]) + p[f"{prefix}.k.b"]
    v = jnp.dot(flat, p[f"{prefix}.v.w"]) + p[f"{prefix}.v.b"]
    scores = jnp.einsum("nqc,nkc->nqk", q, k) / math.sqrt(c)
    att = jnp.einsum("nqk,nkc->nqc", jax.nn.softmax(scores, -1), v)
    out = jnp.dot(att, p[f"{prefix}.proj.w"]) + p[f"{prefix}.proj.b"]
    return x + out.transpose(0, 2, 1).reshape(n, c, h, w)


def upsample2x(p, prefix, x):
    n, c, h, w = x.shape
    x = jax.image.resize(x, (n, c, 2 * h, 2 * w), method="nearest")
    return _conv(p, f"{prefix}.conv", x)


def decoder_fn(cfg: VAEConfig, p, z):
    """latents [N, Cz, H, W] -> image [N, 3, 8H, 8W] in [-1, 1]."""
    groups = cfg.norm_groups
    z = z / cfg.scaling_factor + cfg.shift_factor
    h = _conv(p, "conv_in", z)
    h = resnet_block(p, "mid.res1", h, groups)
    h = attn_block(p, "mid.attn", h, groups)
    h = resnet_block(p, "mid.res2", h, groups)
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block + 1):
            h = resnet_block(p, f"up.{i}.res{j}", h, groups)
        if i < n_blocks - 1:
            h = upsample2x(p, f"up.{i}.upsample", h)
    h = groupnorm_nchw(h, p["norm_out.w"], p["norm_out.b"], groups)
    return _conv(p, "conv_out", silu(h))


def encoder_fn(cfg: VAEConfig, p, x, key=None):
    """image [N,3,H,W] -> latent sample [N, Cz, H/8, W/8]."""
    groups = cfg.norm_groups
    h = _conv(p, "enc.conv_in", x)
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            h = resnet_block(p, f"enc.down.{i}.res{j}", h, groups)
        if i < n_blocks - 1:
            # diffusers Downsample2D: asymmetric (0,1) pad then stride-2 conv
            # so H -> H/2 exactly (the inverse of the decoder's upsample)
            hp = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 1)))
            h = conv2d_fn(hp, p[f"enc.down.{i}.down.w"],
                          p.get(f"enc.down.{i}.down.b"), stride=2, padding=0)
    h = resnet_block(p, "enc.mid.res1", h, groups)
    h = attn_block(p, "enc.mid.attn", h, groups)
    h = resnet_block(p, "enc.mid.res2", h, groups)
    h = groupnorm_nchw(h, p["enc.norm_out.w"], p["enc.norm_out.b"], groups)
    moments = _conv(p, "enc.conv_out", silu(h))
    mean, logvar = jnp.split(moments, 2, axis=1)
    if key is not None:
        mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * \
            jax.random.normal(key, mean.shape, mean.dtype)
    return (mean - cfg.shift_factor) * cfg.scaling_factor


class VAE:
    """reference: VAE, diffusion/models/vae.py."""

    def __init__(self, config: VAEConfig, params: dict):
        self.config = config
        self.params = params
        import functools
        self._decode = jax.jit(functools.partial(decoder_fn, config))
        self._encode = jax.jit(functools.partial(encoder_fn, config))

    def decode(self, latents) -> jnp.ndarray:
        return self._decode(self.params, latents)

    def encode(self, images, key=None) -> jnp.ndarray:
        return self._encode(self.params, images, key)

    def decode_to_images(self, latents) -> np.ndarray:
        """-> uint8 [N, H, W, 3]."""
        img = np.asarray(self.decode(latents), np.float32)
        img = np.clip(img / 2 + 0.5, 0, 1)
        return (img.transpose(0, 2, 3, 1) * 255).round().astype(np.uint8)

    # -- init / loading ------------------------------------------------------

    @classmethod
    def init_random(cls, config: VAEConfig | None = None, seed: int = 0) -> "VAE":
        cfg = config or VAEConfig()
        rng = np.random.default_rng(seed)
        p: dict = {}
        groups = cfg.norm_groups
        chans = list(reversed(cfg.block_out_channels))  # decoder order

        def conv(name, ci, co, k=3):
            p[f"{name}.w"] = jnp.asarray(
                rng.standard_normal((co, ci, k, k), np.float32)
                * (0.5 / math.sqrt(ci * k * k)))
            p[f"{name}.b"] = jnp.zeros((co,), _F32)

        def norm(name, c):
            p[f"{name}.w"] = jnp.ones((c,), _F32)
            p[f"{name}.b"] = jnp.zeros((c,), _F32)

        def res(prefix, ci, co):
            norm(f"{prefix}.norm1", ci)
            conv(f"{prefix}.conv1", ci, co)
            norm(f"{prefix}.norm2", co)
            conv(f"{prefix}.conv2", co, co)
            if ci != co:
                conv(f"{prefix}.shortcut", ci, co, k=1)

        def lin(name, c):
            p[f"{name}.w"] = jnp.asarray(
                rng.standard_normal((c, c), np.float32) / math.sqrt(c))
            p[f"{name}.b"] = jnp.zeros((c,), _F32)

        c0 = chans[0]
        conv("conv_in", cfg.latent_channels, c0)
        res("mid.res1", c0, c0)
        norm("mid.attn.norm", c0)
        for nm in ("q", "k", "v", "proj"):
            lin(f"mid.attn.{nm}", c0)
        res("mid.res2", c0, c0)
        cur = c0
        for i, co in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                res(f"up.{i}.res{j}", cur, co)
                cur = co
            if i < len(chans) - 1:
                conv(f"up.{i}.upsample.conv", cur, cur)
        norm("norm_out", cur)
        conv("conv_out", cur, cfg.in_channels)
        # encoder (consumed by encoder_fn for img2img/inpaint)
        enc_chans = list(cfg.block_out_channels)
        conv("enc.conv_in", cfg.in_channels, enc_chans[0])
        cur = enc_chans[0]
        for i, co in enumerate(enc_chans):
            for j in range(cfg.layers_per_block):
                res(f"enc.down.{i}.res{j}", cur, co)
                cur = co
            if i < len(enc_chans) - 1:
                conv(f"enc.down.{i}.down", cur, cur)
        res("enc.mid.res1", cur, cur)
        norm("enc.mid.attn.norm", cur)
        for nm in ("q", "k", "v", "proj"):
            lin(f"enc.mid.attn.{nm}", cur)
        res("enc.mid.res2", cur, cur)
        norm("enc.norm_out", cur)
        conv("enc.conv_out", cur, 2 * cfg.latent_channels)
        return cls(cfg, p)

    @classmethod
    def from_safetensors(cls, path, config: VAEConfig | None = None) -> "VAE":
        """Load a diffusers AutoencoderKL checkpoint (decoder + encoder)."""
        from ...llm.safetensors import load_safetensors
        st = load_safetensors(path)
        if config is None:
            # infer latent channels from the checkpoint (SD/Flux: 4,
            # SD3: 16) — decoder conv_in input channels — and read the
            # scaling/shift factors from the sibling config.json when present
            zc = int(st.tensor_shape("decoder.conv_in.weight")[1])
            kw = {"latent_channels": zc}
            import json
            from pathlib import Path
            base = Path(path)
            cj = (base if base.is_dir() else base.parent) / "config.json"
            if cj.exists():
                hf = json.loads(cj.read_text())
                kw["scaling_factor"] = hf.get("scaling_factor", 0.18215)
                kw["shift_factor"] = hf.get("shift_factor", 0.0) or 0.0
                if "block_out_channels" in hf:
                    kw["block_out_channels"] = tuple(hf["block_out_channels"])
            config = VAEConfig(**kw)
        cfg = config
        p: dict = {}

        def t(name):
            return jnp.asarray(np.asarray(st.tensor_numpy(name)), _F32)

        def lin_t(name):  # attention to_q etc: [out,in] -> [in,out]
            return jnp.asarray(np.asarray(st.tensor_numpy(name)).T, _F32)

        def put_conv(dst, src):
            p[f"{dst}.w"] = t(f"{src}.weight")
            p[f"{dst}.b"] = t(f"{src}.bias")

        def put_norm(dst, src):
            p[f"{dst}.w"] = t(f"{src}.weight")
            p[f"{dst}.b"] = t(f"{src}.bias")

        def put_res(dst, src):
            put_norm(f"{dst}.norm1", f"{src}.norm1")
            put_conv(f"{dst}.conv1", f"{src}.conv1")
            put_norm(f"{dst}.norm2", f"{src}.norm2")
            put_conv(f"{dst}.conv2", f"{src}.conv2")
            if f"{src}.conv_shortcut.weight" in st:
                put_conv(f"{dst}.shortcut", f"{src}.conv_shortcut")

        d = "decoder"
        put_conv("conv_in", f"{d}.conv_in")
        put_res("mid.res1", f"{d}.mid_block.resnets.0")
        put_res("mid.res2", f"{d}.mid_block.resnets.1")
        a = f"{d}.mid_block.attentions.0"
        put_norm("mid.attn.norm", f"{a}.group_norm")
        for ours, theirs in (("q", "to_q"), ("k", "to_k"), ("v", "to_v"),
                             ("proj", "to_out.0")):
            p[f"mid.attn.{ours}.w"] = lin_t(f"{a}.{theirs}.weight")
            p[f"mid.attn.{ours}.b"] = t(f"{a}.{theirs}.bias")
        n_blocks = len(cfg.block_out_channels)
        for i in range(n_blocks):
            for j in range(cfg.layers_per_block + 1):
                put_res(f"up.{i}.res{j}", f"{d}.up_blocks.{i}.resnets.{j}")
            if f"{d}.up_blocks.{i}.upsamplers.0.conv.weight" in st:
                put_conv(f"up.{i}.upsample.conv",
                         f"{d}.up_blocks.{i}.upsamplers.0.conv")
        put_norm("norm_out", f"{d}.conv_norm_out")
        put_conv("conv_out", f"{d}.conv_out")
        return cls(cfg, p)
