"""PixArt-alpha transformer with a real diffusers checkpoint mapping.

Reference: src/pygpukit/diffusion/models/dit/ (the reference's PixArt path)
and the diffusers ``PixArtTransformer2DModel`` on-disk layout
(transformer/diffusion_pytorch_model.safetensors of PixArt-alpha/PixArt-XL-2):
ada_norm_single conditioning — ONE shared adaLN projection plus per-block
``scale_shift_table`` offsets — self-attention, cross-attention to projected
T5 captions, gelu-approximate FeedForward, learned-sigma 8-channel output.

``state_dict_spec`` enumerates every checkpoint key/shape (the synthetic-
checkpoint tests build from it); ``from_state_dict`` consumes the same names.
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
class PixArtConfig:
    sample_size: int = 64            # latent H=W (512px model: 64)
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 8            # learned sigma: eps + var
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    caption_dim: int = 4096          # T5-XXL features
    ff_mult: int = 4
    base_size: int = 32              # sample_size // patch of the 512 model
    interpolation_scale: float = 1.0
    #: PixArt-alpha 1024 checkpoints condition on resolution + aspect ratio
    #: (adaln_single.emb.{resolution,aspect_ratio}_embedder)
    use_additional_conditions: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# -------------------------------------------------------------- key layout --

def state_dict_spec(cfg: PixArtConfig | None = None) -> dict[str, tuple]:
    """diffusers PixArtTransformer2DModel key -> shape."""
    c = cfg or PixArtConfig()
    h, ff = c.hidden_size, c.hidden_size * c.ff_mult
    keys: dict[str, tuple] = {
        "pos_embed.proj.weight": (h, c.in_channels, c.patch_size, c.patch_size),
        "pos_embed.proj.bias": (h,),
        "caption_projection.linear_1.weight": (h, c.caption_dim),
        "caption_projection.linear_1.bias": (h,),
        "caption_projection.linear_2.weight": (h, h),
        "caption_projection.linear_2.bias": (h,),
        "adaln_single.emb.timestep_embedder.linear_1.weight": (h, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": (h,),
        "adaln_single.emb.timestep_embedder.linear_2.weight": (h, h),
        "adaln_single.emb.timestep_embedder.linear_2.bias": (h,),
        "adaln_single.linear.weight": (6 * h, h),
        "adaln_single.linear.bias": (6 * h,),
    }
    if c.use_additional_conditions:
        # diffusers PixArtAlphaCombinedTimestepSizeEmbeddings: each size
        # scalar embeds 256-sinusoidal -> Linear(256, h//3) -> Linear(h//3,
        # h//3); cat(resolution[2*h//3], aspect[h//3]) adds to the t-emb
        se = h // 3
        for emb in ("resolution_embedder", "aspect_ratio_embedder"):
            keys[f"adaln_single.emb.{emb}.linear_1.weight"] = (se, 256)
            keys[f"adaln_single.emb.{emb}.linear_1.bias"] = (se,)
            keys[f"adaln_single.emb.{emb}.linear_2.weight"] = (se, se)
            keys[f"adaln_single.emb.{emb}.linear_2.bias"] = (se,)
    keys.update({
        "scale_shift_table": (2, h),
        "proj_out.weight": (c.patch_size ** 2 * c.out_channels, h),
        "proj_out.bias": (c.patch_size ** 2 * c.out_channels,),
    })
    for n in range(c.depth):
        b = f"transformer_blocks.{n}"
        keys[f"{b}.scale_shift_table"] = (6, h)
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                keys[f"{b}.{attn}.{proj}.weight"] = (h, h)
                keys[f"{b}.{attn}.{proj}.bias"] = (h,)
            keys[f"{b}.{attn}.to_out.0.weight"] = (h, h)
            keys[f"{b}.{attn}.to_out.0.bias"] = (h,)
        keys[f"{b}.ff.net.0.proj.weight"] = (ff, h)
        keys[f"{b}.ff.net.0.proj.bias"] = (ff,)
        keys[f"{b}.ff.net.2.weight"] = (h, ff)
        keys[f"{b}.ff.net.2.bias"] = (h,)
    return keys


# ------------------------------------------------------------- pos embed --

def _sincos_1d(dim, pos):
    omega = 1.0 / 10000 ** (np.arange(dim // 2) / (dim / 2.0))
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_pos_embed_2d(dim: int, grid: int, base_size: int,
                        interpolation_scale: float) -> np.ndarray:
    """diffusers get_2d_sincos_pos_embed (w-major meshgrid, h-emb first)."""
    coords = np.arange(grid) / (grid / base_size) / interpolation_scale
    gw, gh = np.meshgrid(coords, coords)        # both [h, w]
    emb_h = _sincos_1d(dim // 2, gw)            # grid[0] = w component
    emb_w = _sincos_1d(dim // 2, gh)
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


# --------------------------------------------------------------- forward --

def _gelu_tanh(x):
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def _ln(x, eps=1e-6):
    mu = x.astype(_F32).mean(-1, keepdims=True)
    var = x.astype(_F32).var(-1, keepdims=True)
    return ((x.astype(_F32) - mu) * lax.rsqrt(var + eps)).astype(x.dtype)


def _attn(x_q, x_kv, lp, prefix, n_heads):
    t, e = x_q.shape
    tk = x_kv.shape[0]
    d = e // n_heads
    q = (jnp.dot(x_q, lp[f"{prefix}.q.w"]) + lp[f"{prefix}.q.b"]).reshape(
        t, n_heads, d).transpose(1, 0, 2).astype(_F32)
    k = (jnp.dot(x_kv, lp[f"{prefix}.k.w"]) + lp[f"{prefix}.k.b"]).reshape(
        tk, n_heads, d).transpose(1, 0, 2).astype(_F32)
    v = (jnp.dot(x_kv, lp[f"{prefix}.v.w"]) + lp[f"{prefix}.v.b"]).reshape(
        tk, n_heads, d).transpose(1, 0, 2).astype(_F32)
    scores = jnp.einsum("hqd,hkd->hqk", q, k) / math.sqrt(d)
    out = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(scores, -1), v)
    out = out.transpose(1, 0, 2).reshape(t, e).astype(x_q.dtype)
    return jnp.dot(out, lp[f"{prefix}.o.w"]) + lp[f"{prefix}.o.b"]


def pixart_forward_fn(cfg: PixArtConfig, p, latent, timestep, caption,
                      resolution=None, aspect_ratio=None):
    """latent [C, H, W], timestep scalar, caption [Tc, caption_dim]
    -> eps+var prediction [out_channels, H, W]. 1024-class checkpoints
    (use_additional_conditions) also embed (resolution [2], aspect [1])."""
    c = cfg
    ph = latent.shape[1] // c.patch_size
    pw = latent.shape[2] // c.patch_size
    # patchify via conv
    x = lax.conv_general_dilated(
        latent[None].astype(_F32), p["patch.w"].astype(_F32),
        window_strides=(c.patch_size, c.patch_size), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]       # [hid, ph, pw]
    x = x.reshape(c.hidden_size, ph * pw).T + p["patch.b"]   # [T, hid]
    x = x + p["pos_embed"][:x.shape[0]]

    # ada_norm_single conditioning
    t_sin = timestep_embedding(timestep, 256)
    h1 = jnp.dot(t_sin, p["t.in.w"]) + p["t.in.b"]
    emb_t = jnp.dot(jax.nn.silu(h1), p["t.out.w"]) + p["t.out.b"]  # [hid]
    if cfg.use_additional_conditions:
        res = (jnp.asarray([float(latent.shape[1] * 8),
                            float(latent.shape[2] * 8)], _F32)
               if resolution is None else jnp.asarray(resolution, _F32))
        ar = (jnp.asarray([latent.shape[1] / latent.shape[2]], _F32)
              if aspect_ratio is None else jnp.asarray(aspect_ratio, _F32))

        def size_emb(vals, pre):
            """Each scalar -> 256-sinusoidal -> 2-layer MLP -> [h//3];
            concatenated over the scalars (diffusers
            PixArtAlphaCombinedTimestepSizeEmbeddings)."""
            parts = []
            for i in range(vals.shape[0]):
                sin_e = timestep_embedding(vals[i], 256)
                hh = jnp.dot(sin_e, p[f"{pre}.in.w"]) + p[f"{pre}.in.b"]
                parts.append(jnp.dot(jax.nn.silu(hh), p[f"{pre}.out.w"])
                             + p[f"{pre}.out.b"])
            return jnp.concatenate(parts)

        emb_t = emb_t + jnp.concatenate(
            [size_emb(res, "res"), size_emb(ar, "ar")])
    cond6 = jnp.dot(jax.nn.silu(emb_t), p["adaln.w"]) + p["adaln.b"]

    # caption projection: linear -> gelu(tanh) -> linear
    ctx = _gelu_tanh(jnp.dot(caption, p["cap.in.w"]) + p["cap.in.b"])
    ctx = jnp.dot(ctx, p["cap.out.w"]) + p["cap.out.b"]      # [Tc, hid]

    def block(x, lp):
        mod = lp["scale_shift_table"] + cond6.reshape(6, -1)
        sh1, sc1, g1, sh2, sc2, g2 = mod
        h = _ln(x) * (1 + sc1) + sh1
        x = x + g1 * _attn(h, h, lp, "attn1", c.num_heads)
        x = x + _attn(x, ctx, lp, "attn2", c.num_heads)      # no norm (ada_norm_single)
        h = _ln(x) * (1 + sc2) + sh2
        ffh = _gelu_tanh(jnp.dot(h, lp["ff.in.w"]) + lp["ff.in.b"])
        x = x + g2 * (jnp.dot(ffh, lp["ff.out.w"]) + lp["ff.out.b"])
        return x, None

    x, _ = lax.scan(block, x, p["blocks"])

    shift, scale = p["scale_shift_table"] + emb_t[None]
    x = _ln(x) * (1 + scale) + shift
    x = jnp.dot(x, p["out.w"]) + p["out.b"]                  # [T, pp*out_ch]
    # unpatchify
    x = x.reshape(ph, pw, c.patch_size, c.patch_size, c.out_channels)
    x = jnp.einsum("hwpqc->chpwq", x).reshape(
        c.out_channels, ph * c.patch_size, pw * c.patch_size)
    return x


# ---------------------------------------------------------------- loading --

def _lin(flat, torch_name):
    return {"w": jnp.asarray(np.asarray(flat[f"{torch_name}.weight"]).T),
            "b": jnp.asarray(np.asarray(flat[f"{torch_name}.bias"]))}


def params_from_state_dict(flat: dict, cfg: PixArtConfig) -> dict:
    """Flat diffusers state dict (numpy values) -> forward param pytree."""
    def lw(name):
        return jnp.asarray(np.asarray(flat[f"{name}.weight"]).T, _F32)

    def lb(name):
        return jnp.asarray(np.asarray(flat[f"{name}.bias"]), _F32)

    p = {
        "patch.w": jnp.asarray(np.asarray(flat["pos_embed.proj.weight"]), _F32),
        "patch.b": lb("pos_embed.proj"),
        "pos_embed": jnp.asarray(sincos_pos_embed_2d(
            cfg.hidden_size, cfg.sample_size // cfg.patch_size,
            cfg.base_size, cfg.interpolation_scale)),
        "cap.in.w": lw("caption_projection.linear_1"),
        "cap.in.b": lb("caption_projection.linear_1"),
        "cap.out.w": lw("caption_projection.linear_2"),
        "cap.out.b": lb("caption_projection.linear_2"),
        "t.in.w": lw("adaln_single.emb.timestep_embedder.linear_1"),
        "t.in.b": lb("adaln_single.emb.timestep_embedder.linear_1"),
        "t.out.w": lw("adaln_single.emb.timestep_embedder.linear_2"),
        "t.out.b": lb("adaln_single.emb.timestep_embedder.linear_2"),
        "adaln.w": lw("adaln_single.linear"),
        "adaln.b": lb("adaln_single.linear"),
        **({"res.in.w": lw("adaln_single.emb.resolution_embedder.linear_1"),
            "res.in.b": lb("adaln_single.emb.resolution_embedder.linear_1"),
            "res.out.w": lw("adaln_single.emb.resolution_embedder.linear_2"),
            "res.out.b": lb("adaln_single.emb.resolution_embedder.linear_2"),
            "ar.in.w": lw("adaln_single.emb.aspect_ratio_embedder.linear_1"),
            "ar.in.b": lb("adaln_single.emb.aspect_ratio_embedder.linear_1"),
            "ar.out.w": lw("adaln_single.emb.aspect_ratio_embedder.linear_2"),
            "ar.out.b": lb("adaln_single.emb.aspect_ratio_embedder.linear_2")}
           if cfg.use_additional_conditions else {}),
        "scale_shift_table": jnp.asarray(
            np.asarray(flat["scale_shift_table"]), _F32),
        "out.w": lw("proj_out"),
        "out.b": lb("proj_out"),
    }

    def blk(n):
        b = f"transformer_blocks.{n}"
        lp = {"scale_shift_table": jnp.asarray(
            np.asarray(flat[f"{b}.scale_shift_table"]), _F32)}
        for attn, short in (("attn1", "attn1"), ("attn2", "attn2")):
            for proj, s in (("to_q", "q"), ("to_k", "k"), ("to_v", "v")):
                lp[f"{short}.{s}.w"] = lw(f"{b}.{attn}.{proj}")
                lp[f"{short}.{s}.b"] = lb(f"{b}.{attn}.{proj}")
            lp[f"{short}.o.w"] = lw(f"{b}.{attn}.to_out.0")
            lp[f"{short}.o.b"] = lb(f"{b}.{attn}.to_out.0")
        lp["ff.in.w"] = lw(f"{b}.ff.net.0.proj")
        lp["ff.in.b"] = lb(f"{b}.ff.net.0.proj")
        lp["ff.out.w"] = lw(f"{b}.ff.net.2")
        lp["ff.out.b"] = lb(f"{b}.ff.net.2")
        return lp

    p["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[blk(n) for n in range(cfg.depth)])
    return p


def init_random_flat(cfg: PixArtConfig | None = None, seed: int = 0,
                     scale: float = 0.02) -> dict[str, np.ndarray]:
    """Random flat state dict in the real key layout (tests/demos)."""
    cfg = cfg or PixArtConfig()
    rng = np.random.default_rng(seed)
    flat = {}
    for name, shape in state_dict_spec(cfg).items():
        if name.endswith("scale_shift_table"):
            flat[name] = rng.standard_normal(shape).astype(np.float32) * scale
        elif name.endswith("bias"):
            flat[name] = np.zeros(shape, np.float32)
        else:
            flat[name] = rng.standard_normal(shape).astype(np.float32) * scale
    return flat


class PixArtTransformer:
    """PixArt-alpha denoiser (diffusers-checkpoint compatible)."""

    def __init__(self, config: PixArtConfig, params: dict):
        self.config = config
        self.params = params
        self._fwd = jax.jit(functools.partial(pixart_forward_fn, config))

    def __call__(self, latent, timestep, caption):
        return self._fwd(self.params, latent, jnp.asarray(timestep, _F32),
                         caption)

    @classmethod
    def from_state_dict(cls, flat: dict,
                        config: PixArtConfig | None = None) -> "PixArtTransformer":
        cfg = config or PixArtConfig()
        return cls(cfg, params_from_state_dict(flat, cfg))

    @classmethod
    def from_safetensors(cls, path,
                         config: PixArtConfig | None = None) -> "PixArtTransformer":
        """Load transformer/diffusion_pytorch_model.safetensors (diffusers
        layout) via the mmap parser; dims read from the sibling config.json
        when present (the 1024 model turns on the size conditioners)."""
        import json
        from pathlib import Path
        from ...llm.safetensors import SafeTensorsFile
        path = Path(path)
        base = path if path.is_dir() else path.parent
        if path.is_dir():
            cands = sorted(path.glob("*.safetensors"))
            if not cands:
                raise FileNotFoundError(f"no safetensors under {path}")
            path = cands[0]
        if config is None and (base / "config.json").exists():
            hf = json.loads((base / "config.json").read_text())
            heads = hf.get("num_attention_heads", 16)
            config = PixArtConfig(
                sample_size=hf.get("sample_size", 64),
                patch_size=hf.get("patch_size", 2),
                in_channels=hf.get("in_channels", 4),
                out_channels=hf.get("out_channels", 8),
                hidden_size=heads * hf.get("attention_head_dim", 72),
                depth=hf.get("num_layers", 28),
                num_heads=heads,
                caption_dim=hf.get("caption_channels", 4096),
                # diffusers PatchEmbed: base_size = sample_size // patch_size
                # (64 for the 1024 checkpoints; the dataclass default 32 is
                # the 512 model's and would scale the pos-embed grid 2x off)
                base_size=(hf.get("sample_size", 64)
                           // hf.get("patch_size", 2)),
                interpolation_scale=hf.get("interpolation_scale", 1.0) or 1.0,
                use_additional_conditions=bool(
                    hf.get("use_additional_conditions",
                           hf.get("sample_size", 64) == 128)),
            )
        st = SafeTensorsFile(str(path))
        flat = {k: st.tensor_numpy(k) for k in st.keys()}
        return cls.from_state_dict(flat, config)

    @classmethod
    def init_random(cls, config: PixArtConfig | None = None,
                    seed: int = 0) -> "PixArtTransformer":
        cfg = config or PixArtConfig()
        return cls.from_state_dict(init_random_flat(cfg, seed), cfg)
