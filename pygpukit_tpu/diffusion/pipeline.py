"""Text-to-image pipelines (reference: src/pygpukit/diffusion/pipeline.py:34
Text2ImagePipeline + models/flux/pipeline.py:26 FluxPipeline).

FluxPipeline: encode_prompt (CLIP pooled + T5 sequence) → flow-matching
Euler denoise over the FluxTransformer → VAE decode → image.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .models.flux import (
    FluxTransformer, make_img_ids, patchify, unpatchify,
)
from .models.vae import VAE, VAEConfig
from .schedulers import FlowMatchingScheduler


@dataclass
class PipelineOutput:
    images: np.ndarray          # uint8 [N, H, W, 3]
    latents: np.ndarray | None = None


def _f32_scoped(fn):
    """Run the whole entry under HIGHEST matmul precision for f32-weight
    models (ops/precision.py — JAX DEFAULT bf16-izes f32 dots on TPU;
    bf16 pipelines are untouched)."""
    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        from ..ops.precision import f32_matmul_context
        with f32_matmul_context(self.transformer.params):
            return fn(self, *args, **kwargs)
    return wrapper


class FluxPipeline:
    """reference: FluxPipeline, flux/pipeline.py:26-342."""

    def __init__(self, transformer: FluxTransformer, vae: VAE,
                 clip_encoder=None, t5_encoder=None,
                 clip_tokenizer=None, t5_tokenizer=None,
                 scheduler: FlowMatchingScheduler | None = None):
        self.transformer = transformer
        self.vae = vae
        self.clip = clip_encoder
        self.t5 = t5_encoder
        self.clip_tokenizer = clip_tokenizer
        self.t5_tokenizer = t5_tokenizer
        self.scheduler = scheduler or FlowMatchingScheduler(
            shift=1.0, use_dynamic_shifting=False)
        self._denoise_exes: dict = {}

    @classmethod
    def from_pretrained(cls, model_dir, dtype=jnp.bfloat16) -> "FluxPipeline":
        """Load transformer + vae + text encoders from a local checkpoint
        tree (reference: from_pretrained, flux/pipeline.py:77)."""
        from pathlib import Path
        from .text_encoders.clip import CLIPTextEncoder
        from .text_encoders.t5 import T5Encoder
        d = Path(model_dir)
        transformer = FluxTransformer.from_safetensors(
            d / "transformer", dtype=dtype)
        vae = VAE.from_safetensors(d / "vae")
        clip = (CLIPTextEncoder.from_safetensors(d / "text_encoder")
                if (d / "text_encoder").exists() else None)
        t5 = (T5Encoder.from_safetensors(d / "text_encoder_2")
              if (d / "text_encoder_2").exists() else None)
        return cls(transformer, vae, clip, t5)

    # -- prompt encoding -----------------------------------------------------

    def encode_prompt(self, prompt: str, max_t5_len: int = 256):
        """(reference: encode_prompt, flux/pipeline.py:146)."""
        cfg = self.transformer.config
        if self.clip is not None and self.clip_tokenizer is not None:
            ids = self.clip_tokenizer(prompt)
            _, pooled = self.clip(ids)
        else:
            pooled = jnp.zeros((cfg.pooled_dim,), jnp.float32)
        if self.t5 is not None and self.t5_tokenizer is not None:
            ids = self.t5_tokenizer(prompt)[:max_t5_len]
            txt = self.t5(ids)
        else:
            txt = jnp.zeros((max_t5_len, cfg.context_dim), jnp.float32)
        return txt, pooled

    # -- generation ----------------------------------------------------------

    @_f32_scoped
    def __call__(self, prompt: str = "", height: int = 256, width: int = 256,
                 num_inference_steps: int = 4, guidance_scale: float = 3.5,
                 seed: int = 0, txt_embeds=None, pooled=None) -> PipelineOutput:
        """Denoise loop (reference: __call__, flux/pipeline.py:265)."""
        cfg = self.transformer.config
        lat_c = self.vae.config.latent_channels
        lat_h, lat_w = height // 8, width // 8
        key = jax.random.PRNGKey(seed)
        latents = jax.random.normal(key, (lat_c, lat_h, lat_w), jnp.float32)

        if txt_embeds is None or pooled is None:
            txt_embeds, pooled = self.encode_prompt(prompt)
        t_txt = txt_embeds.shape[0]
        txt_ids = jnp.zeros((t_txt, 3), jnp.int32)
        img_ids = make_img_ids(lat_h // 2, lat_w // 2)

        self.scheduler.set_timesteps(num_inference_steps)
        img = patchify(latents)
        sigmas = jnp.asarray(self.scheduler.sigmas, jnp.float32)
        # the whole denoise loop is ONE executable (scan over sigma pairs) —
        # the diffusion analog of the device-side decode loop
        key_shape = (img.shape, txt_embeds.shape, num_inference_steps)
        if key_shape not in self._denoise_exes:
            from .models.flux import flux_forward_fn
            cfg = self.transformer.config

            def denoise(params, img, img_ids, txt, txt_ids, pooled,
                        guidance, sigmas):
                def step(img, sig_pair):
                    s_cur, s_next = sig_pair
                    v = flux_forward_fn(cfg, params, img, img_ids, txt,
                                        txt_ids, s_cur, pooled, guidance)
                    return img + (s_next - s_cur) * v, None
                pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)
                img, _ = lax.scan(step, img, pairs)
                return img

            self._denoise_exes[key_shape] = jax.jit(denoise)
        img = self._denoise_exes[key_shape](
            self.transformer.params, img, img_ids, txt_embeds, txt_ids,
            pooled, jnp.float32(guidance_scale), sigmas)
        latents = unpatchify(img, lat_c, lat_h, lat_w)
        images = self.vae.decode_to_images(latents[None])
        return PipelineOutput(images=images, latents=np.asarray(latents))

    generate = __call__

    # -- image-conditioned variants -------------------------------------------

    def _prep_image_latents(self, image: np.ndarray):
        """uint8 [H, W, 3] (or float in [0,1]) -> latents [Cz, H/8, W/8]."""
        x = np.asarray(image)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        x = x.astype(np.float32) * 2.0 - 1.0               # [-1, 1]
        x = jnp.asarray(x.transpose(2, 0, 1))[None]        # [1, 3, H, W]
        return self.vae.encode(x)[0]

    def img2img(self, image: np.ndarray, prompt: str = "",
                strength: float = 0.6, num_inference_steps: int = 4,
                guidance_scale: float = 3.5, seed: int = 0,
                txt_embeds=None, pooled=None,
                mask: np.ndarray | None = None) -> PipelineOutput:
        """Image-to-image (reference: flux img2img variant, pipeline.py:342):
        VAE-encode the init image, noise it to the flow-matching point chosen
        by ``strength`` (x_s = (1-s)*x0 + s*noise), and denoise the remaining
        schedule. With ``mask`` (H/8 x W/8 or H x W; 1 = repaint) this is
        inpainting: after every step the known region is re-imposed at the
        current noise level."""
        if not 0.0 < strength <= 1.0:
            raise ValueError(f"strength must be in (0, 1], got {strength}")
        cfg = self.transformer.config
        x0 = self._prep_image_latents(image)               # [Cz, h, w]
        lat_c, lat_h, lat_w = x0.shape
        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(key, x0.shape, jnp.float32)

        self.scheduler.set_timesteps(num_inference_steps)
        sigmas_full = np.asarray(self.scheduler.sigmas, np.float32)
        i0 = min(int(round(num_inference_steps * (1.0 - strength))),
                 num_inference_steps - 1)
        sigmas = jnp.asarray(sigmas_full[i0:])
        s0 = float(sigmas_full[i0])

        if txt_embeds is None or pooled is None:
            txt_embeds, pooled = self.encode_prompt(prompt)
        txt_ids = jnp.zeros((txt_embeds.shape[0], 3), jnp.int32)
        img_ids = make_img_ids(lat_h // 2, lat_w // 2)

        x0_tok = patchify(x0)
        noise_tok = patchify(noise)
        img = (1.0 - s0) * x0_tok + s0 * noise_tok
        if mask is not None:
            m = np.asarray(mask, np.float32)
            if m.shape != (lat_h, lat_w):   # pixel-space mask: max-pool to latent
                m = m.reshape(lat_h, m.shape[0] // lat_h,
                              lat_w, m.shape[1] // lat_w).max(axis=(1, 3))
            mask_tok = patchify(jnp.broadcast_to(
                jnp.asarray(m)[None], (lat_c, lat_h, lat_w)))
        else:
            mask_tok = None

        key_shape = ("i2i", img.shape, txt_embeds.shape, len(sigmas_full) - i0,
                     mask is not None)
        if key_shape not in self._denoise_exes:
            from .models.flux import flux_forward_fn
            tcfg = self.transformer.config

            def denoise(params, img, img_ids, txt, txt_ids, pooled, guidance,
                        sigmas, x0_tok, noise_tok, mask_tok):
                def step(img, sig_pair):
                    s_cur, s_next = sig_pair
                    v = flux_forward_fn(tcfg, params, img, img_ids, txt,
                                        txt_ids, s_cur, pooled, guidance)
                    img = img + (s_next - s_cur) * v
                    if mask_tok is not None:
                        known = (1.0 - s_next) * x0_tok + s_next * noise_tok
                        img = mask_tok * img + (1.0 - mask_tok) * known
                    return img, None
                pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)
                img, _ = lax.scan(step, img, pairs)
                return img

            self._denoise_exes[key_shape] = jax.jit(denoise)
        img = self._denoise_exes[key_shape](
            self.transformer.params, img, img_ids, txt_embeds, txt_ids,
            pooled, jnp.float32(guidance_scale), sigmas, x0_tok, noise_tok,
            mask_tok)
        latents = unpatchify(img, lat_c, lat_h, lat_w)
        images = self.vae.decode_to_images(latents[None])
        return PipelineOutput(images=images, latents=np.asarray(latents))

    def inpaint(self, image: np.ndarray, mask: np.ndarray, prompt: str = "",
                num_inference_steps: int = 4, guidance_scale: float = 3.5,
                seed: int = 0, strength: float = 1.0,
                txt_embeds=None, pooled=None) -> PipelineOutput:
        """Masked regeneration (mask: 1 = repaint, 0 = keep; pixel- or
        latent-resolution)."""
        return self.img2img(image, prompt=prompt, strength=strength,
                            num_inference_steps=num_inference_steps,
                            guidance_scale=guidance_scale, seed=seed,
                            txt_embeds=txt_embeds, pooled=pooled, mask=mask)


class Text2ImagePipeline(FluxPipeline):
    """Generic facade (reference: Text2ImagePipeline, pipeline.py:34) — the
    SD3/PixArt variants share the flow-matching loop; model family selected
    by the transformer passed in."""


class PixArtPipeline:
    """PixArt-alpha text-to-image: T5 captions -> ada_norm_single DiT ->
    DDIM epsilon sampling -> VAE decode (reference: Text2ImagePipeline's
    PixArt path, pipeline.py:34; models/dit/)."""

    def __init__(self, transformer, vae: VAE | None = None, t5_encoder=None,
                 t5_tokenizer=None, scheduler=None):
        from .schedulers import DDIMScheduler
        self.transformer = transformer
        self.vae = vae
        self.t5 = t5_encoder
        self.t5_tokenizer = t5_tokenizer
        self.scheduler = scheduler or DDIMScheduler()
        self._step_jit = None

    @classmethod
    def from_pretrained(cls, model_dir, config=None) -> "PixArtPipeline":
        """diffusers PixArt snapshot layout: transformer/, vae/,
        text_encoder/ (T5), tokenizer/."""
        from pathlib import Path
        from .models.pixart import PixArtTransformer
        from .text_encoders.t5 import T5Encoder
        d = Path(model_dir)
        transformer = PixArtTransformer.from_safetensors(
            d / "transformer", config)
        vae = VAE.from_safetensors(d / "vae") if (d / "vae").exists() else None
        t5 = (T5Encoder.from_safetensors(d / "text_encoder")
              if (d / "text_encoder").exists() else None)
        tok = None
        try:
            from transformers import AutoTokenizer
            if (d / "tokenizer").exists():
                tok = AutoTokenizer.from_pretrained(str(d / "tokenizer"))
        except Exception:
            pass
        return cls(transformer, vae, t5, tok)

    def encode_prompt(self, prompt: str, max_len: int = 120):
        if self.t5 is None:
            raise RuntimeError("no text encoder loaded")
        if self.t5_tokenizer is not None:
            ids = self.t5_tokenizer(prompt, max_length=max_len,
                                    truncation=True)["input_ids"]
        else:
            ids = [ord(c) % 1000 for c in prompt][:max_len]  # offline stub
        return self.t5(jnp.asarray(ids, jnp.int32))

    @_f32_scoped
    def generate(self, prompt: str = "", num_steps: int = 20,
                 guidance_scale: float = 4.5, seed: int = 0,
                 caption_embeds=None, negative_embeds=None):
        """-> latent [C, H, W] (and decoded image via .vae when present).
        ``caption_embeds`` bypasses the text encoder (pre-computed T5)."""
        cfg = self.transformer.config
        c = caption_embeds if caption_embeds is not None else (
            self.encode_prompt(prompt))
        if negative_embeds is not None:
            uc = negative_embeds
        elif self.t5 is not None:
            # diffusers encodes negative_prompt="" through T5 for the CFG
            # unconditional branch; all-zero embeds would deviate on real
            # checkpoints.
            uc = self.encode_prompt("")
        else:
            uc = jnp.zeros_like(c)
        self.scheduler.set_timesteps(num_steps)
        key = jax.random.PRNGKey(seed)
        lat = jax.random.normal(
            key, (cfg.in_channels, cfg.sample_size, cfg.sample_size),
            jnp.float32)
        for i, t in enumerate(self.scheduler.timesteps):
            eps_c = self.transformer(lat, float(t), c)[:cfg.in_channels]
            if guidance_scale != 1.0:
                eps_u = self.transformer(lat, float(t), uc)[:cfg.in_channels]
                eps = eps_u + guidance_scale * (eps_c - eps_u)
            else:
                eps = eps_c
            lat = jnp.asarray(self.scheduler.step(
                np.asarray(eps), i, np.asarray(lat)).prev_sample)
        if self.vae is not None:
            return self.vae.decode_to_images(lat[None])
        return lat


class SD3Pipeline:
    """Stable Diffusion 3 text-to-image: MMDiT + rectified-flow sampling
    (reference: the SD3 path of Text2ImagePipeline, pipeline.py:34)."""

    def __init__(self, transformer, vae: VAE | None = None,
                 t5_encoder=None, clip_encoders=None, scheduler=None):
        self.transformer = transformer
        self.vae = vae
        self.t5 = t5_encoder
        self.clips = clip_encoders or []
        self.clip_tokenizers: list = []
        self.t5_tokenizer = None
        self.scheduler = scheduler or FlowMatchingScheduler(
            shift=3.0, use_dynamic_shifting=False)

    @classmethod
    def from_pretrained(cls, model_dir, config=None) -> "SD3Pipeline":
        """diffusers SD3 snapshot layout: transformer/, vae/,
        text_encoder{,_2}/ (CLIP-L/G), text_encoder_3/ (T5),
        tokenizer{,_2,_3}/."""
        from pathlib import Path
        from .models.sd3 import SD3Transformer
        from .text_encoders.clip import CLIPTextEncoder
        from .text_encoders.t5 import T5Encoder
        d = Path(model_dir)
        transformer = SD3Transformer.from_safetensors(d / "transformer",
                                                      config)
        vae = VAE.from_safetensors(d / "vae") if (d / "vae").exists() else None
        clips = [CLIPTextEncoder.from_safetensors(d / n)
                 for n in ("text_encoder", "text_encoder_2")
                 if (d / n).exists()]
        t5 = (T5Encoder.from_safetensors(d / "text_encoder_3")
              if (d / "text_encoder_3").exists() else None)
        pipe = cls(transformer, vae, t5, clips)
        try:
            from transformers import AutoTokenizer
            pipe.clip_tokenizers = [
                AutoTokenizer.from_pretrained(str(d / n))
                for n in ("tokenizer", "tokenizer_2") if (d / n).exists()]
            if (d / "tokenizer_3").exists():
                pipe.t5_tokenizer = AutoTokenizer.from_pretrained(
                    str(d / "tokenizer_3"))
        except Exception as e:  # noqa: BLE001
            import warnings
            warnings.warn(f"SD3 tokenizers not loaded ({e!r}); "
                          "generate(prompt=...) needs pre-computed embeds",
                          stacklevel=2)
        return pipe

    def encode_prompt(self, prompt: str, max_t5_len: int = 256):
        """-> (context [77+T, ctx_dim], pooled [pooled_dim]): CLIP-L/G
        hiddens concatenated on features and zero-padded to the T5 width,
        stacked with the T5 sequence (the diffusers SD3 recipe)."""
        cfg = self.transformer.config
        if not self.clips or not self.clip_tokenizers:
            raise RuntimeError("text encoders/tokenizers not loaded; pass "
                               "caption_embeds/pooled_embeds instead")
        hiddens, pooleds = [], []
        for clip, tok in zip(self.clips, self.clip_tokenizers):
            ids = tok(prompt, padding="max_length", max_length=77,
                      truncation=True)["input_ids"]
            # diffusers SD3: penultimate hidden states condition the MMDiT;
            # pooled = projected final-layer EOS hidden
            try:
                h, pooled = clip(ids, penultimate=True)
            except TypeError:      # duck-typed test encoders
                h, pooled = clip(ids)
            hiddens.append(h)
            pooleds.append(pooled)
        clip_cat = jnp.concatenate(hiddens, axis=-1)
        clip_cat = jnp.pad(
            clip_cat, ((0, 0), (0, cfg.context_dim - clip_cat.shape[-1])))
        parts = [clip_cat]
        if self.t5 is not None and self.t5_tokenizer is not None:
            # pad to max_t5_len: ONE compiled shape per pipeline instead of
            # one per prompt length (compiles are minutes over the tunnel)
            t5_ids = self.t5_tokenizer(
                prompt, max_length=max_t5_len, truncation=True,
                padding="max_length")["input_ids"]
            parts.append(self.t5(jnp.asarray(t5_ids, jnp.int32)))
        context = jnp.concatenate(parts, axis=0)
        pooled = jnp.concatenate([jnp.ravel(p) for p in pooleds])
        return context, pooled

    @_f32_scoped
    def generate(self, caption_embeds=None, pooled_embeds=None,
                 num_steps: int = 28, guidance_scale: float = 7.0,
                 seed: int = 0, negative_embeds=None, negative_pooled=None,
                 prompt: str | None = None, negative_prompt: str = ""):
        """Prompt (via loaded encoders) or pre-computed context
        [Tc, ctx_dim] + pooled [pooled_dim] -> latent [C, H, W] (decoded via
        .vae when present)."""
        if caption_embeds is None:
            caption_embeds, pooled_embeds = self.encode_prompt(prompt or "")
            if guidance_scale != 1.0 and negative_embeds is None:
                negative_embeds, negative_pooled = self.encode_prompt(
                    negative_prompt)
        cfg = self.transformer.config
        c, pc = caption_embeds, pooled_embeds
        uc = (negative_embeds if negative_embeds is not None
              else jnp.zeros_like(c))
        upc = (negative_pooled if negative_pooled is not None
               else jnp.zeros_like(pc))
        self.scheduler.set_timesteps(num_steps)
        lat = jax.random.normal(
            jax.random.PRNGKey(seed),
            (cfg.in_channels, cfg.sample_size, cfg.sample_size), jnp.float32)
        for i in range(num_steps):
            t = float(self.scheduler.timesteps[i])   # sigma*1000 convention
            v_c = self.transformer(lat, t, c, pc)
            if guidance_scale != 1.0:
                v_u = self.transformer(lat, t, uc, upc)
                v = v_u + guidance_scale * (v_c - v_u)
            else:
                v = v_c
            lat = jnp.asarray(self.scheduler.step(
                np.asarray(v), i, np.asarray(lat)).prev_sample)
        if self.vae is not None:
            return self.vae.decode_to_images(lat[None])
        return lat
