"""Diffusion stack tests: schedulers, VAE, CLIP/T5 parity vs transformers,
DiT + Flux forward, end-to-end tiny pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

from pygpukit_tpu.diffusion.schedulers import (
    DDIMScheduler, EulerDiscreteScheduler, FlowMatchingScheduler,
)
from pygpukit_tpu.diffusion.models.dit import DiT, DiTConfig
from pygpukit_tpu.diffusion.models.flux import (
    FluxConfig, FluxTransformer, make_img_ids, patchify, unpatchify,
)
from pygpukit_tpu.diffusion.models.vae import VAE, VAEConfig


class TestSchedulers:
    def test_flow_matching_sigmas(self):
        s = FlowMatchingScheduler()
        s.set_timesteps(8)
        assert len(s.sigmas) == 9
        assert s.sigmas[0] == pytest.approx(1.0)
        assert s.sigmas[-1] == 0.0
        assert (np.diff(s.sigmas) < 0).all()

    def test_flow_matching_shift(self):
        a = FlowMatchingScheduler(shift=1.0)
        b = FlowMatchingScheduler(shift=3.0)
        a.set_timesteps(8)
        b.set_timesteps(8)
        assert not np.allclose(a.sigmas[1:-1], b.sigmas[1:-1])

    def test_flow_step_reaches_x0(self):
        # with a perfect velocity v = noise - x0, integrating to sigma=0
        # recovers x0 exactly
        s = FlowMatchingScheduler()
        s.set_timesteps(4)
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((4, 4)).astype(np.float32)
        noise = rng.standard_normal((4, 4)).astype(np.float32)
        x = noise.copy()
        v = noise - x0
        for i in range(4):
            x = np.asarray(s.step(v, i, x).prev_sample)
        np.testing.assert_allclose(x, x0, rtol=1e-4, atol=1e-5)

    def test_euler_and_ddim_run(self):
        for s in (EulerDiscreteScheduler(), DDIMScheduler()):
            s.set_timesteps(5)
            x = np.ones((2, 2), np.float32)
            eps = np.zeros_like(x)
            out = s.step(eps, 0, x).prev_sample
            assert np.isfinite(np.asarray(out)).all()


class TestVAE:
    def test_decode_shapes(self):
        cfg = VAEConfig(block_out_channels=(32, 32), layers_per_block=1,
                        norm_groups=8, latent_channels=4)
        vae = VAE.init_random(cfg)
        z = jnp.ones((1, 4, 8, 8))
        img = vae.decode(z)
        assert img.shape == (1, 3, 16, 16)  # one upsample (2 blocks)
        out = vae.decode_to_images(z)
        assert out.shape == (1, 16, 16, 3) and out.dtype == np.uint8


class TestCLIPParity:
    def test_matches_transformers(self, tmp_path):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from pygpukit_tpu.diffusion.text_encoders.clip import CLIPTextEncoder
        cfg = transformers.CLIPTextConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=16, eos_token_id=99)
        torch.manual_seed(0)
        m = transformers.CLIPTextModel(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        enc = CLIPTextEncoder.from_safetensors(tmp_path)
        ids = [5, 10, 20, 99]
        hidden, pooled = enc(ids)
        with torch.no_grad():
            out = m(torch.tensor([ids]))
        np.testing.assert_allclose(np.asarray(hidden),
                                   out.last_hidden_state[0].numpy(),
                                   rtol=3e-3, atol=3e-3)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output[0].numpy(),
                                   rtol=3e-3, atol=3e-3)

    def test_pooled_first_eos_with_eos_padding(self, tmp_path):
        """SD3's CLIP tokenizers pad with the EOS token: pooled must be read
        at the FIRST eos occurrence, not a later pad slot (ADVICE r2)."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from pygpukit_tpu.diffusion.text_encoders.clip import CLIPTextEncoder
        cfg = transformers.CLIPTextConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=16, eos_token_id=99)
        torch.manual_seed(1)
        m = transformers.CLIPTextModel(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        enc = CLIPTextEncoder.from_safetensors(tmp_path)
        # prompt tokens, then EOS, then EOS-padding to max length
        ids = [5, 10, 20, 99] + [99] * 12
        _, pooled = enc(ids)
        with torch.no_grad():
            out = m(torch.tensor([ids]))
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output[0].numpy(),
                                   rtol=3e-3, atol=3e-3)


class TestT5Parity:
    def test_matches_transformers(self, tmp_path):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from pygpukit_tpu.diffusion.text_encoders.t5 import T5Encoder
        cfg = transformers.T5Config(
            vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_heads=4, relative_attention_num_buckets=8,
            relative_attention_max_distance=20,
            feed_forward_proj="gated-gelu", decoder_start_token_id=0)
        torch.manual_seed(0)
        m = transformers.T5EncoderModel(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        enc = T5Encoder.from_safetensors(tmp_path)
        ids = [3, 17, 42, 9, 1]
        ours = np.asarray(enc(ids))
        with torch.no_grad():
            ref = m(torch.tensor([ids])).last_hidden_state[0].numpy()
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


class TestDiT:
    def test_forward_shapes(self):
        cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                        hidden_size=64, depth=2, num_heads=4)
        dit = DiT.init_random(cfg)
        tokens = jnp.ones((16, 16))          # 4x4 patches, 2*2*4 dims
        out = dit(tokens, 0.5)
        assert out.shape == (16, 16)

    def test_adaln_zero_identity_at_init(self):
        # gates are zero-init: output == final zero-linear of modulated input
        cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                        hidden_size=64, depth=2, num_heads=4)
        dit = DiT.init_random(cfg)
        out = np.asarray(dit(jnp.ones((16, 16)), 0.1))
        assert np.allclose(out, 0)           # final layer zero-init


class TestFlux:
    def test_patchify_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8, 8)),
                        jnp.float32)
        tokens = patchify(x)
        assert tokens.shape == (16, 16)
        back = unpatchify(tokens, 4, 8, 8)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    def test_forward_shapes(self):
        cfg = FluxConfig(in_channels=16, hidden_size=64, num_heads=4,
                         depth=2, depth_single=2, context_dim=32,
                         pooled_dim=24, axes_dim=(4, 6, 6),
                         guidance_embed=True)
        model = FluxTransformer.init_random(cfg)
        img = jnp.ones((16, 16))
        img_ids = make_img_ids(4, 4)
        txt = jnp.ones((8, 32))
        txt_ids = jnp.zeros((8, 3), jnp.int32)
        pooled = jnp.ones((24,))
        out = model(img, img_ids, txt, txt_ids, 0.5, pooled, 3.5)
        assert out.shape == (16, 16)
        assert np.isfinite(np.asarray(out)).all()


class TestPipeline:
    def test_end_to_end_tiny(self):
        from pygpukit_tpu.diffusion import FluxPipeline
        fcfg = FluxConfig(in_channels=16, hidden_size=64, num_heads=4,
                          depth=2, depth_single=2, context_dim=32,
                          pooled_dim=24, axes_dim=(4, 6, 6))
        vcfg = VAEConfig(block_out_channels=(16, 16), layers_per_block=1,
                         norm_groups=4, latent_channels=4)
        pipe = FluxPipeline(FluxTransformer.init_random(fcfg),
                            VAE.init_random(vcfg))
        out = pipe(height=32, width=32, num_inference_steps=2)
        # 32/8=4 latent; one upsample in tiny vae -> 8x8 image
        assert out.images.shape == (1, 8, 8, 3)
        assert out.images.dtype == np.uint8
        # determinism: same seed, same image
        out2 = pipe(height=32, width=32, num_inference_steps=2)
        np.testing.assert_array_equal(out.images, out2.images)


class TestImg2Img:
    def _pipe(self):
        from pygpukit_tpu.diffusion import FluxPipeline
        fcfg = FluxConfig(in_channels=16, hidden_size=64, num_heads=4,
                          depth=2, depth_single=2, context_dim=32,
                          pooled_dim=24, axes_dim=(4, 6, 6))
        vcfg = VAEConfig(block_out_channels=(16, 16), layers_per_block=1,
                         norm_groups=4, latent_channels=4)
        return FluxPipeline(FluxTransformer.init_random(fcfg),
                            VAE.init_random(vcfg))

    def test_img2img_runs_and_deterministic(self):
        pipe = self._pipe()
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        out = pipe.img2img(img, strength=0.5, num_inference_steps=4)
        assert out.images.shape == (1, 8, 8, 3)
        out2 = pipe.img2img(img, strength=0.5, num_inference_steps=4)
        np.testing.assert_array_equal(out.images, out2.images)
        # higher strength diverges further from the init image
        far = pipe.img2img(img, strength=1.0, num_inference_steps=4)
        assert not np.array_equal(out.images, far.images)

    def test_strength_validated(self):
        pipe = self._pipe()
        img = np.zeros((8, 8, 3), np.uint8)
        import pytest as _pytest
        with _pytest.raises(ValueError):
            pipe.img2img(img, strength=0.0)
        with _pytest.raises(ValueError):
            pipe.img2img(img, strength=1.5)

    def test_inpaint_preserves_unmasked_latents(self):
        pipe = self._pipe()
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        x0 = np.asarray(pipe._prep_image_latents(img))      # [4, 4, 4]
        mask = np.zeros((4, 4), np.float32)
        mask[:, 2:] = 1.0                                    # repaint right half
        out = pipe.inpaint(img, mask, num_inference_steps=3)
        keep = out.latents[:, :, :2]
        np.testing.assert_allclose(keep, x0[:, :, :2], rtol=0, atol=1e-5)
        # repainted half actually changed
        assert np.abs(out.latents[:, :, 2:] - x0[:, :, 2:]).max() > 1e-3

    def test_pixel_space_mask_pooled(self):
        pipe = self._pipe()
        img = np.zeros((8, 8, 3), np.uint8)
        mask = np.zeros((8, 8), np.float32)
        mask[0, 4] = 1.0   # one pixel -> whole latent cell repainted
        out = pipe.inpaint(img, mask, num_inference_steps=2)
        assert out.images.shape == (1, 8, 8, 3)
