"""SD3 MMDiT: diffusers-layout checkpoint mapping + torch transcription
parity (diffusion/models/sd3.py; reference: the SD3 path of
src/pygpukit/diffusion/pipeline.py:34)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pygpukit_tpu.diffusion.models.sd3 import (
    SD3Config, SD3Transformer, init_random_flat, params_from_state_dict,
    state_dict_spec,
)

torch = pytest.importorskip("torch")

TINY = SD3Config(sample_size=8, patch_size=2, in_channels=4, out_channels=4,
                 hidden_size=32, depth=3, num_heads=4, context_dim=16,
                 pooled_dim=12, pos_embed_max_size=8)


class TestSpec:
    def test_spec_loader_roundtrip(self):
        flat = init_random_flat(TINY, seed=0)
        assert len(flat) == len(state_dict_spec(TINY))
        p = params_from_state_dict(flat, TINY)
        assert len(p["blocks"]) == 3
        assert "ao.w" in p["blocks"][0] and "ao.w" not in p["blocks"][2]

    def test_real_dims(self):
        spec = state_dict_spec(SD3Config())
        assert spec["context_embedder.weight"] == (1536, 4096)
        assert spec["pos_embed.pos_embed"] == (1, 192 * 192, 1536)
        assert spec["transformer_blocks.23.norm1_context.linear.weight"] == (
            2 * 1536, 1536)   # last block: AdaLayerNormContinuous
        assert spec["transformer_blocks.0.norm1_context.linear.weight"] == (
            6 * 1536, 1536)

    def test_qk_norm_variant(self):
        cfg = SD3Config(sample_size=8, patch_size=2, in_channels=4,
                        out_channels=4, hidden_size=32, depth=2, num_heads=4,
                        context_dim=16, pooled_dim=12, pos_embed_max_size=8,
                        qk_norm=True)
        flat = init_random_flat(cfg, seed=0)
        assert "transformer_blocks.0.attn.norm_q.weight" in flat
        m = SD3Transformer.from_state_dict(flat, cfg)
        out = m(jnp.zeros((4, 8, 8)), 500.0, jnp.zeros((5, 16)),
                jnp.zeros(12))
        assert out.shape == (4, 8, 8)


class TestForward:
    def test_forward_shapes(self):
        m = SD3Transformer.init_random(TINY, seed=0)
        rng = np.random.default_rng(0)
        out = m(jnp.asarray(rng.standard_normal((4, 8, 8)).astype(np.float32)),
                300.0,
                jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32)),
                jnp.asarray(rng.standard_normal(12).astype(np.float32)))
        assert out.shape == (4, 8, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_joint_block_parity_vs_torch(self):
        """One non-last MMDiT joint block transcribed in torch from the
        diffusers JointTransformerBlock semantics."""
        rng = np.random.default_rng(7)
        cfg = TINY
        flat = init_random_flat(cfg, seed=7)
        for k in flat:
            if k.endswith("bias"):
                flat[k] = rng.standard_normal(flat[k].shape).astype(
                    np.float32) * 0.05
        p = params_from_state_dict(flat, cfg)
        hid, heads = cfg.hidden_size, cfg.num_heads
        d = hid // heads
        x = rng.standard_normal((10, hid)).astype(np.float32)
        ctx = rng.standard_normal((5, hid)).astype(np.float32)
        temb = rng.standard_normal((hid,)).astype(np.float32)

        # ---- JAX block 0 (mirrors sd3_forward_fn body)
        from pygpukit_tpu.diffusion.models.sd3 import _gelu_tanh, _ln
        lp = p["blocks"][0]
        mod = jnp.dot(jnp.asarray(temb), lp["mod.w"]) + lp["mod.b"]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6)
        cmod = jnp.dot(jnp.asarray(temb), lp["cmod.w"]) + lp["cmod.b"]
        csh1, csc1, cg1, csh2, csc2, cg2 = jnp.split(cmod, 6)
        xj, cj = jnp.asarray(x), jnp.asarray(ctx)
        xh = _ln(xj) * (1 + sc1) + sh1
        ch = _ln(cj) * (1 + csc1) + csh1

        def proj(src, name):
            return (jnp.dot(src, lp[f"{name}.w"]) + lp[f"{name}.b"]).reshape(
                -1, heads, d)
        import math as _m
        q = jnp.concatenate([proj(ch, "aq"), proj(xh, "q")], 0).transpose(1, 0, 2)
        k = jnp.concatenate([proj(ch, "ak"), proj(xh, "k")], 0).transpose(1, 0, 2)
        v = jnp.concatenate([proj(ch, "av"), proj(xh, "v")], 0).transpose(1, 0, 2)
        sc_ = jnp.einsum("hqd,hkd->hqk", q, k) / _m.sqrt(d)
        o = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(sc_, -1), v)
        o = o.transpose(1, 0, 2).reshape(-1, hid)
        ctx_o, img_o = o[:5], o[5:]
        img_o = jnp.dot(img_o, lp["o.w"]) + lp["o.b"]
        ctx_o = jnp.dot(ctx_o, lp["ao.w"]) + lp["ao.b"]
        xj = xj + g1 * img_o
        h = _ln(xj) * (1 + sc2) + sh2
        xj = xj + g2 * (jnp.dot(_gelu_tanh(jnp.dot(h, lp["ff.in.w"])
                                           + lp["ff.in.b"]),
                                lp["ff.out.w"]) + lp["ff.out.b"])
        cj = cj + cg1 * ctx_o
        hc = _ln(cj) * (1 + csc2) + csh2
        cj = cj + cg2 * (jnp.dot(_gelu_tanh(jnp.dot(hc, lp["cff.in.w"])
                                            + lp["cff.in.b"]),
                                 lp["cff.out.w"]) + lp["cff.out.b"])
        got_x, got_c = np.asarray(xj), np.asarray(cj)

        # ---- torch transcription with the raw checkpoint tensors
        def T(name):
            return torch.tensor(flat[f"transformer_blocks.0.{name}"])

        def tlin(src, name):
            return torch.nn.functional.linear(src, T(f"{name}.weight"),
                                              T(f"{name}.bias"))
        ln = torch.nn.LayerNorm(hid, eps=1e-6, elementwise_affine=False)
        xt, ct = torch.tensor(x), torch.tensor(ctx)
        tt = torch.tensor(temb)
        m6 = tlin(tt, "norm1.linear").chunk(6)
        c6 = tlin(tt, "norm1_context.linear").chunk(6)
        xh_t = ln(xt) * (1 + m6[1]) + m6[0]
        ch_t = ln(ct) * (1 + c6[1]) + c6[0]

        def tproj(src, name):
            return tlin(src, f"attn.{name}").reshape(-1, heads, d).transpose(0, 1)
        qt = torch.cat([tproj(ch_t, "add_q_proj"), tproj(xh_t, "to_q")], 1)
        kt = torch.cat([tproj(ch_t, "add_k_proj"), tproj(xh_t, "to_k")], 1)
        vt = torch.cat([tproj(ch_t, "add_v_proj"), tproj(xh_t, "to_v")], 1)
        ot = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt)
        ot = ot.transpose(0, 1).reshape(-1, hid)
        ctx_ot, img_ot = ot[:5], ot[5:]
        img_ot = tlin(img_ot, "attn.to_out.0")
        ctx_ot = tlin(ctx_ot, "attn.to_add_out")
        xt = xt + m6[2] * img_ot
        h_t = ln(xt) * (1 + m6[4]) + m6[3]
        xt = xt + m6[5] * tlin(torch.nn.functional.gelu(
            tlin(h_t, "ff.net.0.proj"), approximate="tanh"), "ff.net.2")
        ct = ct + c6[2] * ctx_ot
        hc_t = ln(ct) * (1 + c6[4]) + c6[3]
        ct = ct + c6[5] * tlin(torch.nn.functional.gelu(
            tlin(hc_t, "ff_context.net.0.proj"), approximate="tanh"),
            "ff_context.net.2")
        np.testing.assert_allclose(got_x, xt.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(got_c, ct.numpy(), rtol=1e-3, atol=1e-4)


class TestQKNormStreams:
    def test_per_stream_qk_norms_loaded_and_distinct(self):
        """SD3.5 norm_q applies to the image stream, norm_added_q to the
        context stream — scaling ONLY norm_added must change the output
        while all-ones weights reproduce the unnormed-identity structure."""
        cfg = SD3Config(sample_size=8, patch_size=2, in_channels=4,
                        out_channels=4, hidden_size=32, depth=1, num_heads=4,
                        context_dim=16, pooled_dim=12, pos_embed_max_size=8,
                        qk_norm=True)
        rng = np.random.default_rng(0)
        flat = init_random_flat(cfg, seed=0)
        lat = jnp.asarray(rng.standard_normal((4, 8, 8)).astype(np.float32))
        ctxe = jnp.asarray(rng.standard_normal((5, 16)).astype(np.float32))
        pooled = jnp.asarray(rng.standard_normal(12).astype(np.float32))
        base = np.asarray(SD3Transformer.from_state_dict(flat, cfg)(
            lat, 100.0, ctxe, pooled))
        flat2 = dict(flat)
        # norm_added_K: context keys shape the image queries' attention even
        # in the last block (norm_added_q only affects the discarded context
        # output there)
        flat2["transformer_blocks.0.attn.norm_added_k.weight"] = (
            flat["transformer_blocks.0.attn.norm_added_k.weight"] * 3.0)
        changed = np.asarray(SD3Transformer.from_state_dict(flat2, cfg)(
            lat, 100.0, ctxe, pooled))
        assert not np.allclose(base, changed)


class TestPromptEncoding:
    def test_encode_prompt_shapes(self):
        """CLIP-L/G + T5 prompt encoding per the diffusers SD3 recipe (stub
        tokenizers; real CLIP/T5 encoders at tiny configs)."""
        from pygpukit_tpu.diffusion import SD3Pipeline
        cfg = SD3Config(sample_size=8, patch_size=2, in_channels=4,
                        out_channels=4, hidden_size=32, depth=1, num_heads=4,
                        context_dim=64, pooled_dim=48, pos_embed_max_size=8)
        m = SD3Transformer.init_random(cfg, seed=0)
        rng = np.random.default_rng(0)

        def stub_clip(dim):
            def enc(ids):
                h = jnp.asarray(rng.standard_normal(
                    (len(ids), dim)).astype(np.float32))
                return h, h[-1]
            return enc

        pipe = SD3Pipeline(m, clip_encoders=[stub_clip(16), stub_clip(32)])
        pipe.clip_tokenizers = [
            lambda p, **kw: {"input_ids": [1, 2, 3] + [0] * 74},
            lambda p, **kw: {"input_ids": [1, 2, 3] + [0] * 74},
        ]
        ctxe, pooled = pipe.encode_prompt("hello")
        assert ctxe.shape == (77, 64)       # 16+32 padded to context_dim
        assert pooled.shape == (48,)        # 16+32 pooled
        lat = pipe.generate(prompt="hello", num_steps=2, guidance_scale=1.0)
        assert np.asarray(lat).shape == (4, 8, 8)
