"""Fused whole-model Pallas decode kernel — interpret-mode parity vs the XLA
decode path (kernels/fused_decode.py; reference analog: the CUDA GEMV decode
path, native/ops/matmul/gemv/)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import (
    CausalTransformerModel, decode_step_fn, fused_decode_eligible,
    fused_decode_step_fn, init_params, prefill_fn,
    prepare_fused_decode_params,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = TransformerConfig(
        vocab_size=128, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=512, max_position_embeddings=128)
    params = init_params(cfg, seed=3, dtype=jnp.bfloat16)
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
    return cfg, prepare_fused_decode_params(cfg, model.params)


class TestEligibility:
    def test_tiny_config_eligible(self, tiny):
        cfg, params = tiny
        assert fused_decode_eligible(cfg, params, 128)

    def test_moe_and_layernorm_rejected(self, tiny):
        cfg, params = tiny
        import dataclasses
        assert not fused_decode_eligible(
            dataclasses.replace(cfg, norm_type="layernorm"), params, 128)
        assert not fused_decode_eligible(cfg, params, 4096)  # VMEM cache cap

    def test_quantized_leaves_rejected(self, tiny):
        cfg, params = tiny
        p2 = dict(params)
        p2["layers"] = dict(params["layers"])
        p2["layers"]["w_q"] = {"q": params["layers"]["w_q"],
                               "scale": jnp.float32(1.0)}
        assert not fused_decode_eligible(cfg, p2, 128)


class TestParity:
    def test_decode_matches_xla_path(self, tiny):
        cfg, params = tiny
        max_seq = 128
        shape = (cfg.num_layers, max_seq, cfg.num_kv_heads, cfg.head_dim)
        kc = jnp.zeros(shape, jnp.bfloat16)
        vc = jnp.zeros(shape, jnp.bfloat16)

        # prefill 5 tokens through the XLA path so the cache is non-trivial
        prompt = jnp.asarray([3, 17, 42, 7, 99], jnp.int32)
        padded = jnp.zeros((8,), jnp.int32).at[:5].set(prompt)
        kc, vc, logits_p = jax.jit(functools.partial(prefill_fn, cfg))(
            params, kc, vc, padded, jnp.int32(5))

        tok = jnp.int32(int(jnp.argmax(logits_p)))
        pos = jnp.int32(5)

        kc_x, vc_x, logits_x = jax.jit(
            functools.partial(decode_step_fn, cfg))(params, kc, vc, tok, pos)
        kc_f, vc_f, logits_f = jax.jit(functools.partial(
            fused_decode_step_fn, cfg, interpret=True))(
            params, kc, vc, tok, pos)

        lx = np.asarray(logits_x, np.float32)
        lf = np.asarray(logits_f, np.float32)
        assert np.argmax(lx) == np.argmax(lf)
        np.testing.assert_allclose(lf, lx, rtol=0.05, atol=0.05)

        # the cache rows written at pos must agree (bf16 exact-ish)
        np.testing.assert_allclose(
            np.asarray(kc_f[:, 5], np.float32), np.asarray(kc_x[:, 5], np.float32),
            rtol=0.05, atol=0.02)
        np.testing.assert_allclose(
            np.asarray(vc_f[:, 5], np.float32), np.asarray(vc_x[:, 5], np.float32),
            rtol=0.05, atol=0.02)
        # untouched rows identical
        np.testing.assert_array_equal(
            np.asarray(kc_f[:, :5], np.float32), np.asarray(kc_x[:, :5], np.float32))

    def test_multi_step_greedy_match(self, tiny):
        """Three chained fused steps produce the same greedy tokens as XLA."""
        cfg, params = tiny
        max_seq = 128
        shape = (cfg.num_layers, max_seq, cfg.num_kv_heads, cfg.head_dim)
        kc = jnp.zeros(shape, jnp.bfloat16)
        vc = jnp.zeros(shape, jnp.bfloat16)
        prompt = jnp.asarray([5, 9, 23], jnp.int32)
        padded = jnp.zeros((4,), jnp.int32).at[:3].set(prompt)
        kc, vc, logits = jax.jit(functools.partial(prefill_fn, cfg))(
            params, kc, vc, padded, jnp.int32(3))

        xla_step = jax.jit(functools.partial(decode_step_fn, cfg))
        fus_step = jax.jit(functools.partial(
            fused_decode_step_fn, cfg, interpret=True))

        toks_x, toks_f = [], []
        kcx, vcx, kcf, vcf = kc, vc, kc, vc
        tx = tf = jnp.int32(int(jnp.argmax(logits)))
        for i in range(3):
            pos = jnp.int32(3 + i)
            kcx, vcx, lx = xla_step(params, kcx, vcx, tx, pos)
            kcf, vcf, lf = fus_step(params, kcf, vcf, tf, pos)
            tx = jnp.int32(int(jnp.argmax(lx)))
            tf = jnp.int32(int(jnp.argmax(lf)))
            toks_x.append(int(tx))
            toks_f.append(int(tf))
        assert toks_x == toks_f
