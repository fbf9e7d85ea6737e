"""Quantized (fp8) KV cache: clamped writes, dequantised attention reads,
model/serving/loader plumbing.

Reference surface: kv_cache_quant_algo (src/pygpukit/llm/quant.py:76) and
the FA3 fp8-KV kernel family
(native/ops/nn/attention/flash_attention_3_fp8_sm120.cuh). TPU design:
storage-dtype cache arrays (ops/embedding.to_kv_dtype clamps at write,
ops.nn.attention._kv_load dequantises at read) — every decode/serving/paged
path inherits it from the cache array's dtype.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pygpukit_tpu.llm import CausalTransformerModel, TransformerConfig, init_params
from pygpukit_tpu.llm.model import resolve_kv_dtype
from pygpukit_tpu.ops.embedding import to_kv_dtype, kv_compute_dtype
from pygpukit_tpu.ops.nn.attention import (
    _sdpa_fixed_cache_full,
    sdpa_fixed_cache_chunked_fn,
)

E4M3 = jnp.float8_e4m3fn


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))


class TestKVDtypeHelpers:
    def test_clamped_write_no_nan(self):
        x = jnp.array([0.5, 447.0, 1000.0, -1000.0], jnp.float32)
        y = np.asarray(to_kv_dtype(x, E4M3).astype(jnp.float32))
        assert not np.any(np.isnan(y))
        assert y[2] == 448.0 and y[3] == -448.0

    def test_bf16_passthrough(self):
        x = jnp.ones((4,), jnp.float32)
        assert to_kv_dtype(x, jnp.bfloat16).dtype == jnp.bfloat16

    def test_compute_dtype(self):
        assert kv_compute_dtype(E4M3) == jnp.bfloat16
        assert kv_compute_dtype(jnp.bfloat16) == jnp.bfloat16

    def test_resolve(self):
        assert resolve_kv_dtype(None, jnp.bfloat16) == jnp.bfloat16
        assert resolve_kv_dtype("fp8", jnp.bfloat16) == E4M3
        assert resolve_kv_dtype("fp8_e5m2", jnp.bfloat16) == jnp.float8_e5m2
        with pytest.raises(ValueError):
            resolve_kv_dtype("int7", jnp.bfloat16)

    def test_resolve_env(self, monkeypatch):
        monkeypatch.setenv("PYGPUKIT_KV_DTYPE", "fp8_e4m3")
        assert resolve_kv_dtype(None, jnp.bfloat16) == E4M3


class TestFP8Attention:
    """fp8-cache decode attention vs the bf16-cache reference."""

    def _setup(self, max_len=64, ctx=50, t=1, hq=8, hk=2, d=32):
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (t, hq, d), jnp.float32).astype(jnp.bfloat16)
        kc = jax.random.normal(kk, (max_len, hk, d), jnp.float32)
        vc = jax.random.normal(kv, (max_len, hk, d), jnp.float32)
        return (q, kc.astype(jnp.bfloat16), vc.astype(jnp.bfloat16),
                to_kv_dtype(kc, E4M3), to_kv_dtype(vc, E4M3))

    def test_full_path_close(self):
        q, kc, vc, kc8, vc8 = self._setup()
        ref = jax.jit(_sdpa_fixed_cache_full)(q, kc, vc, jnp.int32(50))
        out = jax.jit(_sdpa_fixed_cache_full)(q, kc8, vc8, jnp.int32(50))
        assert out.dtype == q.dtype
        assert _rel(out, ref) < 0.06, _rel(out, ref)

    def test_chunked_matches_full_fp8(self):
        q, _, _, kc8, vc8 = self._setup(max_len=128, ctx=100)
        full = jax.jit(_sdpa_fixed_cache_full)(q, kc8, vc8, jnp.int32(100))
        chunked = jax.jit(
            lambda *a: sdpa_fixed_cache_chunked_fn(*a, chunk=32))(
                q, kc8, vc8, jnp.int32(100))
        # both outputs round to bf16; online- vs full-softmax order noise
        assert _rel(chunked, full) < 5e-3, _rel(chunked, full)


@pytest.fixture(scope="module")
def cfg():
    return TransformerConfig(
        vocab_size=97, hidden_size=48, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=96, head_dim_override=12,
        max_position_embeddings=256, tie_word_embeddings=True,
        use_qk_norm=True, norm_type="rmsnorm")


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(cfg, 5, jnp.float32)


class TestFP8KVModel:
    def test_generate_close_to_bf16_cache(self, cfg, params):
        prompt = [5, 11, 42, 7, 3, 19]
        ref = CausalTransformerModel(cfg, params, dtype=jnp.float32)
        ref.init_fixed_cache(128)
        ref_logits = np.asarray(ref.prefill(prompt), np.float32)
        ref_tok = ref.generate(prompt, max_new_tokens=8, temperature=0.0)

        m8 = CausalTransformerModel(cfg, params, dtype=jnp.float32,
                                    kv_dtype="fp8")
        m8.init_fixed_cache(128)
        assert m8.k_cache.dtype == E4M3
        logits8 = np.asarray(m8.prefill(prompt), np.float32)
        # prefill attention runs on fresh (unquantized) K/V: logits match
        # the reference run up to cache-write side effects
        assert _rel(logits8, ref_logits) < 1e-5
        toks8 = m8.generate(prompt, max_new_tokens=8, temperature=0.0)
        assert len(toks8) == 8
        assert all(np.isfinite(t) for t in toks8)
        # decode reads the quantized cache: logits drift but stay close —
        # same argmax for the first step on this model
        step8 = np.asarray(m8.decode_step(int(toks8[-1])), np.float32)
        assert np.all(np.isfinite(step8))
        # tokens usually identical on tiny models; require high agreement
        agree = sum(int(a == b) for a, b in zip(toks8, ref_tok))
        assert agree >= 6, (toks8, ref_tok)

    def test_snapshot_restore_fp8(self, cfg, params):
        m8 = CausalTransformerModel(cfg, params, dtype=jnp.float32,
                                    kv_dtype="fp8")
        m8.init_fixed_cache(64)
        m8.prefill([5, 11, 42])
        snap = m8.snapshot_kv_cache()
        t1 = m8.generate_from_state(8) if hasattr(m8, "generate_from_state") \
            else None
        m8.restore_kv_cache(snap)
        assert m8.k_cache.dtype == E4M3
        assert m8.pos == 3


class TestFP8Serving:
    def _model(self, kv_dtype=None):
        c = TransformerConfig(
            vocab_size=97, hidden_size=48, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=96, head_dim_override=12,
            max_position_embeddings=256, tie_word_embeddings=True)
        return CausalTransformerModel(c, init_params(c, 5, jnp.float32),
                                      dtype=jnp.float32, kv_dtype=kv_dtype)

    def test_engine_fp8_pools(self):
        from pygpukit_tpu.llm.serving import ContinuousBatchingEngine
        m = self._model("fp8")
        eng = ContinuousBatchingEngine(m, max_batch=2, max_seq_len=64)
        assert eng.k_cache.dtype == E4M3
        r = eng.submit([5, 11, 42], max_new_tokens=6)
        eng.run_until_complete()
        assert r.done and len(r.generated) == 6
        ref = self._model(None)
        eng_ref = ContinuousBatchingEngine(ref, max_batch=2, max_seq_len=64)
        rr = eng_ref.submit([5, 11, 42], max_new_tokens=6)
        eng_ref.run_until_complete()
        agree = sum(int(a == b) for a, b in zip(r.generated, rr.generated))
        assert agree >= 4, (r.generated, rr.generated)

    def test_engine_fp8_paged(self):
        from pygpukit_tpu.llm.serving import ContinuousBatchingEngine
        m = self._model("fp8")
        eng = ContinuousBatchingEngine(m, max_batch=2, max_seq_len=64,
                                       paged=True, block_size=16)
        assert eng.k_cache.dtype == E4M3
        r = eng.submit([5, 11, 42], max_new_tokens=6)
        eng.run_until_complete()
        assert r.done and len(r.generated) == 6


class TestLoaderKVDtype:
    def test_kv_cache_quant_algo(self, tmp_path):
        import torch
        import transformers
        from pygpukit_tpu.llm.loader import load_model_from_safetensors
        tc = transformers.LlamaConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            tie_word_embeddings=False)
        torch.manual_seed(3)
        hm = transformers.LlamaForCausalLM(tc).eval()
        hm.save_pretrained(tmp_path, safe_serialization=True)
        cj = json.loads((tmp_path / "config.json").read_text())
        cj["quantization_config"] = {"quant_method": "modelopt",
                                     "kv_cache_quant_algo": "FP8"}
        (tmp_path / "config.json").write_text(json.dumps(cj))
        model = load_model_from_safetensors(tmp_path)
        assert model.kv_dtype == E4M3
        model.init_fixed_cache(64)
        assert model.k_cache.dtype == E4M3
        out = model.generate([1, 2, 3], max_new_tokens=4)
        assert len(out) == 4

    def test_quant_config_mapping(self):
        from pygpukit_tpu.llm.quant import kv_dtype_from_quant_config
        assert kv_dtype_from_quant_config(None) is None
        assert kv_dtype_from_quant_config({}) is None
        assert kv_dtype_from_quant_config(
            {"kv_cache_quant_algo": "FP8"}) == "fp8_e4m3"
        assert kv_dtype_from_quant_config(
            {"kv_cache_quant_algo": "fp8_e5m2"}) == "fp8_e5m2"
        # ModelOpt INT8 maps to the per-row-scaled int8 dict cache
        assert kv_dtype_from_quant_config(
            {"kv_cache_quant_algo": "INT8"}) == "int8"
        with pytest.warns(UserWarning):
            # unsupported algo falls back to the dense cache (the load
            # must not fail over an optimisation hint)
            assert kv_dtype_from_quant_config(
                {"kv_cache_quant_algo": "nvfp4"}) is None
