"""Quantized-model inference tests (fp8/int8 weight-only)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import CausalTransformerModel, init_params
from pygpukit_tpu.llm.quant import (
    dequantize_weight, model_quant_bytes, quantize_model_params,
    quantize_weight,
)


@pytest.fixture(scope="module")
def cfg():
    return TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, head_dim_override=8,
        norm_type="rmsnorm", activation="silu", use_rope=True,
        max_position_embeddings=64, tie_word_embeddings=True)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32), dtype=np.float32))
    for mode, tol in [("fp8", 0.07), ("int8", 0.01), ("int4", 0.2)]:
        wq = quantize_weight(w, mode)
        deq = np.asarray(dequantize_weight(wq, jnp.float32))
        rel = np.abs(deq - np.asarray(w)).max() / np.abs(w).max()
        assert rel < tol, f"{mode}: {rel}"


def test_fp8_model_logits_close(cfg):
    params = init_params(cfg, seed=5, dtype=jnp.float32)
    model = CausalTransformerModel(cfg, params, dtype=jnp.float32)
    ids = [3, 9, 27]
    ref = model.get_logits(ids)

    qparams = quantize_model_params(dict(model.params), "fp8")
    qmodel = CausalTransformerModel(cfg, qparams, dtype=jnp.float32)
    got = qmodel.get_logits(ids)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1, f"fp8 logits rel err {rel}"

    qb, db = model_quant_bytes(qparams)
    assert qb < db  # weights actually smaller


def test_fp8_generate_runs(cfg):
    params = init_params(cfg, seed=5, dtype=jnp.float32)
    qparams = quantize_model_params(params, "fp8")
    qmodel = CausalTransformerModel(cfg, qparams, dtype=jnp.float32)
    out = qmodel.generate([1, 2, 3], max_new_tokens=5, temperature=0.0)
    assert len(out) == 5
    # decode must stay deterministic
    qmodel2 = CausalTransformerModel(
        cfg, quantize_model_params(init_params(cfg, seed=5, dtype=jnp.float32),
                                   "fp8"), dtype=jnp.float32)
    assert qmodel2.generate([1, 2, 3], max_new_tokens=5, temperature=0.0) == out


@pytest.fixture(scope="module")
def moe_cfg():
    return TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, head_dim_override=8,
        norm_type="rmsnorm", activation="silu", use_rope=True,
        max_position_embeddings=64, tie_word_embeddings=True,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48)


@pytest.mark.parametrize("mode,tol", [("fp8", 0.1), ("int8", 0.02)])
def test_quantized_moe_experts_logits_close(moe_cfg, mode, tol):
    """Expert stacks quantized to {"q","scale"} run through the same routed
    forward (ops.moe._expert_dot scale-after-dot) and stay close to dense."""
    params = init_params(moe_cfg, seed=7, dtype=jnp.float32)
    model = CausalTransformerModel(moe_cfg, params, dtype=jnp.float32)
    ids = [3, 9, 27, 1]
    ref = model.get_logits(ids)

    qparams = quantize_model_params(dict(model.params), mode)
    assert isinstance(qparams["layers"]["w_experts_gate"], dict)
    qmodel = CausalTransformerModel(moe_cfg, qparams, dtype=jnp.float32)
    got = qmodel.get_logits(ids)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < tol, f"{mode} MoE logits rel err {rel}"

    qb, db = model_quant_bytes(qparams)
    assert qb < db


def test_quantized_moe_generate_deterministic(moe_cfg):
    params = init_params(moe_cfg, seed=8, dtype=jnp.float32)
    qparams = quantize_model_params(params, "int8")
    qmodel = CausalTransformerModel(moe_cfg, qparams, dtype=jnp.float32)
    out = qmodel.generate([1, 2, 3], max_new_tokens=5, temperature=0.0)
    assert len(out) == 5
    assert qmodel.generate([1, 2, 3], max_new_tokens=5,
                           temperature=0.0) == out


def test_int4_skips_moe_experts(moe_cfg):
    """int4 packing targets the decode GEMV; expert stacks must stay dense."""
    params = init_params(moe_cfg, seed=9, dtype=jnp.float32)
    qparams = quantize_model_params(params, "int4")
    assert not isinstance(qparams["layers"]["w_experts_gate"], dict)
    assert isinstance(qparams["layers"]["w_o"], dict)  # attn still quantized


def test_int8_model_runs(cfg):
    params = init_params(cfg, seed=6, dtype=jnp.float32)
    qparams = quantize_model_params(params, "int8")
    qmodel = CausalTransformerModel(cfg, qparams, dtype=jnp.float32)
    out = qmodel.generate([4, 5], max_new_tokens=4, temperature=0.0)
    assert len(out) == 4


class TestMoEGatherPath:
    """Decode-sized MoE routing: the expert-gather formulation must match
    the dense one-hot path exactly (ops/moe.select_moe_fn)."""

    def test_gather_matches_dense(self):
        import jax
        import jax.numpy as jnp
        from pygpukit_tpu.ops.moe import moe_dense_fn, moe_gather_fn
        rng = np.random.default_rng(0)
        t, h, i, e, k = 2, 16, 32, 4, 2
        y = jnp.asarray(rng.standard_normal((t, h)).astype(np.float32))
        wg = jnp.asarray(rng.standard_normal((e, h, i)).astype(np.float32))
        wu = jnp.asarray(rng.standard_normal((e, h, i)).astype(np.float32))
        wd = jnp.asarray(rng.standard_normal((e, i, h)).astype(np.float32))
        logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
        dense = np.asarray(moe_dense_fn(y, wg, wu, wd, logits, k))
        gathered = np.asarray(moe_gather_fn(y, wg, wu, wd, logits, k))
        np.testing.assert_allclose(gathered, dense, rtol=1e-4, atol=1e-5)

    def test_gather_quantized_leaves(self):
        import jax.numpy as jnp
        from pygpukit_tpu.ops.moe import moe_dense_fn, moe_gather_fn
        rng = np.random.default_rng(1)
        t, h, i, e, k = 1, 16, 32, 4, 2
        y = jnp.asarray(rng.standard_normal((t, h)).astype(np.float32))
        def qleaf(shape):
            w = rng.standard_normal(shape).astype(np.float32)
            # per-expert, per-column scales as llm/quant.py produces
            scale = np.full((shape[0], 1, shape[-1]), 0.1, np.float32)
            return {"q": jnp.asarray((w * 10).astype(np.int8)),
                    "scale": jnp.asarray(scale)}
        wg, wu = qleaf((e, h, i)), qleaf((e, h, i))
        wd = qleaf((e, i, h))
        logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
        dense = np.asarray(moe_dense_fn(y, wg, wu, wd, logits, k))
        gathered = np.asarray(moe_gather_fn(y, wg, wu, wd, logits, k))
        np.testing.assert_allclose(gathered, dense, rtol=2e-2, atol=1e-2)

    def test_select_routing(self, monkeypatch):
        from pygpukit_tpu.ops import moe
        monkeypatch.setattr(moe, "use_gmm", lambda: True)
        assert moe.select_moe_fn(1, 2) is moe.moe_gather_fn
        assert moe.select_moe_fn(256, 2) is moe.moe_gmm_fn
        assert moe.select_moe_fn(32, 2) is moe.moe_dense_fn
        monkeypatch.setattr(moe, "use_gmm", lambda: False)
        assert moe.select_moe_fn(256, 2) is moe.moe_dense_fn


class TestQuantizedFusion:
    """fuse_params now fuses quantized {q,scale} leaves (per-column scales
    concatenate exactly); fused quantized logits == unfused."""

    def test_fp8_fused_matches_unfused(self):
        import jax.numpy as jnp
        from pygpukit_tpu.llm.config import TransformerConfig
        from pygpukit_tpu.llm.model import (CausalTransformerModel,
                                            fuse_params, init_params)
        from pygpukit_tpu.llm.quant import quantize_model_params
        cfg = TransformerConfig(
            vocab_size=97, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128,
            max_position_embeddings=128)
        qp = quantize_model_params(
            init_params(cfg, seed=2, dtype=jnp.bfloat16), "fp8")
        m_unf = CausalTransformerModel(cfg, qp, dtype=jnp.bfloat16)
        fused = fuse_params(m_unf.params)
        assert "w_qkv" in fused["layers"] and isinstance(
            fused["layers"]["w_qkv"], dict)
        assert "w_gate_up" in fused["layers"]
        m_f = CausalTransformerModel(cfg, fused, dtype=jnp.bfloat16)
        ids = [3, 17, 42, 7]
        lu = np.asarray(m_unf(ids), np.float32)
        lf = np.asarray(m_f(ids), np.float32)
        np.testing.assert_allclose(lf, lu, rtol=2e-2, atol=2e-2)
        assert (np.argmax(lu, -1) == np.argmax(lf, -1)).all()

    @pytest.mark.parametrize("mode", ["int4", "int4_block"])
    def test_int4_packed_fuses_and_matches(self, mode):
        """Packed leaves fuse along the transposed OUT axis (q_packed on N,
        scales on their column axis) — fused logits must match unfused
        exactly (same dequantized values, same dot shapes after the
        column split)."""
        import jax.numpy as jnp
        from pygpukit_tpu.llm.config import TransformerConfig
        from pygpukit_tpu.llm.model import (
            CausalTransformerModel, fuse_params, init_params,
        )
        from pygpukit_tpu.llm.quant import quantize_model_params
        cfg = TransformerConfig(
            vocab_size=97, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128,
            max_position_embeddings=128, tie_word_embeddings=False)
        qp = quantize_model_params(
            init_params(cfg, seed=2, dtype=jnp.float32), mode)
        fused = fuse_params({k: (dict(v) if isinstance(v, dict) else v)
                             for k, v in qp.items()})
        assert "w_qkv" in fused["layers"]
        assert "w_gate_up" in fused["layers"]
        assert "q_packed" in fused["layers"]["w_qkv"]
        ids = [3, 17, 42, 7]
        lu = CausalTransformerModel(cfg, qp, dtype=jnp.float32).get_logits(
            ids)
        lf = CausalTransformerModel(cfg, fused,
                                    dtype=jnp.float32).get_logits(ids)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lu),
                                   rtol=2e-5, atol=2e-5)


class TestW8A8:
    """Opt-in native int8 activation-quantized matvec (PYGPUKIT_INT8_MODE=
    w8a8): int8 x int8 -> int32 MXU dot, per-row activation scales."""

    def test_mm_matches_dequant(self, monkeypatch):
        import jax
        from pygpukit_tpu.llm.model import _mm
        monkeypatch.setenv("PYGPUKIT_INT8_MODE", "w8a8")
        rng = np.random.default_rng(7)
        w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32)
                        * 0.05)
        wq = quantize_weight(w, "int8")
        x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
        got = np.asarray(jax.jit(_mm)(x, wq), np.float32)
        ref = np.asarray(x, np.float32) @ np.asarray(
            dequantize_weight(wq, jnp.float32))
        rms = (np.sqrt(((got - ref) ** 2).mean())
               / np.sqrt((ref ** 2).mean()))
        assert rms < 0.01, rms      # activation quant adds ~0.4% RMS

    def test_model_greedy_tokens_match_w8a16(self, cfg, monkeypatch):
        params = init_params(cfg, seed=11, dtype=jnp.bfloat16)
        qp = quantize_model_params(params, "int8")
        m16 = CausalTransformerModel(cfg, qp, dtype=jnp.bfloat16)
        ref = m16.generate([5, 1, 8], max_new_tokens=8, temperature=0.0)
        monkeypatch.setenv("PYGPUKIT_INT8_MODE", "w8a8")
        m8 = CausalTransformerModel(cfg, qp, dtype=jnp.bfloat16)
        got = m8.generate([5, 1, 8], max_new_tokens=8, temperature=0.0)
        # random tiny models have near-flat logits; exact token match is
        # not guaranteed under activation quant — require high overlap
        same = sum(a == b for a, b in zip(ref, got))
        assert same >= len(ref) - 2, (ref, got)


class TestInt4Block:
    """Block-scaled int4 (NVF4 analog — reference
    native/ops/matmul/gemm/w4a16_bf16/, README W4A16 row: its own stated
    error is ~15%). Per-(K-block, column) scales cut matvec output error
    vs per-column int4; storage stays packed 2 values/byte."""

    def test_roundtrip_and_output_error(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((2048, 256)).astype(np.float32)
                        * 0.02)
        x = rng.standard_normal((4, 2048)).astype(np.float32)
        ref = x @ np.asarray(w)

        def out_rms(mode, **kw):
            deq = np.asarray(dequantize_weight(
                quantize_weight(w, mode, **kw), jnp.float32))
            out = x @ deq
            return (np.sqrt(((out - ref) ** 2).mean())
                    / np.sqrt((ref ** 2).mean()))

        col = out_rms("int4")
        blk = out_rms("int4_block", block_size=32)
        assert blk < 0.13, blk          # measured 0.102 (col int4: 0.155)
        assert blk < col * 0.8, (blk, col)
        wq = quantize_weight(w, "int4_block", block_size=32)
        assert wq["scale_block"].shape == (2048 // 32, 256)
        deq = np.asarray(dequantize_weight(wq, jnp.float32))
        relw = np.abs(deq - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
        assert relw < 0.08, relw        # per-column int4 bound is 0.2

    def test_mm_xla_fallback_matches_dequant(self):
        import jax
        from pygpukit_tpu.llm.model import _mm
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32)
                        * 0.05)
        wq = quantize_weight(w, "int4_block", block_size=16)
        x = jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32))
        got = np.asarray(jax.jit(_mm)(x, wq), np.float32)
        ref = np.asarray(x, np.float32) @ np.asarray(
            dequantize_weight(wq, jnp.float32))
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 2e-2, rel

    def test_model_logits_close(self, cfg):
        params = init_params(cfg, seed=5, dtype=jnp.float32)
        model = CausalTransformerModel(cfg, params, dtype=jnp.float32)
        ids = [3, 9, 27]
        ref = model.get_logits(ids)
        qp = quantize_model_params(init_params(cfg, seed=5, dtype=jnp.float32),
                                   "int4_block")
        qmodel = CausalTransformerModel(cfg, qp, dtype=jnp.float32)
        got = qmodel.get_logits(ids)
        rel = (np.abs(np.asarray(got) - np.asarray(ref)).max()
               / (np.abs(np.asarray(ref)).max() + 1e-9))
        assert rel < 0.25, rel

    def test_skips_moe_experts(self, moe_cfg):
        params = init_params(moe_cfg, seed=3, dtype=jnp.bfloat16)
        qparams = quantize_model_params(params, "int4_block")
        assert not isinstance(qparams["layers"]["w_experts_gate"], dict)
        assert isinstance(qparams["layers"]["w_o"], dict)
        assert "scale_block" in qparams["layers"]["w_o"]


class TestQuantizedHead:
    """Untied lm_head joins int8/fp8 quantization (round 3): it is the
    largest single weight read per decoded token (vocab x hidden — measured
    ~170 us/tok bf16 at HBM rate on the 1B model in the round-3 device
    trace, exactly halved by int8). Packed-int4 modes take an int8 head
    (int4 logit error shifts greedy order; int8 is the accepted tradeoff)."""

    @pytest.fixture(scope="class")
    def ucfg(self):
        return TransformerConfig(
            vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=64, head_dim_override=8,
            norm_type="rmsnorm", activation="silu", use_rope=True,
            max_position_embeddings=64, tie_word_embeddings=False)

    def test_head_leaf_policy(self, ucfg, cfg):
        up = init_params(ucfg, seed=2, dtype=jnp.bfloat16)
        assert isinstance(quantize_model_params(up, "int8")["lm_head"], dict)
        assert isinstance(quantize_model_params(up, "fp8")["lm_head"], dict)
        # packed-int4 modes take an int8 head (NOT packed-int4: greedy
        # order must hold); explicit opt-out keeps it dense
        i4_head = quantize_model_params(up, "int4")["lm_head"]
        assert isinstance(i4_head, dict) and "q" in i4_head
        assert i4_head["q"].dtype == jnp.int8
        fp8_head = quantize_model_params(up, "int4", head="fp8")["lm_head"]
        assert fp8_head["q"].dtype == jnp.float8_e4m3fn
        assert not isinstance(
            quantize_model_params(up, "int8", head=False)["lm_head"], dict)
        # tied embeddings: nothing to quantize
        tp = init_params(cfg, seed=2, dtype=jnp.bfloat16)
        assert quantize_model_params(tp, "int8")["lm_head"] is None

    def test_logits_close_and_f32(self, ucfg):
        params = init_params(ucfg, seed=9, dtype=jnp.float32)
        model = CausalTransformerModel(ucfg, params, dtype=jnp.float32)
        ids = [3, 9, 27]
        ref = np.asarray(model.get_logits(ids))
        qp = quantize_model_params(
            init_params(ucfg, seed=9, dtype=jnp.float32), "int8")
        qmodel = CausalTransformerModel(ucfg, qp, dtype=jnp.float32)
        got = qmodel.get_logits(ids)
        assert got.dtype == np.float32
        rel = np.abs(np.asarray(got) - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.05, rel

    def test_dequant_and_checkpoint_roundtrip(self, ucfg, tmp_path):
        from pygpukit_tpu.llm.quant import dequantize_model_params
        from pygpukit_tpu.llm.safetensors import (load_model_params,
                                                  save_model_params)
        params = init_params(ucfg, seed=4, dtype=jnp.bfloat16)
        qp = quantize_model_params(params, "int8")
        path = tmp_path / "q.safetensors"
        save_model_params(path, qp)
        back = load_model_params(path)
        assert isinstance(back["lm_head"], dict)
        np.testing.assert_array_equal(np.asarray(back["lm_head"]["q"]),
                                      np.asarray(qp["lm_head"]["q"]))
        dq = dequantize_model_params(qp)
        assert not isinstance(dq["lm_head"], dict)

    def test_sharding_specs_handle_quantized_leaves(self, ucfg):
        from pygpukit_tpu.parallel.sharding import param_specs
        qp = quantize_model_params(
            init_params(ucfg, seed=4, dtype=jnp.bfloat16), "int8")
        specs = param_specs(qp)
        assert specs["lm_head"]["q"] == specs["lm_head"]["scale"]
        wq = specs["layers"]["w_q"]
        assert isinstance(wq, dict)
        # q shards like the dense column-parallel weight; per-column scales
        # cut the same out axis
        assert wq["q"][-1] == "tp" and wq["scale"][-1] == "tp"
