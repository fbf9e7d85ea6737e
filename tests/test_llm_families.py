"""Model-family parity tests: Qwen2 (biases), Qwen3 (QK-norm), Mixtral (MoE)
against transformers — the full ModelSpec registry exercised end-to-end."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pygpukit_tpu.llm as llm  # noqa: E402


def _check_parity(d, hf_model, spec_name, prompt=(1, 7, 23), rtol=1e-4):
    # rtol 1e-4: f32 parity measures ~1e-6; a WRONG rope convention
    # measures ~1e-3 on these tiny models (empirically confirmed for
    # interleaved-vs-split and NoPE-vs-roped) — 5e-3 could not detect the
    # exact bug class these tests exist to pin
    st = llm.load_safetensors(d)
    assert llm.detect_model_spec(st.keys()).name == spec_name
    model = llm.load_model_from_safetensors(d, dtype="float32")
    ours = model.get_logits(list(prompt))
    with torch.no_grad():
        ref = hf_model(torch.tensor([list(prompt)])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=rtol)
    # greedy token match
    out = model.generate(list(prompt), max_new_tokens=6, temperature=0.0)
    hf_out = hf_model.generate(
        torch.tensor([list(prompt)]), max_new_tokens=6, do_sample=False,
        pad_token_id=0)[0, len(prompt):].tolist()
    assert out == hf_out, f"{spec_name}: {out} != {hf_out}"
    return model


class TestQwen2:
    def test_parity(self, tmp_path):
        cfg = transformers.Qwen2Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            tie_word_embeddings=False)
        torch.manual_seed(0)
        m = transformers.Qwen2ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "qwen2")
        # qkv biases loaded (fused with the default fuse=True load)
        assert "b_qkv" in model.params["layers"]


class TestQwen3:
    def test_parity(self, tmp_path):
        cfg = transformers.Qwen3Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64, tie_word_embeddings=False)
        torch.manual_seed(1)
        m = transformers.Qwen3ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "qwen3")
        assert model.config.use_qk_norm


class TestMixtral:
    def test_parity(self, tmp_path):
        cfg = transformers.MixtralConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_local_experts=4,
            num_experts_per_tok=2, max_position_embeddings=64,
            tie_word_embeddings=False)
        torch.manual_seed(2)
        m = transformers.MixtralForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "mixtral")
        assert model.config.is_moe
        assert model.params["layers"]["w_experts_gate"].shape[1] == 4


class TestQwen3Moe:
    def test_parity(self, tmp_path):
        cfg = transformers.Qwen3MoeConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, num_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=32,
            decoder_sparse_step=1, norm_topk_prob=True,
            max_position_embeddings=64, tie_word_embeddings=False)
        torch.manual_seed(3)
        m = transformers.Qwen3MoeForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "qwen3_moe")
        assert model.config.is_moe and model.config.use_qk_norm


class TestGemma2:
    def test_parity(self, tmp_path):
        """Sliding window (< prompt len), attn+final softcaps, sandwich
        norms, (1+w) RMSNorm fold, embed scaling, query_pre_attn_scalar —
        every gemma2 mechanism live in one tiny model."""
        cfg = transformers.Gemma2Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, query_pre_attn_scalar=16,
            sliding_window=8, attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0, max_position_embeddings=64,
            attn_implementation="eager")
        torch.manual_seed(5)
        m = transformers.Gemma2ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        prompt = tuple(range(1, 13))          # 12 tokens > window of 8
        model = _check_parity(tmp_path, m, "gemma2", prompt=prompt)
        c = model.config
        assert c.use_post_norms and c.sliding_window == 8
        assert c.attn_logit_softcap == 50.0 and c.final_logit_softcap == 30.0
        assert c.query_scale == 16 ** -0.5 and c.embed_scale == 32 ** 0.5
        import numpy as np_
        assert list(np_.asarray(model.params["layers"]["attn_window"])) == \
            [8, 0, 8, 0]


class TestGemma3:
    def test_parity(self, tmp_path):
        """Gemma3 text: 5:1 sliding pattern, DUAL rope tables (local theta
        on sliding layers), per-head qk-norm with the (1+w) fold, no
        softcaps."""
        cfg = transformers.Gemma3TextConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=6, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, query_pre_attn_scalar=16,
            sliding_window=8, rope_theta=1000000.0,
            rope_local_base_freq=10000.0, max_position_embeddings=64,
            attn_implementation="eager")
        torch.manual_seed(6)
        m = transformers.Gemma3ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        prompt = tuple(range(1, 13))
        model = _check_parity(tmp_path, m, "gemma3", prompt=prompt)
        c = model.config
        assert c.use_qk_norm and c.rope_local_theta == 10000.0
        assert c.attn_logit_softcap is None
        import numpy as np_
        assert list(np_.asarray(model.params["layers"]["use_local_rope"])) \
            == [1, 1, 1, 1, 1, 0]
        assert "rope_cos_local" in model.params


class TestLlama4:
    def test_parity_text(self, tmp_path):
        """Tiny dense Llama4 text model vs transformers: exercises the
        interleaved-pair rope, rope-layer-only QK L2 norm, and NoPE
        temperature tuning (no_rope_layer_interval places NoPE layers)."""
        import jax.numpy as jnp
        from pygpukit_tpu.llm.models.llama4 import Llama4Model
        cfg = transformers.Llama4TextConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            intermediate_size_mlp=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64, tie_word_embeddings=False,
            interleave_moe_layer_step=0, moe_layers=[],
            no_rope_layer_interval=4,          # layer 3 = NoPE
            use_qk_norm=True, attn_temperature_tuning=True,
            rope_scaling=None, attention_chunk_size=64)
        torch.manual_seed(4)
        m = transformers.Llama4ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        ours = Llama4Model.from_safetensors(tmp_path, dtype=jnp.float32)
        assert list(np.asarray(ours.params["layers"]["use_rope"])) == [1, 1, 1, 0]
        prompt = [1, 7, 23]
        got = np.asarray(ours.forward(prompt))
        with torch.no_grad():
            ref = m(torch.tensor([prompt])).logits[0].numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        out = ours.generate(prompt, max_new_tokens=6)
        hf_out = m.generate(torch.tensor([prompt]), max_new_tokens=6,
                            do_sample=False, pad_token_id=0)[0, 3:].tolist()
        assert out == hf_out, (out, hf_out)


class TestLlama31RopeScaling:
    """Llama-3.1 frequency-dependent rope scaling (HF rope_type "llama3")
    must reach the tables — random-weight tests with near-uniform attention
    do NOT catch scaled-vs-unscaled rope, so this parity test uses prompts
    longer than original_max_position_embeddings/4 to force position
    sensitivity."""

    def test_parity(self, tmp_path):
        cfg = transformers.LlamaConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rope_theta=10000.0,
            rope_scaling={"rope_type": "llama3", "factor": 4.0,
                          "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                          "original_max_position_embeddings": 16},
            tie_word_embeddings=False)
        torch.manual_seed(5)
        m = transformers.LlamaForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        prompt = tuple(range(1, 25))   # spans past original_max/4
        model = _check_parity(tmp_path, m, "llama", prompt=prompt)
        assert model.config.rope_scaling["rope_type"] == "llama3"

    def test_scaled_tables_differ_from_unscaled(self):
        import jax.numpy as jnp
        from pygpukit_tpu.ops.nn.rope import rope_init, rope_init_llama3
        # original_max=64, high_freq_factor=4 -> wavelengths under 16 are
        # untouched: only component 0 (wavelen 2*pi) qualifies at dim 16
        cos_s, _ = rope_init_llama3(64, 16, 10000.0, 4.0, 64, 1.0, 4.0)
        cos_u, _ = rope_init(64, 16, 10000.0)
        assert not np.allclose(np.asarray(cos_s.jax), np.asarray(cos_u.jax))
        np.testing.assert_allclose(np.asarray(cos_s.jax)[:, 0],
                                   np.asarray(cos_u.jax)[:, 0], rtol=1e-6)


class TestPhi3:
    """Phi-3: fused qkv_proj/gate_up_proj checkpoints + LongRoPE scaling
    (HF rope_type "longrope": per-dim short/long factor lists switched by
    total sequence length vs original_max — we carry dual tables and select
    by traced length). Reference has no phi family at all."""

    def _cfg(self, **kw):
        return transformers.Phi3Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            tie_word_embeddings=False, pad_token_id=0,
            bos_token_id=1, eos_token_id=2, **kw)

    def test_parity_plain(self, tmp_path):
        torch.manual_seed(7)
        m = transformers.Phi3ForCausalLM(self._cfg()).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "phi3")
        # fused checkpoint split into the standard leaves (then re-fused)
        assert "w_qkv" in model.params["layers"] or "w_q" in model.params["layers"]

    def test_parity_sliding_window(self, tmp_path):
        # phi3 slides EVERY layer when config.json sets sliding_window
        # (mini-4k ships 2047); prompt longer than the window
        torch.manual_seed(13)
        cfg = self._cfg(sliding_window=8, attn_implementation="eager")
        m = transformers.Phi3ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "phi3", prompt=tuple(range(1, 14)))
        assert model.config.sliding_window == 8
        import numpy as np_
        assert list(np_.asarray(model.params["layers"]["attn_window"])) == \
            [8, 8]

    def test_parity_longrope_both_regimes(self, tmp_path):
        half = (32 // 4) // 2
        cfg = self._cfg(
            original_max_position_embeddings=32,
            rope_scaling={"type": "longrope",
                          "short_factor": [1.0 + 0.05 * i for i in range(half)],
                          "long_factor": [1.5 + 0.3 * i for i in range(half)]})
        torch.manual_seed(8)
        m = transformers.Phi3ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        # short regime: total length stays under original_max (32)
        model = _check_parity(tmp_path, m, "phi3", prompt=tuple(range(1, 20)))
        assert "rope_cos_long" in model.params
        # long regime: prompt longer than original_max -> HF switches to
        # long_factor for the whole forward; our traced select must follow
        prompt = list(range(1, 40))
        ours = model.generate(prompt, max_new_tokens=6, temperature=0.0)
        hf_out = m.generate(
            torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
            pad_token_id=0)[0, len(prompt):].tolist()
        assert ours == hf_out, (ours, hf_out)


class TestDeepseekV3:
    """DeepSeek-V3/R1 class: Multi-head Latent Attention (q/kv low-rank,
    decoupled shared rope key) + sigmoid group-limited MoE routing with
    shared experts and a dense layer prefix. Decode runs the ABSORBED MLA
    form off the compressed [kv_lora + rope] cache — greedy must still
    match transformers' naive-expansion cache exactly."""

    def test_parity(self, tmp_path):
        import jax.numpy as jnp
        from pygpukit_tpu.llm.models.deepseek import DeepseekV3Model
        cfg = transformers.DeepseekV3Config(
            vocab_size=96, hidden_size=48, num_hidden_layers=3,
            num_attention_heads=2, num_key_value_heads=2,
            q_lora_rank=24, kv_lora_rank=16, qk_rope_head_dim=4,
            qk_nope_head_dim=8, v_head_dim=8, intermediate_size=64,
            moe_intermediate_size=32, n_routed_experts=8,
            n_shared_experts=1, num_experts_per_tok=2, n_group=4,
            topk_group=2, norm_topk_prob=True, routed_scaling_factor=2.5,
            first_k_dense_replace=1, max_position_embeddings=64,
            tie_word_embeddings=False, pad_token_id=0)
        torch.manual_seed(9)
        m = transformers.DeepseekV3ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        ours = DeepseekV3Model.from_safetensors(tmp_path, dtype=jnp.float32)
        assert ours.params["moe_layers"]["w_experts_gate"].shape[:2] == (2, 8)
        prompt = [1, 7, 23, 40, 4]
        got = ours.get_logits(prompt)
        with torch.no_grad():
            ref = m(torch.tensor([prompt])).logits[0].numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        # absorbed-cache cached decode == HF generate (greedy)
        out = ours.generate(prompt, max_new_tokens=8, chunk_size=4)
        hf_out = m.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
            pad_token_id=0)[0, len(prompt):].tolist()
        assert out == hf_out, (out, hf_out)


class TestYarnRopeScaling:
    """HF-exact YaRN (log-derived correction-dim ramp + attention factor on
    the tables): parity vs transformers with a Qwen3 config carrying yarn
    rope_scaling — the regime every long-context Qwen/DeepSeek checkpoint
    ships with."""

    def test_parity(self, tmp_path):
        cfg = transformers.Qwen3Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=128, rope_theta=10000.0,
            rope_scaling={"rope_type": "yarn", "factor": 4.0,
                          "original_max_position_embeddings": 32},
            tie_word_embeddings=False)
        torch.manual_seed(10)
        m = transformers.Qwen3ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        # prompt crossing original_max so the interpolated dims matter
        _check_parity(tmp_path, m, "qwen3", prompt=tuple(range(1, 40)))


class TestDeepseekV2:
    """DeepSeek-V2 rides the same module with V2 router modes: softmax
    scores with plain top-k (V2-Lite "greedy", also no q-lora) or
    group-MAX-limited top-k ("group_limited_greedy")."""

    def _run(self, tmp_path, seed, **kw):
        import jax.numpy as jnp
        from pygpukit_tpu.llm.models.deepseek import DeepseekV3Model
        cfg = transformers.DeepseekV2Config(
            vocab_size=96, hidden_size=48, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=2,
            kv_lora_rank=16, qk_rope_head_dim=4, qk_nope_head_dim=8,
            v_head_dim=8, intermediate_size=64, moe_intermediate_size=32,
            n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
            first_k_dense_replace=0, max_position_embeddings=64,
            tie_word_embeddings=False, pad_token_id=0, **kw)
        torch.manual_seed(seed)
        m = transformers.DeepseekV2ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        ours = DeepseekV3Model.from_safetensors(tmp_path, dtype=jnp.float32)
        prompt = [1, 7, 23, 40]
        got = ours.get_logits(prompt)
        with torch.no_grad():
            ref = m(torch.tensor([prompt])).logits[0].numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        out = ours.generate(prompt, max_new_tokens=6, chunk_size=3)
        hf_out = m.generate(
            torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
            pad_token_id=0)[0, len(prompt):].tolist()
        assert out == hf_out, (out, hf_out)
        return ours

    def test_v2_lite_greedy_no_qlora(self, tmp_path):
        ours = self._run(tmp_path, 11, q_lora_rank=None,
                         topk_method="greedy", norm_topk_prob=False,
                         routed_scaling_factor=1.0)
        assert ours.config.router_mode == "greedy"
        assert "w_q" in ours.params["moe_layers"]

    def test_v2_group_limited(self, tmp_path):
        # norm_topk_prob=True on purpose: HF's V2 MoEGate stores the flag
        # but never normalises — ours must ignore it for V2 modes too
        ours = self._run(tmp_path, 12, q_lora_rank=24,
                         topk_method="group_limited_greedy", n_group=4,
                         topk_group=2, norm_topk_prob=True,
                         routed_scaling_factor=1.0)
        assert ours.config.router_mode == "group_limited_greedy"


class TestGptOss:
    """GPT-OSS class: attention SINKS (per-head learned softmax column),
    alternating sliding/full layers, clamped gated-SwiGLU MoE with biases
    and interleaved gate/up, softmax-over-topk router, yarn rope with
    truncate=False. Reference has no openai-oss support."""

    def test_parity(self, tmp_path):
        import jax.numpy as jnp
        from pygpukit_tpu.llm.models.gptoss import GptOssModel
        cfg = transformers.GptOssConfig(
            vocab_size=96, hidden_size=32, intermediate_size=48,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, num_local_experts=4,
            num_experts_per_tok=2, sliding_window=8,
            layer_types=["sliding_attention", "full_attention"] * 2,
            rope_scaling={"rope_type": "yarn", "factor": 4.0,
                          "original_max_position_embeddings": 16,
                          "beta_fast": 32.0, "beta_slow": 1.0,
                          "truncate": False},
            max_position_embeddings=64, tie_word_embeddings=False,
            pad_token_id=0, attn_implementation="eager")
        torch.manual_seed(14)
        m = transformers.GptOssForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        ours = GptOssModel.from_safetensors(tmp_path, dtype=jnp.float32)
        assert list(np.asarray(ours.params["layers"]["attn_window"])) == \
            [8, 0, 8, 0]
        # prompt longer than the sliding window AND past original_max/4
        prompt = list(range(1, 21))
        got = ours.get_logits(prompt)
        with torch.no_grad():
            ref = m(torch.tensor([prompt])).logits[0].numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        out = ours.generate(prompt, max_new_tokens=8, chunk_size=4)
        hf_out = m.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
            pad_token_id=0)[0, len(prompt):].tolist()
        assert out == hf_out, (out, hf_out)


class TestOlmo2:
    """OLMo-2: post-norm-only blocks (no input norms — the sublayers read
    the raw residual stream, post_attention/post_feedforward norms on the
    outputs) + whole-width q/k RMS norms applied before the head reshape
    (HF modeling_olmo2; both conventions differ from every other family)."""

    def test_parity(self, tmp_path):
        cfg = transformers.Olmo2Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            tie_word_embeddings=False)
        torch.manual_seed(17)
        m = transformers.Olmo2ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "olmo2")
        assert model.config.pre_norms is False
        assert model.config.use_post_norms is True
        assert model.config.qk_norm_wide is True
        lp = model.params["layers"]
        assert "attn_norm_w" not in lp and "mlp_norm_w" not in lp
        # whole-width norms: [L, Hq*D] / [L, Hk*D]
        assert lp["w_q_norm"].shape == (2, 32)
        assert lp["w_k_norm"].shape == (2, 16)

    def test_detect(self):
        names = ["model.embed_tokens.weight",
                 "model.layers.0.self_attn.q_norm.weight",
                 "model.layers.0.post_feedforward_layernorm.weight"]
        assert llm.detect_model_spec(names).name == "olmo2"


class TestCohere:
    """Cohere Command-R: PARALLEL attn+mlp residual off ONE shared input
    LayerNorm (no bias, no post_attention norm), interleaved even/odd rope
    pairs, tied embeddings scaled by logit_scale, optional LayerNorm-flavour
    per-head qk-norms with [H, D] weights (HF modeling_cohere)."""

    def _hf(self, seed, **kw):
        cfg = transformers.CohereConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            logit_scale=0.0625, **kw)
        torch.manual_seed(seed)
        return transformers.CohereForCausalLM(cfg).eval()

    def test_parity(self, tmp_path):
        m = self._hf(19)
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "cohere")
        assert model.config.parallel_block is True
        assert model.config.rope_interleaved is True
        assert model.config.logit_scale == 0.0625
        assert model.params["lm_head"] is None      # tied + scaled

    def test_parity_qk_norm(self, tmp_path):
        m = self._hf(20, use_qk_norm=True)
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "cohere")
        assert model.config.use_qk_norm is True
        # per-head LayerNorm weights [L, H, D]
        assert model.params["layers"]["w_q_norm"].shape == (2, 4, 8)


class TestStarcoder2:
    """Starcoder2: GPT-2-style blocks (biased LayerNorms + gelu-tanh
    c_fc/c_proj MLP with biases) in the llama key layout + rope, tied
    embeddings (HF modeling_starcoder2)."""

    def test_parity(self, tmp_path):
        cfg = transformers.Starcoder2Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            use_bias=True)
        torch.manual_seed(22)
        m = transformers.Starcoder2ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "starcoder2")
        lp = model.params["layers"]
        assert "b_fc1" in lp and "attn_norm_b" in lp
        assert model.params["lm_head"] is None      # tied by default


class TestGlm4:
    """GLM-4: gemma2-style sandwich norms (post_self_attn/post_mlp on the
    sublayer outputs), fused gate_up MLP, qkv biases, and INTERLEAVED rope
    over only the first partial_rotary_factor*head_dim dims
    (HF modeling_glm4.apply_rotary_pos_emb)."""

    def test_parity(self, tmp_path):
        cfg = transformers.Glm4Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            partial_rotary_factor=0.5, attention_bias=True, head_dim=8,
            tie_word_embeddings=False, pad_token_id=0, eos_token_id=1)
        torch.manual_seed(23)
        m = transformers.Glm4ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "glm4",
                              prompt=tuple(range(1, 10)))
        assert model.config.use_post_norms is True
        assert model.config.rope_interleaved is True
        assert model.config.rope_dim == 4           # 8 * 0.5
        assert model.params["rope_cos"].shape[-1] == 4


class TestGranite:
    """IBM Granite = llama + four scalar multipliers: embedding_multiplier,
    attention_multiplier (softmax scale), residual_multiplier (sublayer
    outputs), logits_scaling (divides logits) — each a 'main diff with
    Llama' site in HF modeling_granite."""

    def test_parity(self, tmp_path):
        cfg = transformers.GraniteConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            embedding_multiplier=12.0, residual_multiplier=0.22,
            attention_multiplier=0.015625, logits_scaling=8.0,
            tie_word_embeddings=False)
        torch.manual_seed(25)
        m = transformers.GraniteForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "llama")   # llama key layout
        assert model.config.embed_scale == 12.0
        assert model.config.residual_multiplier == 0.22
        assert model.config.query_scale == 0.015625
        assert model.config.logit_scale == 1.0 / 8.0


class TestSmolLM3:
    """SmolLM3: llama layout + NoPE every 4th layer (no_rope_layers —
    1 = rope, 0 = NoPE; HF modeling_smollm3 reads it per layer). Our NoPE
    layers rotate by IDENTITY tables (cos=1, sin=0) so one program serves
    both layer kinds."""

    def test_parity(self, tmp_path):
        cfg = transformers.SmolLM3Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            no_rope_layers=[1, 1, 1, 0], tie_word_embeddings=True,
            pad_token_id=0, eos_token_id=1, bos_token_id=2)
        torch.manual_seed(26)
        m = transformers.SmolLM3ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "llama",
                              prompt=tuple(range(1, 10)))
        assert model.config.rope_layers == (1, 1, 1, 0)
        import numpy as np_
        assert list(np_.asarray(
            model.params["layers"]["use_rope_layer"])) == [1, 1, 1, 0]


class TestMistralSlidingWindow:
    """Mistral-v0.1 class rides the llama spec + every-layer sliding
    window from config.json (round 3: the generic path previously dropped
    sliding_window for every non-gemma family — full attention silently)."""

    def test_parity(self, tmp_path):
        cfg = transformers.MistralConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, sliding_window=8,
            max_position_embeddings=64, tie_word_embeddings=False,
            attn_implementation="eager")
        torch.manual_seed(15)
        m = transformers.MistralForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "llama", prompt=tuple(range(1, 14)))
        assert model.config.sliding_window == 8
        import numpy as np_
        assert list(np_.asarray(model.params["layers"]["attn_window"])) == \
            [8, 8]


class TestQwen2SlidingWindow:
    def test_parity(self, tmp_path):
        """use_sliding_window=True: layers >= max_window_layers slide
        (HF-derived layer_types honoured)."""
        cfg = transformers.Qwen2Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, use_sliding_window=True,
            sliding_window=8, max_window_layers=2,
            max_position_embeddings=64, tie_word_embeddings=False,
            attn_implementation="eager")
        torch.manual_seed(16)
        m = transformers.Qwen2ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "qwen2",
                              prompt=tuple(range(1, 14)))
        import numpy as np_
        assert list(np_.asarray(model.params["layers"]["attn_window"])) == \
            [0, 0, 8, 8]


class TestNemotron:
    """Nemotron: LayerNorm1P (effective weight = 1+w, bias kept), gateless
    up->relu^2->down MLP, split-half partial rotary (factor 0.5)
    (HF modeling_nemotron)."""

    def test_parity(self, tmp_path):
        cfg = transformers.NemotronConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            partial_rotary_factor=0.5, tie_word_embeddings=False)
        torch.manual_seed(27)
        m = transformers.NemotronForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "nemotron",
                              prompt=tuple(range(1, 10)))
        assert model.config.activation == "relu2"
        assert model.config.rope_dim == 4
        assert model.config.rope_interleaved is False


class TestErnie45:
    def test_parity(self, tmp_path):
        """Ernie 4.5 = llama layout + interleaved rope pairs."""
        cfg = transformers.Ernie4_5Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            head_dim=8, tie_word_embeddings=True, pad_token_id=0)
        torch.manual_seed(28)
        m = transformers.Ernie4_5ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "llama",
                              prompt=tuple(range(1, 10)))
        assert model.config.rope_interleaved is True


class TestLfm2:
    """LFM2 hybrid: gated short-conv layers carry an [E, L_cache] rolling
    state instead of a KV cache; attention layers are GQA + per-head
    qk-norm (HF modeling_lfm2, slow path). llm/models/lfm2.py."""

    def test_parity(self, tmp_path):
        import jax.numpy as jnp
        from pygpukit_tpu.llm.models.lfm2 import Lfm2Model
        cfg = transformers.Lfm2Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2,
            layer_types=["conv", "full_attention", "conv",
                         "full_attention"],
            conv_L_cache=3, block_auto_adjust_ff_dim=False,
            max_position_embeddings=64, tie_word_embeddings=True,
            pad_token_id=0)
        torch.manual_seed(30)
        m = transformers.Lfm2ForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        ours = Lfm2Model.from_safetensors(tmp_path, dtype=jnp.float32)
        assert ours.config.layer_types[0] == "conv"
        prompt = [1, 7, 23, 5, 9]
        got = ours.get_logits(prompt)
        with torch.no_grad():
            ref = m(torch.tensor([prompt])).logits[0].numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        out = ours.generate(prompt, max_new_tokens=8)
        hf = m.generate(torch.tensor([prompt]), max_new_tokens=8,
                        do_sample=False, pad_token_id=0)[0, 5:].tolist()
        assert list(out) == hf, (out, hf)

    def test_conv_cache_shape(self):
        import jax.numpy as jnp
        from pygpukit_tpu.llm.models.lfm2 import Lfm2Config, init_caches
        cfg = Lfm2Config(hidden_size=32, num_layers=2, num_heads=4,
                         num_kv_heads=2, head_dim=8,
                         layer_types=("conv", "full_attention"),
                         conv_l_cache=3)
        caches = init_caches(cfg, 64, jnp.float32)
        assert caches[0]["conv"].shape == (32, 3)
        assert caches[1]["k"].shape == (64, 2, 8)


class TestQwen3Next:
    """Qwen3-Next hybrid: gated-DeltaNet linear-attention layers carry a
    fixed [nv, Dk, Dv] recurrent state + [conv_dim, K] conv state (O(1) in
    context) next to gated full-attention layers with partial rope; MoE
    with a sigmoid-gated shared expert (llm/models/qwen3next.py vs HF
    modeling_qwen3_next)."""

    def _cfg(self, **kw):
        return transformers.Qwen3NextConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            layer_types=["linear_attention", "full_attention",
                         "linear_attention", "full_attention"],
            linear_num_value_heads=4, linear_num_key_heads=2,
            linear_key_head_dim=8, linear_value_head_dim=8,
            linear_conv_kernel_dim=4, partial_rotary_factor=0.25,
            max_position_embeddings=64, tie_word_embeddings=False,
            pad_token_id=0, **kw)

    def test_parity_dense(self, tmp_path):
        import jax.numpy as jnp
        from pygpukit_tpu.llm.models.qwen3next import Qwen3NextModel
        cfg = self._cfg(num_experts=0)
        torch.manual_seed(31)
        m = transformers.Qwen3NextForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        ours = Qwen3NextModel.from_safetensors(tmp_path, dtype=jnp.float32)
        prompt = [1, 7, 23, 5, 9, 2]
        got = ours.get_logits(prompt)
        with torch.no_grad():
            ref = m(torch.tensor([prompt])).logits[0].numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        out = ours.generate(prompt, max_new_tokens=8)
        hf = m.generate(torch.tensor([prompt]), max_new_tokens=8,
                        do_sample=False, pad_token_id=0)[0, 6:].tolist()
        assert list(out) == hf, (out, hf)

    def test_parity_moe(self, tmp_path):
        import jax.numpy as jnp
        from pygpukit_tpu.llm.models.qwen3next import Qwen3NextModel
        cfg = self._cfg(num_experts=4, num_experts_per_tok=2,
                        moe_intermediate_size=32,
                        shared_expert_intermediate_size=32,
                        decoder_sparse_step=1, norm_topk_prob=True,
                        mlp_only_layers=[0])
        torch.manual_seed(32)
        m = transformers.Qwen3NextForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        ours = Qwen3NextModel.from_safetensors(tmp_path, dtype=jnp.float32)
        assert ours.config.is_moe_layer(1) and not ours.config.is_moe_layer(0)
        prompt = [1, 7, 23, 5, 9]
        got = ours.get_logits(prompt)
        with torch.no_grad():
            ref = m(torch.tensor([prompt])).logits[0].numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        out = ours.generate(prompt, max_new_tokens=6)
        hf = m.generate(torch.tensor([prompt]), max_new_tokens=6,
                        do_sample=False, pad_token_id=0)[0, 5:].tolist()
        assert list(out) == hf, (out, hf)


class TestPhi:
    """phi-1/1.5/2: parallel attn+mlp residual off ONE biased LayerNorm,
    biased q/k/v/dense/fc/lm_head projections, gelu-tanh fc MLP,
    split-half partial rotary (HF modeling_phi)."""

    def test_parity(self, tmp_path):
        cfg = transformers.PhiConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            partial_rotary_factor=0.5, tie_word_embeddings=False)
        torch.manual_seed(33)
        m = transformers.PhiForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "phi", prompt=tuple(range(1, 10)))
        assert model.config.parallel_block is True
        assert model.config.rope_dim == 4
        assert model.params.get("lm_head_b") is not None


def test_qwen3next_chunked_equals_recurrent():
    """The MXU-parallel chunked delta rule must compute the recurrent
    scan's function (both vs each other, incl. the padded-identity-row
    convention used by prefill)."""
    import jax
    import jax.numpy as jnp
    from pygpukit_tpu.llm.models.qwen3next import (
        _delta_scan, _delta_chunked)
    key = jax.random.PRNGKey(0)
    S, H, DK, DV = 100, 4, 8, 8
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (S, H, DK), jnp.float32)
    k = jax.random.normal(ks[1], (S, H, DK), jnp.float32)
    v = jax.random.normal(ks[2], (S, H, DV), jnp.float32)
    g = -jnp.abs(jax.random.normal(ks[3], (S, H), jnp.float32))
    beta = jax.nn.sigmoid(jax.random.normal(ks[4], (S, H), jnp.float32))
    s0 = jnp.zeros((H, DK, DV), jnp.float32)
    o1, s1 = _delta_scan(q, k, v, g, beta, s0)
    o2, s2 = _delta_chunked(q, k, v, g, beta, s0, chunk=16)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-5)
    # padded rows as identity steps (beta=0, g=0): state at true_len
    TL = 37
    mask = (jnp.arange(S) < TL)
    gm = jnp.where(mask[:, None], g, 0.0)
    bm = jnp.where(mask[:, None], beta, 0.0)
    o3, s3 = _delta_scan(q[:TL], k[:TL], v[:TL], g[:TL], beta[:TL], s0)
    o4, s4 = _delta_chunked(q, k, v, gm, bm, s0, chunk=16)
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s4),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o4)[:TL],
                               rtol=1e-4, atol=1e-5)


class TestSeedOss:
    """Seed-OSS: llama layout + biases on all four attention projections
    (o_proj bias distinguishes it from qwen2)."""

    def test_parity(self, tmp_path):
        cfg = transformers.SeedOssConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, attention_bias=True,
            attention_out_bias=True, max_position_embeddings=64,
            tie_word_embeddings=False, pad_token_id=0)
        torch.manual_seed(34)
        m = transformers.SeedOssForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "seed_oss")
        assert "b_o" in model.params["layers"]


class TestApertus:
    """Apertus: gateless up->xIELU->down MLP with LEARNED activation
    parameters (alpha_p/alpha_n leaves + beta/eps buffers), per-head
    qk-norms, attention_/feedforward_layernorm names
    (HF modeling_apertus + activations.XIELUActivation)."""

    def test_parity(self, tmp_path):
        cfg = transformers.ApertusConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            tie_word_embeddings=False, pad_token_id=0)
        torch.manual_seed(35)
        m = transformers.ApertusForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        model = _check_parity(tmp_path, m, "apertus",
                              prompt=tuple(range(1, 10)))
        assert model.config.activation == "xielu"
        assert "act_alpha_p" in model.params["layers"]


class TestMamba:
    """Mamba (S6 selective SSM): O(1) conv+SSM cache per layer, prefill
    via PARALLEL lax.associative_scan over the linear recurrence
    (llm/models/mamba.py vs HF modeling_mamba.slow_forward)."""

    def test_parity(self, tmp_path):
        import jax.numpy as jnp
        from pygpukit_tpu.llm.models.mamba import MambaModel
        cfg = transformers.MambaConfig(
            vocab_size=96, hidden_size=32, state_size=8,
            num_hidden_layers=2, conv_kernel=4, intermediate_size=64,
            time_step_rank=4, use_conv_bias=True, use_bias=False,
            pad_token_id=0)
        torch.manual_seed(36)
        m = transformers.MambaForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        ours = MambaModel.from_safetensors(tmp_path, dtype=jnp.float32)
        prompt = [1, 7, 23, 5, 9, 2]
        got = ours.get_logits(prompt)
        with torch.no_grad():
            ref = m(torch.tensor([prompt])).logits[0].numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        out = ours.generate(prompt, max_new_tokens=8)
        hf = m.generate(torch.tensor([prompt]), max_new_tokens=8,
                        do_sample=False, pad_token_id=0)[0, 6:].tolist()
        assert list(out) == hf, (out, hf)
        # cache is O(1) in context
        assert ours.caches[0]["ssm"].shape == (64, 8)
        assert ours.caches[0]["conv"].shape == (64, 4)

    def test_blocked_prefill_matches(self, tmp_path):
        """Stateful prefill: streaming the prompt through prefill_fn in
        blocks (carrying conv+SSM state) matches the one-shot path exactly
        — the 16k+ long-context memory fix (prefill working set becomes
        [block, E, N] instead of [S, E, N])."""
        import jax
        import jax.numpy as jnp
        from pygpukit_tpu.llm.models.mamba import (
            MambaModel, forward_fn, init_caches, prefill_fn)
        cfg = transformers.MambaConfig(
            vocab_size=96, hidden_size=32, state_size=8,
            num_hidden_layers=2, conv_kernel=4, intermediate_size=64,
            time_step_rank=4, use_conv_bias=True, use_bias=False,
            pad_token_id=0)
        torch.manual_seed(38)
        m = transformers.MambaForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        ours = MambaModel.from_safetensors(tmp_path, dtype=jnp.float32)
        prompt = [1, 7, 23, 5, 9, 2, 40, 11, 3, 8, 30]
        ref = list(ours.generate(prompt, max_new_tokens=6))
        # block=4 exercises full blocks + a 3-token remainder, and a block
        # shorter than conv_kernel history handoff
        ours.caches = None
        got = list(ours.generate(prompt, max_new_tokens=6, prefill_block=4))
        assert got == ref, (got, ref)
        # functional-level check: two stateful prefill calls == one forward
        c = ours.config
        caches = init_caches(c, 16, jnp.float32)
        pf = jax.jit(lambda cc, t, n: prefill_fn(c, ours.params, cc, t, n))
        toks = jnp.asarray(prompt, jnp.int32)
        caches, _ = pf(caches, toks[:6], jnp.int32(6))
        caches, logits = pf(caches, jnp.pad(toks[6:], (0, 1)), jnp.int32(5))
        full = forward_fn(c, ours.params, toks)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(full[-1]),
                                   rtol=1e-5, atol=1e-5)

    def test_falcon_mamba_parity(self, tmp_path):
        """FalconMamba = mamba + weightless RMS norms on B/C/dt before
        discretisation (mixer_rms_eps, auto-detected from model_type)."""
        import jax.numpy as jnp
        from pygpukit_tpu.llm.models.mamba import MambaModel
        cfg = transformers.FalconMambaConfig(
            vocab_size=96, hidden_size=32, state_size=8,
            num_hidden_layers=2, conv_kernel=4, intermediate_size=64,
            time_step_rank=4, use_conv_bias=True, use_bias=False,
            mixer_rms_eps=1e-6, pad_token_id=0)
        torch.manual_seed(37)
        m = transformers.FalconMambaForCausalLM(cfg).eval()
        m.save_pretrained(tmp_path, safe_serialization=True)
        ours = MambaModel.from_safetensors(tmp_path, dtype=jnp.float32)
        assert ours.config.mixer_rms_eps == 1e-6
        prompt = [1, 7, 23, 5, 9, 2]
        got = ours.get_logits(prompt)
        with torch.no_grad():
            ref = m(torch.tensor([prompt])).logits[0].numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        out = ours.generate(prompt, max_new_tokens=6)
        hf = m.generate(torch.tensor([prompt]), max_new_tokens=6,
                        do_sample=False, pad_token_id=0)[0, 6:].tolist()
        assert list(out) == hf, (out, hf)
