"""Cross-strategy greedy token-match tests — the reference's key integration
guarantee (SURVEY §4: all decode strategies must produce identical greedy
output)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import CausalTransformerModel, init_params
from pygpukit_tpu.llm.decode import (
    DecodeBatch, DecodeJacobi, DecodeM1, DecodeM1Graph, DecodeSpeculative,
)


@pytest.fixture(scope="module")
def model():
    cfg = TransformerConfig(
        vocab_size=97, hidden_size=48, num_layers=3, num_heads=4,
        num_kv_heads=2, intermediate_size=96, head_dim_override=12,
        norm_type="rmsnorm", activation="silu", use_rope=True,
        max_position_embeddings=128, norm_eps=1e-6,
        tie_word_embeddings=True)
    params = init_params(cfg, seed=3, dtype=jnp.float32)
    return CausalTransformerModel(cfg, params, dtype=jnp.float32)


PROMPT = [5, 11, 42]
N_NEW = 10


@pytest.fixture(scope="module")
def reference_tokens(model):
    model.init_fixed_cache(64)
    return DecodeM1().bind(model).generate(PROMPT, N_NEW)


def test_m1_graph_matches(model, reference_tokens):
    model.init_fixed_cache(64)
    strat = DecodeM1Graph().bind(model)
    strat.init_graph(64)
    assert strat.node_count > 0
    out = strat.generate(PROMPT, N_NEW)
    assert out == reference_tokens


def test_speculative_matches(model, reference_tokens):
    model.init_fixed_cache(64)
    strat = DecodeSpeculative(n_draft_layers=2, gamma=3).bind(model)
    out = strat.generate(PROMPT, N_NEW)
    assert out == reference_tokens
    assert strat.stats.tokens_generated >= N_NEW


def test_speculative_device_loop_full_acceptance(model, reference_tokens):
    """With the draft == the full target (n_draft_layers = num_layers) every
    round must accept all gamma proposals + the bonus token — the mechanism
    ceiling of the device-side loop."""
    model.init_fixed_cache(64)
    strat = DecodeSpeculative(
        n_draft_layers=model.config.num_layers, gamma=3).bind(model)
    out = strat.generate(PROMPT, N_NEW)
    assert out == reference_tokens
    assert strat.stats.rejected == 0
    assert strat.stats.accepted >= strat.stats.steps - 1  # gamma per round


def test_spec_chunk_worst_case_guard(model):
    model.init_fixed_cache(64)
    model.prefill(PROMPT)
    with pytest.raises(ValueError):
        model.decode_spec_chunk(1, n_rounds=64, gamma=3, n_draft=2)


def test_speculative_separate_draft_matches(model, reference_tokens):
    """A SEPARATE (smaller, differently-shaped) draft model must leave the
    target's greedy stream unchanged — verification is exact."""
    dcfg = TransformerConfig(
        vocab_size=97, hidden_size=32, num_layers=1, num_heads=2,
        num_kv_heads=1, intermediate_size=64, head_dim_override=16,
        norm_type="rmsnorm", activation="silu", use_rope=True,
        max_position_embeddings=128, norm_eps=1e-6, tie_word_embeddings=True)
    draft = CausalTransformerModel(dcfg, init_params(dcfg, seed=9,
                                                     dtype=jnp.float32),
                                   dtype=jnp.float32)
    model.init_fixed_cache(64)
    strat = DecodeSpeculative(gamma=3, draft_model=draft).bind(model)
    out = strat.generate(PROMPT, N_NEW)
    assert out == reference_tokens
    assert strat.stats.tokens_generated >= N_NEW


def test_speculative_draft_vocab_mismatch_rejected(model):
    dcfg = TransformerConfig(
        vocab_size=50, hidden_size=32, num_layers=1, num_heads=2,
        num_kv_heads=1, intermediate_size=64, head_dim_override=16,
        max_position_embeddings=128, tie_word_embeddings=True)
    draft = CausalTransformerModel(dcfg, init_params(dcfg, seed=9,
                                                     dtype=jnp.float32),
                                   dtype=jnp.float32)
    with pytest.raises(ValueError):
        DecodeSpeculative(draft_model=draft).bind(model)


def test_jacobi_matches(model, reference_tokens):
    model.init_fixed_cache(64)
    strat = DecodeJacobi(window=4).bind(model)
    out = strat.generate(PROMPT, N_NEW)
    assert out == reference_tokens


def test_batch_matches_and_is_independent(model, reference_tokens):
    strat = DecodeBatch().bind(model)
    prompts = [PROMPT, [7, 3], PROMPT]
    outs = strat.generate(prompts, N_NEW)
    assert outs[0] == reference_tokens
    assert outs[2] == reference_tokens
    assert len(outs[1]) == N_NEW
    # batch position independence: same prompt in different slots matches
    assert outs[0] == outs[2]


def test_uncached_forward_matches(model, reference_tokens):
    out = model.generate(PROMPT, N_NEW, temperature=0.0, use_cache=False)
    assert out == reference_tokens


def test_sliced_draft_runs_sliced_depth(model):
    """decode_step_fn must bound its layer loop by the CACHE's layer dim,
    not cfg.num_layers: the speculative draft passes n_draft-layer slices
    of a deeper model's params into the same fn (regression: a cfg-bound
    loop clamped to the last draft layer and ran full-depth)."""
    import dataclasses
    import jax
    from jax import numpy as jnp
    from pygpukit_tpu.llm.model import decode_step_fn, slice_layers

    cfg = model.config
    params = model.params
    n_draft = 1
    draft_params = dict(params)
    draft_params["layers"] = jax.tree.map(lambda a: a[:n_draft],
                                          params["layers"])
    shape = (n_draft, 16, cfg.num_kv_heads, cfg.head_dim)
    kc = jnp.zeros(shape, jnp.float32)
    vc = jnp.zeros(shape, jnp.float32)
    _, _, logits_sliced = decode_step_fn(
        cfg, draft_params, kc, vc, jnp.int32(5), jnp.int32(0),
        allow_fused=False)
    # ground truth: the same 1-layer stack under a 1-layer config
    cfg1 = dataclasses.replace(cfg, num_layers=n_draft)
    _, _, logits_ref = decode_step_fn(
        cfg1, draft_params, kc, vc, jnp.int32(5), jnp.int32(0),
        allow_fused=False)
    np.testing.assert_allclose(np.asarray(logits_sliced),
                               np.asarray(logits_ref), rtol=1e-6)
