"""Multi-chip sharding tests on the 8-device virtual CPU mesh: TP-sharded
inference must match unsharded bitwise-close; mesh/spec construction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pygpukit_tpu.parallel import make_mesh, param_specs, shard_model, shard_params


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8


def test_param_specs_cover_tree():
    from pygpukit_tpu.llm import TransformerConfig, init_params
    cfg = TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, head_dim_override=8,
        max_position_embeddings=32, tie_word_embeddings=True)
    params = init_params(cfg, 0, jnp.float32)
    specs = param_specs(params)
    assert set(specs["layers"].keys()) == set(params["layers"].keys())
    # column-parallel out dims sharded on tp
    assert specs["layers"]["w_q"][-1] == "tp"
    assert specs["layers"]["w_down"][-2] == "tp"


def test_tp_sharded_forward_matches(mesh):
    from pygpukit_tpu.llm import CausalTransformerModel, TransformerConfig, init_params
    cfg = TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=8,
        num_kv_heads=4, intermediate_size=64, head_dim_override=8,
        max_position_embeddings=64, tie_word_embeddings=True)
    params = init_params(cfg, 0, jnp.float32)
    model = CausalTransformerModel(cfg, params, dtype=jnp.float32)
    ref = model.get_logits([1, 5, 9])

    model_sharded = CausalTransformerModel(
        cfg, init_params(cfg, 0, jnp.float32), dtype=jnp.float32)
    shard_model(model_sharded, mesh)
    # verify leaves actually live on the mesh
    wq = model_sharded.params["layers"]["w_q"]
    assert len(wq.sharding.device_set) == 8
    got = model_sharded.get_logits([1, 5, 9])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_tp_sharded_generate_matches(mesh):
    from pygpukit_tpu.llm import CausalTransformerModel, TransformerConfig, init_params
    cfg = TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=8,
        num_kv_heads=4, intermediate_size=64, head_dim_override=8,
        max_position_embeddings=64, tie_word_embeddings=True)
    m1 = CausalTransformerModel(cfg, init_params(cfg, 0, jnp.float32),
                                dtype=jnp.float32)
    ref = m1.generate([1, 5], max_new_tokens=5, temperature=0.0)
    m2 = CausalTransformerModel(cfg, init_params(cfg, 0, jnp.float32),
                                dtype=jnp.float32)
    shard_model(m2, mesh)
    got = m2.generate([1, 5], max_new_tokens=5, temperature=0.0)
    assert got == ref


def test_tp_sharded_serving_engine(mesh):
    """Continuous-batching serving over a TP-sharded model: the batched
    decode executable compiles as a GSPMD-partitioned program."""
    from pygpukit_tpu.llm import CausalTransformerModel, TransformerConfig, init_params
    from pygpukit_tpu.llm.serving import ContinuousBatchingEngine
    cfg = TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=8,
        num_kv_heads=4, intermediate_size=64, head_dim_override=8,
        max_position_embeddings=128, tie_word_embeddings=True)
    ref_model = CausalTransformerModel(cfg, init_params(cfg, 0, jnp.float32),
                                       dtype=jnp.float32)
    ref_model.init_fixed_cache(64)
    ref = ref_model.generate([3, 9], max_new_tokens=6, temperature=0.0)

    sharded = CausalTransformerModel(cfg, init_params(cfg, 0, jnp.float32),
                                     dtype=jnp.float32)
    shard_model(sharded, mesh)
    eng = ContinuousBatchingEngine(sharded, max_batch=2, max_seq_len=64,
                                   steps_per_dispatch=3)
    r1 = eng.submit([3, 9], max_new_tokens=6)
    r2 = eng.submit([5, 1], max_new_tokens=6)
    eng.run_until_complete()
    assert r1.generated == ref
    assert r2.done and len(r2.generated) == 6
