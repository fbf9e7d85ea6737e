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


class TestPipelineParallel:
    def _setup(self, n_layers=4):
        from pygpukit_tpu.llm import TransformerConfig, init_params
        from pygpukit_tpu.llm.model import forward_fn
        cfg = TransformerConfig(
            vocab_size=64, hidden_size=32, num_layers=n_layers, num_heads=4,
            num_kv_heads=2, intermediate_size=64, head_dim_override=8,
            norm_type="rmsnorm", activation="silu", use_rope=True,
            max_position_embeddings=32, tie_word_embeddings=True)
        params = init_params(cfg, 11, jnp.float32)
        from pygpukit_tpu.ops.nn import rope as rope_mod
        cos, sin = rope_mod.rope_init(cfg.max_position_embeddings,
                                      cfg.head_dim, cfg.rope_theta)
        params["rope_cos"], params["rope_sin"] = cos.jax, sin.jax
        return cfg, params, forward_fn

    def test_gpipe_matches_forward(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from pygpukit_tpu.parallel import (
            make_pp_mesh, pipeline_forward_fn, shard_params_pp,
        )
        cfg, params, forward_fn = self._setup(n_layers=4)
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(0, 64, (3, 8)), jnp.int32)  # M=3
        ref = np.asarray(jax.vmap(
            lambda t: forward_fn(cfg, params, t))(tokens))
        mesh = make_pp_mesh(4)          # 4 stages x 1 layer each
        placed = shard_params_pp(params, mesh)
        assert len(placed["layers"]["w_q"].sharding.device_set) == 4
        got = np.asarray(jax.jit(
            lambda p, t: pipeline_forward_fn(cfg, p, t, mesh))(placed, tokens))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_gpipe_grads_flow(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from pygpukit_tpu.parallel import (
            make_pp_mesh, pipeline_forward_fn, shard_params_pp,
        )
        cfg, params, _ = self._setup(n_layers=2)
        mesh = make_pp_mesh(2)
        placed = shard_params_pp(params, mesh)
        tokens = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)

        def loss(p, t):
            logits = pipeline_forward_fn(cfg, p, t, mesh)
            lp = jax.nn.log_softmax(logits, axis=-1)
            tgt = jnp.roll(t, -1, axis=1)
            return jnp.mean(-jnp.take_along_axis(lp, tgt[..., None],
                                                 axis=-1)[:, :-1])
        l, grads = jax.jit(jax.value_and_grad(loss))(placed, tokens)
        assert np.isfinite(float(l))
        g = grads["layers"]["w_q"]
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_uneven_layers_rejected(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from pygpukit_tpu.parallel import make_pp_mesh, pipeline_forward_fn
        cfg, params, _ = self._setup(n_layers=3)
        mesh = make_pp_mesh(2)
        with pytest.raises(ValueError):
            pipeline_forward_fn(cfg, params,
                                jnp.zeros((1, 4), jnp.int32), mesh)


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


class TestQuantizedLeafSharding:
    """VERDICT r4 #3: the formats that win every bench (int4/int8) must
    TP/EP-shard instead of replicating their weight stacks per chip."""

    def _cfg(self, **kw):
        from pygpukit_tpu.llm import TransformerConfig
        base = dict(
            vocab_size=64, hidden_size=64, num_layers=2, num_heads=8,
            num_kv_heads=4, intermediate_size=128, head_dim_override=8,
            max_position_embeddings=64, tie_word_embeddings=True)
        base.update(kw)
        return TransformerConfig(**base)

    def _pair(self, cfg, mode, mesh, ep=False):
        from pygpukit_tpu.llm import CausalTransformerModel, init_params
        from pygpukit_tpu.llm.quant import quantize_model_params
        params = quantize_model_params(init_params(cfg, 3, jnp.float32),
                                       mode)
        ref = CausalTransformerModel(
            cfg, jax.tree.map(lambda x: x, params), dtype=jnp.float32)
        sh = CausalTransformerModel(cfg, params, dtype=jnp.float32)
        shard_model(sh, mesh, ep=ep)
        assert sh.xla_mm_only
        return ref, sh

    def test_packed_int4_specs(self):
        from pygpukit_tpu.parallel.sharding import _packed_leaf_spec
        from jax.sharding import PartitionSpec as P
        plain = {"q_packed": jnp.zeros((2, 16, 8), jnp.uint8),
                 "scale": jnp.zeros((2, 1, 16), jnp.float32)}
        s = _packed_leaf_spec("w_q", plain)            # column: cut N
        assert s["q_packed"] == P(None, "tp", None)
        assert s["scale"] == P(None, None, "tp")
        s = _packed_leaf_spec("w_o", plain)            # row: cut K/2
        assert s["q_packed"] == P(None, None, "tp")
        assert s["scale"] == P(None, None, None)
        blocked = {"q_packed": jnp.zeros((2, 8, 16), jnp.uint8),
                   "scale_block": jnp.zeros((2, 4, 16), jnp.bfloat16)}
        s = _packed_leaf_spec("w_up", blocked)         # column: trailing N
        assert s["q_packed"] == P(None, None, "tp")
        assert s["scale_block"] == P(None, None, "tp")
        s = _packed_leaf_spec("w_down", blocked)       # row: cut packed K
        assert s["q_packed"] == P(None, "tp", None)
        assert s["scale_block"] == P(None, None, None)  # scales replicate

    @pytest.mark.parametrize("mode", ["int4", "int4_block", "int8"])
    def test_tp_sharded_quantized_generate_matches(self, mode):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh2 = make_mesh(8, tp=2)
        cfg = self._cfg()
        ref, sh = self._pair(cfg, mode, mesh2)
        wq = sh.params["layers"]["w_q"]
        leaf = wq["q_packed"] if "q_packed" in wq else wq["q"]
        # the quantized leaf is genuinely CUT over tp, not replicated
        assert len(leaf.sharding.device_set) == 8
        spec = leaf.sharding.spec
        assert "tp" in tuple(spec), spec
        a = ref.generate([1, 5, 9], max_new_tokens=6, temperature=0.0)
        b = sh.generate([1, 5, 9], max_new_tokens=6, temperature=0.0)
        assert a == b

    def test_ep_sharded_quantized_experts_matches(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh2 = make_mesh(8, tp=2)
        cfg = self._cfg(num_experts=4, num_experts_per_tok=2,
                        moe_intermediate_size=32)
        ref, sh = self._pair(cfg, "int8", mesh2, ep=True)
        wg = sh.params["layers"]["w_experts_gate"]
        assert isinstance(wg, dict)
        # expert axis (1) sharded on every member of the quantized dict
        for vv in wg.values():
            assert tuple(vv.sharding.spec)[1] == "tp", vv.sharding.spec
        a = ref.generate([2, 7], max_new_tokens=6, temperature=0.0)
        b = sh.generate([2, 7], max_new_tokens=6, temperature=0.0)
        assert a == b

    def test_tp_sharded_int4_serving_engine(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from pygpukit_tpu.llm.serving import ContinuousBatchingEngine
        mesh2 = make_mesh(8, tp=2)
        cfg = self._cfg()
        ref, sh = self._pair(cfg, "int4", mesh2)
        ref.init_fixed_cache(64)
        want = ref.generate([3, 9], max_new_tokens=6, temperature=0.0)
        eng = ContinuousBatchingEngine(sh, max_batch=2, max_seq_len=64,
                                       steps_per_dispatch=3, mesh=mesh2,
                                       pipelined=True)
        r1 = eng.submit([3, 9], max_new_tokens=6)
        r2 = eng.submit([5, 1], max_new_tokens=6)
        eng.run_until_complete()
        assert r1.generated == want
        assert r2.done and len(r2.generated) == 6


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
