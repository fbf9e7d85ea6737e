"""Pallas batched KV-row write kernel (kernels/kv_row_write.py).

Replaces the batch-rows step's vmapped per-slot scatter writes (a serial
8-iteration loop per pool leaf, ~1.46 ms/step at batch-8 bf16, double for
int8 dicts — device-traced) with ONE RMW pallas_call per layer. Writes
must be bitwise-identical to the XLA scatter path for every pool layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pygpukit_tpu.kernels.kv_row_write import kv_rows_write
from pygpukit_tpu.ops.embedding import kv_cache_zeros, kv_write

B, L, MAX, HK, D = 8, 3, 1024, 2, 64


def _ref_write(layer):
    def f(kc_b, vc_b, kb, vb, pb):
        nd = kc_b["q"].ndim if isinstance(kc_b, dict) else kc_b.ndim
        if nd == 3:
            kc_b = kv_write(kc_b, kb.reshape(1, 1, -1), (layer, pb, 0))
            vc_b = kv_write(vc_b, vb.reshape(1, 1, -1), (layer, pb, 0))
        else:
            kc_b = kv_write(kc_b, kb[None, None], (layer, pb, 0, 0))
            vc_b = kv_write(vc_b, vb[None, None], (layer, pb, 0, 0))
        return kc_b, vc_b
    return f


@pytest.mark.parametrize("kv,merged", [
    (jnp.bfloat16, True), (jnp.bfloat16, False),
    (jnp.float8_e4m3fn, True), (jnp.int8, True), (jnp.int8, False),
])
def test_bitwise_vs_scatter(kv, merged):
    rows_k = jax.random.normal(jax.random.PRNGKey(0), (B, HK, D),
                               jnp.bfloat16)
    rows_v = jax.random.normal(jax.random.PRNGKey(1), (B, HK, D),
                               jnp.bfloat16)
    # edge positions: window starts, window ends, chunk boundaries
    poss = jnp.array([0, 5, 17, 511, 512, 1023, 8, 9], jnp.int32)
    shape = (B, L, MAX, HK * D) if merged else (B, L, MAX, HK, D)
    kp = kv_cache_zeros(shape, kv, merged=merged)
    vp = kv_cache_zeros(shape, kv, merged=merged)
    # nonzero neighbourhood: the RMW blend must preserve adjacent rows
    kp = jax.tree.map(lambda a: a + jnp.ones((), a.dtype), kp)
    kk, vk = kv_rows_write(kp, vp, rows_k, rows_v, 1, poss)
    kr, vr = jax.vmap(_ref_write(1))(kp, vp, rows_k, rows_v, poss)
    for a, b in zip(jax.tree.leaves(kk) + jax.tree.leaves(vk),
                    jax.tree.leaves(kr) + jax.tree.leaves(vr)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), (kv, merged)


@pytest.mark.parametrize("max_len", [256, 576])
def test_int8_scale_window_small_max(max_len):
    """int8-KV scale tiles ride a FULL-width block when MAX isn't a
    512-multiple (a partial window would clamp out of bounds on TPU and
    blend the wrong column)."""
    rows_k = jax.random.normal(jax.random.PRNGKey(2), (B, HK, D),
                               jnp.bfloat16)
    rows_v = jax.random.normal(jax.random.PRNGKey(3), (B, HK, D),
                               jnp.bfloat16)
    poss = jnp.array([0, 5, 17, 100, max_len - 1, 8, 9, 63], jnp.int32)
    shape = (B, L, max_len, HK * D)
    kp = kv_cache_zeros(shape, jnp.int8, merged=True)
    vp = kv_cache_zeros(shape, jnp.int8, merged=True)
    kk, vk = kv_rows_write(kp, vp, rows_k, rows_v, 1, poss)
    kr, vr = jax.vmap(_ref_write(1))(kp, vp, rows_k, rows_v, poss)
    for a, b in zip(jax.tree.leaves(kk) + jax.tree.leaves(vk),
                    jax.tree.leaves(kr) + jax.tree.leaves(vr)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), max_len


def test_batch_step_token_parity(monkeypatch):
    """batch_decode_step_fn with PYGPUKIT_KV_WRITE=pallas (interpret on
    CPU) produces the same token stream as the XLA scatter path."""
    from pygpukit_tpu.llm.config import TransformerConfig
    from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                        init_params_device)
    from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

    cfg = TransformerConfig(
        vocab_size=256, hidden_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=256,
        max_position_embeddings=256)
    params = fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16))
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
    monkeypatch.setenv("PYGPUKIT_SERVING_STEP", "batch")
    streams = {}
    for mode in ("xla", "pallas"):
        monkeypatch.setenv("PYGPUKIT_KV_WRITE", mode)
        eng = ContinuousBatchingEngine(model, max_batch=2, max_seq_len=64,
                                       steps_per_dispatch=2)
        rs = [eng.submit([5, 11, 42], max_new_tokens=5),
              eng.submit([7, 3], max_new_tokens=5)]
        eng.run_until_complete()
        streams[mode] = [r.generated for r in rs]
    assert streams["xla"] == streams["pallas"]
