"""Parity tests for the Pallas batched dense-pool decode attention kernel
(kernels/batch_decode_attention.py, interpret mode on CPU) against the XLA
full-softmax reference: ragged context lengths, GQA, softcap, sliding
window, traced layer index, fp8 pool storage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pygpukit_tpu.kernels.batch_decode_attention import batch_decode_attention
from pygpukit_tpu.ops.nn.attention import (_sdpa_fixed_cache_full,
                                           sdpa_fixed_cache_chunked_fn)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _pools(rng, b, L, max_len, hk, d, dtype=np.float32):
    kp = jnp.asarray(
        rng.standard_normal((b, L, max_len, hk, d)).astype(dtype))
    vp = jnp.asarray(
        rng.standard_normal((b, L, max_len, hk, d)).astype(dtype))
    return kp, vp


def _ref(q, kp, vp, lens, layer, **kw):
    return jax.vmap(lambda a, k2, v2, n: _sdpa_fixed_cache_full(
        a, k2[layer], v2[layer], n, **kw))(q, kp, vp, lens)


class TestBatchDecodeAttentionKernel:
    def test_ragged_gqa_layers(self, rng):
        b, L, max_len, hq, hk, d = 4, 3, 64, 4, 2, 8
        kp, vp = _pools(rng, b, L, max_len, hk, d)
        lens = jnp.asarray([3, 16, 17, 64], jnp.int32)
        q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32))
        for layer in (0, 2):
            full = _ref(q, kp, vp, lens, layer)
            out = batch_decode_attention(q, kp, vp, jnp.int32(layer), lens,
                                         chunk=16)
            np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                       rtol=1e-4, atol=1e-5)

    def test_softcap_and_window(self, rng):
        b, L, max_len, hq, hk, d = 3, 2, 48, 4, 4, 8
        kp, vp = _pools(rng, b, L, max_len, hk, d)
        lens = jnp.asarray([5, 30, 48], jnp.int32)
        q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32))
        full = _ref(q, kp, vp, lens, 1, softcap=30.0)
        out = batch_decode_attention(q, kp, vp, jnp.int32(1), lens,
                                     chunk=16, softcap=30.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)
        full = _ref(q, kp, vp, lens, 0, window=9)
        out = batch_decode_attention(q, kp, vp, jnp.int32(0), lens,
                                     chunk=16, window=jnp.int32(9))
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)

    def test_fp8_pool_storage(self, rng):
        """fp8 pools convert in-kernel chunk-at-a-time — must match the
        XLA chunked path reading the same fp8 bytes."""
        b, L, max_len, hq, hk, d = 3, 2, 32, 4, 2, 8
        kp, vp = _pools(rng, b, L, max_len, hk, d)
        kp8, vp8 = kp.astype(jnp.float8_e4m3fn), vp.astype(jnp.float8_e4m3fn)
        lens = jnp.asarray([7, 16, 31], jnp.int32)
        q = jnp.asarray(rng.standard_normal(
            (b, 1, hq, d)).astype(np.float32)).astype(jnp.bfloat16)
        ref = jax.vmap(lambda a, k2, v2, n: sdpa_fixed_cache_chunked_fn(
            a, k2[1], v2[1], n, chunk=16))(q, kp8, vp8, lens)
        out = batch_decode_attention(q, kp8, vp8, jnp.int32(1), lens,
                                     chunk=16)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-3)

    def test_single_chunk_covers_pool(self, rng):
        """chunk >= MAX degenerates to one grid step per slot."""
        b, L, max_len, hq, hk, d = 2, 2, 16, 2, 1, 8
        kp, vp = _pools(rng, b, L, max_len, hk, d)
        lens = jnp.asarray([4, 16], jnp.int32)
        q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32))
        full = _ref(q, kp, vp, lens, 1)
        out = batch_decode_attention(q, kp, vp, jnp.int32(1), lens,
                                     chunk=64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)

    def test_rejects_unsupported_shapes(self, rng):
        b, L, max_len, hq, hk, d = 2, 2, 24, 4, 2, 8
        kp, vp = _pools(rng, b, L, max_len, hk, d)
        lens = jnp.asarray([4, 8], jnp.int32)
        q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32))
        with pytest.raises(ValueError):
            batch_decode_attention(q, kp, vp, jnp.int32(0), lens, chunk=16)
