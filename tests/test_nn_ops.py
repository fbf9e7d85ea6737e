"""NN op parity tests: norms, activations, rope family, attention."""

import numpy as np
import pytest

import pygpukit_tpu as gp
from pygpukit_tpu.ops.nn import rope as rope_mod


def _np(a):
    return a.to_numpy().astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestNorms:
    def test_rmsnorm(self, rng):
        x = rng.standard_normal((4, 64), dtype=np.float32)
        w = rng.standard_normal((64,), dtype=np.float32)
        out = _np(gp.rmsnorm(gp.from_numpy(x), gp.from_numpy(w)))
        ref = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_layernorm(self, rng):
        x = rng.standard_normal((4, 64), dtype=np.float32)
        w = rng.standard_normal((64,), dtype=np.float32)
        b = rng.standard_normal((64,), dtype=np.float32)
        out = _np(gp.layernorm(gp.from_numpy(x), gp.from_numpy(w), gp.from_numpy(b)))
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        ref = (x - mu) / np.sqrt(var + 1e-5) * w + b
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_l2norm(self, rng):
        x = rng.standard_normal((3, 32), dtype=np.float32)
        out = _np(gp.l2norm(gp.from_numpy(x)))
        ref = x / np.sqrt((x**2).sum(-1, keepdims=True) + 1e-12)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


class TestActivations:
    def test_silu(self, rng):
        x = rng.standard_normal((16,), dtype=np.float32)
        out = _np(gp.silu(gp.from_numpy(x)))
        np.testing.assert_allclose(out, x / (1 + np.exp(-x)), rtol=1e-5, atol=1e-6)

    def test_gelu_tanh(self, rng):
        x = rng.standard_normal((16,), dtype=np.float32)
        out = _np(gp.gelu(gp.from_numpy(x)))
        ref = 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_swiglu(self, rng):
        g = rng.standard_normal((8,), dtype=np.float32)
        u = rng.standard_normal((8,), dtype=np.float32)
        out = _np(gp.swiglu(gp.from_numpy(g), gp.from_numpy(u)))
        np.testing.assert_allclose(out, g / (1 + np.exp(-g)) * u, rtol=1e-5, atol=1e-6)


class TestRope:
    def test_rope_inplace_matches_manual(self, rng):
        s, h, d = 6, 2, 8
        q = rng.standard_normal((s, h, d), dtype=np.float32)
        k = rng.standard_normal((s, 1, d), dtype=np.float32)
        cos, sin = rope_mod.rope_init(16, d)
        gq, gk = gp.from_numpy(q), gp.from_numpy(k)
        rope_mod.rope_inplace(gq, gk, cos, sin)
        cn, sn = cos.to_numpy(), sin.to_numpy()
        half = d // 2
        ref_q = q.copy()
        for ss in range(s):
            c, snn = cn[ss, :half], sn[ss, :half]
            for hh in range(h):
                q0, q1 = q[ss, hh, :half].copy(), q[ss, hh, half:].copy()
                ref_q[ss, hh, :half] = q0 * c - q1 * snn
                ref_q[ss, hh, half:] = q1 * c + q0 * snn
        np.testing.assert_allclose(_np(gq), ref_q, rtol=1e-5, atol=1e-5)

    def test_rope_variants_shapes(self):
        for fn in (rope_mod.rope_init_ntk_aware, rope_mod.rope_init_linear):
            cos, sin = fn(32, 16, scale=2.0)
            assert cos.shape == (32, 16) and sin.shape == (32, 16)
        cos, sin = rope_mod.rope_init_yarn(64, 16, scale=4.0, original_max_len=16)
        assert cos.shape == (64, 16)

    def test_ntk_differs_from_base(self):
        cos_b, _ = rope_mod.rope_init(32, 16)
        cos_n, _ = rope_mod.rope_init_ntk_aware(32, 16, scale=4.0)
        assert not np.allclose(cos_b.to_numpy(), cos_n.to_numpy())

    def test_pope(self, rng):
        enc = rope_mod.pope_init_encoding(16, 8)
        q = rng.standard_normal((4, 2, 8), dtype=np.float32)
        k = rng.standard_normal((4, 1, 8), dtype=np.float32)
        gq, gk = gp.from_numpy(q), gp.from_numpy(k)
        rope_mod.pope_inplace(gq, gk, enc)
        ref = q + enc.to_numpy()[:4][:, None, :]
        np.testing.assert_allclose(_np(gq), ref, rtol=1e-5, atol=1e-6)

    def test_alibi(self):
        slopes = rope_mod.alibi_init_slopes(4)
        assert slopes.shape == (4,)
        np.testing.assert_allclose(slopes.to_numpy()[0], 2 ** (-8 * 1 / 4), rtol=1e-6)
        bias = rope_mod.alibi_compute_bias(8, 4, slopes)
        bn = bias.to_numpy()
        assert bn.shape == (4, 8, 8)
        assert bn[0, 0, 1] <= -1e8  # causal mask
        np.testing.assert_allclose(bn[1, 5, 2], -slopes.to_numpy()[1] * 3, rtol=1e-5)


class TestAttention:
    def _ref_sdpa(self, q, k, v, causal=True):
        s, h, d = q.shape
        nk = k.shape[1]
        if nk != h:
            k = np.repeat(k, h // nk, axis=1)
            v = np.repeat(v, h // nk, axis=1)
        out = np.zeros_like(q)
        scale = 1 / np.sqrt(d)
        for hh in range(h):
            scores = q[:, hh] @ k[:, hh].T * scale
            if causal:
                mask = np.triu(np.ones((s, s), bool), 1)
                scores = np.where(mask, -1e30, scores)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            p = e / e.sum(-1, keepdims=True)
            out[:, hh] = p @ v[:, hh]
        return out

    def test_sdpa_causal(self, rng):
        s, h, d = 12, 4, 16
        q = rng.standard_normal((s, h, d), dtype=np.float32)
        k = rng.standard_normal((s, h, d), dtype=np.float32)
        v = rng.standard_normal((s, h, d), dtype=np.float32)
        out = _np(gp.sdpa_causal(gp.from_numpy(q), gp.from_numpy(k), gp.from_numpy(v)))
        np.testing.assert_allclose(out, self._ref_sdpa(q, k, v), rtol=1e-4, atol=1e-5)

    def test_sdpa_gqa(self, rng):
        s, hq, hk, d = 10, 8, 2, 16
        q = rng.standard_normal((s, hq, d), dtype=np.float32)
        k = rng.standard_normal((s, hk, d), dtype=np.float32)
        v = rng.standard_normal((s, hk, d), dtype=np.float32)
        out = _np(gp.sdpa_causal(gp.from_numpy(q), gp.from_numpy(k), gp.from_numpy(v)))
        np.testing.assert_allclose(out, self._ref_sdpa(q, k, v), rtol=1e-4, atol=1e-5)

    def test_flash_matches_sdpa(self, rng):
        s, h, d = 70, 2, 16
        q = rng.standard_normal((s, h, d), dtype=np.float32)
        k = rng.standard_normal((s, h, d), dtype=np.float32)
        v = rng.standard_normal((s, h, d), dtype=np.float32)
        ref = _np(gp.sdpa_causal(gp.from_numpy(q), gp.from_numpy(k), gp.from_numpy(v)))
        out = _np(gp.flash_attention(gp.from_numpy(q), gp.from_numpy(k),
                                     gp.from_numpy(v), chunk_size=32))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_fixed_cache_decode(self, rng):
        max_len, hq, hk, d = 16, 4, 2, 8
        ctx = 9
        kc = np.zeros((max_len, hk, d), np.float32)
        vc = np.zeros((max_len, hk, d), np.float32)
        kc[:ctx] = rng.standard_normal((ctx, hk, d))
        vc[:ctx] = rng.standard_normal((ctx, hk, d))
        q = rng.standard_normal((1, hq, d), dtype=np.float32)
        out = _np(gp.sdpa_causal_fixed_cache(
            gp.from_numpy(q), gp.from_numpy(kc), gp.from_numpy(vc), ctx))
        ref = self._ref_sdpa(
            np.concatenate([np.zeros((ctx - 1, hq, d), np.float32), q]),
            kc[:ctx], vc[:ctx])[-1:]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_chunked_decode_matches_full(self, rng):
        """kv-chunk LSE-combine decode (VERDICT r2 #3) vs the full-softmax
        path at every boundary: ctx at/around chunk multiples, GQA,
        lookahead windows, non-dividing max_len."""
        import jax.numpy as jnp
        from pygpukit_tpu.ops.nn.attention import (
            _sdpa_fixed_cache_full, sdpa_fixed_cache_chunked_fn,
        )
        hq, hk, d = 4, 2, 8
        for max_len, chunk in ((64, 16), (72, 16)):   # 72: 16 ∤ 72
            kc = jnp.asarray(
                rng.standard_normal((max_len, hk, d)).astype(np.float32))
            vc = jnp.asarray(
                rng.standard_normal((max_len, hk, d)).astype(np.float32))
            for t in (1, 3):
                q = jnp.asarray(
                    rng.standard_normal((t, hq, d)).astype(np.float32))
                for ctx in (t, 15, 16, 17, 32, max_len):
                    full = _sdpa_fixed_cache_full(q, kc, vc, jnp.int32(ctx))
                    chk = sdpa_fixed_cache_chunked_fn(
                        q, kc, vc, jnp.int32(ctx), chunk=chunk)
                    np.testing.assert_allclose(
                        np.asarray(chk), np.asarray(full),
                        rtol=1e-4, atol=1e-5,
                        err_msg=f"max={max_len} t={t} ctx={ctx}")

    def test_chunked_decode_auto_gate(self, monkeypatch):
        from pygpukit_tpu.ops.nn import attention as A
        monkeypatch.delenv("PYGPUKIT_FLASH_DECODING", raising=False)
        assert A._decode_backend(A.FLASH_DECODING_MIN_CACHE) == "chunked"
        assert A._decode_backend(A.FLASH_DECODING_MIN_CACHE - 1) == "full"
        monkeypatch.setenv("PYGPUKIT_FLASH_DECODING", "full")
        assert A._decode_backend(1 << 20) == "full"
        monkeypatch.setenv("PYGPUKIT_FLASH_DECODING", "chunked")
        assert A._decode_backend(16) == "chunked"

    def test_chunked_decode_batch_vmap(self, rng):
        import jax
        import jax.numpy as jnp
        from pygpukit_tpu.ops.nn.attention import (
            _sdpa_fixed_cache_full, sdpa_fixed_cache_chunked_fn,
        )
        b, max_len, hq, hk, d = 3, 32, 4, 2, 8
        q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32))
        kc = jnp.asarray(
            rng.standard_normal((b, max_len, hk, d)).astype(np.float32))
        vc = jnp.asarray(
            rng.standard_normal((b, max_len, hk, d)).astype(np.float32))
        lens = jnp.asarray([5, 17, 32], jnp.int32)
        full = jax.vmap(_sdpa_fixed_cache_full)(q, kc, vc, lens)
        chk = jax.vmap(
            lambda a, k2, v2, n: sdpa_fixed_cache_chunked_fn(
                a, k2, v2, n, chunk=16))(q, kc, vc, lens)
        np.testing.assert_allclose(np.asarray(chk), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)

    def test_chunked_decode_batch_native(self, rng):
        """Natively-batched chunk loop (shared scalar cursor — the serving
        formulation that avoids vmap's per-slot gather) vs the vmapped
        full-softmax path: ragged ctx_lens, lookahead t>1, softcap,
        sliding window, and the layer-pools form."""
        import jax
        import jax.numpy as jnp
        from pygpukit_tpu.ops.nn.attention import (
            _sdpa_fixed_cache_full, sdpa_batch_fixed_cache_chunked_fn,
            sdpa_batch_pools_fn, decode_pref,
        )
        b, max_len, hq, hk, d = 4, 40, 4, 2, 8
        kc = jnp.asarray(
            rng.standard_normal((b, max_len, hk, d)).astype(np.float32))
        vc = jnp.asarray(
            rng.standard_normal((b, max_len, hk, d)).astype(np.float32))
        lens = jnp.asarray([3, 16, 17, 40], jnp.int32)
        for t in (1, 2):
            q = jnp.asarray(
                rng.standard_normal((b, t, hq, d)).astype(np.float32))
            for kw in ({}, {"softcap": 30.0}, {"window": 9}):
                full = jax.vmap(
                    lambda a, k2, v2, n: _sdpa_fixed_cache_full(
                        a, k2, v2, n, **kw))(q, kc, vc, lens)
                chk = sdpa_batch_fixed_cache_chunked_fn(
                    q, kc, vc, lens, chunk=16, **kw)
                np.testing.assert_allclose(
                    np.asarray(chk), np.asarray(full), rtol=1e-4, atol=1e-5,
                    err_msg=f"t={t} kw={kw}")

        # layer-pools form: [B, L, MAX, Hk, D] with an in-loop layer slice
        L = 3
        kp = jnp.asarray(
            rng.standard_normal((b, L, max_len, hk, d)).astype(np.float32))
        vp = jnp.asarray(
            rng.standard_normal((b, L, max_len, hk, d)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32))
        for layer in (0, 2):
            full = jax.vmap(
                lambda a, k2, v2, n: _sdpa_fixed_cache_full(
                    a, k2[layer], v2[layer], n))(q, kp, vp, lens)
            chk = sdpa_batch_fixed_cache_chunked_fn(
                q, kp, vp, lens, chunk=16, layer=jnp.int32(layer))
            np.testing.assert_allclose(
                np.asarray(chk), np.asarray(full), rtol=1e-4, atol=1e-5)
            with decode_pref("chunked", 16):
                routed, kp2, vp2 = sdpa_batch_pools_fn(
                    q, kp, vp, jnp.int32(layer), lens)
            np.testing.assert_allclose(
                np.asarray(routed), np.asarray(full), rtol=1e-4, atol=1e-5)
            # pools pass through the loop untouched
            np.testing.assert_array_equal(np.asarray(kp2), np.asarray(kp))
            np.testing.assert_array_equal(np.asarray(vp2), np.asarray(vp))
            with decode_pref("full"):
                routed, _, _ = sdpa_batch_pools_fn(
                    q, kp, vp, jnp.int32(layer), lens)
            np.testing.assert_allclose(
                np.asarray(routed), np.asarray(full), rtol=1e-4, atol=1e-5)

    def test_chunked_decode_batch_native_fp8(self, rng):
        """fp8 cache storage: the natively-batched chunk loop converts the
        SAME chunk bytes the per-slot path converts — results must match
        the vmapped chunked path bitwise-closely."""
        import jax
        import jax.numpy as jnp
        from pygpukit_tpu.ops.nn.attention import (
            sdpa_fixed_cache_chunked_fn, sdpa_batch_fixed_cache_chunked_fn,
        )
        b, max_len, hk, hq, d = 3, 32, 2, 4, 8
        kc = jnp.asarray(rng.standard_normal(
            (b, max_len, hk, d)).astype(np.float32)).astype(jnp.float8_e4m3fn)
        vc = jnp.asarray(rng.standard_normal(
            (b, max_len, hk, d)).astype(np.float32)).astype(jnp.float8_e4m3fn)
        q = jnp.asarray(
            rng.standard_normal((b, 1, hq, d)).astype(np.float32)
        ).astype(jnp.bfloat16)
        lens = jnp.asarray([7, 16, 31], jnp.int32)
        ref = jax.vmap(
            lambda a, k2, v2, n: sdpa_fixed_cache_chunked_fn(
                a, k2, v2, n, chunk=16))(q, kc, vc, lens)
        out = sdpa_batch_fixed_cache_chunked_fn(q, kc, vc, lens, chunk=16)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-3)


class TestKVCache:
    def test_update_and_prefill(self, rng):
        from pygpukit_tpu.ops import kv_cache_prefill, kv_cache_update
        kc = gp.zeros((8, 2, 4))
        vc = gp.zeros((8, 2, 4))
        k1 = rng.standard_normal((3, 2, 4), dtype=np.float32)
        v1 = rng.standard_normal((3, 2, 4), dtype=np.float32)
        kv_cache_prefill(kc, vc, gp.from_numpy(k1), gp.from_numpy(v1))
        np.testing.assert_allclose(_np(kc)[:3], k1, rtol=1e-6)
        k2 = rng.standard_normal((1, 2, 4), dtype=np.float32)
        v2 = rng.standard_normal((1, 2, 4), dtype=np.float32)
        kv_cache_update(kc, vc, gp.from_numpy(k2), gp.from_numpy(v2), 3)
        np.testing.assert_allclose(_np(kc)[3], k2[0], rtol=1e-6)
        np.testing.assert_allclose(_np(vc)[3], v2[0], rtol=1e-6)


class TestSampling:
    def test_greedy(self, rng):
        logits = rng.standard_normal((100,), dtype=np.float32)
        tok = gp.sample_token_gpu(gp.from_numpy(logits), temperature=0.0)
        assert tok.item() == logits.argmax()

    def test_seeded_determinism(self, rng):
        logits = rng.standard_normal((50,), dtype=np.float32)
        gl = gp.from_numpy(logits)
        gp.set_sampling_seed(123)
        a = [gp.sample_token_gpu(gl, temperature=1.0).item() for _ in range(5)]
        gp.set_sampling_seed(123)
        b = [gp.sample_token_gpu(gl, temperature=1.0).item() for _ in range(5)]
        assert a == b

    def test_topk_restricts(self, rng):
        logits = np.zeros(10, np.float32)
        logits[3] = 10.0
        logits[7] = 9.0
        gp.set_sampling_seed(0)
        for _ in range(10):
            t = gp.sample_token_gpu(gp.from_numpy(logits), temperature=1.0,
                                    top_k=2).item()
            assert t in (3, 7)


class TestInterleavedRope:
    def test_matches_complex_reference(self):
        """apply_rope_interleaved_fn == complex-pair rotation (the HF llama4
        apply_rotary_emb semantics)."""
        from pygpukit_tpu.ops.nn.rope import (
            apply_rope_interleaved_fn, rope_init,
        )
        rng = np.random.default_rng(0)
        s, h, d, theta = 6, 2, 8, 10000.0
        x = rng.standard_normal((s, h, d)).astype(np.float32)
        cos, sin = rope_init(16, d, theta)
        import jax.numpy as jnp
        got = np.asarray(apply_rope_interleaved_fn(
            jnp.asarray(x), cos.jax[:s], sin.jax[:s]))
        inv = theta ** (-2 * np.arange(d // 2) / d)
        freqs = np.arange(s)[:, None] * inv[None, :]          # [S, D/2]
        xc = x[..., 0::2] + 1j * x[..., 1::2]                 # [S, H, D/2]
        out = xc * np.exp(1j * freqs)[:, None, :]
        ref = np.empty_like(x)
        ref[..., 0::2] = out.real
        ref[..., 1::2] = out.imag
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_inplace_wrapper(self):
        import pygpukit_tpu as gp
        from pygpukit_tpu.ops.nn import rope_inplace_interleaved
        from pygpukit_tpu.ops.nn.rope import rope_init
        rng = np.random.default_rng(1)
        q = gp.from_numpy(rng.standard_normal((4, 2, 8)).astype(np.float32))
        k = gp.from_numpy(rng.standard_normal((4, 1, 8)).astype(np.float32))
        cos, sin = rope_init(8, 8)
        before = _np(q).copy()
        rope_inplace_interleaved(q, k, cos, sin)
        after = _np(q)
        assert not np.allclose(after, before)         # rotated in place
        # position 0 is the identity rotation
        np.testing.assert_allclose(after[0], before[0], rtol=1e-6)
