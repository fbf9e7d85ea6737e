"""NumPy parity tests for the ops layer (reference model: tests/test_ops.py)."""

import numpy as np
import pytest

import pygpukit_tpu as gp


def _np(a):
    return a.to_numpy().astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestElementwise:
    def test_add(self, rng):
        a = rng.standard_normal((32, 16), dtype=np.float32)
        b = rng.standard_normal((32, 16), dtype=np.float32)
        out = gp.add(gp.from_numpy(a), gp.from_numpy(b))
        np.testing.assert_allclose(_np(out), a + b, rtol=1e-6)

    def test_sub_mul_div(self, rng):
        a = rng.standard_normal((8, 8), dtype=np.float32)
        b = rng.standard_normal((8, 8), dtype=np.float32) + 2.0
        ga, gb = gp.from_numpy(a), gp.from_numpy(b)
        np.testing.assert_allclose(_np(gp.sub(ga, gb)), a - b, rtol=1e-6)
        np.testing.assert_allclose(_np(gp.mul(ga, gb)), a * b, rtol=1e-6)
        np.testing.assert_allclose(_np(gp.div(ga, gb)), a / b, rtol=1e-5)

    def test_out_param(self, rng):
        a = rng.standard_normal((4, 4), dtype=np.float32)
        b = rng.standard_normal((4, 4), dtype=np.float32)
        out = gp.zeros((4, 4))
        ret = gp.add(gp.from_numpy(a), gp.from_numpy(b), out=out)
        assert ret is out
        np.testing.assert_allclose(_np(out), a + b, rtol=1e-6)

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            gp.add(gp.zeros((2, 3)), gp.zeros((4, 5)))

    def test_clamp_where(self, rng):
        a = rng.standard_normal((10,), dtype=np.float32)
        np.testing.assert_allclose(
            _np(gp.clamp(gp.from_numpy(a), -0.5, 0.5)), np.clip(a, -0.5, 0.5))
        cond = a > 0
        np.testing.assert_allclose(
            _np(gp.where(gp.from_numpy(cond), gp.from_numpy(a), gp.from_numpy(-a))),
            np.where(cond, a, -a))

    def test_operators(self, rng):
        a = rng.standard_normal((5, 5), dtype=np.float32)
        b = rng.standard_normal((5, 5), dtype=np.float32)
        ga, gb = gp.from_numpy(a), gp.from_numpy(b)
        np.testing.assert_allclose(_np(ga + gb), a + b, rtol=1e-6)
        np.testing.assert_allclose(_np(ga * 2.0), a * 2.0, rtol=1e-6)
        np.testing.assert_allclose(_np(-ga), -a, rtol=1e-6)


class TestUnary:
    def test_exp_log_sqrt(self, rng):
        a = np.abs(rng.standard_normal((16,), dtype=np.float32)) + 0.1
        ga = gp.from_numpy(a)
        np.testing.assert_allclose(_np(gp.exp(ga)), np.exp(a), rtol=1e-5)
        np.testing.assert_allclose(_np(gp.log(ga)), np.log(a), rtol=1e-5)
        np.testing.assert_allclose(_np(gp.sqrt(ga)), np.sqrt(a), rtol=1e-6)
        np.testing.assert_allclose(_np(gp.rsqrt(ga)), 1 / np.sqrt(a), rtol=1e-5)

    def test_trig(self, rng):
        a = rng.standard_normal((16,), dtype=np.float32)
        ga = gp.from_numpy(a)
        np.testing.assert_allclose(_np(gp.sin(ga)), np.sin(a), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(_np(gp.cos(ga)), np.cos(a), rtol=1e-5, atol=1e-6)


class TestReduction:
    def test_sum_mean_max_min(self, rng):
        a = rng.standard_normal((8, 16), dtype=np.float32)
        ga = gp.from_numpy(a)
        np.testing.assert_allclose(_np(gp.sum(ga)), a.sum(), rtol=1e-5)
        np.testing.assert_allclose(_np(gp.mean(ga)), a.mean(), rtol=1e-5)
        np.testing.assert_allclose(_np(gp.max(ga)), a.max())
        np.testing.assert_allclose(_np(gp.min(ga)), a.min())

    def test_axis_reductions(self, rng):
        a = rng.standard_normal((8, 16), dtype=np.float32)
        ga = gp.from_numpy(a)
        np.testing.assert_allclose(_np(gp.sum(ga, axis=0)), a.sum(0), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(_np(gp.sum_axis(ga, 1)), a.sum(1), rtol=1e-5,
                                   atol=1e-6)
        assert gp.argmax(ga, axis=1).to_numpy().tolist() == a.argmax(1).tolist()

    def test_softmax(self, rng):
        a = rng.standard_normal((4, 10), dtype=np.float32)
        out = _np(gp.softmax(gp.from_numpy(a)))
        e = np.exp(a - a.max(-1, keepdims=True))
        np.testing.assert_allclose(out, e / e.sum(-1, keepdims=True), rtol=1e-5)


class TestMatmul:
    def test_matmul(self, rng):
        a = rng.standard_normal((33, 65), dtype=np.float32)
        b = rng.standard_normal((65, 17), dtype=np.float32)
        out = gp.matmul(gp.from_numpy(a), gp.from_numpy(b))
        np.testing.assert_allclose(_np(out), a @ b, rtol=1e-4, atol=1e-4)

    def test_matmul_nt(self, rng):
        a = rng.standard_normal((8, 32), dtype=np.float32)
        bt = rng.standard_normal((16, 32), dtype=np.float32)
        out = gp.matmul_nt(gp.from_numpy(a), gp.from_numpy(bt))
        np.testing.assert_allclose(_np(out), a @ bt.T, rtol=1e-4, atol=1e-4)

    def test_gemv(self, rng):
        w = rng.standard_normal((64, 32), dtype=np.float32)
        x = rng.standard_normal((32,), dtype=np.float32)
        out = gp.gemv(gp.from_numpy(w), gp.from_numpy(x))
        np.testing.assert_allclose(_np(out), w @ x, rtol=1e-4, atol=1e-4)

    def test_inner_dim_mismatch(self):
        with pytest.raises(ValueError):
            gp.matmul(gp.zeros((3, 4)), gp.zeros((5, 6)))

    def test_batched(self, rng):
        a = rng.standard_normal((3, 8, 16), dtype=np.float32)
        b = rng.standard_normal((3, 16, 4), dtype=np.float32)
        out = gp.batched_matmul(gp.from_numpy(a), gp.from_numpy(b))
        np.testing.assert_allclose(_np(out), a @ b, rtol=1e-4, atol=1e-4)


class TestQuantized:
    def test_fp8_roundtrip_matmul(self, rng):
        a = rng.standard_normal((32, 64), dtype=np.float32)
        b = rng.standard_normal((64, 48), dtype=np.float32)
        aq, sa = gp.ops.quantize_fp8(gp.from_numpy(a))
        bq, sb = gp.ops.quantize_fp8(gp.from_numpy(b))
        out = gp.matmul_fp8(aq, bq, sa, sb)
        ref = a @ b
        rel = np.abs(_np(out) - ref).max() / np.abs(ref).max()
        assert rel < 0.05, f"fp8 rel err {rel}"

    def test_int8_matmul(self, rng):
        a = rng.standard_normal((16, 32), dtype=np.float32)
        b = rng.standard_normal((32, 24), dtype=np.float32)
        aq, sa = gp.ops.quantize_int8(gp.from_numpy(a), axis=1)
        bq, sb = gp.ops.quantize_int8(gp.from_numpy(b), axis=0)
        out = gp.matmul_int8(aq, bq, sa, sb, out_dtype="float32")
        ref = a @ b
        rel = np.abs(_np(out) - ref).max() / np.abs(ref).max()
        assert rel < 0.05, f"int8 rel err {rel}"

    def test_w8a16_gemv(self, rng):
        w = rng.standard_normal((48, 64), dtype=np.float32)
        x = rng.standard_normal((64,), dtype=np.float32)
        wq, ws = gp.ops.quantize_fp8(gp.from_numpy(w))
        out = gp.ops.gemv_w8a16(gp.from_numpy(x).astype("bfloat16"), wq, ws)
        ref = w @ x
        rel = np.abs(_np(out) - ref).max() / np.abs(ref).max()
        assert rel < 0.1, f"w8a16 rel err {rel}"

    def test_int4_quantize(self, rng):
        w = rng.standard_normal((16, 32), dtype=np.float32)
        wq, ws = gp.ops.quantize_int4(gp.from_numpy(w), axis=1)
        deq = wq.to_numpy().astype(np.float32) * ws.to_numpy()
        rel = np.abs(deq - w).max() / np.abs(w).max()
        assert rel < 0.25

    def test_grouped_matmul(self, rng):
        t, k, n, e = 12, 16, 8, 4
        a = rng.standard_normal((t, k), dtype=np.float32)
        ws = rng.standard_normal((e, k, n), dtype=np.float32)
        gid = rng.integers(0, e, size=(t,))
        out = gp.grouped_matmul(gp.from_numpy(a), gp.from_numpy(ws),
                                gp.from_numpy(gid.astype(np.int32)))
        ref = np.stack([a[i] @ ws[gid[i]] for i in range(t)])
        np.testing.assert_allclose(_np(out), ref, rtol=1e-4, atol=1e-4)


class TestBlockwiseFP8:
    def test_roundtrip_and_matmul_error(self, rng):
        import jax.numpy as jnp
        from pygpukit_tpu.ops.matmul import matmul_fp8_block, quantize_fp8_block
        k, n, m = 256, 384, 64
        # mix of scales per block region (the case blockwise scaling exists for)
        w = rng.standard_normal((k, n)).astype(np.float32)
        w[:128, :128] *= 50.0            # outlier block
        x = rng.standard_normal((m, k)).astype(np.float32)
        wq, ws = quantize_fp8_block(gp.from_numpy(w))
        assert ws.shape == (2, 3)
        out = matmul_fp8_block(gp.from_numpy(x), wq, ws, out_dtype="float32")
        ref = x @ w
        # normalized error: blockwise scaling keeps the envelope at the e4m3
        # information floor (~2-3% RMS on gaussian data) even with the
        # outlier block — per-tensor scaling would blow up instead
        err = np.linalg.norm(_np(out) - ref) / np.linalg.norm(ref)
        assert err < 0.04, err

    def test_blockwise_beats_per_tensor_on_outliers(self, rng):
        import jax.numpy as jnp
        from pygpukit_tpu.ops.matmul import (
            matmul_fp8, matmul_fp8_block, quantize_fp8, quantize_fp8_block,
        )
        k, n, m = 256, 256, 32
        w = rng.standard_normal((k, n)).astype(np.float32)
        w[0, 0] = 500.0                  # single outlier wrecks per-tensor
        x = rng.standard_normal((m, k)).astype(np.float32)
        ref = x @ w
        wq_b, ws_b = quantize_fp8_block(gp.from_numpy(w))
        out_b = matmul_fp8_block(gp.from_numpy(x), wq_b, ws_b,
                                 out_dtype="float32")
        aq, sa = quantize_fp8(gp.from_numpy(x))
        bq, sb = quantize_fp8(gp.from_numpy(w))
        out_t = matmul_fp8(aq, bq, sa, sb, out_dtype="float32")
        err_b = np.linalg.norm(_np(out_b) - ref) / np.linalg.norm(ref)
        err_t = np.linalg.norm(_np(out_t) - ref) / np.linalg.norm(ref)
        assert err_b < err_t / 2, (err_b, err_t)


class TestF32MatmulContext:
    def test_f32_params_get_highest(self):
        import jax
        import jax.numpy as jnp
        from pygpukit_tpu.ops.precision import f32_matmul_context
        import contextlib
        f32_tree = {"w": jnp.zeros((2, 2), jnp.float32)}
        mixed = {"w": jnp.zeros((2, 2), jnp.bfloat16),
                 "norm": jnp.zeros((2,), jnp.float32)}
        assert not isinstance(f32_matmul_context(f32_tree),
                              contextlib.nullcontext)
        # bf16 models (f32 norms by design) stay on fast DEFAULT
        assert isinstance(f32_matmul_context(mixed), contextlib.nullcontext)

    def test_allow_tf32_disables(self, monkeypatch):
        import jax.numpy as jnp
        import contextlib
        from pygpukit_tpu.ops.precision import f32_matmul_context
        monkeypatch.setenv("PYGPUKIT_ALLOW_TF32", "1")
        f32_tree = {"w": jnp.zeros((2, 2), jnp.float32)}
        assert isinstance(f32_matmul_context(f32_tree),
                          contextlib.nullcontext)
