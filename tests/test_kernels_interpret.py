"""Pallas kernel LOGIC tests in interpret mode (CPU, tiny shapes) — these
run in the default suite so kernel regressions surface without a TPU; the
real-Mosaic parity versions live in test_pallas_kernels.py (TPU-gated)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_gemv_quant_int8_interpret(rng):
    from pygpukit_tpu.kernels.gemv_quant import gemv_quant
    n, k = 256, 256
    w = rng.standard_normal((n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=1, keepdims=True) / 127.0).astype(np.float32)
    wq = jnp.asarray(np.clip(np.round(w / scale), -127, 127), jnp.int8)
    x = rng.standard_normal(k).astype(np.float32)
    y = np.asarray(gemv_quant(wq, jnp.asarray(x), jnp.asarray(scale[:, 0]),
                              bn=128, bk=128), np.float32)
    ref = w @ x
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_gemv_int4_packed_interpret(rng):
    from pygpukit_tpu.kernels.gemv_quant import gemv_int4_packed
    n, k = 256, 256
    w = rng.standard_normal((n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=1, keepdims=True) / 7.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    lo = q[:, :k // 2] & 0xF
    hi = q[:, k // 2:] & 0xF
    packed = jnp.asarray((lo | (hi << 4)).astype(np.uint8))
    x = rng.standard_normal(k).astype(np.float32)
    y = np.asarray(gemv_int4_packed(packed, jnp.asarray(x),
                                    jnp.asarray(scale[:, 0]),
                                    bn=128, bk_half=128), np.float32)
    ref = (q.astype(np.float32) * scale) @ x
    rel = np.abs(y[0] - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel


def test_gemv_int4_packed_stacked_interpret(rng):
    """Stacked-layer GEMV (scalar-prefetch layer select) matches the sliced
    kernel for every layer index."""
    from pygpukit_tpu.kernels.gemv_quant import (
        gemv_int4_packed, gemv_int4_packed_stacked,
    )
    L, n, k = 3, 256, 256
    w = rng.standard_normal((L, n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=2, keepdims=True) / 7.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    lo = q[:, :, :k // 2] & 0xF
    hi = q[:, :, k // 2:] & 0xF
    packed = jnp.asarray((lo | (hi << 4)).astype(np.uint8))   # [L, N, K/2]
    sc3 = jnp.asarray(np.swapaxes(scale, 1, 2))               # [L, 1, N]
    x = rng.standard_normal(k).astype(np.float32)
    for i in range(L):
        y = np.asarray(gemv_int4_packed_stacked(
            packed, jnp.int32(i), jnp.asarray(x), sc3,
            bn=128, bk_half=128), np.float32)
        ref = np.asarray(gemv_int4_packed(
            packed[i], jnp.asarray(x), jnp.asarray(scale[i, :, 0]),
            bn=128, bk_half=128), np.float32)
        np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_gemv_int4_block_stacked_interpret(rng):
    """Stacked block-scaled GEMV (native [K/B, N] scales, scalar-prefetch
    layer select) matches the sliced block kernel per layer."""
    import jax.numpy as jnp

    from pygpukit_tpu.kernels.gemv_quant import (
        gemv_int4_block, gemv_int4_block_stacked,
    )
    from pygpukit_tpu.llm.quant import quantize_weight
    L, k, n, blk = 3, 256, 256, 32
    w = rng.standard_normal((L, k, n)).astype(np.float32)
    wq = quantize_weight(jnp.asarray(w), "int4_block", block_size=blk)
    x = rng.standard_normal(k).astype(np.float32)
    for i in range(L):
        y = np.asarray(gemv_int4_block_stacked(
            wq["q_packed"], jnp.int32(i), jnp.asarray(x),
            wq["scale_block"], bn=128, bk_half=128), np.float32)
        ref = np.asarray(gemv_int4_block(
            wq["q_packed"][i], jnp.asarray(x), wq["scale_block"][i],
            bn=128, bk_half=128), np.float32)
        np.testing.assert_allclose(y, ref, rtol=2e-6, atol=2e-6)


def test_pallas_gemm_interpret(rng):
    from pygpukit_tpu.kernels.gemm import gemm
    a = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    out = np.asarray(gemm(a, b, force="pallas"), np.float32)
    ref = np.asarray(a) @ np.asarray(b)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-4, rel


def test_flash_decode_interpret(rng):
    from pygpukit_tpu.kernels.flash_attention import flash_decode
    from pygpukit_tpu.ops.nn.attention import sdpa_fixed_cache_fn
    max_len, hq, hk, d = 256, 4, 2, 128
    kc = jnp.asarray(rng.standard_normal((max_len, hk, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((max_len, hk, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((1, hq, d)), jnp.float32)
    out = np.asarray(flash_decode(q, kc, vc, 100))
    ref = np.asarray(jax.jit(sdpa_fixed_cache_fn)(q, kc, vc, jnp.int32(100)))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-4, rel


def test_gemv_int4_block_interpret(rng):
    """Block-scaled packed-int4 GEMV (NVF4 analog): scales vary along K in
    blocks; kernel expands the [bn, nb] scale tile with a lane repeat."""
    import jax.numpy as jnp
    from pygpukit_tpu.kernels.gemv_quant import gemv_int4_block
    from pygpukit_tpu.llm.quant import dequantize_weight, quantize_weight
    n, k, blk = 256, 256, 32
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    wq = quantize_weight(w, "int4_block", block_size=blk)
    x = rng.standard_normal((2, k)).astype(np.float32)
    y = np.asarray(gemv_int4_block(wq["q_packed"], jnp.asarray(x),
                                   wq["scale_block"], bn=128, bk_half=128),
                   np.float32)
    ref = x @ np.asarray(dequantize_weight(wq, jnp.float32))
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel


def test_gemv_int4_w4a8_interpret(rng):
    """w4a8 GEMV (int8 activation quant + native int8 dots, XOR-bias
    unpack with rowsum correction) matches the dequantized reference
    within the int4 + int8-act envelope."""
    from pygpukit_tpu.kernels.gemv_quant import gemv_int4_w4a8
    n, k = 256, 256
    w = rng.standard_normal((n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=1, keepdims=True) / 7.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    lo = q[:, :k // 2] & 0xF
    hi = q[:, k // 2:] & 0xF
    packed = jnp.asarray((lo | (hi << 4)).astype(np.uint8))
    x = rng.standard_normal((2, k)).astype(np.float32)
    y = np.asarray(gemv_int4_w4a8(packed, jnp.asarray(x),
                                  jnp.asarray(scale[:, 0]),
                                  bn=128, bk_half=128), np.float32)
    # int-exact reference including the activation quantization
    sx = np.maximum(np.abs(x).max(axis=1, keepdims=True) / 127.0, 1e-12)
    xi = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
    ref = (xi @ q.astype(np.int32).T) * sx * scale[:, 0]
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel


def test_gemv_int4_w4a8_stacked_interpret(rng):
    """Stacked w4a8 GEMV matches the sliced w4a8 kernel per layer."""
    from pygpukit_tpu.kernels.gemv_quant import (
        gemv_int4_w4a8, gemv_int4_w4a8_stacked,
    )
    L, n, k = 3, 256, 256
    w = rng.standard_normal((L, n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=2, keepdims=True) / 7.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    lo = q[:, :, :k // 2] & 0xF
    hi = q[:, :, k // 2:] & 0xF
    packed = jnp.asarray((lo | (hi << 4)).astype(np.uint8))  # [L, N, K/2]
    sc3 = jnp.asarray(np.swapaxes(scale, 1, 2))              # [L, 1, N]
    x = rng.standard_normal(k).astype(np.float32)
    for i in range(L):
        y = np.asarray(gemv_int4_w4a8_stacked(
            packed, jnp.int32(i), jnp.asarray(x), sc3,
            bn=128, bk_half=128), np.float32)
        ref = np.asarray(gemv_int4_w4a8(
            packed[i], jnp.asarray(x), jnp.asarray(scale[i, :, 0]),
            bn=128, bk_half=128), np.float32)
        np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_gemv_int4_block_rejects_misaligned_blocks(rng):
    """B must divide K/2: the lo/hi scale-half split misassigns the block
    straddling the K/2 boundary otherwise — the kernel raises instead of
    silently computing wrong results (callers gate via block_tiles_aligned
    and fall back to the XLA formulation)."""
    import jax.numpy as jnp

    from pygpukit_tpu.kernels.gemv_quant import gemv_int4_block
    k, n, blk = 192, 256, 64                     # B | K but B does not | K/2
    packed = jnp.zeros((k // 2, n), jnp.uint8)
    s = jnp.ones((k // blk, n), jnp.float32)
    x = jnp.zeros((k,), jnp.float32)
    with pytest.raises(ValueError, match="B \\| K/2"):
        gemv_int4_block(packed, x, s)


def test_gemv_int4_w4a8_stacked_fusedq_interpret(rng, monkeypatch):
    """The in-kernel-quant stacked w4a8 form == the XLA-quant form BITWISE
    (same divide/round/clip ops, just relocated into the kernel)."""
    import jax.numpy as jnp

    from pygpukit_tpu.kernels.gemv_quant import gemv_int4_w4a8_stacked
    L, n, k = 2, 256, 256
    w = rng.standard_normal((L, n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=2) / 7.0).astype(np.float32)   # [L, N]
    q = np.clip(np.round(w / scale[:, :, None]), -7, 7).astype(np.int8)
    packed = jnp.asarray(((q[:, :, :k // 2] & 0xF)
                          | ((q[:, :, k // 2:] & 0xF) << 4)).astype(np.uint8))
    sc = jnp.asarray(scale[:, None, :])
    for xdt in (np.float32, None):          # f32 caller and bf16 caller
        x = rng.standard_normal(k).astype(np.float32)
        xj = jnp.asarray(x) if xdt else jnp.asarray(x, jnp.bfloat16)
        ys = {}
        for mode in ("kernel", "xla"):
            monkeypatch.setenv("PYGPUKIT_W4A8_QUANT", mode)
            ys[mode] = np.asarray(gemv_int4_w4a8_stacked(
                packed, jnp.int32(1), xj, sc, bn=128, bk_half=128),
                np.float32)
        np.testing.assert_array_equal(ys["kernel"], ys["xla"])
        ref = (q[1].astype(np.float32) * scale[1][:, None]) @ x
        err = np.abs(ys["kernel"][0] - ref) / (np.abs(ref).max() + 1e-9)
        assert err.max() < 3e-2, err.max()


def test_gemm_int4_w4a8_interpret(rng):
    """M>1 w4a8 GEMM matches the integer-exact reference AND the w4a8 GEMV
    row-for-row (same tile math — _w4a8_tile_dots — so rows must agree
    bitwise when tile shapes coincide)."""
    from pygpukit_tpu.kernels.gemv_quant import gemm_int4_w4a8, gemv_int4_w4a8
    n, k, m = 384, 256, 24
    w = rng.standard_normal((n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=1, keepdims=True) / 7.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    packed = jnp.asarray(((q[:, :k // 2] & 0xF)
                          | ((q[:, k // 2:] & 0xF) << 4)).astype(np.uint8))
    x = rng.standard_normal((m, k)).astype(np.float32)
    y = np.asarray(gemm_int4_w4a8(packed, jnp.asarray(x),
                                  jnp.asarray(scale[:, 0]),
                                  bm=8, bn=128, bk_half=128), np.float32)
    # integer-exact reference including the activation quantization
    sx = np.maximum(np.abs(x).max(axis=1, keepdims=True) / 127.0, 1e-12)
    xi = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
    ref = (xi @ q.astype(np.int32).T) * sx * scale[:, 0]
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel
    # row-for-row vs the GEMV kernel at matching tiles (shared tile math)
    yg = np.asarray(gemv_int4_w4a8(packed, jnp.asarray(x[:8]),
                                   jnp.asarray(scale[:, 0]),
                                   bn=128, bk_half=128), np.float32)
    np.testing.assert_array_equal(y[:8], yg)


def test_gemv_conv_stacked_interpret(rng):
    """Stacked converting GEMV (fp8 K-major [L, K, N] layout): matches the
    XLA dequant dot within fp8 round-trip error, per layer."""
    from pygpukit_tpu.kernels.gemv_quant import gemv_conv_stacked
    L, k, n = 3, 256, 384
    w = rng.standard_normal((L, k, n)).astype(np.float32)
    fmax = float(jnp.finfo(jnp.float8_e4m3fn).max)
    scale = np.maximum(np.abs(w).max(axis=1, keepdims=True) / fmax, 1e-12)
    q = jnp.asarray(w / scale, jnp.float8_e4m3fn)        # [L, K, N]
    sc = jnp.asarray(scale)                              # [L, 1, N]
    x = rng.standard_normal((2, k)).astype(np.float32)
    for i in range(L):
        y = np.asarray(gemv_conv_stacked(q, jnp.int32(i), jnp.asarray(x),
                                         sc, bn=128, bk=128), np.float32)
        wd = np.asarray(q[i], np.float32) * scale[i]
        ref = x.astype(np.float32) @ wd
        rel = np.abs(y - ref).max() / np.abs(ref).max()
        assert rel < 2e-2, (i, rel)


def test_gemv_int4_block_w4a8_fusedq_interpret(rng, monkeypatch):
    """The in-kernel-quant block w4a8 form == the XLA-quant form BITWISE
    (op-for-op relocated quant math, as for the plain-int4 fusedq)."""
    import jax.numpy as jnp

    from pygpukit_tpu.kernels.gemv_quant import gemv_int4_block_w4a8_stacked
    from pygpukit_tpu.llm.quant import quantize_weight
    L, k, n, blk = 2, 256, 384, 32
    w = rng.standard_normal((L, k, n)).astype(np.float32)
    wq = quantize_weight(jnp.asarray(w), "int4_block", block_size=blk)
    for rows in (1, 2):
        x = rng.standard_normal((rows, k)).astype(np.float32)
        ys = {}
        for mode in ("kernel", "xla"):
            monkeypatch.setenv("PYGPUKIT_W4A8_QUANT", mode)
            ys[mode] = np.asarray(gemv_int4_block_w4a8_stacked(
                wq["q_packed"], jnp.int32(1), jnp.asarray(x),
                wq["scale_block"], bn=128, bk_half=128), np.float32)
        np.testing.assert_array_equal(ys["kernel"], ys["xla"])


def test_gemv_int4_block_w4a8_stacked_interpret(rng):
    """int4_block v2 (w4a8 Z-decomposition: int8 MXU dots, per-block scales
    post-dot) matches the integer-exact reference including the activation
    quantization — and hence the v1 bf16 kernel within the act-quant
    envelope."""
    import jax.numpy as jnp

    from pygpukit_tpu.kernels.gemv_quant import (
        gemv_int4_block_stacked, gemv_int4_block_w4a8_stacked,
    )
    from pygpukit_tpu.llm.quant import dequantize_weight, quantize_weight
    L, k, n, blk = 3, 256, 384, 32
    w = rng.standard_normal((L, k, n)).astype(np.float32)
    wq = quantize_weight(jnp.asarray(w), "int4_block", block_size=blk)
    x = rng.standard_normal((2, k)).astype(np.float32)
    sx = np.maximum(np.abs(x).max(axis=1, keepdims=True) / 127.0, 1e-12)
    xi = np.clip(np.round(x / sx), -127, 127).astype(np.float64)
    for i in range(L):
        y = np.asarray(gemv_int4_block_w4a8_stacked(
            wq["q_packed"], jnp.int32(i), jnp.asarray(x),
            wq["scale_block"], bn=128, bk_half=128), np.float32)
        wd = np.asarray(dequantize_weight(
            {kk: vv[i] for kk, vv in wq.items()}, jnp.float32), np.float64)
        ref = (xi @ wd) * sx
        rel = np.abs(y - ref).max() / np.abs(ref).max()
        assert rel < 2e-2, (i, rel)
        # v1 (bf16 acts) agreement within the act-quant envelope
        v1 = np.asarray(gemv_int4_block_stacked(
            wq["q_packed"], jnp.int32(i), jnp.asarray(x),
            wq["scale_block"], bn=128, bk_half=128), np.float32)
        relv = np.abs(y - v1).max() / np.abs(v1).max()
        assert relv < 2e-2, (i, relv)
