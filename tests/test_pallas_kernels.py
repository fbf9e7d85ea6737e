"""Pallas kernel tests — TPU-only (Mosaic compile; interpret mode is
unusably slow on CI hosts). Run manually:
  JAX_PLATFORMS= python -m pytest tests/test_pallas_kernels.py -m tpu --no-header
The default CI run (CPU backend) skips these.
"""

import numpy as np
import pytest

import jax

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pallas kernels require a TPU (Mosaic)")

pytestmark = [pytest.mark.tpu, tpu_only]


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_flash_attention_matches_sdpa(rng):
    import jax.numpy as jnp
    from pygpukit_tpu.kernels.flash_attention import flash_attention
    from pygpukit_tpu.ops.nn.attention import sdpa_causal_fn
    s, h, d = 512, 8, 128
    q = jnp.asarray(rng.standard_normal((s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((s, h, d)), jnp.float32)
    out = np.asarray(flash_attention(q, k, v))
    ref = np.asarray(jax.jit(sdpa_causal_fn)(q, k, v))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel    # MXU bf16-pass precision


def test_flash_decode_matches_fixed_cache(rng):
    import jax.numpy as jnp
    from pygpukit_tpu.kernels.flash_attention import flash_decode
    from pygpukit_tpu.ops.nn.attention import sdpa_fixed_cache_fn
    max_len, hq, hk, d = 1024, 8, 4, 128
    kc = jnp.asarray(rng.standard_normal((max_len, hk, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((max_len, hk, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((1, hq, d)), jnp.float32)
    out = np.asarray(flash_decode(q, kc, vc, 700))
    ref = np.asarray(jax.jit(sdpa_fixed_cache_fn)(q, kc, vc, jnp.int32(700)))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel    # MXU bf16-pass precision


def test_gemv_quant_w8a16(rng):
    import jax.numpy as jnp
    from pygpukit_tpu.kernels.gemv_quant import gemv_quant
    n, k = 4096, 4096
    w = rng.standard_normal((n, k)).astype(np.float32)
    x = rng.standard_normal(k).astype(np.float32)
    scale = (np.abs(w).max(axis=1, keepdims=True) / 448.0).astype(np.float32)
    wq = jnp.asarray(w / scale, jnp.float8_e4m3fn)
    y = np.asarray(gemv_quant(wq, jnp.asarray(x), jnp.asarray(scale[:, 0])),
                   np.float32)
    ref = w @ x
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_pallas_gemm(rng):
    import jax.numpy as jnp
    from pygpukit_tpu.kernels.gemm import gemm
    a = jnp.asarray(rng.standard_normal((512, 512)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((512, 512)), jnp.bfloat16)
    out = np.asarray(gemm(a, b, force="pallas"), np.float32)
    ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel


def test_moe_gmm_matches_dense(rng):
    import jax.numpy as jnp
    from pygpukit_tpu.ops.moe import moe_dense_fn, moe_gmm_fn
    t, h, i, e, k = 64, 128, 256, 4, 2
    y = jnp.asarray(rng.standard_normal((t, h)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((e, h, i)) * 0.05, jnp.float32)
    wu = jnp.asarray(rng.standard_normal((e, h, i)) * 0.05, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((e, i, h)) * 0.05, jnp.float32)
    logits = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
    dense = np.asarray(jax.jit(lambda *a: moe_dense_fn(*a, 2))(y, wg, wu, wd, logits))
    ragged = np.asarray(jax.jit(lambda *a: moe_gmm_fn(*a, 2))(y, wg, wu, wd, logits))
    rel = np.abs(ragged - dense).max() / (np.abs(dense).max() + 1e-9)
    assert rel < 5e-3, rel


def test_jax_flash_backend_gate(rng):
    import os
    import jax.numpy as jnp
    from pygpukit_tpu.ops.nn.attention import flash_attention_fn, sdpa_causal_fn
    s, h, d = 256, 4, 128
    q = jnp.asarray(rng.standard_normal((s, h, d)), jnp.float32)
    os.environ["PYGPUKIT_FLASH_ATTENTION"] = "jax"
    try:
        out = np.asarray(flash_attention_fn(q, q, q))
    finally:
        del os.environ["PYGPUKIT_FLASH_ATTENTION"]
    ref = np.asarray(jax.jit(sdpa_causal_fn)(q, q, q))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel


def test_paged_attention_scalar_prefetch(rng):
    """Pallas paged attention (scalar-prefetched block table) matches the XLA
    gather formulation — permuted blocks, GQA, ragged ctx_len."""
    import jax.numpy as jnp
    from pygpukit_tpu.kernels.paged_attention import paged_attention
    from pygpukit_tpu.ops.paged import paged_attention_fn
    nb, bs, hq, hk, d = 32, 16, 8, 4, 128
    kp = jnp.asarray(rng.standard_normal((nb, bs, hk, d)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((nb, bs, hk, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((hq, d)), jnp.float32)
    # deliberately scrambled physical block order
    table = jnp.asarray(rng.permutation(nb)[:8], jnp.int32)
    for ctx in (1, 16, 100, 128):     # ragged lengths incl. mid-block
        out = np.asarray(paged_attention(q, kp, vp, table, ctx))
        ref = np.asarray(jax.jit(paged_attention_fn)(
            q, kp, vp, table, jnp.int32(ctx)))
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 5e-3, (ctx, rel)


def test_gemv_int4_packed(rng):
    import jax.numpy as jnp
    from pygpukit_tpu.kernels.gemv_quant import gemv_int4_packed
    n, k = 2048, 2048
    w = rng.standard_normal((n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=1, keepdims=True) / 7.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    # split-half packing: low nibble = K[:K/2], high = K[K/2:]
    lo = q[:, :k // 2] & 0xF
    hi = q[:, k // 2:] & 0xF
    packed = jnp.asarray((lo | (hi << 4)).astype(np.uint8))
    x = rng.standard_normal(k).astype(np.float32)
    y = np.asarray(gemv_int4_packed(packed, jnp.asarray(x),
                                    jnp.asarray(scale[:, 0])), np.float32)
    ref = (q.astype(np.float32) * scale) @ x
    rel = np.abs(y[0] - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel


def test_gemv_int4_packed_stacked(rng):
    """Stacked scalar-prefetch GEMV == sliced kernel BITWISE, per layer and
    under vmap (the decode path streams layer tiles straight from the
    [L, N, K/2] stack — no materialized slice copies)."""
    import jax
    import jax.numpy as jnp
    from pygpukit_tpu.kernels.gemv_quant import (
        gemv_int4_packed, gemv_int4_packed_stacked,
    )
    L, n, k = 3, 2048, 2048
    w = rng.standard_normal((L, n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=2, keepdims=True) / 7.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    lo = q[:, :, :k // 2] & 0xF
    hi = q[:, :, k // 2:] & 0xF
    packed = jnp.asarray((lo | (hi << 4)).astype(np.uint8))
    sc3 = jnp.asarray(np.swapaxes(scale, 1, 2))               # [L, 1, N]
    x = rng.standard_normal(k).astype(np.float32)
    for i in (0, 2):
        y = np.asarray(gemv_int4_packed_stacked(
            packed, jnp.int32(i), jnp.asarray(x), sc3), np.float32)
        ref = np.asarray(gemv_int4_packed(
            packed[i], jnp.asarray(x), jnp.asarray(scale[i, :, 0])),
            np.float32)
        np.testing.assert_array_equal(y, ref)
    # vmap batching (the serving chunk) must also be bitwise
    xs = jnp.asarray(rng.standard_normal((4, 1, k)).astype(np.float32),
                     dtype=jnp.bfloat16)
    f = lambda xv: gemv_int4_packed_stacked(packed, jnp.int32(1), xv, sc3)
    yv = np.asarray(jax.jit(jax.vmap(f))(xs))
    yl = np.stack([np.asarray(jax.jit(f)(xs[b])) for b in range(4)])
    np.testing.assert_array_equal(yv, yl)


def test_gemv_int4_w4a8(rng):
    """The w4a8 decode-default kernel (int8 act quant + native int8 MXU
    dots) against the numpy int4 dequant reference — Mosaic lowering of
    the 8-bit bitcast/XOR unpack and int32-accum dots, not just the
    interpret-mode logic (tests/test_kernels_interpret.py)."""
    import jax.numpy as jnp
    from pygpukit_tpu.kernels.gemv_quant import gemv_int4_w4a8
    n, k = 2048, 2048
    w = rng.standard_normal((n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=1, keepdims=True) / 7.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    lo = q[:, :k // 2] & 0xF
    hi = q[:, k // 2:] & 0xF
    packed = jnp.asarray((lo | (hi << 4)).astype(np.uint8))
    x = rng.standard_normal(k).astype(np.float32)
    y = np.asarray(gemv_int4_w4a8(packed, jnp.asarray(x),
                                  jnp.asarray(scale[:, 0])), np.float32)
    ref = (q.astype(np.float32) * scale) @ x
    # int4 weights + int8 act quant: ~0.5% extra on top of the w4a16 2e-2
    rel = np.abs(y[0] - ref).max() / np.abs(ref).max()
    assert rel < 3e-2, rel


def test_gemv_int4_w4a8_stacked(rng):
    """Stacked w4a8 == sliced w4a8 BITWISE per layer (scalar-prefetch layer
    select; the 1B decode path runs exactly this kernel)."""
    import jax.numpy as jnp
    from pygpukit_tpu.kernels.gemv_quant import (
        gemv_int4_w4a8, gemv_int4_w4a8_stacked,
    )
    L, n, k = 3, 2048, 2048
    w = rng.standard_normal((L, n, k)).astype(np.float32)
    scale = (np.abs(w).max(axis=2, keepdims=True) / 7.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    lo = q[:, :, :k // 2] & 0xF
    hi = q[:, :, k // 2:] & 0xF
    packed = jnp.asarray((lo | (hi << 4)).astype(np.uint8))
    sc3 = jnp.asarray(np.swapaxes(scale, 1, 2))               # [L, 1, N]
    x = rng.standard_normal(k).astype(np.float32)
    for i in (0, 2):
        y = np.asarray(gemv_int4_w4a8_stacked(
            packed, jnp.int32(i), jnp.asarray(x), sc3), np.float32)
        ref = np.asarray(gemv_int4_w4a8(
            packed[i], jnp.asarray(x), jnp.asarray(scale[i, :, 0])),
            np.float32)
        np.testing.assert_array_equal(y, ref)


def test_gemv_int4_block_stacked_device_tiling(rng):
    """K-major block-scaled stacked GEMV at a DEVICE-LEGAL tiling
    (8 | bk_half/blk — the Mosaic sublane rule the interpret tests don't
    enforce): sliced == stacked bitwise, both within the NVF4-class
    error envelope of the numpy dequant reference."""
    import jax.numpy as jnp
    from pygpukit_tpu.kernels.gemv_quant import (
        gemv_int4_block, gemv_int4_block_stacked,
    )
    from pygpukit_tpu.llm.quant import dequantize_weight, quantize_weight
    L, k, n, blk = 3, 2048, 2048, 32
    w = rng.standard_normal((L, k, n)).astype(np.float32)
    wq = quantize_weight(jnp.asarray(w), "int4_block", block_size=blk)
    x = rng.standard_normal(k).astype(np.float32)
    for i in (0, 2):
        y = np.asarray(gemv_int4_block_stacked(
            wq["q_packed"], jnp.int32(i), jnp.asarray(x),
            wq["scale_block"], bn=2048, bk_half=1024), np.float32)
        ys = np.asarray(gemv_int4_block(
            wq["q_packed"][i], jnp.asarray(x), wq["scale_block"][i],
            bn=2048, bk_half=1024), np.float32)
        np.testing.assert_array_equal(y, ys)
        wd = np.asarray(dequantize_weight(
            {"q_packed": wq["q_packed"][i],
             "scale_block": wq["scale_block"][i]}, jnp.float32))
        ref = x @ wd
        rel = np.abs(y[0] - ref).max() / np.abs(ref).max()
        assert rel < 2e-2, rel
