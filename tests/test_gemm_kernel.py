import numpy as np
import jax.numpy as jnp
import pytest

from pygpukit_tpu.kernels.gemm import gemm, batched_gemm


@pytest.mark.parametrize("m,k,n", [(64, 64, 64), (300, 260, 384)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gemm_matches_numpy(m, k, n, dtype):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((m, k), dtype=np.float32)
    b = rng.standard_normal((k, n), dtype=np.float32)
    out = gemm(jnp.asarray(a, dtype), jnp.asarray(b, dtype))
    ref = a @ b
    tol = 1e-4 if dtype == jnp.float32 else 2e-2
    rel = np.abs(np.asarray(out, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < tol, f"rel err {rel}"


def test_gemm_small_fallback():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((7, 13), dtype=np.float32)
    b = rng.standard_normal((13, 5), dtype=np.float32)
    out = gemm(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), a @ b, rtol=1e-5, atol=1e-5)


def test_batched_gemm():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((4, 32, 64), dtype=np.float32)
    b = rng.standard_normal((4, 64, 16), dtype=np.float32)
    out = batched_gemm(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), a @ b, rtol=1e-4, atol=1e-4)
