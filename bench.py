"""Headline benchmark: BF16 GEMM 8192^2 TFLOPS on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference PyGPUkit BF16 GEMM 8192^2 = 173 TFLOPS on RTX 5090
(BASELINE.md «GEMM (dense)»). TPU v5e peak is ~197 bf16 TFLOPS, so
comparable fractions of peak are expected.
"""

from __future__ import annotations

import json
import time

BASELINE_BF16_TFLOPS = 173.0


def bench_gemm_bf16(n: int = 8192, iters: int = 100) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    key = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (n, n), jnp.bfloat16)
    b = jax.random.normal(kb, (n, n), jnp.bfloat16)

    f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16))
    # warm + HARD sync (block_until_ready is unreliable over the axon tunnel;
    # a 1-element D2H read is the trustworthy barrier)
    _ = np.asarray(f(a, b)[0, 0:1])

    # steady-state: chained dependent matmuls; final D2H read as the barrier
    out = a
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(out, b)
    _ = np.asarray(out[0, 0:1])
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * n * n * n / dt / 1e12


def main() -> None:
    tflops = bench_gemm_bf16()
    print(json.dumps({
        "metric": "bf16_gemm_8192_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOPS",
        "vs_baseline": round(tflops / BASELINE_BF16_TFLOPS, 4),
    }))


if __name__ == "__main__":
    main()
