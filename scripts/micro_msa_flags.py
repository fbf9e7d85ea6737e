"""Round-4: probe per-executable compiler options that stop XLA's
memory-space-assignment pass from staging the int4_block scale halves into
VMEM every decode layer step (traced 229 us/tok of slice-done waits +
~350 MB/tok of re-read scale traffic).

Builds a toy 22-layer fori_loop over the down-proj stacked w4a8 GEMV
(the operand that gets staged), compiles it with candidate options, and
greps the optimized HLO for slice-start/S(1) on the scale buffers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_msa_flags.py
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pygpukit_tpu.kernels.gemv_quant import gemv_int4_block_w4a8_stacked

L, K, N, BLK = 22, 5632, 2048, 32
rng = np.random.default_rng(0)
w = jnp.asarray(rng.integers(0, 255, (L, K // 2, N), np.uint8))
s = jnp.asarray(rng.random((L, K // BLK, N), np.float32) * 0.01,
                jnp.bfloat16)
half = s.shape[1] // 2
slo, shi = jnp.asarray(s[:, :half]), jnp.asarray(s[:, half:])
x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)


def loop(w, x, slo, shi, s):
    def body(i, acc):
        y = gemv_int4_block_w4a8_stacked(w, i, acc.reshape(1, -1), s,
                                         slo_stack=slo, shi_stack=shi)
        # fold output back to a K-sized carry so layers chain like decode
        return jnp.tile(y[0], K // N + 1)[:K].astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, L, body, x[0])


def staged(opts):
    f = jax.jit(loop)
    lowered = f.lower(w, x, slo, shi, s)
    compiled = lowered.compile(compiler_options=opts or None)
    hlo = compiled.as_text()
    n_slice = len(re.findall(r"slice-start", hlo))
    n_s1 = len(re.findall(r"S\(1\)", hlo))
    return n_slice, n_s1


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    base = staged(None)
    print(f"baseline: slice-start={base[0]} S(1)={base[1]}", flush=True)
    candidates = [
        {"xla_tpu_scoped_vmem_limit_kib": "1024"},
        {"xla_tpu_enable_latency_hiding_scheduler": "false"},
        {"xla_tpu_memory_bound_loop_optimizer": "false"},
        {"xla_tpu_enable_while_loop_prefetching": "false"},
        {"xla_tpu_async_copy_bandwidth_bytes_per_second": "1"},
        {"xla_tpu_alternate_memory_benefit_scaling_factor_for_async_copies":
         "0"},
        {"xla_tpu_prefer_async_allocations": "false"},
    ]
    for opts in candidates:
        name = list(opts.items())[0]
        try:
            t0 = time.perf_counter()
            r = staged(opts)
            print(f"{name[0]}={name[1]}: slice-start={r[0]} S(1)={r[1]} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name[0]}={name[1]}: REJECTED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
