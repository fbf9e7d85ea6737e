"""Round-4 verify: int4_block w4a8 fusedq default + bf16 scale storage.

Drives the changed path on the REAL TPU through the public API:
1. backend is tpu + tunnel health probe
2. gemv_int4_block_w4a8_stacked kernel-quant vs xla-quant BITWISE equal
   (the fusedq kernel relocates the act-quant math op-for-op), and
   rel-error vs the f32 matmul within the rung envelope
3. end-to-end 1B int4_block decode: finite logits, tok/s printed

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_r4_int4block.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import pygpukit_tpu as gp
    plat = gp.get_backend().platform
    print(f"backend: {plat}", flush=True)
    assert plat == "tpu", plat

    # tunnel health probe
    f = jax.jit(lambda x: x + 1)
    z = jnp.zeros((1,), jnp.float32)
    np.asarray(f(z))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(z))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"tunnel roundtrip: {min(ts):.1f} ms (healthy ~36)", flush=True)

    from pygpukit_tpu.kernels.gemv_quant import gemv_int4_block_w4a8_stacked
    from pygpukit_tpu.llm.quant import quantize_weight

    L, k, n, blk = 2, 2048, 2816, 32
    rng = np.random.default_rng(0)
    w = rng.standard_normal((L, k, n)).astype(np.float32) * 0.02
    wq = quantize_weight(jnp.asarray(w), "int4_block", block_size=blk)
    assert wq["scale_block"].dtype == jnp.bfloat16, wq["scale_block"].dtype
    x = rng.standard_normal((1, k)).astype(np.float32)
    ys = {}
    for mode in ("kernel", "xla"):
        os.environ["PYGPUKIT_W4A8_QUANT"] = mode
        t0 = time.perf_counter()
        ys[mode] = np.asarray(gemv_int4_block_w4a8_stacked(
            wq["q_packed"], jnp.int32(1), jnp.asarray(x, jnp.bfloat16),
            wq["scale_block"]), np.float32)
        print(f"mode={mode}: first call {time.perf_counter()-t0:.1f}s "
              f"(incl. compile)", flush=True)
    os.environ.pop("PYGPUKIT_W4A8_QUANT")
    assert np.array_equal(ys["kernel"], ys["xla"]), "kernel != xla quant form"
    ref = x @ w[1]
    rel = np.linalg.norm(ys["kernel"] - ref) / np.linalg.norm(ref)
    print(f"bitwise kernel==xla OK; rel vs f32 = {rel:.4f}", flush=True)
    assert rel < 0.25, rel  # rung RMS ~10% + int8 act quant

    # end-to-end decode on the 1B config (default path = fusedq kernel)
    from pygpukit_tpu.llm.config import TransformerConfig
    from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                        init_params_device)
    from pygpukit_tpu.llm.quant import quantize_model_params
    cfg = TransformerConfig(
        vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
        num_kv_heads=4, intermediate_size=5632,
        max_position_embeddings=2048, tie_word_embeddings=False)
    params = quantize_model_params(
        fuse_params(init_params_device(cfg, 0, jnp.bfloat16)), "int4_block")
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
    model.init_fixed_cache(512)
    out = model.generate(list(range(1, 17)), max_new_tokens=129,
                         chunk_size=128)      # warm the SAME chunk size
    assert all(0 <= t < 32000 for t in out), out[:8]
    model.init_fixed_cache(512)
    t0 = time.perf_counter()
    out = model.generate(list(range(1, 17)), max_new_tokens=129,
                         chunk_size=128)
    dt = time.perf_counter() - t0
    print(f"int4_block decode: {len(out)/dt:.1f} tok/s "
          f"({dt/len(out)*1e3:.2f} ms/tok), tokens finite/in-range OK",
          flush=True)
    print("VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
