"""int4 batch-rows serving: steps_per_dispatch sweep (round 4).

Round 3 measured the vmapped int8 chunk at 16->1520 / 32->1500 / 64->1826
/ 128->1925 tok/s (alignment with 128-token requests dominates). The
batch-rows int4 chunk hit 1827 at steps=32; this sweeps the chunk size on
the SAME engine config to find the round-4 serving headline.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_serving_steps4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def main():
    os.environ["PYGPUKIT_SERVING_STEP"] = "batch"
    from pygpukit_tpu.llm.config import TransformerConfig
    from pygpukit_tpu.llm.model import (
        CausalTransformerModel, fuse_params, init_params_device,
    )
    from pygpukit_tpu.llm.quant import quantize_model_params
    from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

    cfg = TransformerConfig(
        vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
        num_kv_heads=4, intermediate_size=5632,
        max_position_embeddings=2048, tie_word_embeddings=False)
    params = quantize_model_params(
        fuse_params(init_params_device(cfg, 0, jnp.bfloat16)), "int4")
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
    prompt = list(range(1, 17))
    results = {}
    for steps in (32, 64, 128, 64, 32):
        eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=512,
                                       steps_per_dispatch=steps,
                                       pipelined=True)
        for _ in range(8):
            eng.submit(prompt, max_new_tokens=steps)
        eng.run_until_complete()
        for _ in range(32):
            eng.submit(prompt, max_new_tokens=128)
        t0 = time.perf_counter()
        eng.run_until_complete()
        tput = 32 * 128 / (time.perf_counter() - t0)
        results.setdefault(steps, []).append(round(tput, 1))
        print(f"steps={steps:3d}: {tput:8.1f} tok/s", flush=True)
        del eng
    print(results)


if __name__ == "__main__":
    main()
