"""Same-process A/B: int4 batch-8 serving, batch-rows vs vmapped chunk.

VERDICT r3 #1: the vmapped serving chunk forces packed-int4 _mm to the XLA
dequant dot (the Pallas GEMV would re-stream the weight stack once per
slot), capping int4 serving at ~1574 tok/s vs int8's ~1841 even though
int4's bytes are half. The batch-rows chunk (llm/model.batch_decode_step_fn)
carries all 8 slot rows through ONE stacked Pallas w4a8 GEMV call per
weight stream. Target: int4 batch-8 >= int8's same-day number (stretch
2200+).

Order favours the incumbent (vmap first), and a final vmap rerun bounds
drift. int8 w8a8 runs once for the day's cross-format context.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_serving_batchrows.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def build(mode):
    from pygpukit_tpu.llm.config import TransformerConfig
    from pygpukit_tpu.llm.model import (
        CausalTransformerModel, fuse_params, init_params_device,
    )
    from pygpukit_tpu.llm.quant import quantize_model_params

    cfg = TransformerConfig(
        vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
        num_kv_heads=4, intermediate_size=5632,
        max_position_embeddings=2048, tie_word_embeddings=False)
    params = quantize_model_params(
        fuse_params(init_params_device(cfg, 0, jnp.bfloat16)), mode)
    return CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)


def serve(model, n_req=32, steps=32, gen=128):
    from pygpukit_tpu.llm.serving import ContinuousBatchingEngine
    eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=512,
                                   steps_per_dispatch=steps, pipelined=True)
    prompt = list(range(1, 17))
    for _ in range(8):                       # warm: compiles chunk + waves
        eng.submit(prompt, max_new_tokens=steps)
    eng.run_until_complete()
    for _ in range(n_req):
        eng.submit(prompt, max_new_tokens=gen)
    t0 = time.perf_counter()
    eng.run_until_complete()
    return n_req * gen / (time.perf_counter() - t0), eng


def main():
    results = {}
    for label, env, mode in (
            ("int4_vmap", "vmap", "int4"),
            ("int4_batch", "batch", "int4"),
            ("int4_vmap2", "vmap", "int4"),
            ("int8_vmap", "vmap", "int8"),
            ("int8_batch", "batch", "int8"),
    ):
        os.environ["PYGPUKIT_SERVING_STEP"] = env
        m = build(mode)
        tput, eng = serve(m)
        results[label] = tput
        print(f"{label:12s} {tput:8.1f} tok/s  (batch_rows={eng._batch_rows})",
              flush=True)
        del m, eng
    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
