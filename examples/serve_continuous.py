#!/usr/bin/env python
"""Continuous-batching serving demo: requests join and leave the batch
dynamically while the engine advances every active sequence per step
(the serving loop the reference's continuous-batching primitives feed).

Usage:
  python examples/serve_continuous.py [--model /path/to/ckpt]
  (random-weight demo model when --model is omitted)
"""

from __future__ import annotations


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse
import time

import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--requests", type=int, default=10)
    ap.add_argument("--steps-per-dispatch", type=int, default=1)
    ap.add_argument("--pipelined", action="store_true",
                    help="device-resident decode state; chunk N+1 dispatches "
                         "before chunk N's tokens are read (highest "
                         "throughput over remote/tunneled devices)")
    ap.add_argument("--kv-dtype", default=None,
                    choices=["fp8", "int8"],
                    help="quantized KV cache: int8 = per-row-scaled dict "
                         "pools, the no-tax capacity rung on v5e; fp8 = "
                         "HF kv_cache_quant_algo compatibility")
    ap.add_argument("--paged", action="store_true",
                    help="paged block-pool KV (capacity scales with live "
                         "blocks, not max_batch*max_seq)")
    args = ap.parse_args()

    from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

    if args.model:
        from pygpukit_tpu.llm import load_model_from_safetensors
        model = load_model_from_safetensors(args.model,
                                            kv_dtype=args.kv_dtype)
    else:
        from pygpukit_tpu.llm import (
            CausalTransformerModel, TransformerConfig, init_params,
        )
        cfg = TransformerConfig(
            vocab_size=512, hidden_size=128, num_layers=4, num_heads=8,
            num_kv_heads=4, intermediate_size=256,
            max_position_embeddings=512, tie_word_embeddings=True)
        model = CausalTransformerModel(cfg, init_params(cfg, 0),
                                       dtype=jnp.bfloat16,
                                       kv_dtype=args.kv_dtype)

    kw = dict(paged=True, block_size=16) if args.paged else {}
    eng = ContinuousBatchingEngine(model, max_batch=args.max_batch,
                                   max_seq_len=512,
                                   steps_per_dispatch=args.steps_per_dispatch,
                                   pipelined=args.pipelined, **kw)
    # stagger submissions to show dynamic join; stream request 1's tokens
    reqs = []
    t0 = time.time()
    stream = (lambda r, t: print(f"  [stream req {r.request_id}] token {t}")
              if r.request_id == 1 else None)
    for i in range(args.requests):
        reqs.append(eng.submit(list(range(1, 5 + i % 4)),
                               max_new_tokens=16 + 8 * (i % 3),
                               on_token=stream if i == 0 else None))
        eng.step()
        eng.step()
    eng.run_until_complete()
    dt = time.time() - t0

    print(f"served {eng.stats.requests_completed} requests in {dt:.1f}s "
          f"({eng.stats.tokens_generated} tokens, "
          f"{eng.stats.tokens_generated / dt:.1f} tok/s aggregate, "
          f"{eng.stats.steps} engine steps)")
    for r in reqs[:3]:
        print(f"  req {r.request_id}: ttft={r.ttft_s:.2f}s "
              f"tokens={len(r.generated)} first={r.generated[:5]}")


if __name__ == "__main__":
    main()
