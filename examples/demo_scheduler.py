#!/usr/bin/env python
"""Multi-model serving demo (reference: examples/demo_scheduler_log.py +
multi-LLM concurrency, scheduler/execution.py).

Serves two random-weight models concurrently from separate execution
contexts with QoS-scheduled admission.
"""

from __future__ import annotations


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import threading
import time

import jax.numpy as jnp


def main() -> None:
    from pygpukit_tpu.llm import (
        CausalTransformerModel, TransformerConfig, init_params,
    )
    from pygpukit_tpu.scheduler import (
        MultiModelController, Scheduler, Task, TaskPolicy,
    )

    cfg = TransformerConfig(
        vocab_size=512, hidden_size=128, num_layers=4, num_heads=8,
        num_kv_heads=4, intermediate_size=256, max_position_embeddings=512,
        tie_word_embeddings=True)
    model_a = CausalTransformerModel(cfg, init_params(cfg, 1), dtype=jnp.bfloat16)
    model_b = CausalTransformerModel(cfg, init_params(cfg, 2), dtype=jnp.bfloat16)

    ctrl = MultiModelController(total_memory=4 << 30)
    ctx_a = ctrl.create_context("llm_a", 1 << 30)
    ctx_b = ctrl.create_context("llm_b", 1 << 30)
    print("contexts:", ctrl.stats())

    results = {}

    def serve(name, ctx, model):
        t0 = time.time()
        out = ctx.run(lambda: model.generate(list(range(1, 9)), 32),
                      memory_bytes=64 << 20)
        results[name] = (out[:5], time.time() - t0)

    threads = [threading.Thread(target=serve, args=("a", ctx_a, model_a)),
               threading.Thread(target=serve, args=("b", ctx_b, model_b))]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(f"concurrent serving wall time: {time.time() - t0:.1f}s")
    for name, (toks, dt) in results.items():
        print(f"  model {name}: first tokens {toks} in {dt:.1f}s")

    # QoS scheduling demo
    sched = Scheduler(total_memory=1 << 30)
    for policy in (TaskPolicy.BEST_EFFORT, TaskPolicy.GUARANTEED,
                   TaskPolicy.BURSTABLE):
        sched.submit(Task(memory_bytes=1 << 20, policy=policy,
                          fn=lambda p=policy: print(f"  running {p.name}")))
    print("QoS drain order:")
    sched.run_pending()
    print("scheduler stats:", sched.stats())
    ctrl.shutdown()


if __name__ == "__main__":
    main()
