"""Same-process serving A/B: wave-batched early-admit vs per-slot.

VERDICT r3 task #4 (serving ceiling): at a wave boundary every length-bound
slot frees at once; round-2 _early_admit prefilled replacements one
dispatch at a time (N serialized per-slot forwards). Round 3 batches the
group into ONE wave executable. Control arm monkeypatches
_dispatch_prefills back to the serialized form. Also reports the raw chunk
ceiling (sustained chunk replay, full batch, no admission) same-process.

Usage: python scripts/micro_serving_ab.py [n_requests] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pygpukit_tpu.llm.config import TransformerConfig
from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                    init_params_device)
from pygpukit_tpu.llm.serving import ContinuousBatchingEngine

N_REQ = int(sys.argv[1]) if len(sys.argv) > 1 else 32
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 32

cfg = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048)
params = fuse_params(init_params_device(cfg, seed=0, dtype=jnp.bfloat16))
model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
prompt = list(range(1, 17))


def run(label, serialize_early=False):
    eng = ContinuousBatchingEngine(model, max_batch=8, max_seq_len=512,
                                   steps_per_dispatch=STEPS, pipelined=True)
    if serialize_early:
        orig_early = eng._early_admit

        def early_serial():
            batched = eng._dispatch_prefills
            eng._dispatch_prefills = lambda pairs: [
                eng._prefill_slot(s, r) for s, r in pairs]
            try:
                orig_early()
            finally:
                eng._dispatch_prefills = batched
        eng._early_admit = early_serial
    for _ in range(2):                              # warm all executables
        [eng.submit(prompt, max_new_tokens=STEPS) for _ in range(10)]
        eng.run_until_complete()
    reqs = [eng.submit(prompt, max_new_tokens=128) for _ in range(N_REQ)]
    t0 = time.perf_counter()
    eng.run_until_complete()
    dt = time.perf_counter() - t0
    toks = sum(len(r.generated) for r in reqs)
    print(f"{label:24s} {toks/dt:8.1f} tok/s  ({toks} toks, {dt:.2f}s)",
          flush=True)
    return eng


def ceiling(eng):
    """Raw chunk ceiling: replay the warmed chunk executable back-to-back."""
    exe = eng._ensure_chunk_exe()
    st = (eng.k_cache, eng.v_cache, eng._last_dev, eng._poss_dev)
    reps = 12
    # warm once, then sustained replays chained on device state
    st = exe.replay(eng.model.params, *st[:2], st[2], st[3], jnp.int32(0))[:4]
    np.asarray(st[2])
    t0 = time.perf_counter()
    s = st
    for i in range(reps):
        out = exe.replay(eng.model.params, s[0], s[1], s[2], s[3],
                         jnp.int32(i))
        s = out[:4]
    np.asarray(s[2])
    dt = (time.perf_counter() - t0) / reps
    tps = 8 * STEPS / dt
    print(f"{'raw chunk ceiling':24s} {tps:8.1f} tok/s  "
          f"({dt*1e3:.1f} ms/chunk)", flush=True)


run("early-admit serialized", serialize_early=True)
eng = run("early-admit wave-batched")
ceiling(eng)
run("early-admit wave-batched")  # repeat for variance bound
