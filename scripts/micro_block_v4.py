"""Round-4 int4_block levers A/B (one config per process, driver below):

  base            — current default (down proj whole-K tile, nb=88)
  tiles           — TILE_OVERRIDES_KM down (2816,2048) -> bk_half=256
                    (nb=8: 11x less Z-decomposition MXU work, K-split DMA)
  vmem            — XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=4096 (stop
                    the per-layer-step VMEM staging of the down scale
                    halves: traced 171 us/tok of slice-done waits)
  tiles+vmem      — both

Driver:
  for c in base tiles vmem both; do
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_block_v4.py $c
  done
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CFG = sys.argv[1] if len(sys.argv) > 1 else "base"
if CFG in ("vmem", "both"):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_tpu_scoped_vmem_limit_kib=4096")
# scopedNN: raise the scoped-vmem budget via per-executable compiler
# options (PYGPUKIT_XLA_OPTS -> lowered.compile) — MSA's alternate-memory
# budget is what's left of VMEM after scoped, so a big scoped budget
# starves the per-layer-step scale staging (traced 229 us/tok)
if CFG.startswith("scoped"):
    kib = int(CFG[len("scoped"):]) * 1024
    os.environ["PYGPUKIT_XLA_OPTS"] = \
        f"xla_tpu_scoped_vmem_limit_kib={kib}"

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pygpukit_tpu.kernels import gemv_quant
    if CFG in ("tiles", "both"):
        gemv_quant.TILE_OVERRIDES_KM[(2816, 2048)] = (2048, 256)

    from pygpukit_tpu.llm.config import TransformerConfig
    from pygpukit_tpu.llm.model import (CausalTransformerModel, fuse_params,
                                        init_params_device)
    from pygpukit_tpu.llm.quant import quantize_model_params

    # tunnel probe
    f = jax.jit(lambda x: x + 1)
    z = jnp.zeros((1,), jnp.float32)
    np.asarray(f(z))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(z))
        ts.append((time.perf_counter() - t0) * 1e3)

    cfg = TransformerConfig(
        vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
        num_kv_heads=4, intermediate_size=5632,
        max_position_embeddings=2048, tie_word_embeddings=False)
    params = quantize_model_params(
        fuse_params(init_params_device(cfg, 0, jnp.bfloat16)), "int4_block")
    model = CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)
    model.init_fixed_cache(512)
    model.generate(list(range(1, 17)), max_new_tokens=256, chunk_size=256)
    rates = []
    for _ in range(3):
        model.init_fixed_cache(512)
        t0 = time.perf_counter()
        out = model.generate(list(range(1, 17)), max_new_tokens=256,
                             chunk_size=256)
        rates.append(len(out) / (time.perf_counter() - t0))
    print(f"{CFG:10s} tunnel={min(ts):5.1f}ms  "
          + " ".join(f"{r:6.1f}" for r in rates)
          + f"  best={max(rates):6.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
