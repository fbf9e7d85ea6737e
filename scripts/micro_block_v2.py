"""Same-process A/B: 1B int4_block decode, v2 (w4a8 Z-decomposition) vs v1.

VERDICT r3 #2: int4_block ran 411 tok/s / 0.40 HBM peak — the device trace
(scripts/micro_attn_share.py int4_block, 2026-08-19) shows all four Pallas
block-GEMV calls at 2.5-2.9x their stream time: the v1 kernel converts
every nibble to bf16 and multiplies whole [bk, bn] tiles by expanded
scales (VPU-bound). v2 (_block_w4a8_tile_dots) keeps nibbles int8 into
native MXU dots and applies block scales POST-dot via the block-expanded
activation (M = nb*rows rides one MXU pass). Target: >= 600 tok/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_block_v2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def build():
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
        fuse_params(init_params_device(cfg, 0, jnp.bfloat16)), "int4_block")
    return CausalTransformerModel(cfg, params, dtype=jnp.bfloat16)


def decode(model, n_tokens=256):
    model.init_fixed_cache(512)
    model.generate(list(range(1, 17)), max_new_tokens=n_tokens,
                   chunk_size=n_tokens)
    model.init_fixed_cache(512)
    t0 = time.perf_counter()
    out = model.generate(list(range(1, 17)), max_new_tokens=n_tokens,
                         chunk_size=n_tokens)
    return len(out) / (time.perf_counter() - t0)


def main():
    results = {}
    for label, mode in (("v1_w4a16", "w4a16"), ("v2_w4a8", "w4a8"),
                        ("v1_again", "w4a16")):
        os.environ["PYGPUKIT_INT4_BLOCK"] = mode
        m = build()
        results[label] = decode(m)
        print(f"{label:10s} {results[label]:8.1f} tok/s", flush=True)
        del m
    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
