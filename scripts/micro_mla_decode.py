"""MLA decode speed demo (round 3): 1B-class all-dense MLA model.

The absorbed-MLA cache stores kv_lora+rope (576 2-byte values/pos/layer)
regardless of head count — vs Hq*(qk_head+v_head) for the naive cache
transformers keeps (16 heads here -> 16KB/pos/layer, 5.8 GB at 16k ctx,
which would not fit next to the weights). Measures decode at short and
long live context off the compressed cache.

Usage: python scripts/micro_mla_decode.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pygpukit_tpu.llm.models.deepseek import DeepseekV3Config, DeepseekV3Model

cfg = DeepseekV3Config(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=16,
    q_lora_rank=None, kv_lora_rank=512, qk_nope_head_dim=128,
    qk_rope_head_dim=64, v_head_dim=128, intermediate_size=5632,
    first_k_dense=22, max_position_embeddings=16384)

key = jax.random.PRNGKey(0)
e, hq = cfg.hidden_size, cfg.num_heads


def w(*shape, scale=0.02):
    global key
    key, sub = jax.random.split(key)
    return (jax.random.normal(sub, shape, jnp.bfloat16) * scale)


L = cfg.num_layers
dense = {
    "attn_norm_w": jnp.ones((L, e), jnp.float32),
    "mlp_norm_w": jnp.ones((L, e), jnp.float32),
    "w_q": w(L, e, hq * cfg.qk_head_dim),
    "w_kva": w(L, e, cfg.kv_lora_rank + cfg.qk_rope_head_dim),
    "w_kva_norm": jnp.ones((L, cfg.kv_lora_rank), jnp.float32),
    "w_kvb": w(L, cfg.kv_lora_rank, hq * (cfg.qk_nope_head_dim + cfg.v_head_dim)),
    "w_o": w(L, hq * cfg.v_head_dim, e),
    "w_gate": w(L, e, cfg.intermediate_size),
    "w_up": w(L, e, cfg.intermediate_size),
    "w_down": w(L, cfg.intermediate_size, e),
}
params = {
    "embed": w(cfg.vocab_size, e),
    "final_norm_w": jnp.ones((e,), jnp.float32),
    "lm_head": w(e, cfg.vocab_size),
    "dense_layers": dense,
}
nbytes = sum(int(v.size * v.dtype.itemsize)
             for v in jax.tree.leaves(params))
print(f"params: {nbytes/1e9:.2f} GB; compressed KV/pos: "
      f"{L*(cfg.kv_lora_rank+cfg.qk_rope_head_dim)*2/1024:.1f} KB "
      f"(naive would be {L*hq*(cfg.qk_head_dim+cfg.v_head_dim)*2/1024:.0f} KB)",
      flush=True)

model = DeepseekV3Model(cfg, params, dtype=jnp.bfloat16)
model.init_fixed_cache(16384)
prompt = list(range(1, 17))
model.generate(prompt, max_new_tokens=129, chunk_size=128)    # warm

for ctx in (16, 4000, 12000):
    model.init_fixed_cache(16384)
    model.generate(prompt, max_new_tokens=129, chunk_size=128)  # reset+warm
    model.pos = ctx
    t0 = time.perf_counter()
    model.ckv_cache, model.kpe_cache, toks = model._gen_exes[128].replay(
        model.params, model.ckv_cache, model.kpe_cache,
        jnp.int32(5), jnp.int32(ctx))
    np.asarray(toks)
    dt = (time.perf_counter() - t0) / 128 * 1e3
    print(f"MLA decode ctx={ctx:6d}: {dt:5.2f} ms/tok ({1e3/dt:6.1f} tok/s)",
          flush=True)
