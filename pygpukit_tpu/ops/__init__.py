"""Ops re-export hub (reference: src/pygpukit/ops/__init__.py:1-60)."""

from . import audio, batching, conv, elementwise, embedding, matmul, nn, paged, reduction, sampling, tensor, unary
from .elementwise import add, add_scaled, clamp, div, maximum, minimum, mul, sub, where
from .batching import (
    argmax_sample, check_eos, gather_embeddings, prepare_position_ids,
    scatter_last_token_logits,
)
from .embedding import (
    embedding_lookup, embedding_lookup_batch,
    kv_cache_prefill, kv_cache_prefill_gqa, kv_cache_update, kv_cache_update_gqa,
)
from .matmul import (
    batched_matmul, fp8_available, gemv, gemv_bf16, gemv_int4, gemv_w8a16,
    grouped_matmul, int4_available, int8_available, matmul, matmul_fp8,
    matmul_int8, matmul_nt, matmul_w8a16, quantize_fp8, quantize_int4,
    quantize_int8, w8a16_available,
)
from .paged import (
    PagedKVCache, paged_attention_batch_fn, paged_attention_fn,
    reshape_and_cache_fn,
)
from .nn import (
    flash_attention, gelu, geglu, l2norm, layernorm, relu, relu2, rmsnorm,
    rope_init, rope_inplace, sdpa_causal, sdpa_causal_fixed_cache, silu, swiglu,
)
from .reduction import (
    argmax, argmin, cumsum, log_softmax, max, mean, min, softmax, sum, sum_axis,
)
from .sampling import sample_multinomial, sample_token_gpu, set_sampling_seed
from .tensor import (
    cast, cast_bf16_to_f32, cast_f32_to_bf16, cast_f32_to_f16, concat, pad,
    repeat, reshape_copy, transpose_2d, transpose_3d_021, transpose_3d_102,
    transpose_4d_0213, transpose_4d_0231,
)
from .unary import (
    abs, ceil, cos, exp, floor, log, neg, reciprocal, rsqrt, sigmoid, sign,
    sin, sqrt, tan, tanh,
)
