from . import activation, attention, fused, llama4, norm, recurrent, rope
from .activation import gelu, geglu, relu, relu2, silu, swiglu
from .attention import (
    flash_attention, sdpa_causal, sdpa_causal_fixed_cache,
)
from .norm import groupnorm, l2norm, layernorm, rmsnorm
from .llama4 import irope_scale_q, sdpa_irope
from .rope import (
    alibi_add_bias, alibi_compute_bias, alibi_init_slopes,
    pope_init_encoding, pope_inplace,
    rope_init, rope_init_linear, rope_init_llama3, rope_init_longrope,
    rope_init_ntk_aware, rope_init_yarn,
    rope_inplace, rope_inplace_f32table, rope_inplace_interleaved,
)

__all__ = [
    "activation", "attention", "fused", "norm", "recurrent", "rope",
    "gelu", "geglu", "relu", "relu2", "silu", "swiglu",
    "flash_attention", "sdpa_causal", "sdpa_causal_fixed_cache",
    "groupnorm", "l2norm", "layernorm", "rmsnorm",
    "alibi_add_bias", "alibi_compute_bias", "alibi_init_slopes",
    "pope_init_encoding", "pope_inplace",
    "rope_init", "rope_init_linear", "rope_init_llama3",
    "rope_init_longrope", "rope_init_ntk_aware", "rope_init_yarn",
    "rope_inplace", "rope_inplace_f32table", "rope_inplace_interleaved",
]
