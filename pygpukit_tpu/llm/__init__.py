from .buffers import BatchDecodeBuffers, DecodeBuffers, PrefillBuffers, kv_cache_nbytes
from .chat import ChatMessage, apply_chat_template, apply_guard_template
from .config import (
    GPT2Config, LlamaConfig, Qwen3Config,
    GPT2_SPEC, LLAMA_SPEC, MIXTRAL_SPEC, MODEL_SPECS, QWEN2_SPEC, QWEN3_MOE_SPEC,
    QWEN3_SPEC, ModelSpec, TransformerConfig, detect_model_spec,
)
from .loader import (
    load_gpt2_from_safetensors, load_llama_from_safetensors,
    load_mixtral_from_safetensors, load_model_from_safetensors,
    load_qwen3_from_safetensors,
)
from .decode import (
    STRATEGIES, DecodeBatch, DecodeJacobi, DecodeM1, DecodeM1Graph,
    DecodeSpeculative, DecodeStrategy,
)
from .model import CausalTransformerModel, KVSnapshot, fuse_params, init_params
from .quant import (
    FP8QuantConfig, QATConfig, PruningConfig, QuantizationMetadata,
    dequantize_model_params, quantize_model_params, quantize_weight,
)
from .repack import repack_model_weights
from .streaming import (
    LayerStreamingContext, LoadingStrategy, StreamingConfig,
    create_streaming_context,
)
from .tokenizer import Tokenizer
from .safetensors import (
    LazyModelLoader, SafeTensorsFile, ShardedSafeTensorsFile, TensorState,
    load_model_params, load_safetensors, save_model_params, save_safetensors,
)
from .sampling import sample_token
from .layers import (
    Attention, CausalSelfAttention, LayerNorm, Linear, LinearBF16, LinearFP8,
    LlamaAttention, LlamaBlock, LlamaMLP, MLP, MoELayer, Norm, RMSNorm,
    TransformerBlock, precompute_freqs_cis,
)
from .quant import (
    ModelOptimizationInfo, QATQuantConfig, SparsityConfig,
)
from .chat import create_chat_prompt, format_chat_messages
from .repack import repack_linear, repack_norm, repack_weight
from .safetensors import TensorInfo
from ..memory.pool import PoolStats
from ..core.dtypes import DataType as Dtype

# reference model-class names: the unified model IS both (ModelSpec decides)
GPT2Model = CausalTransformerModel
LlamaModel = CausalTransformerModel
QwenModel = CausalTransformerModel

# streaming-strategy aliases (reference: SimpleStreaming / SlidingWindow /
# AutoLRU class names; ours are LoadingStrategy values)
SimpleStreaming = LoadingStrategy.SIMPLE
SlidingWindow = LoadingStrategy.SLIDING_WINDOW
AutoLRU = LoadingStrategy.AUTO_LRU


def apply_rotary_pos_emb_numpy(q, k, cos, sin):
    """Host-side rope helper (reference: apply_rotary_pos_emb_numpy)."""
    import numpy as np

    def rot(x):
        x = np.asarray(x, np.float32)
        half = x.shape[-1] // 2
        c, sn = np.asarray(cos)[..., :half], np.asarray(sin)[..., :half]
        if x.ndim == 3:   # [S, H, D]: broadcast over heads
            c, sn = c[:, None, :], sn[:, None, :]
        x0, x1 = x[..., :half], x[..., half:]
        return np.concatenate([x0 * c - x1 * sn, x1 * c + x0 * sn], axis=-1)

    return rot(q), rot(k)

__all__ = [
    "BatchDecodeBuffers", "DecodeBuffers", "PrefillBuffers", "kv_cache_nbytes",
    "STRATEGIES", "DecodeBatch", "DecodeJacobi", "DecodeM1", "DecodeM1Graph",
    "DecodeSpeculative", "DecodeStrategy", "init_params",
    "FP8QuantConfig", "QATConfig", "PruningConfig", "QuantizationMetadata",
    "dequantize_model_params", "quantize_model_params", "quantize_weight",
    "repack_model_weights", "save_safetensors", "save_model_params", "load_model_params", "LayerStreamingContext", "LoadingStrategy",
    "StreamingConfig", "create_streaming_context", "Tokenizer",
    "ChatMessage", "apply_chat_template", "apply_guard_template",
    "GPT2_SPEC", "LLAMA_SPEC", "MIXTRAL_SPEC", "MODEL_SPECS", "QWEN2_SPEC",
    "QWEN3_MOE_SPEC", "QWEN3_SPEC", "ModelSpec", "TransformerConfig",
    "detect_model_spec",
    "load_gpt2_from_safetensors", "load_llama_from_safetensors",
    "load_mixtral_from_safetensors", "load_model_from_safetensors",
    "load_qwen3_from_safetensors",
    "CausalTransformerModel", "KVSnapshot", "GPT2Model", "LlamaModel",
    "QwenModel", "Attention", "CausalSelfAttention", "LayerNorm", "Linear",
    "LinearBF16", "LinearFP8", "LlamaAttention", "LlamaBlock", "LlamaMLP",
    "MLP", "MoELayer", "Norm", "RMSNorm", "TransformerBlock",
    "precompute_freqs_cis", "ModelOptimizationInfo", "QATQuantConfig",
    "SparsityConfig", "create_chat_prompt", "format_chat_messages",
    "repack_linear", "repack_norm", "repack_weight", "TensorInfo",
    "PoolStats", "Dtype", "SimpleStreaming", "SlidingWindow", "AutoLRU",
    "apply_rotary_pos_emb_numpy",
    "LazyModelLoader", "SafeTensorsFile", "ShardedSafeTensorsFile",
    "TensorState", "load_safetensors", "sample_token",
]
