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
    "CausalTransformerModel", "KVSnapshot",
    "LazyModelLoader", "SafeTensorsFile", "ShardedSafeTensorsFile",
    "TensorState", "load_safetensors", "sample_token",
]
