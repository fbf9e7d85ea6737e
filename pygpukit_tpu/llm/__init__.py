from .chat import ChatMessage, apply_chat_template
from .config import (
    GPT2_SPEC, LLAMA_SPEC, MIXTRAL_SPEC, MODEL_SPECS, QWEN2_SPEC, QWEN3_MOE_SPEC,
    QWEN3_SPEC, ModelSpec, TransformerConfig, detect_model_spec,
)
from .loader import (
    load_gpt2_from_safetensors, load_llama_from_safetensors,
    load_mixtral_from_safetensors, load_model_from_safetensors,
    load_qwen3_from_safetensors,
)
from .model import CausalTransformerModel, KVSnapshot
from .safetensors import (
    LazyModelLoader, SafeTensorsFile, ShardedSafeTensorsFile, TensorState,
    load_safetensors,
)
from .sampling import sample_token

__all__ = [
    "ChatMessage", "apply_chat_template",
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
