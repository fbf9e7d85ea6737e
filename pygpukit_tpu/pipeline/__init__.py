from .llm_tts import LLMTTSConfig, LLMTTSPipeline, SentenceBuffer
from .voice import (
    VADConfig, VADState, VoiceActivityDetector, VoiceEvent, VoicePipeline,
)

__all__ = [
    "LLMTTSConfig", "LLMTTSPipeline", "SentenceBuffer",
    "VADConfig", "VADState", "VoiceActivityDetector", "VoiceEvent",
    "VoicePipeline",
]
