from .model import (
    KokoroConfig, KokoroModel, KokoroTokenizer, SynthesisResult,
)

__all__ = ["KokoroConfig", "KokoroModel", "KokoroTokenizer", "SynthesisResult"]
