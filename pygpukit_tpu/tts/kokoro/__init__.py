from .model import (
    KokoroConfig, KokoroModel, KokoroTokenizer, SynthesisResult,
)
from .g2p import Phonemizer
from .pretrained import Kokoro82M

__all__ = ["KokoroConfig", "KokoroModel", "KokoroTokenizer", "Kokoro82M",
           "Phonemizer", "SynthesisResult"]
