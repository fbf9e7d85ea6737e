"""Pipeline tests: sentence buffering, VAD state machine, end-to-end voice
loop with tiny random models (reference model: pipeline/ tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pygpukit_tpu.pipeline import (
    SentenceBuffer, VADConfig, VoiceActivityDetector, VoicePipeline,
    LLMTTSConfig, LLMTTSPipeline,
)


class TestSentenceBuffer:
    def test_splits_sentences(self):
        buf = SentenceBuffer(min_chars=4)
        out = buf.push("Hello there. How are")
        assert out == ["Hello there."]
        out = buf.push(" you? Good")
        assert out == ["How are you?"]
        assert buf.flush() == "Good"

    def test_min_chars(self):
        buf = SentenceBuffer(min_chars=10)
        assert buf.push("Hi.") == []
        assert buf.push(" More text here.") != []


class TestVAD:
    def test_detects_utterance(self):
        vad = VoiceActivityDetector(VADConfig(min_speech_frames=3))
        sr = 16000
        silence = np.zeros(sr // 4, np.float32)
        t = np.arange(sr // 2) / sr
        speech = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        assert vad.process(silence) is None
        assert vad.process(speech) is None          # speech ongoing
        utt = vad.process(silence)                  # end of speech
        assert utt is not None and len(utt) >= len(speech)

    def test_flush(self):
        vad = VoiceActivityDetector(VADConfig(min_speech_frames=2))
        t = np.arange(8000) / 16000
        speech = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        vad.process(speech)
        assert vad.flush() is not None


class _EchoTokenizer:
    def encode(self, text):
        return [min(ord(c), 96) for c in text][:8]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


@pytest.fixture(scope="module")
def tiny_models():
    from pygpukit_tpu.llm import CausalTransformerModel, TransformerConfig, init_params
    from pygpukit_tpu.tts.kokoro import KokoroConfig, KokoroModel
    cfg = TransformerConfig(
        vocab_size=97, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, head_dim_override=8,
        max_position_embeddings=512, tie_word_embeddings=True)
    llm = CausalTransformerModel(cfg, init_params(cfg, 0, jnp.float32),
                                 dtype=jnp.float32)
    tts = KokoroModel(KokoroConfig(hidden_dim=64, decoder_dim=64,
                                   plbert_dim=64))
    return llm, tts


class TestLLMTTS:
    def test_streaming_synthesis(self, tiny_models):
        llm, tts = tiny_models
        pipe = LLMTTSPipeline(llm, _EchoTokenizer(), tts,
                              LLMTTSConfig(max_new_tokens=40, temperature=0.0,
                                           min_sentence_chars=4))
        texts = []
        outs = list(pipe.run([5, 10, 15], on_text=texts.append))
        # random model likely emits no '.'; flush should still synthesize tail
        assert len(outs) >= 1
        assert all(o.audio.ndim == 1 for o in outs)
        assert texts  # streaming callback fired


class TestVoicePipeline:
    def test_end_to_end_events(self, tiny_models, tmp_path):
        import torch, transformers
        llm, tts = tiny_models
        d = tmp_path / "w"
        wcfg = transformers.WhisperConfig(
            vocab_size=96, num_mel_bins=80, d_model=64, encoder_layers=1,
            decoder_layers=1, encoder_attention_heads=4,
            decoder_attention_heads=4, encoder_ffn_dim=128,
            decoder_ffn_dim=128, max_target_positions=32,
            eos_token_id=3, decoder_start_token_id=2, pad_token_id=0)
        torch.manual_seed(0)
        transformers.WhisperForConditionalGeneration(wcfg).save_pretrained(
            d, safe_serialization=True)
        from pygpukit_tpu.asr.whisper import WhisperModel
        asr = WhisperModel.from_safetensors(d)

        pipe = VoicePipeline(asr, llm, _EchoTokenizer(), tts,
                             sot_sequence=[2],
                             vad_config=VADConfig(min_speech_frames=2),
                             max_reply_tokens=6)
        sr = 16000
        t = np.arange(sr // 2) / sr
        speech = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        chunks = [np.zeros(4000, np.float32), speech,
                  np.zeros(4000, np.float32)]
        events = list(pipe.run(chunks))
        kinds = [e.kind for e in events]
        assert kinds[:2] == ["speech_start", "transcript"]
        assert "reply" in kinds and "audio" in kinds
        audio_ev = [e for e in events if e.kind == "audio"][0]
        assert audio_ev.audio is not None and np.isfinite(audio_ev.audio).all()
