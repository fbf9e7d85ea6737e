"""Kokoro TTS layer + pipeline tests (reference model: tests/test_tts_layers.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pygpukit_tpu.tts.kokoro import KokoroConfig, KokoroModel
from pygpukit_tpu.tts.kokoro.layers import (
    LSTM, AdaIN, AlbertEncoder, Conv1d, ConvTranspose1d, InstanceNorm1d,
    ISTFTNet, Linear, StyleEncoder, TextEncoder, WeightNormConv1d,
)


KEY = jax.random.PRNGKey(0)


class TestLayers:
    def test_linear_matches_torch_layout(self):
        torch = pytest.importorskip("torch")
        tl = torch.nn.Linear(8, 4)
        lin = Linear(KEY, 8, 4).load(tl.weight.detach().numpy(),
                                     tl.bias.detach().numpy())
        x = np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32)
        ref = tl(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(lin(jnp.asarray(x))), ref,
                                   rtol=1e-4, atol=1e-5)

    def test_conv1d_matches_torch(self):
        torch = pytest.importorskip("torch")
        tc = torch.nn.Conv1d(4, 6, 5, padding=2)
        conv = Conv1d(KEY, 4, 6, 5, padding=2).load(
            tc.weight.detach().numpy(), tc.bias.detach().numpy())
        x = np.random.default_rng(1).standard_normal((1, 4, 16)).astype(np.float32)
        ref = tc(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(conv(jnp.asarray(x))), ref,
                                   rtol=1e-4, atol=1e-4)

    def test_conv_transpose_matches_torch(self):
        torch = pytest.importorskip("torch")
        tc = torch.nn.ConvTranspose1d(4, 2, 8, stride=4, padding=2)
        conv = ConvTranspose1d(KEY, 4, 2, 8, stride=4, padding=2).load(
            tc.weight.detach().numpy(), tc.bias.detach().numpy())
        x = np.random.default_rng(2).standard_normal((1, 4, 10)).astype(np.float32)
        ref = tc(torch.tensor(x)).detach().numpy()
        got = np.asarray(conv(jnp.asarray(x)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_lstm_shapes(self):
        lstm = LSTM(KEY, 16, 8, bidirectional=True)
        x = jnp.ones((10, 2, 16))
        out = lstm(x)
        assert out.shape == (10, 2, 16)  # 2*hidden

    def test_weight_norm_fold(self):
        torch = pytest.importorskip("torch")
        tc = torch.nn.utils.weight_norm(torch.nn.Conv1d(3, 5, 3, padding=1))
        w = WeightNormConv1d(KEY, 3, 5, 3, padding=1).load_weight_norm(
            tc.weight_g.detach().numpy(), tc.weight_v.detach().numpy(),
            tc.bias.detach().numpy())
        x = np.random.default_rng(3).standard_normal((1, 3, 12)).astype(np.float32)
        ref = tc(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(w(jnp.asarray(x))), ref,
                                   rtol=1e-4, atol=1e-4)

    def test_adain_modulates(self):
        ada = AdaIN(KEY, 8, 4)
        x = jnp.ones((1, 4, 6)) * jnp.arange(6)[None, None, :]
        s1 = jnp.zeros((1, 8))
        s2 = jnp.ones((1, 8))
        assert not np.allclose(np.asarray(ada(x, s1)), np.asarray(ada(x, s2)))

    def test_instance_norm(self):
        inorm = InstanceNorm1d(3)
        x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 3, 32)),
                        jnp.float32)
        y = np.asarray(inorm(x))
        np.testing.assert_allclose(y.mean(-1), 0, atol=1e-5)
        np.testing.assert_allclose(y.std(-1), 1, atol=1e-2)

    def test_albert_encoder(self):
        enc = AlbertEncoder(KEY, 100, 32, 4, 64, n_layers=2)
        out = enc(jnp.asarray([1, 5, 9]))
        assert out.shape == (3, 32)

    def test_text_encoder(self):
        te = TextEncoder(KEY, 100, 32)
        out = te(jnp.asarray([1, 5, 9, 20]))
        assert out.shape == (4, 32)

    def test_style_encoder(self):
        se = StyleEncoder(KEY, 80, 16)
        mel = jnp.ones((50, 80))
        assert se(mel).shape == (16,)

    def test_istftnet_output_length(self):
        net = ISTFTNet(KEY, in_ch=64, n_fft=20, hop=5, upsamples=(10, 6),
                       up_kernels=(20, 12))
        x = jnp.ones((1, 64, 8))
        audio = np.asarray(net(x))
        # 8 frames upsampled 60x -> 480 frames of hop 5 -> ~2400 samples
        assert audio.ndim == 1 and audio.shape[0] > 1000
        assert np.isfinite(audio).all()


class TestKokoroModel:
    def test_synthesize_shapes(self):
        model = KokoroModel(KokoroConfig(hidden_dim=64, decoder_dim=64,
                                         plbert_dim=64))
        res = model.synthesize("hello world.")
        assert res.sample_rate == 24000
        assert res.audio.ndim == 1 and len(res.audio) > 500
        assert np.isfinite(res.audio).all()

    def test_voice_selection(self):
        model = KokoroModel(
            KokoroConfig(hidden_dim=64, decoder_dim=64, plbert_dim=64),
            voice_embeddings={"af_test": np.ones(64, np.float32)})
        r1 = model.synthesize("hi.")
        r2 = model.synthesize("hi.", voice="af_test")
        assert not np.allclose(r1.audio[:500], r2.audio[:500])
        import pytest as _pt
        with _pt.raises(KeyError):
            model.set_voice("nope")

    def test_streaming_segments(self):
        model = KokoroModel(KokoroConfig(hidden_dim=64, decoder_dim=64,
                                         plbert_dim=64))
        outs = list(model.synthesize_streaming("one. two! three?"))
        assert len(outs) == 3

    def test_wav_write(self, tmp_path):
        model = KokoroModel(KokoroConfig(hidden_dim=64, decoder_dim=64,
                                         plbert_dim=64))
        res = model.synthesize("test.")
        p = tmp_path / "out.wav"
        res.to_wav(str(p))
        assert p.stat().st_size > 1000
