"""Audio DSP tests (reference model: tests/test_audio.py, 50 tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pygpukit_tpu.ops import audio


@pytest.fixture
def sine():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    return (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32), sr


class TestBuffer:
    def test_from_pcm_int16(self):
        pcm = (np.ones(100) * 16384).astype(np.int16)
        buf = audio.AudioBuffer.from_pcm(pcm, 16000)
        np.testing.assert_allclose(buf.to_numpy(), 0.5, rtol=1e-4)
        assert buf.duration == pytest.approx(100 / 16000)

    def test_stereo_downmix(self):
        pcm = np.stack([np.ones(50), np.zeros(50)], axis=-1).astype(np.float32)
        buf = audio.AudioBuffer.from_pcm(pcm, 8000)
        np.testing.assert_allclose(buf.to_numpy(), 0.5)


class TestSTFT:
    def test_stft_shape_and_peak(self, sine):
        x, sr = sine
        spec = np.abs(np.asarray(audio.stft(jnp.asarray(x), 512, 256)))
        assert spec.shape[1] == 257
        peak_bin = spec.mean(axis=0).argmax()
        expected = round(440 * 512 / sr)
        assert abs(peak_bin - expected) <= 1

    def test_istft_roundtrip(self, sine):
        x, sr = sine
        spec = audio.stft(jnp.asarray(x), 512, 128)
        rec = np.asarray(audio.istft(spec, 512, 128, length=len(x)))
        err = np.abs(rec[256:-256] - x[256:-256]).max()
        assert err < 1e-3, err

    def test_mel_shapes(self, sine):
        x, sr = sine
        m = np.asarray(audio.melspectrogram(jnp.asarray(x), sr, 400, 160, 80))
        assert m.shape[1] == 80
        assert (m >= 0).all()

    def test_log_mel_whisper_range(self, sine):
        x, sr = sine
        lm = np.asarray(audio.log_melspectrogram(jnp.asarray(x), sr))
        assert lm.max() <= 2.5 and lm.min() >= -2.5

    def test_mfcc_shape(self, sine):
        x, sr = sine
        m = np.asarray(audio.mfcc(jnp.asarray(x), sr, n_mfcc=13))
        assert m.shape[1] == 13


class TestVAD:
    def test_energy_vad(self):
        sr = 16000
        sig = np.zeros(sr, np.float32)
        sig[4000:8000] = 0.5 * np.sin(
            2 * np.pi * 200 * np.arange(4000) / sr).astype(np.float32)
        act = np.asarray(audio.vad_energy(jnp.asarray(sig)))
        frames_active = act.nonzero()[0]
        assert len(frames_active) > 0
        # active frames concentrated in the 4000..8000 sample region
        centers = frames_active * 160 + 200
        assert (centers > 3000).all() and (centers < 9500).all()

    def test_hangover_extends(self):
        act = jnp.asarray([False, True, False, False, False, False])
        out = np.asarray(audio.vad_hangover(act, hang_frames=3))
        assert out[1] and out[2] and out[3]
        assert not out[5]


class TestPitch:
    def test_yin_440(self, sine):
        x, sr = sine
        f0 = np.asarray(audio.yin_pitch(jnp.asarray(x), sr))
        voiced = f0[f0 > 0]
        assert len(voiced) > 0
        assert abs(np.median(voiced) - 440.0) < 15.0


class TestAnalysis:
    def test_cqt_chroma_shapes(self, sine):
        x, sr = sine
        c = np.asarray(audio.cqt(jnp.asarray(x[:8000]), sr))
        assert c.shape[1] == 84
        ch = np.asarray(audio.chroma(jnp.asarray(x[:8000]), sr))
        assert ch.shape[1] == 12
        # 440 Hz = A -> chroma bin of A most energetic
        assert ch.mean(axis=0).argmax() == 9  # A is 9 semitones above C

    def test_hpss_shapes(self, sine):
        x, sr = sine
        h, p = audio.hpss(jnp.asarray(x[:8000]))
        assert h.shape == p.shape == (8000,)
        # a pure tone is harmonic: harmonic energy >> percussive
        assert float(jnp.sum(h**2)) > 2 * float(jnp.sum(p**2))


class TestEffects:
    def test_resample_length(self, sine):
        x, sr = sine
        y = np.asarray(audio.resample(jnp.asarray(x), sr, 8000))
        assert abs(len(y) - len(x) // 2) <= 1

    def test_time_stretch_length(self, sine):
        x, sr = sine
        y = np.asarray(audio.time_stretch(jnp.asarray(x[:16000]), 2.0))
        assert len(y) < len(x) * 0.75

    def test_griffin_lim_runs(self, sine):
        x, sr = sine
        mag = jnp.abs(audio.stft(jnp.asarray(x[:4000]), 400, 160))
        rec = np.asarray(audio.griffin_lim(mag, 400, 160, n_iter=4,
                                           length=4000))
        assert rec.shape == (4000,)
        assert np.isfinite(rec).all()

    def test_normalize(self, sine):
        x, sr = sine
        y = np.asarray(audio.normalize(jnp.asarray(x), target_db=-6.0))
        assert abs(np.abs(y).max() - 10 ** (-6 / 20)) < 1e-3


class TestRingBuffer:
    def test_push_read_wraparound(self):
        rb = audio.RingBuffer(8)
        rb.push(np.arange(5, dtype=np.float32))
        assert len(rb) == 5
        np.testing.assert_array_equal(rb.read_latest(3), [2, 3, 4])
        rb.push(np.arange(5, 11, dtype=np.float32))   # wraps
        assert len(rb) == 8
        np.testing.assert_array_equal(rb.read_latest(4), [7, 8, 9, 10])

    def test_oversized_push(self):
        rb = audio.RingBuffer(4)
        rb.push(np.arange(10, dtype=np.float32))
        np.testing.assert_array_equal(rb.read_latest(4), [6, 7, 8, 9])
