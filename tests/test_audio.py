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


class TestSpectralFeatures:
    """Numpy-parity for the spectral feature family (reference:
    native spectral_*_kernels + ops/audio/features.py)."""

    @pytest.fixture
    def spec(self, sine):
        x, sr = sine
        mag = np.abs(np.asarray(audio.stft(jnp.asarray(x), 512, 256)))
        return mag, sr

    def test_centroid_parity(self, spec):
        mag, sr = spec
        got = np.asarray(audio.spectral_centroid(jnp.asarray(mag), sr))
        freqs = np.arange(mag.shape[1]) * sr / (2.0 * (mag.shape[1] - 1))
        want = (mag * freqs).sum(-1) / np.maximum(mag.sum(-1), 1e-10)
        np.testing.assert_allclose(got, want, rtol=1e-4)
        # a 440 Hz sine's centroid should sit near 440
        assert abs(np.median(got) - 440) < 60

    def test_bandwidth_parity(self, spec):
        mag, sr = spec
        cen = audio.spectral_centroid(jnp.asarray(mag), sr)
        got = np.asarray(audio.spectral_bandwidth(jnp.asarray(mag), cen, sr))
        freqs = np.arange(mag.shape[1]) * sr / (2.0 * (mag.shape[1] - 1))
        diff = np.abs(freqs[None, :] - np.asarray(cen)[:, None]) ** 2
        want = np.sqrt((diff * mag).sum(-1) / np.maximum(mag.sum(-1), 1e-10))
        np.testing.assert_allclose(got, want, rtol=1e-3)

    def test_rolloff_parity(self, spec):
        mag, sr = spec
        got = np.asarray(audio.spectral_rolloff(jnp.asarray(mag), sr, 0.85))
        bin_hz = sr / (2.0 * (mag.shape[1] - 1))
        want = np.empty(mag.shape[0])
        for f in range(mag.shape[0]):
            cum = np.cumsum(mag[f])
            want[f] = np.searchsorted(cum, cum[-1] * 0.85) * bin_hz
        np.testing.assert_allclose(got, want, atol=bin_hz + 1e-3)

    def test_flatness_range(self, spec):
        mag, _ = spec
        tonal = np.asarray(audio.spectral_flatness(jnp.asarray(mag)))
        rng = np.random.default_rng(0)
        noise = rng.uniform(0.5, 1.0, mag.shape).astype(np.float32)
        noisy = np.asarray(audio.spectral_flatness(jnp.asarray(noise)))
        assert tonal.mean() < 0.2          # sine = tonal
        assert noisy.mean() > 0.8          # flat noise
        assert (tonal >= 0).all() and (noisy <= 1.0 + 1e-5).all()

    def test_contrast_shape_and_sign(self, spec):
        mag, _ = spec
        c = np.asarray(audio.spectral_contrast(jnp.asarray(mag), n_bands=6))
        assert c.shape == (mag.shape[0], 6)
        assert (c >= 0).all()              # log(peak) >= log(valley)

    def test_delta_parity(self):
        rng = np.random.default_rng(1)
        feats = rng.normal(size=(20, 5)).astype(np.float32)
        got = np.asarray(audio.delta(jnp.asarray(feats), order=1, width=2))
        denom = 2.0 * (1 + 4)
        want = np.zeros_like(feats)
        for n in (1, 2):
            plus = feats[np.minimum(np.arange(20) + n, 19)]
            minus = feats[np.maximum(np.arange(20) - n, 0)]
            want += n * (plus - minus)
        want /= denom + 1e-10
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        # order=2 == delta(delta)
        dd = np.asarray(audio.delta(jnp.asarray(feats), order=2, width=2))
        d1 = audio.delta(jnp.asarray(feats), order=1, width=2)
        d2 = np.asarray(audio.delta(d1, order=1, width=2))
        np.testing.assert_allclose(dd, d2, rtol=1e-5, atol=1e-6)

    def test_autocorrelation_parity(self, sine):
        x, sr = sine
        x = x[:2000]
        got = np.asarray(audio.autocorrelation(jnp.asarray(x), 500))
        want = np.array([np.dot(x[: len(x) - lag], x[lag:]) for lag in range(500)])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
        # period of 440 Hz at 16 kHz ~ 36.4 samples -> acf peak near 36
        peak = np.argmax(got[20:60]) + 20
        assert abs(peak - sr / 440) <= 1

    def test_chroma_cqt(self, sine):
        x, sr = sine
        c = audio.cqt(jnp.asarray(x), sr, n_bins=84, hop_length=512)
        ch = np.asarray(audio.chroma_cqt(c, bins_per_octave=12))
        assert ch.shape == (c.shape[0], 12)
        assert ch.max() <= 1.0 + 1e-5
        # A440 -> pitch class A = 9 semitones above C
        assert np.median(ch.argmax(axis=1)) == 9


class TestPreprocessing:
    def test_deemphasis_inverts_preemphasis(self, sine):
        x, _ = sine
        x = x[:4000]
        pre = audio.preemphasis(jnp.asarray(x), 0.97)
        back = np.asarray(audio.deemphasis(pre, 0.97))
        np.testing.assert_allclose(back, x, atol=1e-3)

    def test_remove_dc(self):
        x = jnp.asarray(np.random.default_rng(2).normal(1.5, 1.0, 1000).astype(np.float32))
        y = np.asarray(audio.remove_dc(x))
        assert abs(y.mean()) < 1e-5

    def test_highpass_kills_dc_keeps_tone(self, sine):
        x, sr = sine
        x = x[:8000] + 0.5  # add DC
        y = np.asarray(audio.highpass_filter(jnp.asarray(x), 20.0, sr))
        # DC removed, 440 Hz survives
        assert abs(y[4000:].mean()) < 0.01
        assert y[4000:].std() > 0.3

    def test_highpass_matches_sequential(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=500).astype(np.float32)
        sr, fc = 16000, 100.0
        rc = 1.0 / (2 * np.pi * fc)
        a = rc / (rc + 1.0 / sr)
        want = np.zeros_like(x)
        xp = yp = 0.0
        for i in range(len(x)):
            yp = a * (yp + x[i] - xp)
            xp = x[i]
            want[i] = yp
        got = np.asarray(audio.highpass_filter(jnp.asarray(x), fc, sr))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_noise_gate(self):
        x = jnp.asarray(np.array([0.005, -0.5, 0.02, -0.001], np.float32))
        y = np.asarray(audio.noise_gate(x, 0.01))
        np.testing.assert_allclose(y, [0.0, -0.5, 0.02, 0.0])

    def test_short_term_energy(self):
        x = jnp.asarray(np.concatenate([np.zeros(256), np.ones(256)]).astype(np.float32))
        e = np.asarray(audio.compute_short_term_energy(x, 256))
        np.testing.assert_allclose(e, [0.0, 1.0])

    def test_spectral_gate_attenuates_quiet(self):
        loud = np.ones(256, np.float32) * 0.5
        quiet = np.ones(256, np.float32) * 0.01
        x = jnp.asarray(np.concatenate([loud, quiet]))
        y = np.asarray(audio.spectral_gate(x, threshold=0.01, attack_samples=64))
        np.testing.assert_allclose(y[:256], loud)          # untouched
        assert np.abs(y[256:]).max() < 0.01                # squashed by (e/t)^2


class TestStreamingVAD:
    """VAD/SpeechSegment/AudioStream objects (reference: vad.py:32-150,
    buffer.py:299)."""

    def test_vad_detects_speech_segment(self, sine):
        x, sr = sine
        sig = np.zeros(sr, np.float32)
        sig[4000:12000] = x[:8000]          # speech burst in silence
        sig += np.random.default_rng(0).normal(0, 1e-4, sr).astype(np.float32)
        segs = audio.VAD(sample_rate=sr).detect(sig)
        assert len(segs) == 1
        assert abs(segs[0].start_sample - 4000) < 1000
        assert abs(segs[0].end_sample - 12000) < 3000
        assert segs[0].start_time == pytest.approx(
            segs[0].start_sample / sr)

    def test_vad_silence_empty(self):
        sig = np.random.default_rng(1).normal(0, 1e-5, 16000).astype(np.float32)
        assert audio.VAD(sample_rate=16000).detect(sig) == []

    def test_audio_stream_chunking(self):
        st = audio.AudioStream(chunk_size=480, hop_size=240)
        st.push(np.ones(500, np.float32))
        assert st.has_chunk()
        c1 = st.pop_chunk()
        assert c1.shape == (480,)
        assert not st.has_chunk()
        st.push(np.ones(300, np.float32))
        assert st.has_chunk()               # 260 pending + 300 >= 480
        assert st.latest(0.01).shape == (160,)


class TestReferenceAliases:
    def test_alias_surface(self, sine):
        x, sr = sine
        import jax
        spec = jax.jit(lambda v: audio.magnitude_spectrum(
            audio.stft(v, 512, 256)))(jnp.asarray(x))
        assert np.asarray(spec).min() >= 0
        ps = audio.power_spectrum(spec.astype(np.complex64) * 0 + spec)
        fb = audio.create_mel_filterbank(sr, 512, 40)
        mel = audio.apply_mel_filterbank(spec, fb)
        assert mel.shape[-1] == 40
        lm = audio.log_mel(mel)
        db = audio.to_decibels(spec)
        assert np.isfinite(np.asarray(lm)).all()
        h = audio.harmonic(jnp.asarray(x[:4000]))
        assert h.shape[0] == 4000
        assert audio.AudioRingBuffer is audio.RingBuffer
        assert audio.mel_spectrogram is audio.melspectrogram

    def test_zero_crossing_rate(self, sine):
        x, sr = sine
        z = np.asarray(audio.zero_crossing_rate(jnp.asarray(x), 512, 256))
        # 440 Hz sine crosses ~2*440 times/s -> rate ~ 880/16000 = 0.055
        np.testing.assert_allclose(z.mean(), 2 * 440 / sr, rtol=0.1)

    def test_chroma_stft_pitch_class(self, sine):
        x, sr = sine
        import jax
        ch = np.asarray(jax.jit(lambda v: audio.chroma_stft(
            jnp.abs(audio.stft(v, 2048, 512)), sr))(jnp.asarray(x)))
        assert ch.shape[-1] == 12
        assert np.median(ch.argmax(axis=1)) == 9    # A pitch class
