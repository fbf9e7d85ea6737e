from .analysis import (
    chroma, cqt, hpss, normalize, pitch_shift, time_stretch, vad_energy,
    vad_hangover, vad_zcr, yin_pitch,
)
from .core import (
    AudioBuffer, RingBuffer, amplitude_to_db, db_to_amplitude, frame_signal, griffin_lim,
    hann_window, istft, log_melspectrogram, mel_filterbank, melspectrogram,
    mfcc, preemphasis, resample, stft,
)
from .features import (
    autocorrelation, chroma_cqt, compute_short_term_energy, deemphasis, delta,
    highpass_filter, noise_gate, remove_dc, spectral_bandwidth,
    spectral_centroid, spectral_contrast, spectral_flatness, spectral_gate,
    spectral_rolloff,
)

__all__ = [
    "AudioBuffer", "RingBuffer", "amplitude_to_db", "db_to_amplitude", "frame_signal",
    "griffin_lim", "hann_window", "istft", "log_melspectrogram",
    "mel_filterbank", "melspectrogram", "mfcc", "preemphasis", "resample",
    "stft", "chroma", "cqt", "hpss", "normalize", "pitch_shift",
    "time_stretch", "vad_energy", "vad_hangover", "vad_zcr", "yin_pitch",
    "autocorrelation", "chroma_cqt", "compute_short_term_energy", "deemphasis",
    "delta", "highpass_filter", "noise_gate", "remove_dc",
    "spectral_bandwidth", "spectral_centroid", "spectral_contrast",
    "spectral_flatness", "spectral_gate", "spectral_rolloff",
]
