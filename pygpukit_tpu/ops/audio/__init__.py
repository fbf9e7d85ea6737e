from .analysis import (
    chroma, cqt, hpss, normalize, pitch_shift, time_stretch, vad_energy,
    vad_hangover, vad_zcr, yin_pitch,
)
from .core import (
    AudioBuffer, RingBuffer, amplitude_to_db, db_to_amplitude, frame_signal, griffin_lim,
    hann_window, istft, log_melspectrogram, mel_filterbank, melspectrogram,
    mfcc, preemphasis, resample, stft,
)

__all__ = [
    "AudioBuffer", "RingBuffer", "amplitude_to_db", "db_to_amplitude", "frame_signal",
    "griffin_lim", "hann_window", "istft", "log_melspectrogram",
    "mel_filterbank", "melspectrogram", "mfcc", "preemphasis", "resample",
    "stft", "chroma", "cqt", "hpss", "normalize", "pitch_shift",
    "time_stretch", "vad_energy", "vad_hangover", "vad_zcr", "yin_pitch",
]
