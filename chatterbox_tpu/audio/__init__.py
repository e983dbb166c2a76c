from .mels import (
    mel_spectrogram_24k,
    log_mel_spectrogram_s3tok,
    melspectrogram_ve,
    kaldi_fbank_80,
)
from .stft import stft_real_imag, istft_overlap_add, frame_signal
from .resample import resample

__all__ = [
    "mel_spectrogram_24k",
    "log_mel_spectrogram_s3tok",
    "melspectrogram_ve",
    "kaldi_fbank_80",
    "stft_real_imag",
    "istft_overlap_add",
    "frame_signal",
    "resample",
]
