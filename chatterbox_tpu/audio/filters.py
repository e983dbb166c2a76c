"""Filterbank / window constants for the audio frontends.

Everything here is plain numpy executed once at model-build time; the results
are baked into jitted functions as constants so the hot path is pure matmuls
on the MXU.

Reimplements (without importing librosa/torchaudio):
  - librosa.filters.mel (slaney scale + slaney norm) — used by the 24 kHz
    matcha mel (ref: models/s3gen/utils/mel.py:56), the 16 kHz/128-mel
    whisper-style tokenizer mel (ref: models/s3tokenizer/s3tokenizer.py:39-43)
    and the 40-mel voice-encoder mel (ref: models/voice_encoder/melspec.py:9-16).
  - Kaldi-compatible mel banks + povey window for CAMPPlus's fbank frontend
    (ref: models/s3gen/xvector.py:50 → torchaudio.compliance.kaldi.fbank).
"""
from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Slaney (librosa-default) mel scale
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3            # Hz per mel below the knee
_MIN_LOG_HZ = 1000.0         # knee of the linear/log split
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mel = np.where(log_region, _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP, mel)
    return mel


def mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    f = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)
    return f


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank.

    Equivalent to librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) with the
    default htk=False, norm='slaney'. Returns (n_mels, n_fft//2 + 1) float32.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)

    mel_min = hz_to_mel_slaney(fmin)
    mel_max = hz_to_mel_slaney(fmax)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)          # (n_mels + 2,)

    fdiff = np.diff(hz_pts)                      # (n_mels + 1,)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels+2, n_freqs)

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: equal-area triangles.
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# HTK/Kaldi mel scale + banks (for CAMPPlus kaldi fbank)
# ---------------------------------------------------------------------------

def hz_to_mel_htk(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (np.exp(np.asarray(m, dtype=np.float64) / 1127.0) - 1.0)


def kaldi_mel_banks(num_bins: int, padded_window_size: int, sample_freq: float,
                    low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi-style mel banks over FFT bins (matches torchaudio's kaldi.get_mel_banks).

    Kaldi triangles are defined in mel space directly (not normalized) and
    exclude the nyquist bin. Returns (num_bins, padded_window_size//2 + 1),
    with the nyquist column zero (kaldi pads one zero column).
    """
    num_fft_bins = padded_window_size // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_freq / padded_window_size
    mel_low = hz_to_mel_htk(low_freq)
    mel_high = hz_to_mel_htk(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_bins, num_fft_bins + 1), dtype=np.float32)
    fft_freqs = fft_bin_width * np.arange(num_fft_bins)
    mel = hz_to_mel_htk(fft_freqs)                       # (num_fft_bins,)
    for i in range(num_bins):
        left = mel_low + i * mel_delta
        center = mel_low + (i + 1) * mel_delta
        right = mel_low + (i + 2) * mel_delta
        up = (mel - left) / (center - left)
        down = (right - mel) / (right - center)
        tri = np.minimum(up, down)
        bins[i, :num_fft_bins] = np.maximum(0.0, tri)
    return bins


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """torch.hann_window equivalent (periodic=True by default)."""
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1))
    return w[:win_length].astype(np.float32)


def povey_window(win_length: int) -> np.ndarray:
    """Kaldi 'povey' window: hann(periodic=False) ** 0.85."""
    a = 2.0 * np.pi / (win_length - 1)
    w = (0.5 - 0.5 * np.cos(a * np.arange(win_length))) ** 0.85
    return w.astype(np.float32)


# ---------------------------------------------------------------------------
# Matmul-DFT bases: the STFT hot path is (frames @ basis) on the MXU.
# ---------------------------------------------------------------------------

def dft_basis(n_fft: int, window: np.ndarray | None = None):
    """Real/imag DFT analysis basis, window folded in.

    Returns (real, imag), each (n_fft, n_fft//2 + 1) float32, such that for a
    frame x (already extracted, length n_fft):
        re = x @ real;  im = x @ imag
    matches rfft(x * window).
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    re = np.cos(ang)
    im = np.sin(ang)
    if window is not None:
        re = re * window[:, None]
        im = im * window[:, None]
    return re.astype(np.float32), im.astype(np.float32)


def idft_basis(n_fft: int, window: np.ndarray | None = None):
    """Inverse real-DFT synthesis basis with window folded in.

    Returns (real, imag), each (n_fft//2 + 1, n_fft) float32, such that
        frame = re_spec @ real + im_spec @ imag
    equals irfft(complex_spec) * window (the pre-overlap-add frames of istft).
    """
    n_freqs = n_fft // 2 + 1
    k = np.arange(n_freqs)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    # irfft coefficient weights: DC and nyquist count once, others twice.
    scale = np.full((n_freqs, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    re = np.cos(ang) * scale
    im = -np.sin(ang) * scale
    if window is not None:
        re = re * window[None, :]
        im = im * window[None, :]
    return re.astype(np.float32), im.astype(np.float32)
