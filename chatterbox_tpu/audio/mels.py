"""The four audio feature frontends of the Chatterbox stack, as pure jittable
JAX functions over baked-in filterbank constants.

| frontend            | sr    | n_fft | hop | mels | used by                        | reference                                   |
|---------------------|-------|-------|-----|------|--------------------------------|---------------------------------------------|
| matcha mel          | 24000 | 1920  | 480 | 80   | S3Gen CFM target / ref prompt  | models/s3gen/utils/mel.py:36-85              |
| whisper-style mel   | 16000 | 400   | 160 | 128  | S3 speech tokenizer            | models/s3tokenizer/s3tokenizer.py:128-168    |
| voice-encoder mel   | 16000 | 400   | 160 | 40   | GE2E speaker encoder           | models/voice_encoder/melspec.py:26-51        |
| kaldi fbank         | 16000 | 512p  | 160 | 80   | CAMPPlus x-vector              | models/s3gen/xvector.py:45-58 (torchaudio)   |
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .filters import mel_filterbank, kaldi_mel_banks, hann_window, povey_window
from .stft import stft_real_imag, frame_signal, power


# ---------------------------------------------------------------------------
# Matcha 24 kHz mel (S3Gen)
# ---------------------------------------------------------------------------

_MATCHA = dict(n_fft=1920, hop=480, win=1920, sr=24000, n_mels=80, fmin=0, fmax=8000)
_matcha_mel_basis = mel_filterbank(24000, 1920, 80, 0, 8000)          # (80, 961)
_matcha_window = hann_window(1920)


def mel_spectrogram_24k(y: jnp.ndarray) -> jnp.ndarray:
    """(B, T) 24 kHz audio -> (B, 80, T//480) log-mel.

    Matches the matcha mel (ref: models/s3gen/utils/mel.py:36-85):
    manual reflect-pad of (n_fft - hop)/2 = 720 both sides, center=False,
    |stft| = sqrt(re^2 + im^2 + 1e-9), mel, log(clamp(x, 1e-5)).
    """
    pad = (_MATCHA["n_fft"] - _MATCHA["hop"]) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    re, im = stft_real_imag(y, _MATCHA["n_fft"], _MATCHA["hop"], _matcha_window,
                            center=False)
    mag = jnp.sqrt(power(re, im) + 1e-9)                               # (B, 961, F)
    mel = jnp.asarray(_matcha_mel_basis) @ mag                         # (B, 80, F)
    return jnp.log(jnp.clip(mel, min=1e-5))


# ---------------------------------------------------------------------------
# Whisper-style 16 kHz / 128-mel (S3 tokenizer input)
# ---------------------------------------------------------------------------

_s3tok_mel_basis = mel_filterbank(16000, 400, 128)                     # (128, 201)
_s3tok_window = hann_window(400)


def log_mel_spectrogram_s3tok(audio: jnp.ndarray) -> jnp.ndarray:
    """(B, T) 16 kHz audio -> (B, 128, T//160) whisper-normalized log-mel.

    Matches ref models/s3tokenizer/s3tokenizer.py:128-168: torch.stft
    (center=True, reflect), drop last frame, power spectrum, mel, log10
    clamp 1e-10, dynamic-range max-8, (x+4)/4.
    """
    re, im = stft_real_imag(audio, 400, 160, _s3tok_window, center=True)
    p = power(re, im)[..., :-1]                                        # drop last frame
    mel = jnp.asarray(_s3tok_mel_basis) @ p
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


# ---------------------------------------------------------------------------
# Voice-encoder 40-mel (GE2E speaker embedding)
# ---------------------------------------------------------------------------

_ve_mel_basis = mel_filterbank(16000, 400, 40, 0, 8000)                # (40, 201)
_ve_window = hann_window(400)


def melspectrogram_ve(wav: jnp.ndarray) -> jnp.ndarray:
    """(B, T) 16 kHz audio -> (B, 40, 1 + T//160) power mel.

    Matches ref models/voice_encoder/melspec.py:26-51 with VoiceEncConfig:
    librosa.stft(n_fft=400, hop=160, center=True, reflect), magnitude**2
    (mel_power=2.0), mel_type='amp' → no dB, no normalization.
    """
    re, im = stft_real_imag(wav, 400, 160, _ve_window, center=True)
    p = power(re, im)
    return jnp.asarray(_ve_mel_basis) @ p


# ---------------------------------------------------------------------------
# Kaldi fbank-80 (CAMPPlus input)
# ---------------------------------------------------------------------------

_KALDI_PADDED = 512   # 400-sample window rounded up to a power of two
_kaldi_banks = kaldi_mel_banks(80, _KALDI_PADDED, 16000.0)             # (80, 257)
_kaldi_window = povey_window(400)


def kaldi_fbank_80(wav: jnp.ndarray) -> jnp.ndarray:
    """(B, T) 16 kHz float waveform in [-1, 1] -> (B, n_frames, 80) log fbank.

    Matches torchaudio.compliance.kaldi.fbank(num_mel_bins=80) defaults as
    invoked by the reference (models/s3gen/xvector.py:50): snip_edges=True,
    frame 25 ms / shift 10 ms, remove_dc_offset, preemphasis 0.97, povey
    window, power spectrum on 512-point FFT, log(max(x, eps)).
    NOTE: kaldi multiplies the waveform by 32768 internally (int16 scale).
    """
    wav = wav * 32768.0
    frames = frame_signal(wav, 400, 160)                               # (B, F, 400)
    # remove DC per frame
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # preemphasis with kaldi's first-sample convention: x[0] -= 0.97*x[0]
    first = frames[..., :1] * (1.0 - 0.97)
    rest = frames[..., 1:] - 0.97 * frames[..., :-1]
    frames = jnp.concatenate([first, rest], axis=-1)
    frames = frames * jnp.asarray(_kaldi_window)
    # zero-pad to 512 and power spectrum via matmul-DFT
    frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, _KALDI_PADDED - 400)])
    from .filters import dft_basis
    re_b, im_b = dft_basis(_KALDI_PADDED, None)
    re = frames @ jnp.asarray(re_b)
    im = frames @ jnp.asarray(im_b)
    p = re * re + im * im                                              # (B, F, 257)
    mel = p @ jnp.asarray(_kaldi_banks.T)                              # (B, F, 80)
    return jnp.log(jnp.maximum(mel, 1.1920928955078125e-07))           # float eps
