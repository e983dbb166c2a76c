"""Minimal audio file IO (CPU).

The reference uses librosa.load (ffmpeg/soundfile backends). This image has
neither, so we read PCM/float WAV via scipy and resample with the shared
polyphase resampler. Non-WAV formats raise a clear error.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..audio.resample import resample


def load_audio(path: str, target_sr: int) -> np.ndarray:
    """Returns mono float32 in [-1, 1] at target_sr. Uses the native C++
    reader (runtime/wavio.cpp) when built, else scipy."""
    from ..runtime import read_wav
    native = read_wav(str(path))
    if native is not None:
        wav, sr = native
        if sr != target_sr:
            wav = np.asarray(resample(jnp.asarray(wav), sr, target_sr))
        return wav
    from scipy.io import wavfile
    try:
        sr, data = wavfile.read(path)
    except ValueError as e:
        raise ValueError(
            f"Could not read {path!r} — only WAV files are supported in this "
            f"build (install soundfile/librosa for other formats): {e}") from e
    if data.ndim == 2:
        data = data.mean(axis=1)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wav = data.astype(np.float32)
    if sr != target_sr:
        wav = np.asarray(resample(jnp.asarray(wav), sr, target_sr))
    return wav


def save_wav(path: str, wav: np.ndarray, sr: int):
    from ..runtime import write_wav
    wav = np.clip(np.asarray(wav).reshape(-1), -1.0, 1.0).astype(np.float32)
    if write_wav(str(path), wav, sr):
        return
    from scipy.io import wavfile
    wavfile.write(path, sr, wav)
