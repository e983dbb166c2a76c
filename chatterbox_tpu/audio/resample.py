"""Polyphase sinc resampler (torchaudio-compatible) as a jittable conv.

The reference resamples with torchaudio.transforms.Resample
(ref: models/s3gen/s3gen.py:42-44) and librosa kaiser_fast
(ref: models/voice_encoder/voice_encoder.py:262). We implement one
high-quality windowed-sinc polyphase resampler matching torchaudio's
`sinc_interp_hann` method (lowpass_filter_width=6, rolloff=0.99); it is used
for every rate conversion in the stack. On TPU the polyphase filter is a
single grouped conv (MXU-friendly).
"""
from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=32)
def _resample_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                     rolloff: float = 0.99):
    """Build the polyphase kernel. Returns (kernel, width) where kernel has
    shape (new_freq_g, 1, kernel_len) matching torchaudio's implementation
    with gcd-reduced frequencies."""
    g = math.gcd(orig_freq, new_freq)
    orig = orig_freq // g
    new = new_freq // g

    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    idx = np.arange(-width, width + orig, dtype=np.float64)[None] / orig  # (1, K)
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx    # (new, K)
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    # hann window over the filter support
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    scale = base_freq / orig
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels = kernels * window * scale                                    # (new, K)
    return kernels.astype(np.float32), width, orig, new


def resample(wav: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Resample (..., T) waveform. Matches torchaudio.functional.resample
    with sinc_interp_hann defaults."""
    if orig_freq == new_freq:
        return wav
    kernels, width, orig, new = _resample_kernel(orig_freq, new_freq)
    length = wav.shape[-1]
    batch_shape = wav.shape[:-1]
    x = wav.reshape(-1, 1, length)                                        # (N, 1, T)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))
    # conv with stride `orig`, each of the `new` kernels one output phase
    k = jnp.asarray(kernels)[:, None, :]                                  # (new, 1, K)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(orig,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))                          # (N, new, T//orig+1)
    y = jnp.swapaxes(y, -1, -2).reshape(x.shape[0], -1)                   # interleave phases
    target_len = int(math.ceil(new * length / orig))
    y = y[:, :target_len]
    return y.reshape(*batch_shape, target_len)
