"""STFT / iSTFT as MXU matmuls.

TPU-first design: instead of an FFT primitive, each STFT is
  frame-extract (gather) → (frames @ windowed-DFT-basis) matmul.
For the small, fixed n_fft values used by Chatterbox (1920 / 400 / 16) the
matmul formulation is both faster on TPU (MXU, fusable) and exactly
reproducible against torch.stft.

References (behaviors matched):
  - torch.stft(center=True, pad_mode='reflect')  — whisper-style mel,
    ref: models/s3tokenizer/s3tokenizer.py:156-160
  - torch.stft(center=False) on pre-padded input — matcha 24 kHz mel,
    ref: models/s3gen/utils/mel.py:60-78
  - torch.istft(n_fft=16, hop=4) — HiFT synthesis,
    ref: models/s3gen/hifigan.py:404-410
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .filters import dft_basis, idft_basis


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, n_fft) frames at the given hop.

    n_frames = 1 + (T - n_fft) // hop (torch center=False convention).
    """
    T = x.shape[-1]
    n_frames = 1 + (T - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[..., idx]


def stft_real_imag(x: jnp.ndarray, n_fft: int, hop: int,
                   window: np.ndarray, center: bool = True,
                   pad_mode: str = "reflect"):
    """STFT returning (real, imag), each (..., n_freqs, n_frames).

    Matches torch.stft(x, n_fft, hop, win_length=n_fft, window=window,
    center=center, pad_mode=pad_mode, onesided=True).
    """
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)
    re_b, im_b = dft_basis(n_fft, window)
    frames = frame_signal(x, n_fft, hop)             # (..., F, n_fft)
    re = frames @ jnp.asarray(re_b)                  # (..., F, n_freqs)
    im = frames @ jnp.asarray(im_b)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def magnitude(re: jnp.ndarray, im: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    p = re * re + im * im
    if eps:
        p = p + eps
    return jnp.sqrt(p)


def power(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return re * re + im * im


def istft_overlap_add(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop: int,
                      window: np.ndarray, length: int | None = None) -> jnp.ndarray:
    """Inverse STFT via synthesis matmul + overlap-add.

    Args:
      re, im: (..., n_freqs, n_frames) one-sided spectrum.
      window: analysis window (also used for synthesis, torch semantics).
    Returns (..., out_len) where out_len = (n_frames - 1) * hop (torch
    center=True trimming: n_fft//2 cut from each side), or `length`.

    Matches torch.istft(center=True) including the window-envelope
    normalization sum_k w^2(n - k*hop).
    """
    re_b, im_b = idft_basis(n_fft, window)
    re_t = jnp.swapaxes(re, -1, -2)                  # (..., n_frames, n_freqs)
    im_t = jnp.swapaxes(im, -1, -2)
    frames = re_t @ jnp.asarray(re_b) + im_t @ jnp.asarray(im_b)  # (..., n_frames, n_fft)

    n_frames = frames.shape[-2]
    total = n_fft + hop * (n_frames - 1)

    # Overlap-add via strided scatter: with r = n_fft // hop overlapping
    # groups, frame k contributes to samples [k*hop, k*hop + n_fft).
    # Decompose each frame into r hop-sized chunks and add r shifted
    # "strided reshapes" — static shapes, no dynamic scatter.
    assert n_fft % hop == 0, "istft_overlap_add requires hop | n_fft"
    r = n_fft // hop
    batch_shape = frames.shape[:-2]
    chunks = frames.reshape(*batch_shape, n_frames, r, hop)
    out = jnp.zeros((*batch_shape, total), frames.dtype)
    win_env = jnp.zeros((total,), frames.dtype)
    w2 = jnp.asarray(window.astype(np.float32) ** 2).reshape(r, hop)
    for j in range(r):
        seg = chunks[..., :, j, :].reshape(*batch_shape, n_frames * hop)
        out = out.at[..., j * hop: j * hop + n_frames * hop].add(seg)
        env_seg = jnp.tile(w2[j], n_frames)
        win_env = win_env.at[j * hop: j * hop + n_frames * hop].add(env_seg)

    # torch.istft(center=True) trims n_fft//2 from both sides.
    s = n_fft // 2
    out = out[..., s: total - s]
    win_env = win_env[s: total - s]
    out = out / jnp.maximum(win_env, 1e-11)
    if length is not None:
        out = out[..., :length]
    return out
