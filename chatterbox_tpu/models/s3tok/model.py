"""S3 speech tokenizer: 16 kHz audio → 25 Hz discrete tokens (FSQ, vocab 3^8).

The reference wraps the pip package `s3tokenizer`'s S3TokenizerV2
("speech_tokenizer_v2_25hz") with an integrated mel frontend
(ref: models/s3tokenizer/s3tokenizer.py:22-168). The pip package's
architecture (recovered from its public source, xingchensong/S3Tokenizer
model_v2.py): a whisper-style audio encoder over 128-mel/100fps features with
two stride-2 convs (→25 Hz, "num_mel_frames = 4 * num_tokens" per the
reference comment at s3tokenizer.py:113), sinusoidal positions, pre-norm
transformer blocks, and an FSQ quantizer that projects to 8 dims, tanh-bounds,
rounds each to 3 levels and composes a base-3 index.

Weights for this model ship inside the reference's `s3gen.safetensors` under
the `tokenizer.*` prefix (ref: tts.py:151-155, s3gen.py:55).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ...nn import core as nn
from ...audio.mels import log_mel_spectrogram_s3tok

SPEECH_VOCAB_SIZE = 6561   # 3 ** 8
S3_SR = 16_000
S3_HOP = 160               # 100 mel frames / sec
S3_TOKEN_RATE = 25


@dataclass(frozen=True)
class S3TokenizerConfig:
    n_mels: int = 128
    n_state: int = 1280
    n_heads: int = 20
    n_layers: int = 12
    fsq_dim: int = 8
    fsq_levels: int = 3

    @classmethod
    def tiny_test(cls):
        return cls(n_mels=128, n_state=64, n_heads=4, n_layers=2)


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper-style fixed sinusoidal embedding."""
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def s3tokenizer_init(key, cfg: S3TokenizerConfig = S3TokenizerConfig()) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * cfg.n_layers))
    d = cfg.n_state
    p = {
        "conv1": nn.conv1d_init(next(ks), cfg.n_mels, d, 3),
        "conv2": nn.conv1d_init(next(ks), d, d, 3),
        "blocks": [],
        "ln_post": nn.layer_norm_init(d),
        "fsq_proj": nn.linear_init(next(ks), d, cfg.fsq_dim),
    }
    for _ in range(cfg.n_layers):
        p["blocks"].append({
            "ln1": nn.layer_norm_init(d),
            "q": nn.linear_init(next(ks), d, d),
            "k": nn.linear_init(next(ks), d, d, bias=False),
            "v": nn.linear_init(next(ks), d, d),
            "out": nn.linear_init(next(ks), d, d),
            "ln2": nn.layer_norm_init(d),
            "fc1": nn.linear_init(next(ks), d, 4 * d),
            "fc2": nn.linear_init(next(ks), 4 * d, d),
        })
    return p


def s3tokenizer_encode_mel(params: dict, cfg: S3TokenizerConfig,
                           mel: jnp.ndarray, mel_len: jnp.ndarray):
    """mel: (B, T_mel, 128) whisper-normalized log-mel (100 fps), mel_len (B,).
    Returns (tokens (B, T_mel//4) int32, token_len (B,))."""
    h = nn.gelu_exact(nn.conv1d(params["conv1"], mel, stride=2, padding=1))
    h = nn.gelu_exact(nn.conv1d(params["conv2"], h, stride=2, padding=1))
    T = h.shape[1]
    h = h + jnp.asarray(_sinusoids(T, cfg.n_state))
    token_len = mel_len // 4
    key_mask = jnp.arange(T)[None] < token_len[:, None]
    n_heads = cfg.n_heads
    for blk in params["blocks"]:
        x = nn.layer_norm(blk["ln1"], h)
        q = nn.split_heads(nn.linear(blk["q"], x), n_heads)
        k = nn.split_heads(nn.linear(blk["k"], x), n_heads)
        v = nn.split_heads(nn.linear(blk["v"], x), n_heads)
        a = nn.mha(q, k, v, mask=key_mask[:, None, None, :])
        h = h + nn.linear(blk["out"], nn.merge_heads(a))
        x = nn.layer_norm(blk["ln2"], h)
        h = h + nn.linear(blk["fc2"], nn.gelu_exact(nn.linear(blk["fc1"], x)))
    h = nn.layer_norm(params["ln_post"], h)

    # FSQ: 8-dim tanh-bounded projection, 3 levels per dim, base-3 compose
    z = jnp.tanh(nn.linear(params["fsq_proj"], h)) * 0.9990000128746033
    digits = jnp.round(z) + 1.0                                   # {0,1,2}
    powers = jnp.asarray(3.0 ** np.arange(cfg.fsq_dim), jnp.float32)
    tokens = jnp.sum(digits * powers, axis=-1).astype(jnp.int32)
    tokens = jnp.where(key_mask, tokens, 0)
    return tokens, token_len


def s3tokenizer_tokenize(params: dict, cfg: S3TokenizerConfig,
                         wav_16k: jnp.ndarray, wav_len: jnp.ndarray,
                         max_len: int | None = None):
    """(B, T) 16 kHz waveform (padded to a multiple of 640 samples) →
    (tokens, token_len). Mirrors the reference integrated forward
    (ref: s3tokenizer.py:90-126): log-mel → quantize; optional max_len
    truncation (mel = 4 × tokens)."""
    mel = log_mel_spectrogram_s3tok(wav_16k)          # (B, 128, T_mel)
    mel = jnp.swapaxes(mel, 1, 2)                     # (B, T_mel, 128)
    mel_len = wav_len // S3_HOP
    if max_len is not None:
        mel = mel[:, : max_len * 4]
        mel_len = jnp.minimum(mel_len, max_len * 4)
    tokens, token_len = s3tokenizer_encode_mel(params, cfg, mel, mel_len)
    if max_len is not None:
        token_len = jnp.minimum(token_len, max_len)
    return tokens, token_len


def drop_invalid_tokens(tokens: np.ndarray) -> np.ndarray:
    """Strip special tokens (>= vocab) — host-side helper matching
    ref: models/s3gen/s3gen.py:36-38."""
    tokens = np.asarray(tokens).reshape(-1)
    return tokens[tokens < SPEECH_VOCAB_SIZE]
