"""GE2E-style voice encoder: 16 kHz wav → 256-d L2-normalized speaker embedding.

Matches the reference VoiceEncoder (ref: models/voice_encoder/voice_encoder.py:119-274
with VoiceEncConfig at models/voice_encoder/config.py): 40-mel power
spectrogram → 3-layer LSTM(256) → linear + ReLU → L2 norm; full utterances
are windowed into overlapping "partials" (160 frames, rate 1.3), embedded,
averaged and re-normalized.

The partial windowing is host-side numpy (cheap bookkeeping); the LSTM +
projection run jitted over the batched partials.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...nn import core as nn
from ...audio.mels import melspectrogram_ve
from ...audio.resample import resample

VE_SR = 16_000
NUM_MELS = 40
PARTIAL_FRAMES = 160
HIDDEN = 256
EMBED = 256
DEFAULT_RATE = 1.3   # ref: voice_encoder.py:270


def ve_init(key) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "lstm": nn.lstm_init(k1, NUM_MELS, HIDDEN, num_layers=3),
        "proj": nn.linear_init(k2, HIDDEN, EMBED),
        "similarity_weight": jnp.asarray([10.0]),
        "similarity_bias": jnp.asarray([-5.0]),
    }


@jax.jit
def ve_forward(params: dict, mels: jnp.ndarray) -> jnp.ndarray:
    """(B, 160, 40) partial mels -> (B, 256) L2-normalized embeddings
    (ref: voice_encoder.py:139-160)."""
    _, (h, _) = nn.lstm(params["lstm"], mels)
    raw = jax.nn.relu(nn.linear(params["proj"], h[-1]))
    return raw / jnp.linalg.norm(raw, axis=1, keepdims=True)


def _get_num_wins(n_frames: int, step: int, min_coverage: float):
    """(ref: voice_encoder.py:54-66)"""
    win = PARTIAL_FRAMES
    n_wins, remainder = divmod(max(n_frames - win + step, 0), step)
    if n_wins == 0 or (remainder + (win - step)) / win >= min_coverage:
        n_wins += 1
    target_n = win + step * (n_wins - 1)
    return n_wins, target_n


def _frame_step(rate: float) -> int:
    """(ref: voice_encoder.py:69-81)"""
    return int(np.round((VE_SR / rate) / PARTIAL_FRAMES))


def embeds_from_mels(params: dict, mels: list[np.ndarray], rate: float = DEFAULT_RATE,
                     min_coverage: float = 0.8) -> np.ndarray:
    """mels: list of (T_i, 40) unscaled mels → (N, 256) utterance embeddings."""
    step = _frame_step(rate)
    all_partials, spans = [], []
    for mel in mels:
        n_wins, target = _get_num_wins(len(mel), step, min_coverage)
        if target > len(mel):
            mel = np.concatenate([mel, np.zeros((target - len(mel), NUM_MELS), mel.dtype)])
        start = len(all_partials)
        for i in range(n_wins):
            all_partials.append(mel[i * step: i * step + PARTIAL_FRAMES])
        spans.append((start, len(all_partials)))
    batch = jnp.asarray(np.stack(all_partials).astype(np.float32))
    partial_embeds = np.asarray(ve_forward(params, batch))
    out = []
    for s, e in spans:
        raw = partial_embeds[s:e].mean(axis=0)
        out.append(raw / np.linalg.norm(raw))
    return np.stack(out)


def embeds_from_wavs(params: dict, wavs: list[np.ndarray], sample_rate: int,
                     rate: float = DEFAULT_RATE, as_spk: bool = False) -> np.ndarray:
    """(ref: voice_encoder.py:246-274). Resampling uses the shared polyphase
    resampler; the reference's optional top-db trimming is skipped (it only
    trims leading/trailing silence of already-curated prompts)."""
    if sample_rate != VE_SR:
        wavs = [np.asarray(resample(jnp.asarray(w), sample_rate, VE_SR)) for w in wavs]
    mels = [np.asarray(melspectrogram_ve(jnp.asarray(w)[None]))[0].T for w in wavs]
    embeds = embeds_from_mels(params, mels, rate=rate)
    if as_spk:
        spk = embeds.mean(axis=0)
        return spk / np.linalg.norm(spk)
    return embeds
