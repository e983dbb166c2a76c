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
import jax.numpy as jnp

from ..models.s3gen.model import S3GenEngine, RefDict, trim_fade, SIL_TOKEN
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
    """Streams S3Gen over token chunks with real cross-chunk continuity.

    Continuity machinery (the reference's dormant hooks, now actually wired):
      * one FIXED per-utterance CFM noise buffer, aligned to the packed
        [prompt|gen] mel layout — every feed re-denoises the already-emitted
        region from the same realization (vs. the reference's per-call draw,
        ref: s3gen.py:313-316);
      * HiFT source cache — the source prefix from previous feeds replaces
        the fresh draw so harmonic phase/noise of emitted audio never changes
        (ref: hifigan.py:471-473);
      * `finalize` lookahead trim — non-final feeds drop the last
        PRE_LOOKAHEAD_LEN tokens' frames (ref: flow.py:170-171, s3gen.py:200).

    Two modes:
      * exact (window_tokens=None): each feed re-runs the flow over the full
        accumulated window. Best quality; O(total) flow per feed — right for
        sentence-scale streaming (TTFA path).
      * windowed (window_tokens=W): each feed encodes only [prompt | last ≤W
        tokens] and vocodes only [ctx_mel tail | new frames], with the
        harmonic phase carried across windows — O(chunk) per feed, for
        unbounded long-form narration.
    """

    MAX_MEL_FRAMES = 8192    # fixed-noise buffer cap (≈164 s of audio)

    def __init__(self, engine: S3GenEngine, ref: RefDict, key,
                 lookahead_tokens: int = PRE_LOOKAHEAD_LEN,
                 window_tokens: Optional[int] = None,
                 ctx_mel: int = 16):
        self.engine = engine
        self.ref = ref
        self.lookahead = lookahead_tokens
        self.window = window_tokens
        if window_tokens is not None and window_tokens <= lookahead_tokens + 1:
            raise ValueError(
                f"window_tokens ({window_tokens}) must exceed "
                f"lookahead_tokens + 1 ({lookahead_tokens + 1})")
        self.ctx_mel = ctx_mel
        k_flow, k_noise, k_hift = jax.random.split(key, 3)
        self._k_flow = k_flow          # fixed: CFM solve is deterministic given z
        self._k_hift = k_hift          # fixed: source phases/noise per utterance
        # fixed per-utterance noise lives on DEVICE; feeds slice it there
        self._noise = jax.random.normal(k_noise, (1, self.MAX_MEL_FRAMES, 80))
        self._tokens = np.zeros((1, 0), np.int32)
        self._fade = trim_fade()
        # exact-mode state (fused path: source cache stays on device)
        self._emitted_samples = 0
        self._cache_dev = None
        self._src_cache_len = 0
        # sync-free device handoff state (feed_from_decode)
        self._row_dev = None       # device [prompt|gen] token row
        self._n_acc = 0            # host mirror of the row's gen count
        # windowed-mode state
        self._emitted_tokens = 0
        self._mel_tail = np.zeros((1, 0, 80), np.float32)
        self._phase_carry = np.zeros((1, 9), np.float64)   # Σ f/sr mod 1, fp64

    def feed(self, new_tokens: np.ndarray, final: bool = False) -> np.ndarray:
        """Feed newly generated speech tokens; returns the new audio samples."""
        return self.feed_fetch(self.feed_dispatch(new_tokens, final=final))

    def feed_dispatch(self, new_tokens: np.ndarray, final: bool = False):
        """Async half of feed(): dispatch the vocode program(s) and return an
        opaque handle for feed_fetch. Lets a serving loop dispatch N
        concurrent streams' feeds back-to-back and fetch them together —
        the device computes pipeline and the N relay round-trips collapse
        into one gather (continuous.ContinuousTTSServer._run_feeds).
        Audio is bit-identical to the synchronous feed(): same programs,
        same inputs, only the fetch is deferred. Windowed mode computes
        synchronously (its passes are host-driven) and the handle carries
        the finished audio."""
        new_tokens = np.asarray(new_tokens).reshape(1, -1)
        self._tokens = np.concatenate([self._tokens, new_tokens], axis=1)
        self._row_dev = None      # device token row is stale (rebuilt lazily)
        if not final and self._tokens.shape[1] <= self.lookahead:
            return None
        if self.window is None:
            return self._feed_exact_dispatch(final)
        return self._feed_windowed(final)     # already-host audio

    def feed_fetch(self, handle) -> np.ndarray:
        """Blocking half of feed(): fetch the dispatched audio."""
        if handle is None:
            return np.zeros((0,), np.float32)
        if isinstance(handle, np.ndarray):    # windowed mode: already host
            return handle
        dev, s0 = handle
        new = np.asarray(dev)
        if s0 < len(self._fade) and len(new):
            f = self._fade[s0: s0 + len(new)]
            new = new.copy()
            new[: len(f)] *= f
        return new

    def feed_from_decode(self, gen_tokens, n_raw, *, vocab: int,
                         final: bool = False, append_sil: int = 0,
                         extra_fetch=()):
        """Feed straight from the decode program's DEVICE output — the
        vocode dispatches without any host sync after the decode dispatch,
        and audio + counts come back in ONE device_get. Works for EVERY
        chunk of a stream (the packed token row stays resident on device),
        so each chunk costs one round-trip instead of two (~29 ms saved per
        chunk over the relay; on the first chunk that is the TTFA path).

        gen_tokens/n_raw: device arrays from chunked decode (gen_tokens'
        static length is the chunk's token-count upper bound — it picks the
        buckets); append_sil: silence tokens appended after the chunk
        (final feeds, ref: tts_turbo.py:310); extra_fetch: device scalars to
        piggyback on the one device_get (e.g. the raw count and done flag
        the caller's loop needs). Returns (new_audio (T,) np, n_valid int,
        extras tuple). Exact mode only; tokens >= vocab are dropped on
        device (same semantics as the host path's `toks[toks < vocab]`).
        Interleaves freely with host feed()s: the device row is rebuilt
        from the accumulated tokens when stale.
        """
        assert self.window is None, "device handoff is exact-mode only"
        if self._cache_dev is None:
            self._cache_dev = self.engine.new_stream_cache()
        if self._row_dev is None:
            if self._tokens.shape[1] == 0:
                self._row_dev = self.engine.new_stream_row(self.ref)
            else:                      # host feed()s happened: rebuild
                P = int(self.ref.prompt_token_len[0])
                cap = self.engine.STREAM_ROW_CAP + 1
                row = np.zeros((1, cap), np.int32)
                row[0, :P] = self.ref.prompt_token[0, :P]
                row[0, P: P + self._tokens.shape[1]] = self._tokens[0]
                self._row_dev = jnp.asarray(row)
            self._n_acc = self._tokens.shape[1]
        wav_tail, row2, cache2, n_new, n_acc2, chunk_row = \
            self.engine.fused_stream_append(
                self._row_dev, self._n_acc, gen_tokens, n_raw, self.ref,
                self._k_flow, self._noise, self._k_hift, self._cache_dev,
                self._src_cache_len, np.zeros((1, 9), np.float32),
                self._emitted_samples, lookahead=self.lookahead, vocab=vocab,
                final=final, append_sil=append_sil)
        self._row_dev, self._cache_dev = row2, cache2
        # ONE fetch: audio tail + counts + surviving tokens (+ extras)
        fetched = jax.device_get((wav_tail, n_new, n_acc2, chunk_row)
                                 + tuple(extra_fetch))
        wav_h, n_new_h, n_acc2_h, chunk_h = fetched[:4]
        n_new_h, n_acc2_h = int(n_new_h), int(n_acc2_h)
        toks = np.asarray(chunk_h[0, :n_new_h], np.int32)
        if append_sil:
            toks = np.concatenate([toks, np.full(append_sil, SIL_TOKEN,
                                                 np.int32)])
        self._tokens = np.concatenate([self._tokens, toks[None]], axis=1)
        self._n_acc = n_acc2_h
        vl = n_acc2_h if final else max(0, n_acc2_h - self.lookahead)
        gen_frames = vl * TOKEN_MEL_RATIO
        s0 = self._emitted_samples
        new = np.asarray(wav_h[0, : max(0, gen_frames * 480 - s0)])
        if s0 < len(self._fade) and len(new):
            f = self._fade[s0: s0 + len(new)]
            new = new.copy()
            new[: len(f)] *= f
        self._src_cache_len = gen_frames * 480
        self._emitted_samples = gen_frames * 480
        return new, n_new_h, tuple(fetched[4:])

    # ------------------------------------------------------------------
    def _feed_exact_dispatch(self, final: bool):
        """One fused device program per feed (flow→trim→HiFT, source cache
        resident on device); returns (device wav-tail slice, fade offset) —
        only the new waveform tail is ever fetched (feed_fetch)."""
        if self._cache_dev is None:
            self._cache_dev = self.engine.new_stream_cache()
        n_tok = self._tokens.shape[1]
        vocode_tokens = n_tok if final else n_tok - self.lookahead
        gen_frames = vocode_tokens * TOKEN_MEL_RATIO  # lookahead trim
        wav, self._cache_dev, _ = self.engine.fused_stream_step(
            self._tokens, self.ref, self._k_flow, self._noise, self._k_hift,
            self._cache_dev, self._src_cache_len,
            np.zeros((1, 9), np.float32), gen_frames)
        self._src_cache_len = gen_frames * 480
        s0 = self._emitted_samples
        self._emitted_samples = gen_frames * 480
        return wav[0, s0: gen_frames * 480], s0   # device-sliced

    # ------------------------------------------------------------------
    def _feed_windowed(self, final: bool) -> np.ndarray:
        """May run several window passes when a single feed delivers more
        tokens than one window can vocode (a feed larger than
        window - lookahead would otherwise leave a gap: the window start may
        not pass tokens that haven't been emitted yet)."""
        chunks = []
        n_tok = self._tokens.shape[1]
        upto_total = n_tok if final else n_tok - self.lookahead
        while upto_total > self._emitted_tokens:
            # window start: never beyond the first un-emitted token
            t0 = max(0, min(self._emitted_tokens, n_tok - self.window))
            win_end = min(n_tok, t0 + self.window)
            # tokens vocodable this pass: the window's lookahead tail is
            # unreliable unless the window reaches the true stream tip
            pass_upto = (min(upto_total, win_end) if win_end == n_tok
                         else min(upto_total, win_end - self.lookahead))
            assert pass_upto > self._emitted_tokens, \
                "window_tokens must exceed lookahead + 1"
            chunks.append(self._vocode_window(t0, win_end, pass_upto))
        return (np.concatenate(chunks) if chunks
                else np.zeros((0,), np.float32))

    def _vocode_window(self, t0: int, win_end: int, upto: int) -> np.ndarray:
        """Flow over tokens [t0, win_end), vocode frames for
        [emitted, upto), maintain the mel tail + harmonic phase carry."""
        P = int(self.ref.prompt_token_len[0])
        win_tokens = self._tokens[:, t0:win_end]
        # aligned noise for [prompt | window]: prompt noise + gen noise at the
        # window's absolute offset, from the one fixed buffer. The gen region
        # indexes the buffer CYCLICALLY — unbounded narration reuses noise
        # after ~164 s, and overlapping windows still see identical noise for
        # a given absolute token (index depends only on the absolute frame),
        # so cross-window continuity is preserved.
        off = 2 * (P + t0)
        M = self._noise.shape[1]
        need = M - 2 * P          # ≥ any window bucket's gen region
        idx = (off + np.arange(need)) % M
        noise = jnp.concatenate(
            [self._noise[:, : 2 * P],
             self._noise[:, idx]], axis=1)
        gen_mels, _ = self.engine.flow_to_mel(
            win_tokens, self.ref, self._k_flow, noise=noise)
        # frames for tokens [emitted, upto) live at window-relative
        # [emitted - t0, upto - t0) tokens
        lo = (self._emitted_tokens - t0) * TOKEN_MEL_RATIO
        hi = (upto - t0) * TOKEN_MEL_RATIO
        new_mels = gen_mels[:, lo:hi]

        C = self._mel_tail.shape[1]
        mel_in = np.concatenate([self._mel_tail, new_mels], axis=1)
        wav, _, f0 = self.engine.mel_to_wav_stream(
            mel_in, self._k_hift,
            phase_carry=(self._phase_carry % 1.0).astype(np.float32))
        new = wav[0, C * 480:]
        if self._emitted_tokens == 0:
            new = new.copy()
            new[: len(self._fade)] *= self._fade

        # advance: carry accumulates Σ f/sr over the samples that scroll out
        # of the next window's left context
        keep = min(self.ctx_mel, mel_in.shape[1])
        scrolled = mel_in.shape[1] - keep            # frames leaving the window
        if scrolled > 0:
            harmonics = np.arange(1, 10, dtype=np.float64)
            f_sum = f0[0, :scrolled].astype(np.float64).sum() * 480
            self._phase_carry = (self._phase_carry
                                 + f_sum * harmonics[None] / 24000.0) % 1.0
        self._mel_tail = mel_in[:, -keep:]
        self._emitted_tokens = upto
        return new


def synthesize_long_form(tts, text: str, max_chars: int = 300,
                         **generate_kwargs) -> Iterator[np.ndarray]:
    """Chunked long-form narration: yields one wav array per text chunk.
    Works with any of the TTS pipelines (shared conds across chunks)."""
    for chunk in chunk_text(text, max_chars=max_chars):
        yield np.asarray(tts.generate(chunk, **generate_kwargs))[0]
