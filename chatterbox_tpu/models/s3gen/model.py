"""S3Gen: speech tokens + reference voice → waveform.

Composition root matching the reference S3Token2Wav (ref:
models/s3gen/s3gen.py:47-362): S3 tokenizer + CAMPPlus x-vector + 24 kHz mel
extractor + flow (conformer encoder + CFM) + HiFT vocoder.

TPU execution model: the host-facing S3GenEngine owns the params and a small
set of bucketed jitted programs —
  * flow_to_mel[token_bucket]: [prompt|gen] tokens → mel buffer
  * mel_to_wav[mel_bucket]: gen mels → waveform
  * embed_ref pieces padded UP to 0.5 s buckets with masked true lengths
    (the masked CAMPPlus makes padding exact — no truncation anywhere).
Dynamic lengths travel as scalars + masks inside each bucket, so steady-state
serving never recompiles.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...nn import core as nn
from ...audio.mels import mel_spectrogram_24k
from ...audio.resample import resample
from .flow import flow_init, flow_inference, FlowDims, TOKEN_MEL_RATIO
from .hift import hift_init, hift_inference, TOTAL_UPSAMPLE
from .campplus import campplus_init, campplus_embed_wav
from ..s3tok.model import (S3TokenizerConfig, SPEECH_VOCAB_SIZE,
                           s3tokenizer_init, s3tokenizer_tokenize)

S3GEN_SR = 24_000
S3_SR = 16_000
SIL_TOKEN = 4299                     # silence speech token (ref: const.py:2)
MEL_FLOOR = float(np.log(1e-5))      # matcha mel log-clamp floor
TOKEN_BUCKETS = (64, 128, 192, 256, 384, 512, 640, 768, 1024, 1280, 1536)
GEN_MEL_BUCKETS = (128, 256, 384, 512, 768, 1024, 1536, 2048, 3072)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def s3gen_init(key, meanflow: bool = False,
               tok_cfg: S3TokenizerConfig = S3TokenizerConfig(),
               dims: FlowDims = FlowDims(), hift_base: int = 512) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "tokenizer": s3tokenizer_init(k1, tok_cfg),
        "speaker_encoder": campplus_init(k2),
        "flow": flow_init(k3, meanflow=meanflow, dims=dims),
        "mel2wav": hift_init(k4, base_channels=hift_base),
    }


class RefDict(NamedTuple):
    """The reference-voice conditioning bundle (ref: s3gen.py:165-171)."""
    prompt_token: np.ndarray      # (1, P) int32
    prompt_token_len: np.ndarray  # (1,)
    prompt_feat: np.ndarray       # (1, T_feat, 80)
    embedding: np.ndarray         # (1, 192)


def trim_fade(sr: int = S3GEN_SR) -> np.ndarray:
    """20 ms silence+fade-in applied to outputs to kill reference spillover
    (ref: s3gen.py:254-258)."""
    n = sr // 50
    fade = np.zeros(2 * n, np.float32)
    fade[n:] = (np.cos(np.linspace(np.pi, 0, n)) + 1) / 2
    return fade



def pack_prompt_gen(token_rows: list, refs: list):
    """Pack B requests' [prompt | gen] token rows into one shared bucket.

    Returns (tokens (B, bucket) int32, Ps, Gs, bucket, mel_bucket) — the
    common front half of every fused-inference entry point (single, batched,
    streaming). Ref concat: flow.py:161."""
    B = len(token_rows)
    Ps = [int(r.prompt_token_len[0]) for r in refs]
    Gs = [len(np.asarray(t).reshape(-1)) for t in token_rows]
    bucket = _bucket(max(p + g for p, g in zip(Ps, Gs)), TOKEN_BUCKETS)
    tokens = np.zeros((B, bucket), np.int32)
    for i, (r, t) in enumerate(zip(refs, token_rows)):
        tokens[i, : Ps[i]] = r.prompt_token[0, : Ps[i]]
        tokens[i, Ps[i]: Ps[i] + Gs[i]] = np.asarray(t).reshape(-1)
    mel_bucket = _bucket(max(Gs) * TOKEN_MEL_RATIO, GEN_MEL_BUCKETS)
    return tokens, Ps, Gs, bucket, mel_bucket


class S3GenEngine:
    """Host-facing runner owning jitted bucketed programs."""

    def __init__(self, params: dict, meanflow: bool = False,
                 tok_cfg: S3TokenizerConfig = S3TokenizerConfig(),
                 n_timesteps: Optional[int] = None,
                 dims: FlowDims = FlowDims(),
                 cfm_dtype=None, enc_dtype=None,
                 batched_bf16_min_b: Optional[int] = 16):
        """cfm_dtype: optional CFM-estimator compute dtype (e.g.
        jnp.bfloat16) — an opt-in speed knob; fp32 (the default) matches the
        reference's estimator_dtype marker (ref: s3gen.py:259). When set,
        the UNet weights are stored in that dtype too (halves their HBM
        reads per solver step).
        enc_dtype: same knob for the upsample-conformer encoder weights
        (the flow front); fp32 default for parity. Measured r3: see
        DESIGN.md before enabling.

        batched_bf16_min_b: batched vocode (inference_batch*) switches the
        flow (encoder + CFM estimator) to bfloat16 when the padded batch
        size reaches this bound — the r4 roofline put fp32 flow at ~5 % of
        MXU peak at B≥16 (activation-bandwidth-bound) and measured bf16 at
        +0 % wall at B=16, +17 % at B=32, max|Δwav| 0.0026 (DESIGN.md r4/r5
        A/B). HiFT and every single-stream/streaming path stay fp32. None
        disables (fp32 at every batch size); ignored when cfm_dtype already
        casts the whole engine."""
        def _cast_sub(tree, dt):
            return jax.tree.map(
                lambda l: (l.astype(dt) if hasattr(l, "dtype")
                           and jnp.issubdtype(l.dtype, jnp.floating) else l),
                tree)
        self._cast_sub = _cast_sub
        self.batched_bf16_min_b = batched_bf16_min_b
        self._params_flow_bf16 = None      # lazily built bf16 flow copy
        if cfm_dtype is not None or enc_dtype is not None:
            params = dict(params)
            params["flow"] = dict(params["flow"])
            if cfm_dtype is not None:
                params["flow"]["decoder"] = _cast_sub(
                    params["flow"]["decoder"], cfm_dtype)
            if enc_dtype is not None:
                params["flow"]["encoder"] = _cast_sub(
                    params["flow"]["encoder"], enc_dtype)
        self.params = params
        self.meanflow = meanflow
        self.cfm_dtype = cfm_dtype
        self.enc_dtype = enc_dtype
        self.tok_cfg = tok_cfg
        self.dims = dims
        self.n_timesteps = n_timesteps or (2 if meanflow else 10)
        est_dtype = cfm_dtype

        @functools.partial(jax.jit,
                           static_argnames=("n_timesteps", "noise_aligned"))
        def _flow(params, token, token_len, prompt_len, prompt_feat, embedding,
                  key, noise, n_timesteps, noise_aligned=False):
            return flow_inference(
                params["flow"], token=token, token_len=token_len,
                prompt_len=prompt_len, prompt_feat=prompt_feat,
                embedding=embedding, key=key, n_timesteps=n_timesteps,
                meanflow=meanflow, noise=noise, noise_aligned=noise_aligned,
                dims=dims, est_dtype=est_dtype)

        @jax.jit
        def _hift(params, mel, key):
            wav, s, _ = hift_inference(params["mel2wav"], key, mel)
            return wav, s

        @jax.jit
        def _hift_stream(params, mel, key, cache_source, cache_len, phase_carry):
            return hift_inference(params["mel2wav"], key, mel,
                                  cache_source=cache_source,
                                  cache_len=cache_len,
                                  phase_carry=phase_carry)

        @functools.partial(jax.jit,
                           static_argnames=("n_timesteps", "mel_bucket",
                                            "pcm16", "est_override"))
        def _fused(params, token, token_len, prompt_len, prompt_feat, embedding,
                   key, n_timesteps, mel_bucket, pcm16, est_override=None):
            """flow → gen-region slice → HiFT → trim-fade in ONE program.

            The axon relay costs ~29 ms per sync and ~30 MB/s per fetch, so
            the staged host path (fetch full mel bucket, repack, re-upload,
            fetch full wav bucket) spends more time on transfers than the
            vocoder spends computing (HiFT is ~21 ms for 10 s of audio).
            This program keeps every intermediate on device and the host
            fetches one device-sliced waveform, optionally as int16 PCM
            (halves fetch bytes; same precision as the WAV file a user
            writes). Ref behavior: s3gen.py:329-362 (tokens→wav) +
            s3gen.py:254-258 (trim fade)."""
            B = token.shape[0]
            T_mel = token.shape[1] * TOKEN_MEL_RATIO
            noise = None
            if nn.is_key_batch(key):      # (B,) per-row keys: per-request noise,
                                   # row output independent of its batchmates
                ks = jax.vmap(lambda kk: jax.random.split(kk, 3))(key)
                k_flow, k_hift = ks[:, 1], ks[:, 2]
                if meanflow:
                    noise = jax.vmap(lambda kk: jax.random.normal(
                        kk, (T_mel, 80)))(ks[:, 0])
            else:
                k_noise, k_flow, k_hift = jax.random.split(key, 3)
                if meanflow:
                    noise = jax.random.normal(k_noise, (B, T_mel, 80))
            mels = flow_inference(
                params["flow"], token=token, token_len=token_len,
                prompt_len=prompt_len, prompt_feat=prompt_feat,
                embedding=embedding, key=k_flow, n_timesteps=n_timesteps,
                meanflow=meanflow, noise=noise, dims=dims,
                est_dtype=(est_override if est_override is not None
                           else est_dtype))
            # per-row gen-region extraction (ref: flow.py:196-197): pad so the
            # dynamic_slice is always in-bounds, then mask the tail to the
            # mel floor so prompt-region garbage can't bleed into the vocoder.
            gen_len = (token_len - prompt_len) * TOKEN_MEL_RATIO      # (B,)
            padded = jnp.pad(mels, ((0, 0), (0, mel_bucket), (0, 0)),
                             constant_values=MEL_FLOOR)
            gen = jax.vmap(lambda m, p: jax.lax.dynamic_slice(
                m, (p * TOKEN_MEL_RATIO, 0), (mel_bucket, 80)))(
                    padded, prompt_len)
            frame = jnp.arange(mel_bucket)[None]
            gen = jnp.where((frame < gen_len[:, None])[..., None], gen, MEL_FLOOR)
            wav, _, _ = hift_inference(params["mel2wav"], k_hift, gen)
            fade = jnp.asarray(trim_fade())
            wav = wav.at[:, : fade.shape[0]].multiply(fade)
            samp = jnp.arange(wav.shape[1])[None]
            wav = jnp.where(samp < gen_len[:, None] * TOTAL_UPSAMPLE, wav, 0.0)
            if pcm16:
                wav = jnp.round(jnp.clip(wav, -1.0, 1.0) * 32767.0
                                ).astype(jnp.int16)
            return wav

        def _stream_body(params, token, token_len, prompt_len, prompt_feat,
                         embedding, k_flow, noise, cache_source, cache_len,
                         phase_carry, k_hift, vocode_len,
                         n_timesteps, mel_bucket):
            """Streaming feed body: flow (aligned fixed noise) → gen-region
            slice → lookahead trim (mask to `vocode_len` frames) → HiFT with
            source-cache continuity. The source cache lives in a
            fixed-capacity device buffer (donated, updated in place) so
            feeds exchange no cache bytes with the host — only the waveform
            tail is fetched. Ref hooks: flow.py:170-171 (lookahead),
            hifigan.py:462-474 (cache_source)."""
            k_flow2, _ = jax.random.split(k_flow)   # match flow_to_mel's split
            mels = flow_inference(
                params["flow"], token=token, token_len=token_len,
                prompt_len=prompt_len, prompt_feat=prompt_feat,
                embedding=embedding, key=k_flow2, n_timesteps=n_timesteps,
                meanflow=meanflow, noise=noise, noise_aligned=True, dims=dims,
                est_dtype=est_dtype)
            padded = jnp.pad(mels, ((0, 0), (0, mel_bucket), (0, 0)),
                             constant_values=MEL_FLOOR)
            gen = jax.vmap(lambda m, p: jax.lax.dynamic_slice(
                m, (p * TOKEN_MEL_RATIO, 0), (mel_bucket, 80)))(
                    padded, prompt_len)
            frame = jnp.arange(mel_bucket)[None]
            gen = jnp.where((frame < vocode_len[:, None])[..., None],
                            gen, MEL_FLOOR)
            n_samp = mel_bucket * TOTAL_UPSAMPLE
            wav, src, f0 = hift_inference(
                params["mel2wav"], k_hift, gen,
                cache_source=jax.lax.dynamic_slice(
                    cache_source, (0, 0, 0), (1, n_samp, 1)),
                cache_len=cache_len, phase_carry=phase_carry)
            new_cache = jax.lax.dynamic_update_slice(cache_source, src,
                                                     (0, 0, 0))
            return wav, new_cache, f0

        @functools.partial(jax.jit,
                           static_argnames=("n_timesteps", "mel_bucket"),
                           donate_argnums=(8,))
        def _fused_stream(params, token, token_len, prompt_len, prompt_feat,
                          embedding, k_flow, noise, cache_source, cache_len,
                          phase_carry, k_hift, vocode_len,
                          n_timesteps, mel_bucket):
            """One streaming feed as ONE program (see _stream_body)."""
            return _stream_body(params, token, token_len, prompt_len,
                                prompt_feat, embedding, k_flow, noise,
                                cache_source, cache_len, phase_carry, k_hift,
                                vocode_len, n_timesteps, mel_bucket)

        @functools.partial(jax.jit,
                           static_argnames=("bucket", "mel_bucket",
                                            "lookahead", "vocab",
                                            "n_timesteps", "final",
                                            "append_sil"),
                           donate_argnums=(1, 10))
        def _fused_stream_append(params, row_cap, n_acc, gen_tokens, n_raw,
                                 prompt_len, prompt_feat, embedding, k_flow,
                                 noise, cache_source, cache_len, phase_carry,
                                 k_hift, s0, bucket, mel_bucket, lookahead,
                                 vocab, n_timesteps, final, append_sil):
            """Streaming feed straight from the decode program's device
            output, with the packed [prompt|gen] row RESIDENT on device
            across feeds (donated, appended in place): chunk filter/append +
            flow + lookahead trim + HiFT in ONE dispatch. Buckets come from
            host-known upper bounds, so nothing about the dispatch depends
            on host-visible decode results — every chunk of a stream costs
            ONE dispatch + ONE fetch instead of a token fetch round-trip
            followed by a vocode round-trip (~29 ms saved per chunk over the
            relay). Only the NEW waveform tail (static chunk-sized slice at
            traced offset s0) is returned, so the fetch stays O(chunk) as
            the stream grows. Returns (wav_tail, row_cap', new_cache,
            n_new (), n_acc' (), chunk_row (1, L)) — audio + counts +
            surviving tokens in one device_get."""
            L = gen_tokens.shape[0]
            idx = jnp.arange(L)
            valid = (idx < n_raw) & (gen_tokens < vocab)
            pos = jnp.cumsum(valid) - 1
            n_new = valid.sum()
            CAP = row_cap.shape[1] - 1            # last slot = dump
            base = prompt_len + n_acc
            tgt = jnp.where(valid, base + pos, CAP)
            row = row_cap[0].at[tgt].set(gen_tokens)
            n_acc2 = n_acc + n_new
            for i in range(append_sil):
                row = row.at[prompt_len + n_acc2 + i].set(SIL_TOKEN)
            n_acc2 = n_acc2 + append_sil
            token_len = prompt_len + n_acc2
            vl_tokens = (n_acc2 if final
                         else jnp.maximum(n_acc2 - lookahead, 0))
            vocode_len = vl_tokens * TOKEN_MEL_RATIO
            wav, new_cache, _f0 = _stream_body(
                params, row[None, :bucket], token_len[None], prompt_len[None],
                prompt_feat, embedding, k_flow, noise, cache_source,
                cache_len, phase_carry, k_hift, vocode_len[None],
                n_timesteps, mel_bucket)
            # a final feed also emits the lookahead tokens held back by the
            # previous feed, so the tail window covers them too; the pad
            # keeps the slice in-bounds for non-final feeds (zeros there are
            # past the emitted region and never read by the host)
            slack = lookahead * TOKEN_MEL_RATIO * TOTAL_UPSAMPLE
            tail = (L + append_sil) * TOKEN_MEL_RATIO * TOTAL_UPSAMPLE + slack
            wav_tail = jax.lax.dynamic_slice(
                jnp.pad(wav, ((0, 0), (0, slack))), (0, s0), (1, tail))
            chunk_row = jax.lax.dynamic_slice(row[None], (0, base), (1, L))
            return wav_tail, row[None], new_cache, n_new, n_acc2, chunk_row

        def _pack_body(gen_tokens, n_raw, prompt_token, prompt_len,
                       bucket, append_sil, cfg_slice, sos, eos, vocab):
            """Device-side token post-processing + [prompt|gen] packing.

            Replaces the host round-trip (fetch tokens → filter → repack →
            re-upload) between the T3 decode program and the fused vocoder
            program with one async dispatch, so the only host-device sync in
            a full generate() is a scalar read of n_tokens for bucket choice.

            gen_tokens: (L,) raw decode output; n_raw: () generated count.
            Filtering matches the reference exactly:
              * cfg_slice: keep tokens strictly between the first SOS and the
                first EOS (ref: models/s3tokenizer/__init__.py:11-30), then
                drop >= vocab (ref: tts.py:260-262); empty → one silence
                token (ref: tts.py:263-264).
              * turbo (cfg_slice=False): drop >= vocab, append `append_sil`
                silence tokens (ref: tts_turbo.py:308-311).
            Returns (row (1, bucket) packed [prompt|gen] tokens,
                     token_len (1,) = prompt_len + n_gen).
            """
            L = gen_tokens.shape[0]
            idx = jnp.arange(L)
            in_range = idx < n_raw
            if cfg_slice:
                is_sos = (gen_tokens == sos) & in_range
                is_eos = (gen_tokens == eos) & in_range
                start = jnp.where(jnp.any(is_sos), jnp.argmax(is_sos) + 1, 0)
                end = jnp.where(jnp.any(is_eos), jnp.argmax(is_eos), n_raw)
                in_range = (idx >= start) & (idx < end)
            valid = in_range & (gen_tokens < vocab)
            pos = jnp.cumsum(valid) - 1              # dense target positions
            n_valid = valid.sum()

            row = jnp.zeros((bucket + 1,), jnp.int32)   # slot `bucket` = dump
            ip = jnp.arange(prompt_token.shape[1])
            row = row.at[jnp.where(ip < prompt_len, ip, bucket)].set(
                prompt_token[0])
            row = row.at[jnp.where(valid, prompt_len + pos, bucket)].set(
                gen_tokens)
            n_gen = n_valid
            for i in range(append_sil):
                row = row.at[prompt_len + n_gen + i].set(SIL_TOKEN)
            n_gen = n_gen + append_sil
            if cfg_slice and append_sil == 0:
                # empty-output fallback: vocode one silence token
                empty = n_gen == 0
                row = row.at[prompt_len].set(
                    jnp.where(empty, SIL_TOKEN, row[prompt_len]))
                n_gen = jnp.maximum(n_gen, 1)
            return row[None, :bucket], (prompt_len + n_gen)[None]

        @functools.partial(jax.jit,
                           static_argnames=("bucket", "append_sil", "cfg_slice",
                                            "sos", "eos", "vocab"))
        def _pack_from_decode(gen_tokens, n_raw, prompt_token, prompt_len,
                              bucket, append_sil, cfg_slice, sos, eos, vocab):
            return _pack_body(gen_tokens, n_raw, prompt_token, prompt_len,
                              bucket, append_sil, cfg_slice, sos, eos, vocab)

        @functools.partial(jax.jit,
                           static_argnames=("bucket", "append_sil", "cfg_slice",
                                            "sos", "eos", "vocab",
                                            "n_timesteps", "mel_bucket",
                                            "pcm16"))
        def _fused_from_decode(gen_tokens, n_raw, prompt_token, prompt_len,
                               params, prompt_feat, embedding, key,
                               bucket, append_sil, cfg_slice, sos, eos, vocab,
                               n_timesteps, mel_bucket, pcm16):
            """Token filter/pack + flow + HiFT in ONE program: over the axon
            relay each dispatch/fetch round-trip costs ~10-30 ms — measured:
            a separate pack dispatch + length sync cost ~38 ms/call, more
            than the host repack it replaced. One dispatch, one fetch."""
            row, token_len = _pack_body(gen_tokens, n_raw, prompt_token,
                                        prompt_len, bucket, append_sil,
                                        cfg_slice, sos, eos, vocab)
            wav = _fused(params, row, token_len, prompt_len[None], prompt_feat,
                         embedding, key, n_timesteps, mel_bucket, pcm16)
            return wav, token_len

        @functools.partial(jax.jit, static_argnames=("max_len",))
        def _tokenize(params, wav, wav_len, max_len):
            return s3tokenizer_tokenize(params["tokenizer"], tok_cfg, wav,
                                        wav_len, max_len=max_len)

        @jax.jit
        def _xvector(params, wav16, n_samples):
            return campplus_embed_wav(params["speaker_encoder"], wav16,
                                      n_samples)

        @jax.jit
        def _mel24(wav24):
            return jnp.swapaxes(mel_spectrogram_24k(wav24), 1, 2)

        self._flow = _flow
        self._fused = _fused
        self._fused_stream = _fused_stream
        self._fused_stream_append = _fused_stream_append
        self._pack_from_decode = _pack_from_decode
        self._fused_from_decode = _fused_from_decode
        # device-resident RefDict cache: voice conditioning is uploaded once
        # per RefDict object, not once per call (prompt_feat alone is
        # ~160 KB — a measurable per-call cost over the ~30 MB/s relay)
        self._ref_cache: dict = {}
        self.pcm16_fetch = True   # fetch waveforms as int16 PCM (half bytes)
        self._hift = _hift
        self._hift_stream = _hift_stream
        self._tokenize = _tokenize
        self._xvector = _xvector
        self._mel24 = _mel24
        self._trim_fade = trim_fade()

    # ------------------------------------------------------------------
    # reference embedding (ref: s3gen.py:118-171)
    # ------------------------------------------------------------------
    def embed_ref(self, ref_wav: np.ndarray, ref_sr: int) -> RefDict:
        ref_wav = np.asarray(ref_wav, np.float32).reshape(-1)
        if len(ref_wav) > 10 * ref_sr:
            print("WARNING: s3gen received ref longer than 10s")

        wav24 = ref_wav if ref_sr == S3GEN_SR else np.asarray(
            resample(jnp.asarray(ref_wav), ref_sr, S3GEN_SR))
        wav16 = ref_wav if ref_sr == S3_SR else np.asarray(
            resample(jnp.asarray(ref_wav), ref_sr, S3_SR))

        # x-vector over the FULL audio, padded UP to a 0.5 s bucket with the
        # true length passed in: compiles stay bounded to ≤20 shapes while
        # the masked CAMPPlus computes exactly the unpadded result (no
        # truncation divergence from the reference anywhere in embed_ref)
        half_sec = S3_SR // 2
        nq = max(half_sec, -(-len(wav16) // half_sec) * half_sec)
        wav16x = np.pad(wav16, (0, nq - len(wav16)))
        embedding = np.asarray(
            self._xvector(self.params, jnp.asarray(wav16x)[None],
                          jnp.asarray([len(wav16)], np.int32)))

        # pad to a whole number of 40 ms tokens (ref: s3tokenizer.py:54-76);
        # the <40 ms zero tail mirrors the reference's mel==2·token repair
        n_tok = int(np.ceil(len(wav16) / (S3_SR / 25)))
        wav16p = np.pad(wav16, (0, int(n_tok * S3_SR / 25) - len(wav16)))
        wav24p = np.pad(wav24, (0, max(0, n_tok * (S3GEN_SR // 25) - len(wav24))))
        ref_mels = np.asarray(
            self._mel24(jnp.asarray(wav24p[: n_tok * (S3GEN_SR // 25)])[None]))
        tokens, token_len = self._tokenize(
            self.params, jnp.asarray(wav16p)[None], jnp.asarray([len(wav16p)]),
            None)
        tokens = np.asarray(tokens)
        token_len = np.asarray(token_len)

        # enforce mel_len == 2 * token_len (ref: s3gen.py:158-163)
        if ref_mels.shape[1] != 2 * tokens.shape[1]:
            n_keep = ref_mels.shape[1] // 2
            tokens = tokens[:, :n_keep]
            token_len = np.minimum(token_len, n_keep)

        return RefDict(prompt_token=tokens, prompt_token_len=token_len,
                       prompt_feat=ref_mels, embedding=embedding)

    # ------------------------------------------------------------------
    # tokens → mel (ref: s3gen.py:300-321 / flow.py:131-198)
    # ------------------------------------------------------------------
    def flow_to_mel(self, speech_tokens: np.ndarray, ref: RefDict, key,
                    n_timesteps: Optional[int] = None,
                    noise: Optional[np.ndarray] = None) -> tuple[np.ndarray, int]:
        """Returns (gen mels (1, T_mel_bucket, 80), gen_mel_len).

        noise: optional caller-supplied CFM noise aligned to the packed
        [prompt|gen] mel buffer (must cover bucket*2 frames). Streaming feeds
        slice one fixed per-utterance buffer so the already-emitted region is
        re-denoised from the SAME realization every feed."""
        speech_tokens = np.asarray(speech_tokens).reshape(1, -1)
        P = int(ref.prompt_token_len[0])
        G = speech_tokens.shape[1]
        total = P + G
        bucket = _bucket(total, TOKEN_BUCKETS)
        token = np.zeros((1, bucket), np.int32)
        token[0, :P] = ref.prompt_token[0, :P]
        token[0, P:total] = speech_tokens[0]

        key, k_noise = jax.random.split(key)
        noise_aligned = noise is not None
        if noise_aligned:
            noise = jnp.asarray(noise[:, : bucket * TOKEN_MEL_RATIO])
            assert noise.shape[1] == bucket * TOKEN_MEL_RATIO, \
                "aligned noise buffer too short for this token bucket"
        elif self.meanflow:
            # meanflow pre-draws the generated-region noise (ref: s3gen.py:313-316)
            noise = jax.random.normal(k_noise, (1, bucket * TOKEN_MEL_RATIO, 80))

        _, prompt_feat, embedding, _ = self.device_ref(ref)
        mels = self._flow(self.params, jnp.asarray(token), jnp.asarray([total]),
                          jnp.asarray([P]), prompt_feat, embedding, key, noise,
                          n_timesteps=n_timesteps or self.n_timesteps,
                          noise_aligned=noise_aligned)
        # slice off the prompt region (ref: flow.py:196-197), host-side
        mels = np.asarray(mels)
        gen_mel_len = G * TOKEN_MEL_RATIO
        gen = mels[:, P * TOKEN_MEL_RATIO: P * TOKEN_MEL_RATIO + gen_mel_len]
        return gen, gen_mel_len

    # ------------------------------------------------------------------
    # mel → wav (ref: s3gen.py:323-327)
    # ------------------------------------------------------------------
    def mel_to_wav(self, gen_mels: np.ndarray, key) -> np.ndarray:
        gen_mels = np.asarray(gen_mels)
        T = gen_mels.shape[1]
        bucket = _bucket(T, GEN_MEL_BUCKETS)
        mel = np.full((1, bucket, 80), MEL_FLOOR, np.float32)
        mel[:, :T] = gen_mels
        wav, _ = self._hift(self.params, jnp.asarray(mel), key)
        return np.array(wav)[:, : T * TOTAL_UPSAMPLE]

    def mel_to_wav_stream(self, gen_mels: np.ndarray, key,
                          cache_source: Optional[np.ndarray] = None,
                          cache_len: int = 0,
                          phase_carry: Optional[np.ndarray] = None,
                          mel_bucket: Optional[int] = None):
        """Streaming vocoder step (ref dormant hook: hifigan.py:462-474).

        cache_source: source buffer from the previous feed — its first
        cache_len samples replace the fresh draw (glitch-free joins).
        phase_carry: (1, 9) accumulated Σf/sr before this window (windowed
        O(chunk) mode). Returns (wav (1, T*480), source (1, bucket*480, 1),
        f0 (1, T))."""
        gen_mels = np.asarray(gen_mels)
        T = gen_mels.shape[1]
        bucket = mel_bucket or _bucket(T, GEN_MEL_BUCKETS)
        mel = np.full((1, bucket, 80), MEL_FLOOR, np.float32)
        mel[:, :T] = gen_mels
        n_samp = bucket * TOTAL_UPSAMPLE
        cache_buf = np.zeros((1, n_samp, 1), np.float32)
        if cache_source is not None:
            n = min(cache_source.shape[1], n_samp, cache_len)
            cache_buf[:, :n] = np.asarray(cache_source)[:, :n]
            cache_len = n
        if phase_carry is None:
            phase_carry = np.zeros((1, 9), np.float32)
        wav, s, f0 = self._hift_stream(
            self.params, jnp.asarray(mel), key, jnp.asarray(cache_buf),
            jnp.asarray(cache_len, jnp.int32),
            jnp.asarray(phase_carry, jnp.float32))
        return (np.array(wav)[:, : T * TOTAL_UPSAMPLE], np.asarray(s),
                np.asarray(f0)[:, :T])

    STREAM_CACHE_FRAMES = GEN_MEL_BUCKETS[-1]   # source-cache capacity

    def new_stream_cache(self):
        """Fixed-capacity device source-cache buffer for fused streaming."""
        return jnp.zeros((1, self.STREAM_CACHE_FRAMES * TOTAL_UPSAMPLE, 1),
                         jnp.float32)

    def fused_stream_step(self, tokens_all: np.ndarray, ref: RefDict,
                          k_flow, noise_dev, k_hift, cache_source_dev,
                          cache_len: int, phase_carry: np.ndarray,
                          vocode_frames: int):
        """One streaming feed, fully on device (see _fused_stream).

        tokens_all: (1, n) ALL tokens of the current window (gen region);
        noise_dev: device noise buffer aligned to [prompt|gen] mel layout;
        cache_source_dev: device buffer from new_stream_cache() (donated —
        pass the returned one next feed); vocode_frames: mel frames to
        vocode after the lookahead trim.
        Returns (wav (1, mel_bucket*480) np, new_cache (device), f0 (1, mel_bucket) np).
        """
        token, (P,), (G,), bucket, mel_bucket = pack_prompt_gen(
            [np.asarray(tokens_all).reshape(-1)], [ref])
        noise = noise_dev[:, : bucket * TOKEN_MEL_RATIO]
        _, prompt_feat, embedding, _ = self.device_ref(ref)
        wav, new_cache, f0 = self._fused_stream(
            self.params, jnp.asarray(token), jnp.asarray([P + G]),
            jnp.asarray([P]), prompt_feat, embedding, k_flow, noise,
            cache_source_dev,
            jnp.asarray(cache_len, jnp.int32),
            jnp.asarray(phase_carry, jnp.float32), k_hift,
            jnp.asarray([vocode_frames], jnp.int32),
            n_timesteps=self.n_timesteps, mel_bucket=mel_bucket)
        return wav, new_cache, f0

    STREAM_ROW_CAP = TOKEN_BUCKETS[-1]      # device token-row capacity

    def new_stream_row(self, ref: RefDict):
        """Device-resident packed [prompt|gen] token row (+1 dump slot) for
        sync-free streaming; the prompt is written up front (dispatch only,
        no sync)."""
        prompt_token, _, _, P = self.device_ref(ref)
        row = jnp.zeros((1, self.STREAM_ROW_CAP + 1), jnp.int32)
        return jax.lax.dynamic_update_slice(row, prompt_token[:, :P], (0, 0))

    def fused_stream_append(self, row_dev, n_acc: int, gen_tokens, n_raw,
                            ref: RefDict, k_flow, noise_dev, k_hift,
                            cache_source_dev, cache_len: int,
                            phase_carry: np.ndarray, emitted_samples: int, *,
                            lookahead: int, vocab: int = SPEECH_VOCAB_SIZE,
                            final: bool = False, append_sil: int = 0):
        """One sync-free streaming feed (see _fused_stream_append).

        gen_tokens: (L,) device int32 straight from a decode program; n_raw:
        its device count scalar; row_dev: the device token row from
        new_stream_row / the previous feed's return (donated); n_acc /
        cache_len / emitted_samples: host ints the caller learned from the
        previous feed's fetch. Buckets come from the upper bound
        n_acc + L (+append_sil), so the dispatch needs NO host sync after
        the decode dispatch. Returns device (wav_tail, row', new_cache,
        n_new, n_acc', chunk_row) for the caller to fetch in ONE device_get.
        """
        _, prompt_feat, embedding, P = self.device_ref(ref)
        L = int(gen_tokens.shape[0])
        ub = n_acc + L + append_sil
        bucket = _bucket(P + ub, TOKEN_BUCKETS)
        assert bucket <= self.STREAM_ROW_CAP, \
            f"stream exceeds row capacity ({P + ub} > {self.STREAM_ROW_CAP})"
        mel_bucket = _bucket(ub * TOKEN_MEL_RATIO, GEN_MEL_BUCKETS)
        noise = noise_dev[:, : bucket * TOKEN_MEL_RATIO]
        return self._fused_stream_append(
            self.params, row_dev, jnp.asarray(n_acc, jnp.int32), gen_tokens,
            jnp.asarray(n_raw, jnp.int32), jnp.asarray(P, jnp.int32),
            prompt_feat, embedding, k_flow, noise, cache_source_dev,
            jnp.asarray(cache_len, jnp.int32),
            jnp.asarray(phase_carry, jnp.float32), k_hift,
            jnp.asarray(emitted_samples, jnp.int32), bucket=bucket,
            mel_bucket=mel_bucket, lookahead=lookahead, vocab=vocab,
            n_timesteps=self.n_timesteps, final=final, append_sil=append_sil)

    # ------------------------------------------------------------------
    # device-resident reference conditioning
    # ------------------------------------------------------------------
    _REF_CACHE_CAP = 16

    def device_ref(self, ref: RefDict):
        """Device copies of a RefDict's arrays, uploaded once per object.

        Returns (prompt_token (1,P) dev, prompt_feat (1,T,80) dev,
        embedding (1,192) dev, P int). The cache holds the RefDict itself so
        an id() can't be reused while its entry is live (FIFO, cap 16)."""
        entry = self._ref_cache.get(id(ref))
        if entry is None or entry[0] is not ref:
            dev = (jnp.asarray(ref.prompt_token),
                   jnp.asarray(ref.prompt_feat),
                   jnp.asarray(ref.embedding),
                   int(ref.prompt_token_len[0]))
            if len(self._ref_cache) >= self._REF_CACHE_CAP:
                self._ref_cache.pop(next(iter(self._ref_cache)))
            self._ref_cache[id(ref)] = entry = (ref, dev)
        return entry[1]

    # ------------------------------------------------------------------
    # decode → vocoder handoff, fully on device
    # ------------------------------------------------------------------
    def inference_from_decode(self, gen_tokens, n_tokens, ref: RefDict,
                              key, *, n_timesteps: Optional[int] = None,
                              cfg_slice: bool = False, append_sil: int = 0,
                              sos: int = 6561, eos: int = 6562,
                              vocab: int = SPEECH_VOCAB_SIZE,
                              budget: Optional[int] = None):
        """Vocode a T3 decode result without the tokens ever visiting the host.

        gen_tokens: (L,) device int32 straight from the decode program;
        n_tokens: generated count — a host int (the caller's one scalar
        sync, used only to pick buckets) OR, with `budget`, the decode
        program's device scalar (no sync). Token filtering/packing runs on
        device (_pack_from_decode), the fused flow→HiFT program consumes the
        packed row, and the host fetches one device-sliced waveform. Returns
        (wav (1, T) float32 np, n_gen int) — n_gen = vocoded token count
        after filtering (callers needing the reference's per-token trims use
        it, e.g. mtl_tts.py:348-352).

        budget: token-count upper bound (the decode call's max_new_tokens).
        When given, buckets come from the budget instead of n_tokens, so the
        pipeline runs with NO host sync between the decode and vocode
        dispatches — over the axon relay that sync costs a ~29 ms round-trip
        per generate(). The vocoder then always runs at the budget bucket:
        a win whenever its worst-case overshoot (vocoding budget−n masked
        frames, ≈21 ms per 10 s-of-audio bucket) is smaller than the saved
        round-trip — i.e. for SHORT budgets (benchmark/narration-chunk
        workloads). Callers with long budgets and early EOS should keep the
        synced path.
        """
        prompt_token, prompt_feat, embedding, P = self.device_ref(ref)
        n_known = budget if budget is not None else int(n_tokens)
        n_upper = int(n_known) + append_sil + (1 if cfg_slice else 0)
        n_upper = max(n_upper, 1)
        bucket = _bucket(P + n_upper, TOKEN_BUCKETS)
        mel_bucket = _bucket(n_upper * TOKEN_MEL_RATIO, GEN_MEL_BUCKETS)
        gen_tokens = jnp.asarray(gen_tokens).reshape(-1).astype(jnp.int32)
        wav, token_len = self._fused_from_decode(
            gen_tokens, jnp.asarray(n_tokens, jnp.int32), prompt_token,
            jnp.asarray(P, jnp.int32), self.params, prompt_feat, embedding,
            key, bucket=bucket, append_sil=append_sil, cfg_slice=cfg_slice,
            sos=sos, eos=eos, vocab=vocab,
            n_timesteps=n_timesteps or self.n_timesteps,
            mel_bucket=mel_bucket, pcm16=self.pcm16_fetch)
        # ONE fetch of the full mel-bucket buffer + the real token count;
        # host trims the (zero-masked) tail. Fetching the whole buffer beats
        # device-slicing to n_upper: the slice is an extra dispatch while the
        # bucket overfetch is tiny (buckets are ≤1.5× the content, int16)
        out, tl = jax.device_get((wav, token_len))
        n_gen = int(tl[0]) - P
        out = out[:, : n_gen * TOKEN_MEL_RATIO * TOTAL_UPSAMPLE]
        if self.pcm16_fetch:
            out = out.astype(np.float32) / 32767.0
        return out, n_gen

    # ------------------------------------------------------------------
    # full inference (ref: s3gen.py:329-362)
    # ------------------------------------------------------------------
    def inference(self, speech_tokens: np.ndarray, ref: RefDict, key,
                  n_timesteps: Optional[int] = None) -> np.ndarray:
        """Single fused program (flow→slice→HiFT→fade), one device sync."""
        token, (P,), (G,), _, mel_bucket = pack_prompt_gen(
            [np.asarray(speech_tokens).reshape(-1)], [ref])
        _, prompt_feat, embedding, _ = self.device_ref(ref)
        wav = self._fused(
            self.params, jnp.asarray(token), jnp.asarray([P + G]),
            jnp.asarray([P]), prompt_feat, embedding, key,
            n_timesteps=n_timesteps or self.n_timesteps,
            mel_bucket=mel_bucket, pcm16=self.pcm16_fetch)
        out = np.asarray(wav[:, : G * TOKEN_MEL_RATIO * TOTAL_UPSAMPLE])
        if self.pcm16_fetch:
            out = out.astype(np.float32) / 32767.0
        return out

    # ------------------------------------------------------------------
    # batched inference (serving: one flow + one vocoder call for B requests)
    # ------------------------------------------------------------------
    def inference_batch(self, token_rows: list, refs: list, key,
                        n_timesteps: Optional[int] = None) -> list:
        """B requests (possibly different voices) vocoded together.

        token_rows: list of (G_i,) int arrays; refs: list of RefDict.
        Returns a list of (T_i,) waveforms. All rows share one bucketed flow
        call (per-row prompt/gen lengths masked) and one HiFT call.
        """
        return self.inference_batch_fetch(
            self.inference_batch_dispatch(token_rows, refs, key, n_timesteps))

    def _bf16_flow_params(self) -> dict:
        """Params with the flow encoder+decoder cast to bf16 (built once;
        other subtrees shared by reference). Used by the batched vocode at
        B≥batched_bf16_min_b — halves the flow's activation/weight HBM
        traffic, which the r4 roofline showed is the batched knee."""
        if self._params_flow_bf16 is None:
            p = dict(self.params)
            p["flow"] = dict(p["flow"])
            p["flow"]["decoder"] = self._cast_sub(p["flow"]["decoder"],
                                                  jnp.bfloat16)
            p["flow"]["encoder"] = self._cast_sub(p["flow"]["encoder"],
                                                  jnp.bfloat16)
            self._params_flow_bf16 = p
        return self._params_flow_bf16

    def inference_batch_dispatch(self, token_rows: list, refs: list, key,
                                 n_timesteps: Optional[int] = None):
        """Async half of inference_batch: enqueues the fused program and
        returns a handle (device wavs + row lengths) WITHOUT syncing. A
        serving loop can dispatch the next batch's decode before fetching —
        the ~MBs waveform transfer then overlaps device compute.

        key: one key (batch-shaped draws) or a stacked (B,) key array —
        per-row noise, so each row's audio is reproducible from its own key
        regardless of batch composition.

        Shapes are bucketed on EVERY free axis — tokens/mels (doubling
        buckets), batch (next power of two, last row replicated) and
        prompt-feat length — so a serving loop retiring a different number
        of rows each round reuses one compiled program instead of paying a
        fresh XLA compile per batch composition. Padded rows are masked
        rubbish; the handle remembers the real row count."""
        B = len(token_rows)
        assert B == len(refs) and B >= 1
        Bp = 1
        while Bp < B:
            Bp *= 2
        if Bp > B:                     # replicate the last row into the pad
            token_rows = list(token_rows) + [token_rows[-1]] * (Bp - B)
            refs = list(refs) + [refs[-1]] * (Bp - B)
        tokens, Ps, Gs, _, mel_bucket = pack_prompt_gen(token_rows, refs)
        feat_T = _bucket(max(r.prompt_feat.shape[1] for r in refs),
                         GEN_MEL_BUCKETS)
        feats = np.zeros((Bp, feat_T, 80), np.float32)
        for i, r in enumerate(refs):
            feats[i, : r.prompt_feat.shape[1]] = r.prompt_feat[0]
        embs = np.concatenate([r.embedding for r in refs], axis=0)
        if key.ndim >= 1 and key.shape[0] == B and Bp > B:
            key = jnp.concatenate([key, jnp.repeat(key[-1:], Bp - B, axis=0)])

        # default bf16 flow at large batch (r4 roofline: fp32 flow is ~5 %
        # of MXU peak there; measured +17 % aggregate at B=32, wav delta
        # ≤3e-3). Single-stream (B<min_b) and explicit-cfm_dtype engines
        # keep their configured dtype.
        use_bf16 = (self.batched_bf16_min_b is not None
                    and Bp >= self.batched_bf16_min_b
                    and self.cfm_dtype is None and self.enc_dtype is None)
        wavs = self._fused(
            self._bf16_flow_params() if use_bf16 else self.params,
            jnp.asarray(tokens),
            jnp.asarray([p + g for p, g in zip(Ps, Gs)]),
            jnp.asarray(Ps), jnp.asarray(feats), jnp.asarray(embs), key,
            n_timesteps=n_timesteps or self.n_timesteps,
            mel_bucket=mel_bucket, pcm16=self.pcm16_fetch,
            est_override=jnp.bfloat16 if use_bf16 else None)
        if Bp > B:
            wavs = wavs[:B]       # device-side slice: don't fetch pad rows
        return (wavs, Gs[:B])

    def inference_batch_fetch(self, handle) -> list:
        """Sync half of inference_batch: fetches and unpacks the waveforms."""
        wavs_dev, Gs = handle
        wavs = np.asarray(wavs_dev)
        if self.pcm16_fetch:
            wavs = wavs.astype(np.float32) / 32767.0
        return [wavs[i, : Gs[i] * TOKEN_MEL_RATIO * TOTAL_UPSAMPLE]
                for i in range(len(Gs))]

    def warmup_grid(self, ref: RefDict, *, max_gen: int, min_gen: int = 1,
                    batch_sizes=(1, 2, 4, 8)) -> int:
        """Compile the batched fused-inference program grid serving can hit.

        `inference_batch_dispatch` buckets every free axis, so for voices
        with `ref`'s prompt/feat lengths and generations in
        [min_gen, max_gen] the reachable programs are exactly
        {pow-2 batch sizes} × {(token-bucket, mel-bucket) combos along the
        generation-length axis}. A serving loop retiring variable row counts
        each round then never compiles mid-traffic; with the persistent
        compile cache the cost is one-time per image. Returns the number of
        programs touched. Synthetic token content (token 0) — outputs are
        discarded."""
        P = int(np.asarray(ref.prompt_token_len).reshape(-1)[0])
        combos: dict = {}
        for g in range(max(1, min_gen), max_gen + 1):
            key = (_bucket(P + g, TOKEN_BUCKETS),
                   _bucket(TOKEN_MEL_RATIO * g, GEN_MEL_BUCKETS))
            combos[key] = g            # ascending g: max of each combo wins
        n = 0
        for B in batch_sizes:
            keys = jnp.stack([jax.random.key(i) for i in range(B)])
            for g in sorted(combos.values()):
                self.inference_batch([np.zeros((g,), np.int32)] * B,
                                     [ref] * B, keys)
                n += 1
        return n

    # ------------------------------------------------------------------
    # wav → tokens (for VC; ref: vc.py:94-97)
    # ------------------------------------------------------------------
    def tokenize(self, wav_16k: np.ndarray, max_len: Optional[int] = None):
        wav_16k = np.asarray(wav_16k, np.float32).reshape(-1)
        n_tok = int(np.ceil(len(wav_16k) / (S3_SR / 25)))
        target = int(n_tok * S3_SR / 25)
        wavp = np.pad(wav_16k, (0, target - len(wav_16k)))
        tokens, token_len = self._tokenize(self.params, jnp.asarray(wavp)[None],
                                           jnp.asarray([len(wavp)]), max_len)
        n = int(token_len[0])
        return np.asarray(tokens)[:, :n], np.asarray(token_len)
