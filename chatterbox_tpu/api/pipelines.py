"""Public pipeline API: ChatterboxTTS / ChatterboxTurboTTS /
ChatterboxMultilingualTTS / ChatterboxVC.

Drop-in behavioral equivalents of the reference pipelines
(ref: tts.py, tts_turbo.py, mtl_tts.py, vc.py) over the TPU engines:
  * T3 sampling = one jitted on-device while_loop (sampling/decode.py)
  * S3Gen = bucketed jitted flow + vocoder programs (models/s3gen/model.py)
  * host side keeps only tokenization, file IO, watermarking, and length
    bookkeeping.

Weights load from the reference's checkpoint files through convert/ (torch
safetensors → JAX pytrees). `random_init` constructors exist for
benchmarking/testing without checkpoints.
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.t3.config import T3Config
from ..models.t3 import model as t3m
from ..models.s3gen.model import S3GenEngine, s3gen_init, RefDict, S3GEN_SR, S3_SR
from ..models.s3gen.flow import FlowDims
from ..models.s3tok.model import S3TokenizerConfig, SPEECH_VOCAB_SIZE
from ..models.ve import model as ve
from ..sampling.decode import t3_generate, text_bucket
from ..ops.sampling import SamplerParams
from ..text.tokenizer import punc_norm
from ..utils.watermark import Watermarker
from ..utils.loudness import norm_loudness
from ..utils.audio_io import load_audio
from ..audio.resample import resample as _resample

logger = logging.getLogger(__name__)

S3GEN_SIL = 4299   # ref: models/s3gen/const.py:2

# Supported languages for the multilingual model (ref: mtl_tts.py:31-55)
SUPPORTED_LANGUAGES = {
    "ar": "Arabic", "da": "Danish", "de": "German", "el": "Greek",
    "en": "English", "es": "Spanish", "fi": "Finnish", "fr": "French",
    "he": "Hebrew", "hi": "Hindi", "it": "Italian", "ja": "Japanese",
    "ko": "Korean", "ms": "Malay", "nl": "Dutch", "no": "Norwegian",
    "pl": "Polish", "pt": "Portuguese", "ru": "Russian", "sv": "Swedish",
    "sw": "Swahili", "tr": "Turkish", "zh": "Chinese",
}

MULTILINGUAL_T3_MODELS = {
    "v2": "t3_mtl23ls_v2.safetensors",
    "t3_mtl23ls_v2": "t3_mtl23ls_v2.safetensors",
    "v3": "t3_mtl23ls_v3.safetensors",
    "t3_mtl23ls_v3": "t3_mtl23ls_v3.safetensors",
}


@dataclasses.dataclass
class T3CondHost:
    """Host-side T3 conditioning (mirrors the reference T3Cond dataclass,
    ref: models/t3/modules/cond_enc.py:11-38)."""
    speaker_emb: np.ndarray
    cond_prompt_speech_tokens: Optional[np.ndarray] = None
    emotion_adv: float = 0.5

    def as_arrays(self) -> t3m.T3CondArrays:
        return t3m.T3CondArrays(
            speaker_emb=jnp.asarray(self.speaker_emb),
            cond_prompt_speech_tokens=(None if self.cond_prompt_speech_tokens is None
                                       else jnp.asarray(self.cond_prompt_speech_tokens)),
            emotion_adv=jnp.full((1, 1, 1), self.emotion_adv),
        )


@dataclasses.dataclass
class Conditionals:
    """(T3 conditioning, S3Gen ref_dict) bundle (ref: tts.py:64-103)."""
    t3: T3CondHost
    gen: RefDict

    def save(self, fpath):
        """Native .npz save, or reference-compatible .pt export when the
        path ends in .pt (round-trips with the reference Conditionals.save /
        T3Cond layout — ref: tts.py:91-103, cond_enc.py:11-38)."""
        if str(fpath).endswith(".pt"):
            import torch
            t = lambda x: torch.from_numpy(np.asarray(x))
            tok = self.t3.cond_prompt_speech_tokens
            arg_dict = dict(
                t3={
                    "speaker_emb": t(self.t3.speaker_emb).float(),
                    "clap_emb": None,
                    "cond_prompt_speech_tokens": (None if tok is None
                                                  else t(tok).long()),
                    "cond_prompt_speech_emb": None,
                    "emotion_adv": torch.full((1, 1, 1),
                                              float(self.t3.emotion_adv)),
                },
                gen={
                    "prompt_token": t(self.gen.prompt_token).long(),
                    "prompt_token_len": t(self.gen.prompt_token_len).long(),
                    "prompt_feat": t(self.gen.prompt_feat).float(),
                    "prompt_feat_len": None,
                    "embedding": t(self.gen.embedding).float(),
                },
            )
            torch.save(arg_dict, fpath)
            return
        tok = self.t3.cond_prompt_speech_tokens
        np.savez(fpath,
                 speaker_emb=self.t3.speaker_emb,
                 cond_prompt_speech_tokens=(np.zeros((1, 0), np.int32)
                                            if tok is None else tok),
                 emotion_adv=np.float32(self.t3.emotion_adv),
                 prompt_token=self.gen.prompt_token,
                 prompt_token_len=self.gen.prompt_token_len,
                 prompt_feat=self.gen.prompt_feat,
                 embedding=self.gen.embedding)

    @classmethod
    def load(cls, fpath):
        fpath = str(fpath)
        if fpath.endswith(".pt"):
            from ..convert.weights import load_conds_pt
            return load_conds_pt(fpath)
        z = np.load(fpath)
        tok = z["cond_prompt_speech_tokens"]
        return cls(
            T3CondHost(z["speaker_emb"], None if tok.size == 0 else tok,
                       float(z["emotion_adv"])),
            RefDict(z["prompt_token"], z["prompt_token_len"], z["prompt_feat"],
                    z["embedding"]),
        )


def drop_invalid_tokens_sliced(tokens: np.ndarray, sos: int = 6561,
                               eos: int = 6562) -> np.ndarray:
    """The s3tokenizer-package variant: slice between SOS and EOS
    (ref: models/s3tokenizer/__init__.py:11-30)."""
    tokens = np.asarray(tokens).reshape(-1)
    sos_idx = np.nonzero(tokens == sos)[0]
    start = int(sos_idx[0]) + 1 if len(sos_idx) else 0
    eos_idx = np.nonzero(tokens == eos)[0]
    end = int(eos_idx[0]) if len(eos_idx) else len(tokens)
    return tokens[start:end]


def _frame_text_tokens(ids: np.ndarray, hp: T3Config) -> tuple[np.ndarray, int]:
    """SOT/EOT framing + bucketing (ref: tts.py:240-243)."""
    ids = np.asarray(ids).reshape(-1)
    framed = np.concatenate([[hp.start_text_token], ids, [hp.stop_text_token]])
    n = len(framed)
    bucket = text_bucket(n)
    out = np.zeros(bucket, np.int32)
    out[:n] = framed
    return out[None], n


class _TTSBase:
    """Shared machinery for the three TTS pipelines."""

    def __init__(self, t3_params, hp: T3Config, s3gen: S3GenEngine,
                 ve_params, tokenizer, conds: Optional[Conditionals],
                 seed: int = 0):
        self.sr = S3GEN_SR
        self.t3_params = t3_params
        self.hp = hp
        self.s3gen = s3gen
        self.ve_params = ve_params
        self.tokenizer = tokenizer
        self.conds = conds
        self.watermarker = Watermarker()
        self._key = jax.random.key(seed)

    # --- RNG ------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def set_seed(self, seed: int):
        self._key = jax.random.key(seed)

    # --- conditioning ----------------------------------------------------
    ENC_COND_SEC = 6          # ref: tts.py:107 (6 s); Turbo overrides to 15
    DEC_COND_SEC = 10         # ref: tts.py:108

    def prepare_conditionals(self, wav_fpath, exaggeration: float = 0.5):
        """(ref: tts.py:182-206)"""
        ref_24k = load_audio(wav_fpath, S3GEN_SR)
        self._prepare_from_wav(ref_24k, exaggeration)

    def _prepare_from_wav(self, ref_24k: np.ndarray, exaggeration: float):
        ref_16k = np.asarray(_resample(jnp.asarray(ref_24k), S3GEN_SR, S3_SR))
        gen_ref = self.s3gen.embed_ref(ref_24k[: self.DEC_COND_SEC * S3GEN_SR], S3GEN_SR)

        t3_tokens = None
        if self.hp.speech_cond_prompt_len:
            plen = self.hp.speech_cond_prompt_len
            t3_tokens, _ = self.s3gen.tokenize(
                ref_16k[: self.ENC_COND_SEC * S3_SR], max_len=plen)
            # pad/trim to the static conditioning length
            padded = np.zeros((1, plen), np.int32)
            n = min(t3_tokens.shape[1], plen)
            padded[0, :n] = t3_tokens[0, :n]
            t3_tokens = padded

        ve_embed = ve.embeds_from_wavs(self.ve_params, [ref_16k], sample_rate=S3_SR)
        ve_embed = ve_embed.mean(axis=0, keepdims=True)

        self.conds = Conditionals(
            T3CondHost(ve_embed, t3_tokens, exaggeration), gen_ref)

    # --- common generation tail -------------------------------------------
    def _tokens_to_wav(self, speech_tokens: np.ndarray,
                       n_timesteps: Optional[int] = None) -> np.ndarray:
        wav = self.s3gen.inference(speech_tokens, self.conds.gen,
                                   self._next_key(), n_timesteps=n_timesteps)
        wav = wav[0]
        return self.watermarker.apply_watermark(np.asarray(wav), sample_rate=self.sr)

    # budgets at or under this use the sync-free handoff: the vocoder's
    # worst-case overshoot (vocoding budget−n masked frames at the budget
    # bucket, ≈21 ms per 10 s-of-audio bucket on v5e) stays below the ~29 ms
    # relay round-trip the n_tokens sync costs
    ASYNC_VOCODE_MAX_BUDGET = 256

    def _decode_to_wav(self, res, *, cfg_slice: bool, append_sil: int = 0,
                       n_timesteps: Optional[int] = None,
                       budget: Optional[int] = None):
        """Fused decode→vocode handoff: token filtering/packing happens on
        device (models/s3gen/model._pack_from_decode). With a short enough
        token budget the vocode buckets come from the budget and the whole
        decode→vocode→fetch pipeline runs with ZERO mid-pipeline host syncs;
        otherwise the only sync is the n_tokens scalar (bucket choice).
        Behavior identical to the host tail the reference uses
        (tts.py:260-264, tts_turbo.py:308-311). Returns (wav (T,), n_gen)."""
        if budget is not None and budget <= self.ASYNC_VOCODE_MAX_BUDGET:
            n = res.n_tokens                      # device scalar — no sync
            kw = dict(budget=budget)
        else:
            n = int(res.n_tokens)                 # the one host sync
            kw = {}
        wav, n_gen = self.s3gen.inference_from_decode(
            res.tokens, n, self.conds.gen, self._next_key(),
            n_timesteps=n_timesteps, cfg_slice=cfg_slice,
            append_sil=append_sil, sos=self.hp.start_speech_token,
            eos=self.hp.stop_speech_token, **kw)
        wav = self.watermarker.apply_watermark(wav[0], sample_rate=self.sr)
        return wav, n_gen

    def _stream_cfg(self, text_tokens, n_text, sp, *, max_new_tokens,
                    chunk_tokens, top_k=0, trim_tail_samples=0):
        """Shared CFG-family streaming loop (ChatterboxTTS /
        ChatterboxMultilingualTTS generate_stream): prefill + first chunk
        fused into one dispatch, then chunked cfg decode feeding the
        streaming vocoder through the sync-free device handoff.

        Truncation is progressive first-EOS (the decode row stops at its
        first EOS; the device-side `>= vocab` filter drops specials, incl. a
        stray SOS token itself) — identical to the reference's
        slice-at-SOS/EOS tail (ref: models/s3tokenizer/__init__.py:11-30) on
        any stream a real checkpoint produces; a mid-stream SOS (random-
        weight territory) cannot retroactively drop already-streamed audio,
        so those tokens are kept. Empty streams fall back to one silence
        token, matching the non-streamed engine's empty-output fallback
        (models/s3gen/model.py _pack_from_decode).

        trim_tail_samples: samples held back and dropped from the stream's
        END (the MTL pipeline's 40 ms final-token trim, ref:
        mtl_tts.py:348-352); 0 streams everything."""
        from ..sampling.chunked import t3_prefill_decode, t3_decode_chunk
        from ..serve.streaming import StreamingVocoder
        from ..models.s3gen.model import SIL_TOKEN

        state, toks, n_new = t3_prefill_decode(
            self.t3_params, self.hp, self.conds.t3.as_arrays(),
            jnp.asarray(text_tokens), jnp.asarray(n_text), sp,
            self._next_key(), max_new_tokens=max_new_tokens,
            n_steps=chunk_tokens, top_k=top_k, cfg_mode=True)
        voc = StreamingVocoder(self.s3gen, self.conds.gen, self._next_key())
        total = n_valid = 0
        emitted_samples = 0
        holdback = np.zeros((0,), np.float32)   # tail-trim delay buffer
        first = True
        while total < max_new_tokens:
            if first:
                first = False
            else:
                state, toks, n_new = t3_decode_chunk(
                    self.t3_params, self.hp, state, sp, n_steps=chunk_tokens,
                    top_k=top_k, cfg_mode=True)
            # clamp to the remaining budget: a chunk boundary may overshoot
            # max_new_tokens (rounds decode n_steps at a time) and the
            # one-shot path those tokens must byte-match never decodes them
            n_budget = jnp.minimum(n_new, max_new_tokens - total)
            chunk, nv, (n_raw, st_done) = voc.feed_from_decode(
                toks, n_budget, vocab=SPEECH_VOCAB_SIZE,
                extra_fetch=(n_budget, state.done))
            n = int(n_raw)
            n_valid += int(nv)
            done = bool(st_done) or (total + n >= max_new_tokens) or n == 0
            total += n
            if done:
                # no appended silence (the CFG tail vocodes the sliced
                # tokens alone, ref: tts.py:260-264); empty stream → the
                # engine's one-silence-token fallback
                tail_toks = (np.zeros((0,), np.int32) if n_valid
                             else np.full(1, SIL_TOKEN, np.int32))
                tail = voc.feed(tail_toks, final=True)
                chunk = np.concatenate([chunk, tail]) if len(chunk) else tail
            if len(chunk):
                holdback = np.concatenate([holdback, chunk])
            # hold back the tail trim until the stream ends; the non-streamed
            # MTL pipeline keeps max(1, n-1) tokens, so streams of <=1 valid
            # token are not trimmed
            trim = trim_tail_samples if (not done or n_valid >= 2) else 0
            emit_upto = len(holdback) - trim
            if emit_upto > 0:
                out, holdback = holdback[:emit_upto], holdback[emit_upto:]
                yield self.watermarker.apply_watermark(
                    out, sample_rate=self.sr, offset=emitted_samples)
                emitted_samples += len(out)
            if done:
                break


class ChatterboxTTS(_TTSBase):
    """English 520M CFG pipeline (ref: tts.py:106-272)."""

    @classmethod
    def random_init(cls, key=None, hp: Optional[T3Config] = None,
                    flow_dims: FlowDims = FlowDims(),
                    tok_cfg: S3TokenizerConfig = S3TokenizerConfig(),
                    hift_base: int = 512, tokenizer=None):
        key = key if key is not None else jax.random.key(0)
        hp = hp or T3Config.english_only()
        k1, k2, k3 = jax.random.split(key, 3)
        t3_params = t3m.t3_init(k1, hp)
        s3 = S3GenEngine(s3gen_init(k2, tok_cfg=tok_cfg, dims=flow_dims,
                                    hift_base=hift_base),
                         tok_cfg=tok_cfg, dims=flow_dims)
        ve_params = ve.ve_init(k3)
        return cls(t3_params, hp, s3, ve_params, tokenizer, conds=None)

    @classmethod
    def from_local(cls, ckpt_dir, device=None) -> "ChatterboxTTS":
        from ..convert.weights import load_english_tts
        return load_english_tts(cls, Path(ckpt_dir))

    @classmethod
    def from_pretrained(cls, device=None) -> "ChatterboxTTS":
        from ..convert.weights import download_repo
        return cls.from_local(download_repo("ResembleAI/chatterbox",
                                            ["ve.safetensors", "t3_cfg.safetensors",
                                             "s3gen.safetensors", "tokenizer.json",
                                             "conds.pt"]))

    def generate(self, text, repetition_penalty=1.2, min_p=0.05, top_p=1.0,
                 audio_prompt_path=None, exaggeration=0.5, cfg_weight=0.5,
                 temperature=0.8, max_new_tokens=1000, kv_int8=False):
        """(ref: tts.py:208-272)

        kv_int8: opt-in int8 KV cache + pallas streamed-dequant attention
        (see ChatterboxTurboTTS.generate — CFG's batch-2 decode doubles
        cache traffic, so the long-context win is larger here; off until
        validated on real checkpoints)."""
        if audio_prompt_path:
            self.prepare_conditionals(audio_prompt_path, exaggeration=exaggeration)
        else:
            assert self.conds is not None, \
                "Please `prepare_conditionals` first or specify `audio_prompt_path`"
        if exaggeration != self.conds.t3.emotion_adv:
            self.conds.t3.emotion_adv = exaggeration

        text = punc_norm(text)
        ids = self.tokenizer.text_to_tokens(text)
        text_tokens, n_text = _frame_text_tokens(ids, self.hp)

        sp = SamplerParams.make(temperature=temperature, top_p=top_p, min_p=min_p,
                                repetition_penalty=repetition_penalty,
                                cfg_weight=cfg_weight)
        from ..sampling.chunked import (BUCKETED_DECODE_THRESHOLD,
                                        t3_generate_bucketed)
        if cfg_weight > 0 and max_new_tokens >= BUCKETED_DECODE_THRESHOLD:
            # long budgets: geometrically growing KV cache — attention reads
            # O(actual length); token stream identical to one-shot
            res = t3_generate_bucketed(
                self.t3_params, self.hp, self.conds.t3.as_arrays(),
                jnp.asarray(text_tokens), jnp.asarray(n_text), sp,
                self._next_key(), max_new_tokens=max_new_tokens,
                cfg_mode=True, kv_int8=kv_int8, fused_attn=kv_int8)
        else:
            # batch-1 when cfg_weight==0, like the reference (ref: tts.py:237-238)
            res = t3_generate(self.t3_params, self.hp, self.conds.t3.as_arrays(),
                              jnp.asarray(text_tokens), jnp.asarray(n_text), sp,
                              self._next_key(), max_new_tokens=max_new_tokens,
                              cfg_mode=True, cfg_batch2=cfg_weight > 0,
                              kv_int8=kv_int8,
                              fused_attn=(True if kv_int8 else None))
        # device-side tail: slice SOS..EOS, drop >= vocab, empty → silence
        # (ref: tts.py:260-264)
        wav, _ = self._decode_to_wav(res, cfg_slice=True,
                                     budget=max_new_tokens)
        return wav[None]

    def generate_stream(self, text, audio_prompt_path=None, exaggeration=0.5,
                        cfg_weight=0.5, temperature=0.8,
                        repetition_penalty=1.2, min_p=0.05, top_p=1.0,
                        max_new_tokens=1000, chunk_tokens=25):
        """Streaming synthesis for the 520M CFG pipeline: yields wav chunks
        as tokens decode (the reference streams nothing — this extends
        generate()'s semantics with progressive first-EOS truncation, see
        _TTSBase._stream_cfg)."""
        if audio_prompt_path:
            self.prepare_conditionals(audio_prompt_path,
                                      exaggeration=exaggeration)
        else:
            assert self.conds is not None, \
                "Please `prepare_conditionals` first or specify `audio_prompt_path`"
        if exaggeration != self.conds.t3.emotion_adv:
            self.conds.t3.emotion_adv = exaggeration
        text = punc_norm(text)
        ids = self.tokenizer.text_to_tokens(text)
        text_tokens, n_text = _frame_text_tokens(ids, self.hp)
        sp = SamplerParams.make(temperature=temperature, top_p=top_p,
                                min_p=min_p,
                                repetition_penalty=repetition_penalty,
                                cfg_weight=cfg_weight)
        yield from self._stream_cfg(text_tokens, n_text, sp,
                                    max_new_tokens=max_new_tokens,
                                    chunk_tokens=chunk_tokens)


class ChatterboxTurboTTS(_TTSBase):
    """Turbo/Nano GPT-2 pipeline (ref: tts_turbo.py:111-320)."""

    ENC_COND_SEC = 15        # ref: tts_turbo.py:112

    def __init__(self, *args, model_label="Turbo", **kw):
        super().__init__(*args, **kw)
        self.model_label = model_label

    @classmethod
    def random_init(cls, key=None, nano=False,
                    flow_dims: FlowDims = FlowDims(),
                    tok_cfg: S3TokenizerConfig = S3TokenizerConfig(),
                    hift_base: int = 512, tokenizer=None, hp=None):
        key = key if key is not None else jax.random.key(0)
        hp = hp or (T3Config.nano() if nano else T3Config.turbo())
        k1, k2, k3 = jax.random.split(key, 3)
        t3_params = t3m.t3_init(k1, hp)
        s3 = S3GenEngine(s3gen_init(k2, meanflow=True, tok_cfg=tok_cfg,
                                    dims=flow_dims, hift_base=hift_base),
                         meanflow=True, tok_cfg=tok_cfg, dims=flow_dims)
        ve_params = ve.ve_init(k3)
        return cls(t3_params, hp, s3, ve_params, tokenizer, conds=None,
                   model_label="Nano" if nano else "Turbo")

    @classmethod
    def from_local(cls, ckpt_dir, device=None, nano=False) -> "ChatterboxTurboTTS":
        from ..convert.weights import load_turbo_tts
        return load_turbo_tts(cls, Path(ckpt_dir), nano=nano)

    @classmethod
    def from_pretrained(cls, device=None, nano=False) -> "ChatterboxTurboTTS":
        from ..convert.weights import download_repo
        repo = "ResembleAI/chatterbox-nano" if nano else "ResembleAI/chatterbox-turbo"
        return cls.from_local(download_repo(repo, None), nano=nano)

    def norm_loudness(self, wav, sr, target_lufs=-27):
        return norm_loudness(wav, sr, target_lufs)

    def _quantized_self_draft(self):
        """Build (once) the int8-quantized view of this model that serves as
        its own speculative draft (`generate(draft="int8")`): same config,
        same conditionals (delegated), int8 weights. Sampling stays exactly
        the bf16 target's — the draft only PROPOSES."""
        if getattr(self, "_qdraft", None) is None:
            assert "w_q" not in str(
                jax.tree_util.tree_structure(self.t3_params)), \
                "t3 params are already quantized — the int8 self-draft " \
                "needs the float model as the verify target"
            from ..utils.quantize import (best_serving_mode,
                                          quantize_t3_backbone)
            qp = quantize_t3_backbone(
                self.t3_params, mode=best_serving_mode(self.hp.backbone))
            outer = self

            class _QuantView:
                t3_params = qp
                hp = outer.hp

                @property
                def conds(self):
                    return outer.conds

                def prepare_conditionals(self, *a, **kw):
                    pass          # shares the outer model's conditionals

            self._qdraft = _QuantView()
        return self._qdraft

    def prepare_conditionals(self, wav_fpath, exaggeration=0.5, norm_loudness=True):
        """(ref: tts_turbo.py:241-270): >5 s assert + −27 LUFS normalization."""
        ref_24k = load_audio(wav_fpath, S3GEN_SR)
        assert len(ref_24k) / S3GEN_SR > 5.0, "Audio prompt must be longer than 5 seconds!"
        if norm_loudness:
            ref_24k = self.norm_loudness(ref_24k, S3GEN_SR)
        self._prepare_from_wav(ref_24k, exaggeration)

    def generate(self, text, repetition_penalty=1.2, min_p=0.00, top_p=0.95,
                 audio_prompt_path=None, exaggeration=0.0, cfg_weight=0.0,
                 temperature=0.8, top_k=1000, norm_loudness=True,
                 max_new_tokens=1000, kv_int8=False, draft=None, n_draft=4):
        """(ref: tts_turbo.py:272-320)

        kv_int8: opt-in int8 KV cache + pallas streamed-dequant attention
        kernel — measured +20 % decode throughput at the 1000-token budget
        (1214 vs 1015 tok/s one-shot, tools/ab_int8.py); adds ~0.004 mean
        logit error on top of int8 weights. Off until validated on real
        checkpoints (tools/real_weights_check.py).

        draft: speculative decoding — the draft proposes n_draft tokens per
        round, this model verifies them in ONE forward
        (sampling/speculative.py); the output distribution is exactly this
        model's. Either
          * a draft PIPELINE (e.g. a Nano ChatterboxTurboTTS; builds its own
            conditionals from the same prompt) — measured v5e break-even
            acceptance is steep (α≥0.86, tools/perf_spec.py), so this only
            wins if the real Turbo/Nano pair agrees unusually often; or
          * the string "int8": the draft is this model's OWN weights int8-
            quantized (built lazily, cached) — measured α=0.99 on the
            correlated pair, 1067 tok/s at n_draft=8 vs 868 sequential bf16
            (+23 %) while keeping the bf16 sampling distribution EXACTLY.
            The plain int8 engine is still faster (1384 tok/s) at int8
            quality; this is the lossless middle point. Requires unquantized
            (float) t3 params. NOTE: speculative decode runs on the
            full-capacity (non-bucketed) KV cache and ignores kv_int8 —
            combining them warns and drops both knobs."""
        if draft is not None and kv_int8:
            logger.warning("kv_int8 is ignored when draft= is set: "
                           "speculative decode runs on the non-bucketed "
                           "bf16 KV cache")
        if draft == "int8":
            draft = self._quantized_self_draft()
        if audio_prompt_path:
            self.prepare_conditionals(audio_prompt_path, exaggeration=exaggeration,
                                      norm_loudness=norm_loudness)
            if draft is not None:
                draft.prepare_conditionals(audio_prompt_path,
                                           exaggeration=exaggeration,
                                           norm_loudness=norm_loudness)
        else:
            assert self.conds is not None, \
                "Please `prepare_conditionals` first or specify `audio_prompt_path`"
            assert draft is None or draft.conds is not None, \
                "draft pipeline needs conditionals too"
        if cfg_weight > 0.0 or exaggeration > 0.0 or min_p > 0.0:
            logger.warning(f"CFG, min_p and exaggeration are not supported by the "
                           f"{self.model_label} version and will be ignored.")

        text = punc_norm(text, variant="turbo")
        # the reference passes raw GPT-2 BPE ids (no SOT/EOT framing,
        # ref: tts_turbo.py:295-296) — match that
        ids = np.asarray(self.tokenizer.text_to_tokens(text)).reshape(-1)
        bucket = text_bucket(len(ids))
        text_tokens = np.zeros((1, bucket), np.int32)
        text_tokens[0, : len(ids)] = ids

        sp = SamplerParams.make(temperature=temperature, top_p=top_p, min_p=min_p,
                                repetition_penalty=repetition_penalty, cfg_weight=0.0)
        from ..sampling.chunked import (BUCKETED_DECODE_THRESHOLD,
                                        t3_generate_bucketed)
        if draft is not None:
            from ..sampling.speculative import t3_generate_speculative
            res = t3_generate_speculative(
                self.t3_params, draft.t3_params, self.hp, draft.hp,
                self.conds.t3.as_arrays(), draft.conds.t3.as_arrays(),
                jnp.asarray(text_tokens), jnp.asarray(len(ids)), sp,
                self._next_key(), max_new_tokens=max_new_tokens,
                n_draft=n_draft, top_k=top_k)
        elif max_new_tokens >= BUCKETED_DECODE_THRESHOLD:
            # long budgets: bucketed cache growth — attention reads O(actual
            # length), not O(P+max_new); token stream identical to one-shot
            # (+15 % at the reference's default 1000-token cap)
            res = t3_generate_bucketed(
                self.t3_params, self.hp, self.conds.t3.as_arrays(),
                jnp.asarray(text_tokens), jnp.asarray(len(ids)), sp,
                self._next_key(), max_new_tokens=max_new_tokens,
                top_k=top_k, cfg_mode=False,
                kv_int8=kv_int8, fused_attn=kv_int8)
        else:
            res = t3_generate(self.t3_params, self.hp, self.conds.t3.as_arrays(),
                              jnp.asarray(text_tokens), jnp.asarray(len(ids)), sp,
                              self._next_key(), max_new_tokens=max_new_tokens,
                              top_k=top_k, cfg_mode=False,
                              kv_int8=kv_int8,
                              fused_attn=(True if kv_int8 else None))
        # device-side tail: drop >= vocab + 3 silence tokens
        # (ref: tts_turbo.py:308-311)
        wav, _ = self._decode_to_wav(res, cfg_slice=False, append_sil=3,
                                     n_timesteps=2, budget=max_new_tokens)
        return wav[None]

    def generate_stream(self, text, audio_prompt_path=None, temperature=0.8,
                               top_k=1000, top_p=0.95, repetition_penalty=1.2,
                               norm_loudness=True, max_new_tokens=1000,
                               chunk_tokens=25):
        """Streaming synthesis: yields wav chunks as tokens are decoded.

        TTFA path (north star: p50 <200 ms): prefill + first `chunk_tokens`
        decode steps + one short vocode produce the first audio. Uses chunked
        decode (sampling/chunked.py) + the streaming vocoder with the
        reference's dormant finalize/source-cache hooks (serve/streaming.py).
        NOTE: each vocode call re-runs the flow over the accumulated window —
        ideal for sentences; use serve.streaming.synthesize_long_form for
        narration.
        """
        from ..sampling.chunked import t3_prefill_decode, t3_decode_chunk
        from ..serve.streaming import StreamingVocoder

        if audio_prompt_path:
            self.prepare_conditionals(audio_prompt_path, norm_loudness=norm_loudness)
        else:
            assert self.conds is not None

        text = punc_norm(text, variant="turbo")
        ids = np.asarray(self.tokenizer.text_to_tokens(text)).reshape(-1)
        bucket = text_bucket(len(ids))
        text_tokens = np.zeros((1, bucket), np.int32)
        text_tokens[0, : len(ids)] = ids

        sp = SamplerParams.make(temperature=temperature, top_p=top_p, min_p=0.0,
                                repetition_penalty=repetition_penalty, cfg_weight=0.0)
        # prefill + first chunk fused into one dispatch (TTFA critical path)
        state, toks, n_new = t3_prefill_decode(
            self.t3_params, self.hp, self.conds.t3.as_arrays(),
            jnp.asarray(text_tokens), jnp.asarray(len(ids)), sp,
            self._next_key(), max_new_tokens=max_new_tokens,
            n_steps=chunk_tokens, top_k=top_k, cfg_mode=False)
        voc = StreamingVocoder(self.s3gen, self.conds.gen, self._next_key())
        total = 0
        emitted_samples = 0
        first = True
        while total < max_new_tokens:
            if first:
                first = False
            else:
                state, toks, n_new = t3_decode_chunk(
                    self.t3_params, self.hp, state, sp, n_steps=chunk_tokens,
                    top_k=top_k, cfg_mode=False)
            # sync-free feed: the vocode dispatch rides the decode dispatch
            # with no token fetch in between (device-resident token row);
            # audio + counts + done come back in ONE device_get per chunk
            # clamp to the remaining budget (a chunk may overshoot
            # max_new_tokens when it isn't a multiple of chunk_tokens)
            n_budget = jnp.minimum(n_new, max_new_tokens - total)
            chunk, _nv, (n_raw, st_done) = voc.feed_from_decode(
                toks, n_budget, vocab=SPEECH_VOCAB_SIZE,
                extra_fetch=(n_budget, state.done))
            n = int(n_raw)
            done = bool(st_done) or (total + n >= max_new_tokens) or n == 0
            total += n
            if done:
                # final tail: 3 silence tokens (ref: tts_turbo.py:310)
                tail, _, _ = voc.feed_from_decode(
                    jnp.zeros((1,), jnp.int32), jnp.asarray(0, jnp.int32),
                    vocab=SPEECH_VOCAB_SIZE, final=True, append_sil=3)
                chunk = np.concatenate([chunk, tail]) if len(chunk) else tail
            if len(chunk):
                # offset keeps the chunked watermark phase-continuous with a
                # one-shot embed of the concatenated stream
                yield self.watermarker.apply_watermark(
                    chunk, sample_rate=self.sr, offset=emitted_samples)
                emitted_samples += len(chunk)
            if done:
                break





class ChatterboxMultilingualTTS(_TTSBase):
    """23-language pipeline (ref: mtl_tts.py:155-355)."""

    @classmethod
    def get_supported_languages(cls):
        return SUPPORTED_LANGUAGES.copy()

    @classmethod
    def random_init(cls, key=None, flow_dims: FlowDims = FlowDims(),
                    tok_cfg: S3TokenizerConfig = S3TokenizerConfig(),
                    hift_base: int = 512, tokenizer=None, hp=None):
        key = key if key is not None else jax.random.key(0)
        hp = hp or T3Config.multilingual()
        k1, k2, k3 = jax.random.split(key, 3)
        t3_params = t3m.t3_init(k1, hp)
        s3 = S3GenEngine(s3gen_init(k2, tok_cfg=tok_cfg, dims=flow_dims,
                                    hift_base=hift_base),
                         tok_cfg=tok_cfg, dims=flow_dims)
        ve_params = ve.ve_init(k3)
        return cls(t3_params, hp, s3, ve_params, tokenizer, conds=None)

    @classmethod
    def from_local(cls, ckpt_dir, device=None, t3_model: str | None = None):
        from ..convert.weights import load_mtl_tts
        return load_mtl_tts(cls, Path(ckpt_dir), t3_model=t3_model)

    @classmethod
    def from_pretrained(cls, device=None, t3_model: str | None = None):
        from ..convert.weights import download_repo
        return cls.from_local(download_repo("ResembleAI/chatterbox", None),
                              t3_model=t3_model)

    def generate(self, text, language_id, audio_prompt_path=None,
                 exaggeration=0.5, cfg_weight=0.5, temperature=0.8,
                 repetition_penalty=1.2, min_p=0.05, top_p=1.0,
                 max_new_tokens=1000):
        """(ref: mtl_tts.py:280-355)"""
        if language_id and language_id.lower() not in SUPPORTED_LANGUAGES:
            supported = ", ".join(SUPPORTED_LANGUAGES)
            raise ValueError(f"Unsupported language_id '{language_id}'. "
                             f"Supported languages: {supported}")
        if audio_prompt_path:
            self.prepare_conditionals(audio_prompt_path, exaggeration=exaggeration)
        else:
            assert self.conds is not None, \
                "Please `prepare_conditionals` first or specify `audio_prompt_path`"
        if float(exaggeration) != float(self.conds.t3.emotion_adv):
            self.conds.t3.emotion_adv = float(exaggeration)

        text = punc_norm(text, variant="mtl")
        ids = self.tokenizer.text_to_tokens(
            text, language_id=language_id.lower() if language_id else None)
        text_tokens, n_text = _frame_text_tokens(ids, self.hp)

        sp = SamplerParams.make(temperature=temperature, top_p=top_p, min_p=min_p,
                                repetition_penalty=repetition_penalty,
                                cfg_weight=cfg_weight)
        # NOTE: the reference MTL path always duplicates for CFG
        # (ref: mtl_tts.py:317) — keep batch-2 unconditionally here.
        from ..sampling.chunked import (BUCKETED_DECODE_THRESHOLD,
                                        t3_generate_bucketed)
        if max_new_tokens >= BUCKETED_DECODE_THRESHOLD:
            res = t3_generate_bucketed(
                self.t3_params, self.hp, self.conds.t3.as_arrays(),
                jnp.asarray(text_tokens), jnp.asarray(n_text), sp,
                self._next_key(), max_new_tokens=max_new_tokens,
                cfg_mode=True)
        else:
            res = t3_generate(self.t3_params, self.hp, self.conds.t3.as_arrays(),
                              jnp.asarray(text_tokens), jnp.asarray(n_text), sp,
                              self._next_key(), max_new_tokens=max_new_tokens,
                              cfg_mode=True)
        wav, n_gen = self._decode_to_wav(res, cfg_slice=True,
                                         budget=max_new_tokens)
        # drop the final token's ~40 ms (ref: mtl_tts.py:348-352)
        st_len = max(1, n_gen - 1)
        wav = wav[: st_len * (S3GEN_SR // 25)]
        return wav[None]

    def generate_stream(self, text, language_id, audio_prompt_path=None,
                        exaggeration=0.5, cfg_weight=0.5, temperature=0.8,
                        repetition_penalty=1.2, min_p=0.05, top_p=1.0,
                        max_new_tokens=1000, chunk_tokens=25):
        """Streaming synthesis for the multilingual pipeline (progressive
        first-EOS truncation, see _TTSBase._stream_cfg). The 40 ms final-
        token trim (ref: mtl_tts.py:348-352) is applied by holding those
        samples back until the stream ends."""
        if language_id and language_id.lower() not in SUPPORTED_LANGUAGES:
            supported = ", ".join(SUPPORTED_LANGUAGES)
            raise ValueError(f"Unsupported language_id '{language_id}'. "
                             f"Supported languages: {supported}")
        if audio_prompt_path:
            self.prepare_conditionals(audio_prompt_path,
                                      exaggeration=exaggeration)
        else:
            assert self.conds is not None, \
                "Please `prepare_conditionals` first or specify `audio_prompt_path`"
        if float(exaggeration) != float(self.conds.t3.emotion_adv):
            self.conds.t3.emotion_adv = float(exaggeration)
        text = punc_norm(text, variant="mtl")
        ids = self.tokenizer.text_to_tokens(
            text, language_id=language_id.lower() if language_id else None)
        text_tokens, n_text = _frame_text_tokens(ids, self.hp)
        sp = SamplerParams.make(temperature=temperature, top_p=top_p,
                                min_p=min_p,
                                repetition_penalty=repetition_penalty,
                                cfg_weight=cfg_weight)
        yield from self._stream_cfg(text_tokens, n_text, sp,
                                    max_new_tokens=max_new_tokens,
                                    chunk_tokens=chunk_tokens,
                                    trim_tail_samples=S3GEN_SR // 25)


class ChatterboxVC:
    """Voice conversion (ref: vc.py:16-104)."""

    def __init__(self, s3gen: S3GenEngine, ref_dict: Optional[RefDict] = None,
                 seed: int = 0):
        self.sr = S3GEN_SR
        self.s3gen = s3gen
        self.ref_dict = ref_dict
        self.watermarker = Watermarker()
        self._key = jax.random.key(seed)

    @classmethod
    def random_init(cls, key=None, flow_dims: FlowDims = FlowDims(),
                    tok_cfg: S3TokenizerConfig = S3TokenizerConfig(),
                    hift_base: int = 512):
        key = key if key is not None else jax.random.key(0)
        s3 = S3GenEngine(s3gen_init(key, tok_cfg=tok_cfg, dims=flow_dims,
                                    hift_base=hift_base),
                         tok_cfg=tok_cfg, dims=flow_dims)
        return cls(s3)

    @classmethod
    def from_local(cls, ckpt_dir, device=None) -> "ChatterboxVC":
        from ..convert.weights import load_vc
        return load_vc(cls, Path(ckpt_dir))

    @classmethod
    def from_pretrained(cls, device=None) -> "ChatterboxVC":
        from ..convert.weights import download_repo
        return cls.from_local(download_repo("ResembleAI/chatterbox",
                                            ["s3gen.safetensors", "conds.pt"]))

    def set_target_voice(self, wav_fpath):
        ref = load_audio(wav_fpath, S3GEN_SR)
        self.ref_dict = self.s3gen.embed_ref(ref[: 10 * S3GEN_SR], S3GEN_SR)

    def generate(self, audio, target_voice_path=None):
        """(ref: vc.py:83-104)"""
        if target_voice_path:
            self.set_target_voice(target_voice_path)
        else:
            assert self.ref_dict is not None, \
                "Please `prepare_conditionals` first or specify `target_voice_path`"
        if isinstance(audio, (str, Path)):
            audio_16 = load_audio(audio, S3_SR)
        else:
            audio_16 = np.asarray(audio, np.float32).reshape(-1)
        tokens, _ = self.s3gen.tokenize(audio_16)
        self._key, k = jax.random.split(self._key)
        wav = self.s3gen.inference(tokens, self.ref_dict, k)[0]
        wav = self.watermarker.apply_watermark(np.asarray(wav), sample_rate=self.sr)
        return wav[None]
