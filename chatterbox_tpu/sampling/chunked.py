"""Chunked T3 decode: prefill + fixed-size decode chunks with explicit
on-device state.

This is the time-to-first-audio (TTFA) path: instead of decoding all
max_new_tokens in one jitted call (sampling/decode.py), the caller prefills
once and then pulls tokens in chunks (e.g. 13–25 ≈ 0.5–1 s of audio),
starting vocoding as soon as the first chunk lands
(serve/streaming.StreamingVocoder). State (KV cache, sampler history, RNG)
never leaves the device; chunk calls donate it.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.t3 import backbone as bb
from ..models.t3 import model as t3m
from ..models.t3.config import T3Config
from ..ops import sampling as S


class DecodeState(NamedTuple):
    cache: bb.KVCache
    logits: jnp.ndarray        # (B, V) logits at the current position
    seen: jnp.ndarray          # (V,) repetition history
    step: jnp.ndarray          # () tokens generated so far
    done: jnp.ndarray          # () bool
    key: jnp.ndarray
    prefill_len: jnp.ndarray   # () dense prefix length


@functools.partial(jax.jit,
                   static_argnames=("hp", "max_new_tokens", "cfg_mode",
                                    "kv_int8", "tile_align"))
def t3_prefill(params: dict, hp: T3Config, cond: t3m.T3CondArrays,
               text_tokens: jnp.ndarray, text_len: jnp.ndarray, key,
               *, max_new_tokens: int = 1000, cfg_mode: bool = True,
               kv_int8: bool = False, tile_align: bool = False) -> DecodeState:
    """Build the packed prefix, run it through the backbone, return the
    decode state (same packing scheme as sampling/decode.py).

    tile_align: round the cache's time axis up to the pallas attention tile
    (TT) so the streamed decode kernels can engage; they skip DMA past the
    current length, so the extra padding is free on that path."""
    cfg = hp.backbone
    Lc = t3m.cond_len(hp)
    Ltp = text_tokens.shape[1]
    B = 2 if cfg_mode else 1
    # CFG prefix is [cond | text | BOS | BOS] — the reference's shipped loop
    # feeds the BOS embed twice (ref: t3.py:258-268 + t3.py:305-313); Turbo
    # feeds one (see sampling/decode.py for the full note)
    n_bos = 2 if cfg_mode else 1
    P_pad = Lc + Ltp + n_bos
    t_max = P_pad + max_new_tokens
    if tile_align:
        from ..ops.pallas_attention import TT
        t_max = ((t_max + TT - 1) // TT) * TT
    V = hp.speech_tokens_dict_size

    ce = t3m.cond_embeds(params, hp, cond)
    ce = jnp.broadcast_to(ce, (B,) + ce.shape[1:])
    tokens_b = jnp.broadcast_to(text_tokens, (B, Ltp))
    te = jnp.take(params["text_emb"]["w"], tokens_b, axis=0)
    if cfg_mode:
        te = te * jnp.array([1.0, 0.0])[:, None, None]
    if hp.input_pos_emb == "learned":
        te = te + jnp.take(params["text_pos_emb"]["w"], jnp.arange(Ltp), axis=0)
    bos = t3m.speech_embed_token(
        params, hp, jnp.full((B,), hp.start_speech_token, jnp.int32),
        jnp.zeros((), jnp.int32))
    bos = jnp.concatenate([bos] * n_bos, axis=1)
    dt = params["speech_emb"]["w"].dtype
    ce, te, bos = ce.astype(dt), te.astype(dt), bos.astype(dt)
    x = jnp.concatenate([ce, te, jnp.zeros_like(bos)], axis=1)
    x = jax.lax.dynamic_update_slice(x, bos, (0, Lc + text_len, 0))

    prefill_len = Lc + text_len + n_bos
    lens = jnp.full((B,), prefill_len, jnp.int32)
    cache_cls = bb.KVCacheInt8 if kv_int8 else bb.KVCache
    cache = cache_cls.zeros(cfg, B, t_max, dtype=jnp.bfloat16)
    mask = bb.prefill_mask(P_pad, t_max, lens)
    positions = jnp.tile(jnp.arange(P_pad)[None], (B, 1))
    hidden, cache = bb.backbone_apply_unrolled(
        params["backbone"], cfg, x, positions, cache,
        jnp.zeros((), jnp.int32), mask)
    last_h = jnp.take_along_axis(
        hidden, jnp.full((B, 1, 1), prefill_len - 1), axis=1)[:, 0]
    logits0 = t3m.speech_logits(params, last_h).astype(jnp.float32)

    seen0 = (jax.nn.one_hot(hp.start_speech_token, V, dtype=jnp.bool_)
             if cfg_mode else jnp.zeros((V,), jnp.bool_))
    return DecodeState(cache=cache, logits=logits0, seen=seen0,
                       step=jnp.zeros((), jnp.int32),
                       done=jnp.zeros((), jnp.bool_), key=key,
                       prefill_len=jnp.asarray(prefill_len, jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("hp", "n_steps", "top_k", "cfg_mode",
                                    "ignore_eos", "fused_attn"),
                   donate_argnames=("state",))
def t3_decode_chunk(params: dict, hp: T3Config, state: DecodeState,
                    sp: S.SamplerParams,
                    *, n_steps: int, top_k: int = 0, cfg_mode: bool = True,
                    ignore_eos: bool = False, fused_attn: bool = False):
    """Decode up to n_steps tokens. Returns (state, tokens (n_steps,),
    n_new ())."""
    cfg = hp.backbone
    B = 2 if cfg_mode else 1
    V = hp.speech_tokens_dict_size
    t_max = state.cache[0].shape[3]     # first field is (L,B,H,T,D) for
                                        # both KVCache and KVCacheInt8
    start_onehot = jax.nn.one_hot(hp.start_speech_token, V, dtype=jnp.bool_)

    class _C(NamedTuple):
        i: jnp.ndarray
        st: DecodeState
        out: jnp.ndarray
        n_new: jnp.ndarray

    def cond_fn(c):
        return (c.i < n_steps) & ~c.st.done

    def body_fn(c):
        s = c.st
        key, sub = jax.random.split(s.key)
        if cfg_mode:
            logits = S.process_logits_cfg(s.logits[0], s.logits[1], s.seen, sp)
        else:
            pen = s.seen | (start_onehot & (s.step == 0))
            logits = S.process_logits_turbo(s.logits[0], pen, sp, top_k)
        all_filtered = jnp.all(logits <= S.NEG_INF)
        token = S.sample_categorical(sub, logits).astype(jnp.int32)
        token = jnp.where(all_filtered, hp.stop_speech_token, token)

        out = c.out.at[c.i].set(token)
        seen = s.seen.at[token].set(True)
        done = (jnp.zeros((), jnp.bool_) if ignore_eos
                else token == hp.stop_speech_token)
        emb = t3m.speech_embed_token(params, hp,
                                     jnp.full((B,), token, jnp.int32), s.step + 1)
        pos_now = s.prefill_len + s.step
        cur = jnp.full((B,), pos_now, jnp.int32)
        mask = bb.decode_mask(t_max, cur)
        hidden, cache = bb.backbone_apply_unrolled(
            params["backbone"], cfg, emb, cur[:, None], s.cache,
            pos_now, mask, fused_attn=fused_attn)
        logits_new = t3m.speech_logits(params, hidden[:, 0]).astype(jnp.float32)
        st = DecodeState(cache, logits_new, seen, s.step + 1, done, key,
                         s.prefill_len)
        return _C(c.i + 1, st, out, c.n_new + 1)

    init = _C(jnp.zeros((), jnp.int32), state,
              jnp.full((n_steps,), hp.stop_speech_token, jnp.int32),
              jnp.zeros((), jnp.int32))
    f = jax.lax.while_loop(cond_fn, body_fn, init)
    return f.st, f.out, f.n_new


@functools.partial(jax.jit,
                   static_argnames=("hp", "max_new_tokens", "cfg_mode",
                                    "n_steps", "top_k", "ignore_eos",
                                    "kv_int8"))
def t3_prefill_decode(params: dict, hp: T3Config, cond: t3m.T3CondArrays,
                      text_tokens: jnp.ndarray, text_len: jnp.ndarray,
                      sp: S.SamplerParams, key,
                      *, max_new_tokens: int = 1000, n_steps: int = 25,
                      top_k: int = 0, cfg_mode: bool = True,
                      ignore_eos: bool = False, kv_int8: bool = False):
    """Prefill + the FIRST decode chunk in ONE program.

    The TTFA path previously dispatched t3_prefill then t3_decode_chunk —
    two relay round-trips before any token exists. Fusing them removes one
    dispatch from the time-to-first-audio critical path (each costs
    ~10-30 ms over the axon relay). Returns (state, tokens (n_steps,),
    n_new ()) exactly like t3_decode_chunk; continue with t3_decode_chunk
    for subsequent chunks (token stream identical — the RNG chain lives in
    DecodeState)."""
    state = t3_prefill(params, hp, cond, text_tokens, text_len, key,
                       max_new_tokens=max_new_tokens, cfg_mode=cfg_mode,
                       kv_int8=kv_int8)
    return t3_decode_chunk(params, hp, state, sp, n_steps=n_steps,
                           top_k=top_k, cfg_mode=cfg_mode,
                           ignore_eos=ignore_eos)


# measured crossover (v5e, GPT2-medium int8-fused): bucketed wins above
# ~384 generated tokens (1326 vs 1279 tok/s at 250; 1112 vs 966 at 1000) —
# shared by the pipeline and serving-loop dispatch sites
BUCKETED_DECODE_THRESHOLD = 384


def segment_schedule(max_new_tokens: int, first_segment: int) -> list:
    """Doubling decode-segment lengths summing to max_new_tokens."""
    if first_segment < 1:
        raise ValueError(f"first_segment must be >= 1, got {first_segment}")
    segs, left, s = [], max_new_tokens, first_segment
    while left > 0:
        n = min(s, left)
        segs.append(n)
        left -= n
        s *= 2
    return segs


@functools.partial(jax.jit, static_argnames=("new_t_max",))
def grow_cache(state: DecodeState, *, new_t_max: int) -> DecodeState:
    """Pad the KV cache's time axis to `new_t_max` (bucketed cache growth).
    No donation: the grown cache has a different shape, so the input
    buffers can't be reused anyway (donating only produces warnings).
    Works for both KVCache and KVCacheInt8 (every field has time axis 3)."""
    pad = new_t_max - state.cache[0].shape[3]
    assert pad >= 0
    spec = ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))
    cache = type(state.cache)(*(jnp.pad(a, spec) for a in state.cache))
    return state._replace(cache=cache)


def t3_generate_bucketed(params: dict, hp: T3Config, cond: t3m.T3CondArrays,
                         text_tokens: jnp.ndarray, text_len: jnp.ndarray,
                         sp: S.SamplerParams, key,
                         *, max_new_tokens: int = 1000, top_k: int = 1000,
                         cfg_mode: bool = True, ignore_eos: bool = False,
                         first_segment: int = 64, kv_int8: bool = False,
                         fused_attn: bool = False):
    """One-shot-equivalent generation with a geometrically growing KV cache.

    sampling/decode.t3_generate allocates the cache at P_pad+max_new_tokens
    up front, so every decode step's attention reads the full static buffer
    even early in the sequence (xplane trace: at max_new=1000 the full-size
    cache read costs ~0.13 ms/step of the ~1.0 ms step). Here decode runs in
    doubling segments (64, 128, 256, ...) with the cache padded between
    segments; attention reads O(current bucket). All segment dispatches are
    async (no host sync until the caller fetches), EOS exits propagate
    through `state.done` (later segments no-op), and the token stream is
    IDENTICAL to the one-shot program (the per-step RNG chain lives in
    DecodeState — pinned by tests/test_streaming.py chunk parity).

    Returns (tokens (max_new_tokens,), n_tokens ()) like decode.GenResult.
    """
    from .decode import GenResult
    if max_new_tokens <= 0:
        return GenResult(tokens=jnp.zeros((0,), jnp.int32),
                         n_tokens=jnp.zeros((), jnp.int32))
    segs = segment_schedule(max_new_tokens, first_segment)
    state = t3_prefill(params, hp, cond, text_tokens, text_len, key,
                       max_new_tokens=segs[0], cfg_mode=cfg_mode,
                       kv_int8=kv_int8, tile_align=fused_attn)
    Lc = t3m.cond_len(hp)
    P_pad = Lc + text_tokens.shape[1] + (2 if cfg_mode else 1)
    align = 1
    if fused_attn:
        from ..ops.pallas_attention import TT
        align = TT
    aligned = lambda t: ((t + align - 1) // align) * align
    cap = segs[0]
    outs = []
    n_total = jnp.zeros((), jnp.int32)
    for i, n in enumerate(segs):
        if i > 0:
            cap += n
            state = grow_cache(state, new_t_max=aligned(P_pad + cap))
        state, toks, nn = t3_decode_chunk(
            params, hp, state, sp, n_steps=n, top_k=top_k,
            cfg_mode=cfg_mode, ignore_eos=ignore_eos, fused_attn=fused_attn)
        outs.append(toks)
        n_total = n_total + nn
    return GenResult(tokens=jnp.concatenate(outs), n_tokens=n_total)
