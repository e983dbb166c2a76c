"""Batched T3 decode: N independent requests in one on-device loop.

The reference is strictly batch-1 (ref: s3gen.py:37, gradio queue
concurrency 1 — gradio_tts_app.py:90-93). For TPU serving the decode loop is
where batching pays: each step is bandwidth-bound on the backbone weights, so
B requests cost ~the same as one.

Batching scheme: prefixes are RIGHT-ALIGNED in the cache (left-padded, the
standard batched-generation layout), so every row's next token lands in the
SAME cache slot — KV writes are one shared dynamic_update_slice per layer
instead of a per-row scatter. Positional indices are offset per row
(positions = slot - pad_offset[b]) so wpe/RoPE see the same dense positions
as an unpadded run; attention masks out the left-pad slots.

Multi-tenant semantics:
  * per-row PRNG keys (`keys`: a (B,) key array) — a row's sampled tokens are
    a pure function of its own key/prompt/sampler, invariant to batchmates;
  * per-row SamplerParams — each field may be a scalar (shared) or a (B,)
    vector (heterogeneous temperatures/top_p/penalties per request);
  * cfg_mode=True runs the 520M CFG family (ref loop: t3.py:338-386) as
    2B rows — cond rows [0,B), uncond rows [B,2B) with zeroed text embeds
    (ref: t3.py:113-114) — with the rep→temp→min_p→top_p chain per row.

Structure: `t3_prefill_batched` + `t3_decode_chunk_batched` are the engine;
`t3_generate_batched` (one chunk covering the whole budget) and
`t3_generate_batched_bucketed` (doubling segments with cache growth — the
serving default, attention reads O(actual length)) are thin drivers over
them and produce IDENTICAL token streams (same per-step RNG chain).
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


class BatchGenResult(NamedTuple):
    tokens: jnp.ndarray    # (B, max_new_tokens) int32
    n_tokens: jnp.ndarray  # (B,) int32 per-row counts (incl. EOS)


class BatchDecodeState(NamedTuple):
    step: jnp.ndarray         # () tokens generated so far
    logits: jnp.ndarray       # (Bp, V) logits at the current position
    cache: bb.KVCache
    seen: jnp.ndarray         # (B, V) repetition history
    tokens: jnp.ndarray       # (B, max_new) output buffer
    n: jnp.ndarray            # (B,) per-row counts
    done: jnp.ndarray         # (B,)
    keys: jnp.ndarray         # (B,) key array
    pad: jnp.ndarray          # (Bp,) left-pad per physical row
    prefix_lens: jnp.ndarray  # (Bp,) dense prefix length per physical row


def _check_fused_attn(fused_attn: bool):
    if fused_attn:
        # bf16 pallas attention loses to XLA mha at these cache sizes
        # (DESIGN.md); the kernel path that DOES pay here is the int8-KV
        # one — pass kv_int8=True instead (the streamed kernels take the
        # per-row left-pad lower bound since r3)
        raise ValueError(
            "fused_attn is not a supported knob on the batched decode loop "
            "(XLA attention is the faster bf16 path at these cache sizes); "
            "for the pallas int8-KV kernel pass kv_int8=True")


@functools.partial(
    jax.jit,
    static_argnames=("hp", "t_cap", "max_new_tokens", "cfg_mode", "kv_int8"))
def t3_prefill_batched(params: dict, hp: T3Config, cond: t3m.T3CondArrays,
                       text_tokens: jnp.ndarray, text_lens: jnp.ndarray,
                       keys,
                       *, t_cap: int, max_new_tokens: int,
                       cfg_mode: bool = False,
                       kv_int8: bool = False) -> BatchDecodeState:
    """Run the right-aligned batched prefix; cache allocated at `t_cap`
    slots (the output token buffer is always (B, max_new_tokens)).
    kv_int8: int8 KV cache — prefill quantizes through the XLA-dequant
    path; the decode chunk reads it with the pallas streamed-int8 kernel
    (half the HBM bytes of the bf16 cache, the dominant batched-step
    read at the 1000-token serving budget)."""
    cfg = hp.backbone
    B, Ltp = text_tokens.shape
    Lc = t3m.cond_len(hp)
    # CFG prefix is [cond | text | BOS | BOS] — the reference's shipped loop
    # feeds the BOS embed twice (ref: t3.py:258-268 + t3.py:305-313); Turbo
    # feeds one (see sampling/decode.py for the full note)
    n_bos = 2 if cfg_mode else 1
    P_pad = Lc + Ltp + n_bos
    V = hp.speech_tokens_dict_size

    ce = t3m.cond_embeds(params, hp, cond)                      # (B, Lc, D)
    te = jnp.take(params["text_emb"]["w"], text_tokens, axis=0)
    if hp.input_pos_emb == "learned":
        te = te + jnp.take(params["text_pos_emb"]["w"], jnp.arange(Ltp), axis=0)
    if cfg_mode:
        # uncond half: same cond prefix, zeroed text embeds (ref: t3.py:113-114)
        ce = jnp.concatenate([ce, ce], axis=0)
        te = jnp.concatenate([te, jnp.zeros_like(te)], axis=0)
    Bp = 2 * B if cfg_mode else B
    bos = t3m.speech_embed_token(
        params, hp, jnp.full((Bp,), hp.start_speech_token, jnp.int32),
        jnp.zeros((), jnp.int32))
    bos = jnp.concatenate([bos] * n_bos, axis=1)                # (Bp, n_bos, D)
    dt = params["speech_emb"]["w"].dtype
    ce, te, bos = ce.astype(dt), te.astype(dt), bos.astype(dt)

    lens_p = jnp.tile(text_lens, 2) if cfg_mode else text_lens  # (Bp,)

    # dense prefix then ROLL right so the BOS sits at slot P_pad-1 for all rows
    dense = jnp.concatenate([ce, te, jnp.zeros_like(bos)], axis=1)  # (Bp, P_pad, D)
    dense = jax.vmap(lambda xi, bi, li: jax.lax.dynamic_update_slice(xi, bi, (li, 0))
                     )(dense, bos, Lc + lens_p)
    prefix_lens = Lc + lens_p + n_bos                           # (Bp,)
    pad = P_pad - prefix_lens                                   # left-pad per row
    x = jax.vmap(lambda xi, p: jnp.roll(xi, p, axis=0))(dense, pad)

    # positions: slot - pad (content sees 0..L-1; pad slots get junk, masked)
    slot = jnp.arange(P_pad)[None]                              # (1, P_pad)
    positions = jnp.maximum(slot - pad[:, None], 0)

    cache_cls = bb.KVCacheInt8 if kv_int8 else bb.KVCache
    cache = cache_cls.zeros(cfg, Bp, t_cap, dtype=jnp.bfloat16)
    # causal + left-pad mask: query q attends key k iff pad[b] <= k <= q
    q_pos = jnp.arange(P_pad)[:, None]
    k_pos = jnp.arange(t_cap)[None, :]
    mask = ((k_pos <= q_pos) & (k_pos[None] >= pad[:, None, None]))[:, None]
    hidden, cache = bb.backbone_apply_unrolled(
        params["backbone"], cfg, x, positions, cache,
        jnp.zeros((), jnp.int32), mask)
    logits0 = t3m.speech_logits(params, hidden[:, -1]).astype(jnp.float32)

    start_onehot = jax.nn.one_hot(hp.start_speech_token, V, dtype=jnp.bool_)
    # CFG family seeds the rep-penalty history with the BOS token
    # (matches sampling/decode.py's single-request engine)
    seen0 = (jnp.broadcast_to(start_onehot[None], (B, V)) if cfg_mode
             else jnp.zeros((B, V), jnp.bool_))

    return BatchDecodeState(
        step=jnp.zeros((), jnp.int32), logits=logits0, cache=cache,
        seen=seen0,
        tokens=jnp.full((B, max_new_tokens), hp.stop_speech_token, jnp.int32),
        n=jnp.zeros((B,), jnp.int32), done=jnp.zeros((B,), jnp.bool_),
        keys=keys, pad=pad, prefix_lens=prefix_lens)


@functools.partial(
    jax.jit,
    static_argnames=("hp", "n_steps", "top_k", "cfg_mode", "ignore_eos"),
    donate_argnames=("state",))
def t3_decode_chunk_batched(params: dict, hp: T3Config,
                            state: BatchDecodeState, sp: S.SamplerParams,
                            *, n_steps: int, top_k: int = 1000,
                            cfg_mode: bool = False,
                            ignore_eos: bool = False) -> BatchDecodeState:
    """Advance the batch by up to n_steps tokens (stops early when every row
    is done or the output buffer fills)."""
    cfg = hp.backbone
    B, max_new = state.tokens.shape
    V = hp.speech_tokens_dict_size
    t_cap = state.cache[0].shape[3]   # k / k_q — works for both cache types
    # int8 cache ⇒ pallas streamed-int8 attention with the per-row left-pad
    # lower bound (lo=pad); bf16 stays on XLA mha (the faster bf16 path at
    # these cache sizes, and the whole-slice kernels lack the lower bound)
    int8_cache = isinstance(state.cache, bb.KVCacheInt8)
    start_onehot = jax.nn.one_hot(hp.start_speech_token, V, dtype=jnp.bool_)

    # normalize sampler fields to (B|1, 1) so they broadcast over (B, V)
    sp = S.SamplerParams(*[jnp.asarray(v, jnp.float32).reshape(-1, 1) for v in sp])
    P_pad = state.pad[0] + state.prefix_lens[0]   # slot count (same per row)

    class _C(NamedTuple):
        i: jnp.ndarray
        st: BatchDecodeState

    def cond_fn(c):
        return ((c.i < n_steps) & (c.st.step < max_new)
                & ~jnp.all(c.st.done))

    def body_fn(c):
        s = c.st
        pairs = jax.vmap(lambda kk: jax.random.split(kk, 2))(s.keys)
        keys_next, subs = pairs[:, 0], pairs[:, 1]
        if cfg_mode:
            logits = S.process_logits_cfg(s.logits[:B], s.logits[B:], s.seen, sp)
        else:
            pen = s.seen | (start_onehot[None] & (s.step == 0))
            logits = S.process_logits_turbo(s.logits, pen, sp, top_k)
        # all-(-inf) guard per row (ref: t3.py:450-452)
        all_filtered = jnp.all(logits <= S.NEG_INF, axis=-1)
        token = jax.vmap(S.sample_categorical)(subs, logits).astype(jnp.int32)
        token = jnp.where(all_filtered, hp.stop_speech_token, token)   # (B,)

        active = ~s.done
        tokens = s.tokens.at[jnp.arange(B), s.step].set(
            jnp.where(active, token, hp.stop_speech_token))
        seen = s.seen.at[jnp.arange(B), token].set(
            active | s.seen[jnp.arange(B), token])
        n = jnp.where(active, s.step + 1, s.n)
        if ignore_eos:
            done = s.done
        else:
            done = s.done | (token == hp.stop_speech_token)

        token_p = jnp.tile(token, 2) if cfg_mode else token
        emb = t3m.speech_embed_token(params, hp, token_p, s.step + 1)
        slot_now = P_pad + s.step                                # shared slot
        pos_rows = s.prefix_lens + s.step                        # per-row position
        k_pos = jnp.arange(t_cap)[None, :]
        kv_mask = ((k_pos <= slot_now)
                   & (k_pos >= s.pad[:, None]))[:, None, None]
        hidden, cache = bb.backbone_apply_unrolled(
            params["backbone"], cfg, emb, pos_rows[:, None], s.cache,
            slot_now, kv_mask, fused_attn=int8_cache,
            kv_lo=(s.pad if int8_cache else None))
        logits_new = t3m.speech_logits(params, hidden[:, 0]).astype(jnp.float32)
        st = BatchDecodeState(s.step + 1, logits_new, cache, seen, tokens,
                              n, done, keys_next, s.pad, s.prefix_lens)
        return _C(c.i + 1, st)

    f = jax.lax.while_loop(cond_fn, body_fn,
                           _C(jnp.zeros((), jnp.int32), state))
    return f.st


@functools.partial(jax.jit, static_argnames=("new_t_cap",))
def grow_cache_batched(state: BatchDecodeState,
                       *, new_t_cap: int) -> BatchDecodeState:
    """Pad the batched KV cache's time axis (bucketed cache growth).
    Works for both KVCache and KVCacheInt8 (every field has time axis 3)."""
    pad = new_t_cap - state.cache[0].shape[3]
    assert pad >= 0
    grown = type(state.cache)(*[
        jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, pad)) + ((0, 0),) * (f.ndim - 4))
        for f in state.cache])
    return state._replace(cache=grown)


def t3_generate_batched(params: dict, hp: T3Config, cond: t3m.T3CondArrays,
                        text_tokens: jnp.ndarray, text_lens: jnp.ndarray,
                        sp: S.SamplerParams, keys,
                        *, max_new_tokens: int = 1000, top_k: int = 1000,
                        cfg_mode: bool = False,
                        ignore_eos: bool = False,
                        fused_attn: bool = False,
                        kv_int8: bool = False) -> BatchGenResult:
    """text_tokens: (B, Lt_bucket) left-aligned int32; text_lens: (B,).
    cond fields batched (B, ...). keys: (B,) jax key array — one per row.
    sp fields: scalar (shared) or (B,) per-request.
    kv_int8: int8 KV cache read by the pallas streamed-int8 kernel with the
    per-row left-pad lower bound — half the attention HBM bytes (opt-in,
    same quality caveat as the single-stream kv_int8: tools/ab_int8.py)."""
    _check_fused_attn(fused_attn)
    Lc = t3m.cond_len(hp)
    P_pad = Lc + text_tokens.shape[1] + (2 if cfg_mode else 1)
    t_cap = P_pad + max_new_tokens
    if kv_int8:
        from ..ops.pallas_attention import TT
        t_cap = ((t_cap + TT - 1) // TT) * TT     # tile-align for the kernel
    state = t3_prefill_batched(params, hp, cond, text_tokens, text_lens,
                               keys, t_cap=t_cap,
                               max_new_tokens=max_new_tokens,
                               cfg_mode=cfg_mode, kv_int8=kv_int8)
    state = t3_decode_chunk_batched(params, hp, state, sp,
                                    n_steps=max_new_tokens, top_k=top_k,
                                    cfg_mode=cfg_mode, ignore_eos=ignore_eos)
    return BatchGenResult(tokens=state.tokens, n_tokens=state.n)


def t3_generate_batched_bucketed(params: dict, hp: T3Config,
                                 cond: t3m.T3CondArrays,
                                 text_tokens: jnp.ndarray,
                                 text_lens: jnp.ndarray,
                                 sp: S.SamplerParams, keys,
                                 *, max_new_tokens: int = 1000,
                                 top_k: int = 1000, cfg_mode: bool = False,
                                 ignore_eos: bool = False,
                                 first_segment: int = 64,
                                 kv_int8: bool = False) -> BatchGenResult:
    """Like t3_generate_batched but with doubling decode segments and cache
    growth between them — attention reads O(actual length) instead of
    O(P+max_new) (the dominant batched-step cost at the 1000-token serving
    default). Token streams are identical; all dispatches are async.
    kv_int8 composes: int8 tiles (half the bytes) over the grown cache."""
    segs = []
    left, s = max_new_tokens, first_segment
    while left > 0:
        n = min(s, left)
        segs.append(n)
        left -= n
        s *= 2
    Lc = t3m.cond_len(hp)
    P_pad = Lc + text_tokens.shape[1] + (2 if cfg_mode else 1)

    def _cap(tokens: int) -> int:
        t_cap = P_pad + tokens
        if kv_int8:
            from ..ops.pallas_attention import TT
            t_cap = ((t_cap + TT - 1) // TT) * TT   # tile-align for the kernel
        return t_cap

    state = t3_prefill_batched(params, hp, cond, text_tokens, text_lens,
                               keys, t_cap=_cap(segs[0]),
                               max_new_tokens=max_new_tokens,
                               cfg_mode=cfg_mode, kv_int8=kv_int8)
    cap = segs[0]
    for i, n in enumerate(segs):
        if i > 0:
            cap += n
            state = grow_cache_batched(state, new_t_cap=_cap(cap))
        state = t3_decode_chunk_batched(params, hp, state, sp, n_steps=n,
                                        top_k=top_k, cfg_mode=cfg_mode,
                                        ignore_eos=ignore_eos)
    return BatchGenResult(tokens=state.tokens, n_tokens=state.n)
