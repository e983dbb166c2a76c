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


@functools.partial(
    jax.jit,
    static_argnames=("hp", "max_new_tokens", "top_k", "ignore_eos", "fused_attn"),
)
def t3_generate_batched(params: dict, hp: T3Config, cond: t3m.T3CondArrays,
                        text_tokens: jnp.ndarray, text_lens: jnp.ndarray,
                        sp: S.SamplerParams, key,
                        *, max_new_tokens: int = 1000, top_k: int = 1000,
                        ignore_eos: bool = False,
                        fused_attn: bool = False) -> BatchGenResult:
    """text_tokens: (B, Lt_bucket) left-aligned int32; text_lens: (B,).
    cond fields batched (B, ...). Turbo sampling pipeline per row."""
    cfg = hp.backbone
    B, Ltp = text_tokens.shape
    Lc = t3m.cond_len(hp)
    P_pad = Lc + Ltp + 1
    t_max = P_pad + max_new_tokens
    V = hp.speech_tokens_dict_size

    ce = t3m.cond_embeds(params, hp, cond)                      # (B, Lc, D)
    te = jnp.take(params["text_emb"]["w"], text_tokens, axis=0)
    if hp.input_pos_emb == "learned":
        te = te + jnp.take(params["text_pos_emb"]["w"], jnp.arange(Ltp), axis=0)
    bos = t3m.speech_embed_token(
        params, hp, jnp.full((B,), hp.start_speech_token, jnp.int32),
        jnp.zeros((), jnp.int32))
    dt = params["speech_emb"]["w"].dtype
    ce, te, bos = ce.astype(dt), te.astype(dt), bos.astype(dt)

    # dense prefix then ROLL right so the BOS sits at slot P_pad-1 for all rows
    dense = jnp.concatenate([ce, te, jnp.zeros_like(bos)], axis=1)  # (B, P_pad, D)
    dense = jax.vmap(lambda xi, bi, li: jax.lax.dynamic_update_slice(xi, bi, (li, 0))
                     )(dense, bos, Lc + text_lens)
    prefix_lens = Lc + text_lens + 1                            # (B,)
    pad = P_pad - prefix_lens                                   # left-pad per row
    x = jax.vmap(lambda xi, p: jnp.roll(xi, p, axis=0))(dense, pad)

    # positions: slot - pad (content sees 0..L-1; pad slots get junk, masked)
    slot = jnp.arange(P_pad)[None]                              # (1, P_pad)
    positions = jnp.maximum(slot - pad[:, None], 0)

    cache = bb.KVCache.zeros(cfg, B, t_max, dtype=jnp.bfloat16)
    # causal + left-pad mask: query q attends key k iff pad[b] <= k <= q
    q_pos = jnp.arange(P_pad)[:, None]
    k_pos = jnp.arange(t_max)[None, :]
    mask = ((k_pos <= q_pos) & (k_pos[None] >= pad[:, None, None]))[:, None]
    hidden, cache = bb.backbone_apply_unrolled(
        params["backbone"], cfg, x, positions, cache,
        jnp.zeros((), jnp.int32), mask)
    logits0 = t3m.speech_logits(params, hidden[:, -1]).astype(jnp.float32)

    start_onehot = jax.nn.one_hot(hp.start_speech_token, V, dtype=jnp.bool_)

    class _St(NamedTuple):
        step: jnp.ndarray
        logits: jnp.ndarray       # (B, V)
        cache: bb.KVCache
        seen: jnp.ndarray         # (B, V)
        tokens: jnp.ndarray       # (B, max_new)
        n: jnp.ndarray            # (B,)
        done: jnp.ndarray         # (B,)
        key: jnp.ndarray

    init = _St(jnp.zeros((), jnp.int32), logits0, cache,
               jnp.zeros((B, V), jnp.bool_),
               jnp.full((B, max_new_tokens), hp.stop_speech_token, jnp.int32),
               jnp.zeros((B,), jnp.int32),
               jnp.zeros((B,), jnp.bool_), key)

    def cond_fn(s):
        return (s.step < max_new_tokens) & ~jnp.all(s.done)

    def body_fn(s):
        key, sub = jax.random.split(s.key)
        pen = s.seen | (start_onehot[None] & (s.step == 0))
        logits = S.process_logits_turbo(s.logits, pen, sp, top_k)
        token = S.sample_categorical(sub, logits).astype(jnp.int32)   # (B,)

        active = ~s.done
        tokens = s.tokens.at[jnp.arange(B), s.step].set(
            jnp.where(active, token, hp.stop_speech_token))
        seen = s.seen.at[jnp.arange(B), token].set(active | s.seen[jnp.arange(B), token])
        n = jnp.where(active, s.step + 1, s.n)
        if ignore_eos:
            done = s.done
        else:
            done = s.done | (token == hp.stop_speech_token)

        emb = t3m.speech_embed_token(params, hp, token, s.step + 1)
        slot_now = P_pad + s.step                                    # shared slot
        pos_rows = prefix_lens + s.step                              # per-row position
        k_pos = jnp.arange(t_max)[None, :]
        kv_mask = ((k_pos <= slot_now) & (k_pos >= pad[:, None]))[:, None, None]
        hidden, cache = bb.backbone_apply_unrolled(
            params["backbone"], cfg, emb, pos_rows[:, None], s.cache,
            slot_now, kv_mask)
        logits_new = t3m.speech_logits(params, hidden[:, 0]).astype(jnp.float32)
        return _St(s.step + 1, logits_new, cache, seen, tokens, n, done, key)

    f = jax.lax.while_loop(cond_fn, body_fn, init)
    return BatchGenResult(tokens=f.tokens, n_tokens=f.n)
