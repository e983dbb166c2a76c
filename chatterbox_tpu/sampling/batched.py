"""Batched T3 decode: N independent requests in one on-device loop.

The reference is strictly batch-1 (ref: s3gen.py:37, gradio queue
concurrency 1 — gradio_tts_app.py:90-93). For TPU serving the decode loop is
where batching pays: each step is bandwidth-bound on the backbone weights, so
B requests cost ~the same as one. This engine runs B rows with independent
prefix lengths, EOS states and repetition histories (turbo sampling path —
the batched-serving target is Turbo/Nano; BASELINE config 5).
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
    static_argnames=("hp", "max_new_tokens", "top_k", "ignore_eos"),
)
def t3_generate_batched(params: dict, hp: T3Config, cond: t3m.T3CondArrays,
                        text_tokens: jnp.ndarray, text_lens: jnp.ndarray,
                        sp: S.SamplerParams, key,
                        *, max_new_tokens: int = 1000, top_k: int = 1000,
                        ignore_eos: bool = False) -> BatchGenResult:
    """text_tokens: (B, Lt_bucket); text_lens: (B,). cond fields batched (B, ...).
    Turbo sampling pipeline per row."""
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
    x = jnp.concatenate([ce, te, jnp.zeros_like(bos)], axis=1)
    # per-row BOS placement at Lc + text_lens[b]
    x = jax.vmap(lambda xi, bi, li: jax.lax.dynamic_update_slice(xi, bi, (li, 0))
                 )(x, bos, Lc + text_lens)

    prefill_lens = Lc + text_lens + 1                            # (B,)

    stacked = bb.stack_layer_params(params["backbone"]["layers"])
    cache = bb.KVCache.zeros(cfg, B, t_max, dtype=jnp.bfloat16)
    mask = bb.prefill_mask(P_pad, t_max, prefill_lens)
    positions = jnp.tile(jnp.arange(P_pad)[None], (B, 1))
    hidden, cache = bb.backbone_apply_stacked(
        params["backbone"], stacked, cfg, x, positions, cache,
        jnp.zeros((B,), jnp.int32), mask)
    last_h = jnp.take_along_axis(
        hidden, (prefill_lens - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    logits0 = t3m.speech_logits(params, last_h).astype(jnp.float32)

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
        cur = prefill_lens + s.step                                   # (B,)
        mask = bb.decode_mask(t_max, cur)
        hidden, cache = bb.backbone_apply_stacked(
            params["backbone"], stacked, cfg, emb, cur[:, None], s.cache, cur, mask)
        logits_new = t3m.speech_logits(params, hidden[:, 0]).astype(jnp.float32)
        return _St(s.step + 1, logits_new, cache, seen, tokens, n, done, key)

    f = jax.lax.while_loop(cond_fn, body_fn, init)
    return BatchGenResult(tokens=f.tokens, n_tokens=f.n)
