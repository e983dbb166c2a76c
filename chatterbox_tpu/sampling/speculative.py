"""Speculative T3 decode: a small draft model proposes K tokens, the target
model verifies them in ONE forward.

The reference has nothing like this (its loop is strictly one target forward
per token — ref: models/t3/t3.py:392-468); on TPU it is the natural next
lever after the per-step decode hit its weight-bandwidth floor (DESIGN.md):
a weight-bound decode step costs the same whether it scores 1 token or K+1,
so verifying a whole draft chunk costs ~one step while emitting up to K+1
tokens. The Turbo/Nano pair shares the speech-token space and the GPT-2
text tokenizer, making Nano (GPT2-small) the natural draft for Turbo
(GPT2-medium).

Algorithm (standard speculative sampling, accept prob min(1, p/q), residual
resample max(p-q, 0)/Z on rejection, bonus token from p_{K+1} when all K
accept) — this preserves the target model's sampling distribution EXACTLY,
including the Turbo logits-processor chain: both p and q are the processed
(temperature/top-k/top-p/repetition-penalty) distributions, with the
repetition history threaded per speculative position exactly as the
sequential loop would see it. With greedy sampling (top_k=1) the output is
token-identical to the sequential target decode (tested).

Scope: the Turbo sampler chain (cfg_mode=False). CFG-family speculation
would need batch-2 drafts and batch-2 verifies; the 520M/MTL pipelines keep
the sequential engine.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.t3 import backbone as bb
from ..models.t3 import model as t3m
from ..models.t3.config import T3Config
from ..nn import core as nn
from ..ops import sampling as S
from .chunked import t3_prefill


class SpecResult(NamedTuple):
    tokens: jnp.ndarray      # (max_new_tokens,) int32, stop-token padded
    n_tokens: jnp.ndarray    # () int32 — generated tokens incl. EOS
    n_rounds: jnp.ndarray    # () int32 — draft/verify rounds run
    n_drafted: jnp.ndarray   # () int32 — draft tokens proposed (K * rounds)
    n_accepted: jnp.ndarray  # () int32 — draft tokens accepted


def _chunk_mask(s: int, t_max: int, start) -> jnp.ndarray:
    """(1, 1, s, t_max) causal mask for a slab whose first query sits at
    absolute position `start` (each row i attends to keys <= start+i)."""
    q = jnp.arange(s)[:, None]
    k = jnp.arange(t_max)[None, :]
    return (k <= start + q)[None, None]


def _probs_or_stop(logits: jnp.ndarray, stop_token: int):
    """softmax of processed logits; all-(-inf) rows (everything filtered —
    the decode loops' guard, ref: t3.py:450-452) become one-hot(stop)."""
    V = logits.shape[-1]
    ok = jnp.any(logits > S.NEG_INF, axis=-1, keepdims=True)
    safe = jnp.where(ok, logits, 0.0)
    probs = jax.nn.softmax(safe, axis=-1)
    stop_oh = jax.nn.one_hot(stop_token, V, dtype=probs.dtype)
    return jnp.where(ok, probs, stop_oh)


@functools.partial(
    jax.jit,
    static_argnames=("hp", "hp_draft", "max_new_tokens", "n_draft", "top_k",
                     "ignore_eos"),
)
def t3_generate_speculative(
        params: dict, draft_params: dict, hp: T3Config, hp_draft: T3Config,
        cond: t3m.T3CondArrays, cond_draft: t3m.T3CondArrays,
        text_tokens: jnp.ndarray, text_len: jnp.ndarray,
        sp: S.SamplerParams, key,
        *, max_new_tokens: int = 1000, n_draft: int = 4, top_k: int = 0,
        ignore_eos: bool = False) -> SpecResult:
    """Speculative generation with the Turbo sampler chain (single stream).

    Both models consume the same text tokens (same tokenizer) but build
    their own conditioning prefixes and KV caches. Requires
    hp.speech_tokens_dict_size == hp_draft.speech_tokens_dict_size and
    matching special tokens (Turbo + Nano satisfy this).
    """
    assert hp.speech_tokens_dict_size == hp_draft.speech_tokens_dict_size
    assert hp.start_speech_token == hp_draft.start_speech_token
    assert hp.stop_speech_token == hp_draft.stop_speech_token
    K = n_draft
    V = hp.speech_tokens_dict_size
    stop = hp.stop_speech_token
    start_onehot = jax.nn.one_hot(hp.start_speech_token, V, dtype=jnp.bool_)
    cfg_t, cfg_d = hp.backbone, hp_draft.backbone

    # prefills: cache budget covers the last slab overshooting max_new by K
    budget = max_new_tokens + K + 1
    st_t = t3_prefill(params, hp, cond, text_tokens, text_len, key,
                      max_new_tokens=budget, cfg_mode=False)
    st_d = t3_prefill(draft_params, hp_draft, cond_draft, text_tokens,
                      text_len, key, max_new_tokens=budget, cfg_mode=False)
    pfl_t, pfl_d = st_t.prefill_len, st_d.prefill_len
    t_max_t = st_t.cache[0].shape[3]
    t_max_d = st_d.cache[0].shape[3]

    class _St(NamedTuple):
        step: jnp.ndarray      # emitted tokens so far
        pending: jnp.ndarray   # last emitted token, not yet fed (BOS at init)
        cache_t: object
        cache_d: object
        seen: jnp.ndarray      # (V,) bool — emitted-token history
        tokens: jnp.ndarray    # (max_new + K + 1,)
        done: jnp.ndarray
        key: jnp.ndarray
        n_rounds: jnp.ndarray
        n_accepted: jnp.ndarray

    init = _St(
        step=jnp.zeros((), jnp.int32),
        # re-feeding BOS at its prefill position rewrites identical KV and
        # reproduces the prefill logits — one compiled slab shape for all
        # rounds instead of a special first round
        pending=jnp.asarray(hp.start_speech_token, jnp.int32),
        cache_t=st_t.cache, cache_d=st_d.cache,
        seen=jnp.zeros((V,), jnp.bool_),
        tokens=jnp.full((max_new_tokens + K + 1,), stop, jnp.int32),
        done=jnp.zeros((), jnp.bool_),
        key=key,
        n_rounds=jnp.zeros((), jnp.int32),
        n_accepted=jnp.zeros((), jnp.int32),
    )

    def cond_fn(s: _St):
        return (s.step < max_new_tokens) & ~s.done

    def body_fn(s: _St):
        key, k_draft, k_acc, k_res = jax.random.split(s.key, 4)

        # ---- draft: K+1 single-token steps (scan) -------------------------
        # step i feeds slab token i ([pending, d_1..d_K]); steps 0..K-1
        # sample the K drafts, step K feeds d_K so the draft cache holds its
        # KV when every draft is accepted (without it the next round's first
        # draft would attend over a zero slot and systematically diverge
        # from the target — measured as exactly one rejection per round).
        def draft_step(carry, i):
            cache_d, f_tok, seen_loc, dkey = carry
            pos = pfl_d - 1 + s.step + i                   # absolute seq pos
            emb = t3m.speech_embed_token(
                draft_params, hp_draft, f_tok[None], s.step + i)
            mask = bb.decode_mask(t_max_d, jnp.full((1,), pos, jnp.int32))
            hidden, cache_d = bb.backbone_apply_unrolled(
                draft_params["backbone"], cfg_d, emb,
                jnp.full((1, 1), pos, jnp.int32), cache_d, pos, mask)
            logits = t3m.speech_logits(
                draft_params, hidden[:, 0]).astype(jnp.float32)[0]
            pen = seen_loc | (start_onehot & (s.step + i == 0))
            q_logits = S.process_logits_turbo(logits, pen, sp, top_k)
            q_probs = _probs_or_stop(q_logits, stop)
            dkey, sub = jax.random.split(dkey)
            d = jax.random.categorical(sub, jnp.log(
                jnp.maximum(q_probs, 1e-38))).astype(jnp.int32)
            seen_next = seen_loc.at[d].set(True)
            return (cache_d, d, seen_next, dkey), (d, q_probs, pen)

        (cache_d, _, _, _), (d_all, q_all, pens_all) = jax.lax.scan(
            draft_step, (s.cache_d, s.pending, s.seen, k_draft),
            jnp.arange(K + 1, dtype=jnp.int32))
        d, q_probs = d_all[:K], q_all[:K]   # (K,), (K, V); row K discarded

        # ---- target verify: ONE forward over [pending, d_1..d_K] ---------
        slab = jnp.concatenate([s.pending[None], d])       # (K+1,)
        emb = nn.embedding(params["speech_emb"], slab[None])  # (1, K+1, D)
        if hp.input_pos_emb == "learned":
            emb = emb + jnp.take(params["speech_pos_emb"]["w"],
                                 s.step + jnp.arange(K + 1), axis=0)
        emb = emb.astype(params["speech_emb"]["w"].dtype)
        pos0 = pfl_t - 1 + s.step
        positions = pos0 + jnp.arange(K + 1)[None]
        mask = _chunk_mask(K + 1, t_max_t, pos0)
        hidden, cache_t = bb.backbone_apply_unrolled(
            params["backbone"], cfg_t, emb, positions, s.cache_t, pos0, mask)
        logits_slab = t3m.speech_logits(
            params, hidden[0]).astype(jnp.float32)         # (K+1, V)
        # pens_all rows 0..K-1 are exactly the draft's q pens; row K (from
        # the extra feed) is seen ∪ {d_1..d_K} — the bonus token's history
        p_logits = S.process_logits_turbo(logits_slab, pens_all, sp, top_k)
        p_probs = _probs_or_stop(p_logits, stop)           # (K+1, V)

        # ---- accept / resample -------------------------------------------
        idx = jnp.arange(K)
        ratio = p_probs[idx, d] / jnp.maximum(q_probs[idx, d], 1e-30)
        u = jax.random.uniform(k_acc, (K,))
        acc = u < ratio
        n_acc = jnp.where(jnp.all(acc), K, jnp.argmin(acc))
        q_pad = jnp.concatenate([q_probs, jnp.zeros((1, V))])
        resid = jnp.maximum(p_probs[n_acc] - q_pad[n_acc], 0.0)
        # numerically-empty residual (p under-covers q on every token after
        # float rounding): fall back to the target distribution
        resid = jnp.where(resid.sum() > 0, resid, p_probs[n_acc])
        t_next = jax.random.categorical(
            k_res, jnp.log(jnp.maximum(resid, 1e-38))).astype(jnp.int32)

        # ---- emit row, EOS truncation ------------------------------------
        row = jnp.where(idx < n_acc, d, stop)
        row = jnp.concatenate([row, jnp.full((1,), stop, jnp.int32)])
        row = row.at[n_acc].set(t_next)                    # (K+1,)
        within = jnp.arange(K + 1) <= n_acc
        is_stop = (row == stop) & within
        hit_eos = jnp.any(is_stop)
        if ignore_eos:
            n_emit = n_acc + 1
            done = jnp.zeros((), jnp.bool_)
        else:
            n_emit = jnp.where(hit_eos, jnp.argmax(is_stop) + 1, n_acc + 1)
            done = hit_eos
        tokens = jax.lax.dynamic_update_slice(s.tokens, row, (s.step,))

        emitted = (jnp.arange(K + 1) < n_emit)
        seen = s.seen | jnp.any(
            jax.nn.one_hot(row, V, dtype=jnp.bool_) & emitted[:, None], axis=0)
        pending = row[n_emit - 1]
        step = s.step + n_emit
        return _St(step, pending, cache_t, cache_d, seen, tokens,
                   done | (step >= max_new_tokens), key,
                   s.n_rounds + 1, s.n_accepted + jnp.minimum(n_acc, n_emit))

    f = jax.lax.while_loop(cond_fn, body_fn, init)
    n_tokens = jnp.minimum(f.step, max_new_tokens)
    toks = jnp.where(jnp.arange(max_new_tokens) < n_tokens,
                     f.tokens[:max_new_tokens], stop)
    return SpecResult(tokens=toks, n_tokens=n_tokens, n_rounds=f.n_rounds,
                      n_drafted=f.n_rounds * K, n_accepted=f.n_accepted)
