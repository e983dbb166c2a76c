"""Token-level continuous batching: a fixed pool of decode slots that
requests join and leave at chunk boundaries, without draining the batch.

The reference serves one request at a time (gradio queue concurrency 1 —
ref: gradio_tts_app.py:90-93); its HF loop cannot admit work mid-decode.
Here the decode state is an explicit on-device pytree over S slots:

  * every row is left-aligned in its own cache rows and advances at its own
    position (per-row KV write offsets — models/t3/backbone.py:_write_cache's
    vmapped dynamic_update_slice path), so rows at different decode depths
    coexist in one program;
  * `admit` prefills ONE request into a free slot (a batch-1 prefill whose
    K/V rows are inserted into the slot cache) while the other rows' state is
    untouched — an O(prefix) operation, not a batch restart;
  * `decode_chunk` advances all running rows n_steps together — one
    weight-bound backbone step serves every active request;
  * per-row PRNG keys + per-row SamplerParams make each row's output a pure
    function of its own request (invariant to batchmates — tested).

Turbo/Nano (GPT-2) family: one physical row per request. The 520M/MTL CFG
family (cfg=True) runs each request as a cond/uncond physical row PAIR —
logical slot i owns rows i and S+i; the uncond row shares the cond prefix
with zeroed text embeds (ref: t3.py:113-114) and both rows consume the same
sampled token each step (cfg-combine → rep→temp→min_p→top_p chain,
ref: t3.py:338-360).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.t3 import backbone as bb
from ..models.t3 import model as t3m
from ..models.t3.config import T3Config
from ..nn import core as nn
from ..ops import sampling as S


class SlotStates(NamedTuple):
    cache: bb.KVCache          # (L, Sp, H, T_max, D); Sp = 2S when cfg
    logits: jnp.ndarray        # (Sp, V)
    seen: jnp.ndarray          # (S, V) bool
    step: jnp.ndarray          # (S,) tokens generated
    done: jnp.ndarray          # (S,) bool — hit EOS / per-row cap
    active: jnp.ndarray        # (S,) bool — slot occupied
    keys: jnp.ndarray          # (S,) key array
    prefix_lens: jnp.ndarray   # (S,) dense prefix length
    max_new: jnp.ndarray       # (S,) per-row generation cap
    tokens: jnp.ndarray        # (S, cap) generated tokens
    # per-row sampler params, (S,) each
    temperature: jnp.ndarray
    top_p: jnp.ndarray
    repetition_penalty: jnp.ndarray
    min_p: jnp.ndarray
    cfg_weight: jnp.ndarray


def init_slots(hp: T3Config, n_slots: int, text_bucket: int,
               max_new_tokens: int, t_cap: int = None,
               cfg: bool = False, kv_int8: bool = False) -> SlotStates:
    """t_cap: optional initial cache capacity (slots are LEFT-aligned at
    offset 0, so the cache can start small and grow — grow_slot_cache).
    cfg=True lays out 2 physical cache/logits rows per logical slot
    (cond rows [0,S), uncond rows [S,2S)). kv_int8=True uses the int8 KV
    cache — decode rounds read it with the pallas streamed-int8 kernel
    (half the HBM bytes; the slot layout is left-aligned so the kernel's
    per-row cur_len is all it needs). The cache time axis is tile-aligned
    here and in grow_slot_cache so the kernel always engages."""
    bcfg = hp.backbone
    Lc = t3m.cond_len(hp)
    # CFG prefixes carry the reference's double BOS (see admit)
    t_max = t_cap or (Lc + text_bucket + (2 if cfg else 1) + max_new_tokens)
    V = hp.speech_tokens_dict_size
    Sp = 2 * n_slots if cfg else n_slots
    cache_cls = bb.KVCache
    if kv_int8:
        from ..ops.pallas_attention import TT
        t_max = ((t_max + TT - 1) // TT) * TT
        cache_cls = bb.KVCacheInt8
    return SlotStates(
        cache=cache_cls.zeros(bcfg, Sp, t_max, dtype=jnp.bfloat16),
        logits=jnp.zeros((Sp, V), jnp.float32),
        seen=jnp.zeros((n_slots, V), jnp.bool_),
        step=jnp.zeros((n_slots,), jnp.int32),
        done=jnp.ones((n_slots,), jnp.bool_),
        active=jnp.zeros((n_slots,), jnp.bool_),
        keys=jax.random.split(jax.random.key(0), n_slots),
        prefix_lens=jnp.zeros((n_slots,), jnp.int32),
        max_new=jnp.zeros((n_slots,), jnp.int32),
        tokens=jnp.full((n_slots, max_new_tokens), 0, jnp.int32),
        temperature=jnp.ones((n_slots,), jnp.float32),
        top_p=jnp.ones((n_slots,), jnp.float32),
        repetition_penalty=jnp.ones((n_slots,), jnp.float32),
        min_p=jnp.zeros((n_slots,), jnp.float32),
        cfg_weight=jnp.zeros((n_slots,), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("hp", "cfg_mode"),
                   donate_argnames=("state",))
def admit(params: dict, hp: T3Config, state: SlotStates, slot: jnp.ndarray,
          cond: t3m.T3CondArrays, text_tokens: jnp.ndarray,
          text_len: jnp.ndarray, key, max_new: jnp.ndarray,
          temperature: jnp.ndarray, top_p: jnp.ndarray,
          repetition_penalty: jnp.ndarray,
          min_p: jnp.ndarray = None, cfg_weight: jnp.ndarray = None,
          cfg_mode: bool = False) -> SlotStates:
    """Prefill one request (batch-1; batch-2 cond+uncond when cfg_mode) and
    install it in `slot` (cfg: physical rows slot and S+slot)."""
    cfg = hp.backbone
    Lc = t3m.cond_len(hp)
    Ltp = text_tokens.shape[1]
    # CFG prefix is [cond | text | BOS | BOS] — the reference's shipped loop
    # feeds the BOS embed twice (ref: t3.py:258-268 + t3.py:305-313); Turbo
    # feeds one (see sampling/decode.py for the full note)
    n_bos = 2 if cfg_mode else 1
    P_pad = Lc + Ltp + n_bos
    V = hp.speech_tokens_dict_size
    Sn = state.seen.shape[0]
    B = 2 if cfg_mode else 1

    ce = t3m.cond_embeds(params, hp, cond)                    # (1, Lc, D)
    te = jnp.take(params["text_emb"]["w"], text_tokens, axis=0)
    if hp.input_pos_emb == "learned":
        te = te + jnp.take(params["text_pos_emb"]["w"], jnp.arange(Ltp), axis=0)
    if cfg_mode:
        # uncond row: same cond prefix, zeroed text embeds (ref: t3.py:113-114)
        ce = jnp.concatenate([ce, ce], axis=0)
        te = jnp.concatenate([te, jnp.zeros_like(te)], axis=0)
    bos = t3m.speech_embed_token(
        params, hp, jnp.full((B,), hp.start_speech_token, jnp.int32),
        jnp.zeros((), jnp.int32))
    bos = jnp.concatenate([bos] * n_bos, axis=1)
    dt = params["speech_emb"]["w"].dtype
    x = jnp.concatenate([ce.astype(dt), te.astype(dt),
                         jnp.zeros_like(bos, dt)], axis=1)
    x = jax.lax.dynamic_update_slice(x, bos.astype(dt), (0, Lc + text_len, 0))
    prefill_len = Lc + text_len + n_bos

    # prefill into a mini cache of the SAME type as the slot cache (bf16 or
    # int8+scales), then splice its rows in below
    mini = type(state.cache).zeros(cfg, B, P_pad, dtype=jnp.bfloat16)
    mask = bb.prefill_mask(P_pad, P_pad,
                           jnp.full((B,), prefill_len, jnp.int32))
    positions = jnp.broadcast_to(jnp.arange(P_pad)[None], (B, P_pad))
    hidden, mini = bb.backbone_apply_unrolled(
        params["backbone"], cfg, x, positions, mini,
        jnp.zeros((), jnp.int32), mask)
    last_h = jnp.take_along_axis(
        hidden, jnp.full((B, 1, 1), prefill_len - 1), axis=1)[:, 0]
    logits0 = t3m.speech_logits(params, last_h).astype(jnp.float32)  # (B, V)

    # install the row(s): K/V prefix at time offset 0 of the slot's cache
    # rows — every cache field is (L, B, H, T, D|1), so one loop covers both
    # cache types
    fields = []
    for f_all, f_mini in zip(state.cache, mini):
        fd = f_all.dtype
        f_all = jax.lax.dynamic_update_slice(
            f_all, f_mini[:, :1].astype(fd), (0, slot, 0, 0, 0))
        if cfg_mode:
            f_all = jax.lax.dynamic_update_slice(
                f_all, f_mini[:, 1:].astype(fd), (0, Sn + slot, 0, 0, 0))
        fields.append(f_all)
    cache_new = type(state.cache)(*fields)
    logits = state.logits.at[slot].set(logits0[0])
    if cfg_mode:
        logits = logits.at[Sn + slot].set(logits0[1])
    # CFG family seeds the rep-penalty history with the BOS token
    # (matches sampling/decode.py + sampling/batched.py)
    seen0 = (jax.nn.one_hot(hp.start_speech_token, V, dtype=jnp.bool_)
             if cfg_mode else jnp.zeros((V,), jnp.bool_))
    return SlotStates(
        cache=cache_new,
        logits=logits,
        seen=state.seen.at[slot].set(seen0),
        step=state.step.at[slot].set(0),
        done=state.done.at[slot].set(False),
        active=state.active.at[slot].set(True),
        keys=state.keys.at[slot].set(key),
        prefix_lens=state.prefix_lens.at[slot].set(prefill_len),
        max_new=state.max_new.at[slot].set(max_new),
        tokens=state.tokens.at[slot].set(
            jnp.full((state.tokens.shape[1],), hp.stop_speech_token, jnp.int32)),
        temperature=state.temperature.at[slot].set(temperature),
        top_p=state.top_p.at[slot].set(top_p),
        repetition_penalty=state.repetition_penalty.at[slot].set(
            repetition_penalty),
        min_p=state.min_p.at[slot].set(
            jnp.zeros((), jnp.float32) if min_p is None else min_p),
        cfg_weight=state.cfg_weight.at[slot].set(
            jnp.zeros((), jnp.float32) if cfg_weight is None else cfg_weight),
    )


@functools.partial(jax.jit,
                   static_argnames=("hp", "n_steps", "top_k", "fused_attn",
                                    "cfg_mode"),
                   donate_argnames=("state",))
def decode_chunk_multi(params: dict, hp: T3Config, state: SlotStates,
                       *, n_steps: int, top_k: int = 1000,
                       fused_attn: bool = False,
                       cfg_mode: bool = False) -> SlotStates:
    """Advance every running slot by up to n_steps tokens. cfg_mode runs the
    cond/uncond row pairs of the 520M family (cfg-combine before the
    rep→temp→min_p→top_p chain); otherwise the Turbo chain."""
    cfg = hp.backbone
    Sn = state.seen.shape[0]
    V = hp.speech_tokens_dict_size
    t_max = state.cache[0].shape[3]   # k / k_q — works for both cache types
    cap = state.tokens.shape[1]
    # int8 slot cache ⇒ pallas streamed-int8 attention (per-row cur_len;
    # left-aligned rows need no lower bound). init_slots/grow_slot_cache
    # keep t_max tile-aligned so the kernel path always engages.
    fused_attn = fused_attn or isinstance(state.cache, bb.KVCacheInt8)
    start_onehot = jax.nn.one_hot(hp.start_speech_token, V, dtype=jnp.bool_)
    sp = S.SamplerParams(
        temperature=state.temperature[:, None],
        top_p=state.top_p[:, None],
        min_p=state.min_p[:, None],
        repetition_penalty=state.repetition_penalty[:, None],
        cfg_weight=state.cfg_weight[:, None],
    )
    tile2 = (lambda a: jnp.concatenate([a, a], axis=0)) if cfg_mode \
        else (lambda a: a)

    class _C(NamedTuple):
        i: jnp.ndarray
        st: SlotStates

    def cond_fn(c):
        return (c.i < n_steps) & jnp.any(c.st.active & ~c.st.done)

    def body_fn(c):
        s = c.st
        pairs = jax.vmap(lambda kk: jax.random.split(kk, 2))(s.keys)
        keys_next, subs = pairs[:, 0], pairs[:, 1]
        running = s.active & ~s.done

        if cfg_mode:
            # seen is BOS-seeded at admit; no step-0 special case needed
            logits = S.process_logits_cfg(s.logits[:Sn], s.logits[Sn:],
                                          s.seen, sp)
        else:
            pen = s.seen | (start_onehot[None] & (s.step == 0)[:, None])
            logits = S.process_logits_turbo(s.logits, pen, sp, top_k)
        all_filtered = jnp.all(logits <= S.NEG_INF, axis=-1)
        token = jax.vmap(S.sample_categorical)(subs, logits).astype(jnp.int32)
        token = jnp.where(all_filtered | ~running, hp.stop_speech_token, token)

        wpos = jnp.clip(s.step, 0, cap - 1)
        tokens = s.tokens.at[jnp.arange(Sn), wpos].set(
            jnp.where(running, token, s.tokens[jnp.arange(Sn), wpos]))
        seen = s.seen.at[jnp.arange(Sn), token].set(
            running | s.seen[jnp.arange(Sn), token])
        step = jnp.where(running, s.step + 1, s.step)
        done = s.done | (running & ((token == hp.stop_speech_token)
                                    | (step >= s.max_new)))

        # cfg: both physical rows of a pair consume the same sampled token
        emb = t3m.speech_embed_token(params, hp, tile2(token), tile2(step))
        pos = s.prefix_lens + s.step                          # (S,) per-row
        pos_p = tile2(pos)                                    # (Sp,)
        k_pos = jnp.arange(t_max)[None, :]
        kv_mask = (k_pos <= pos_p[:, None])[:, None, None]    # (Sp,1,1,T)
        # keys_next for finished rows keep advancing — harmless, and keeps
        # the loop state shape fixed
        hidden, cache = bb.backbone_apply_unrolled(
            params["backbone"], cfg, emb, pos_p[:, None], s.cache,
            pos_p, kv_mask, fused_attn=fused_attn)
        logits_new = t3m.speech_logits(params, hidden[:, 0]).astype(jnp.float32)
        logits_new = jnp.where(tile2(running)[:, None], logits_new, s.logits)
        st = s._replace(cache=cache, logits=logits_new, seen=seen, step=step,
                        done=done, keys=keys_next, tokens=tokens)
        return _C(c.i + 1, st)

    f = jax.lax.while_loop(cond_fn, body_fn, _C(jnp.zeros((), jnp.int32), state))
    return f.st


@functools.partial(jax.jit,
                   static_argnames=("hp", "n_rounds", "n_draft", "top_k"),
                   donate_argnames=("state",))
def decode_chunk_multi_spec(params: dict, qparams: dict, hp: T3Config,
                            state: SlotStates, *, n_rounds: int,
                            n_draft: int = 8,
                            top_k: int = 1000) -> SlotStates:
    """Speculative decode rounds over the slot machine: the model's OWN
    int8-quantized weights (`qparams`) draft K tokens per running row, then
    ONE bf16 target forward over the (K+1)-token slab verifies them —
    emitting 1..K+1 tokens per round for ~1 target weight-read (the decode
    is weight-bound, so a K+1-token slab costs about one step — DESIGN.md).

    TOKEN content is the sequential `decode_chunk_multi` Turbo chain's,
    reproduced exactly rather than approximated: the emitted token at step t
    is sample(sub_t, process(P_t)) where sub_t is the t-th split of the
    row's admit key (the same chain sequential consumes, advanced here by
    n_emit per round) and P_t the bf16 target logits given the true emitted
    history. Drafts only GUESS that sample: position j's proposal d_j is
    accepted iff it equals the target's own sample y_j from the verify
    logits — a mismatch still emits y_j (computed from a valid prefix), so
    every round emits >= 1 correct token and rejected work is never
    resampled. Unlike ratio-based speculative sampling (sampling/
    speculative.py, the single-stream `generate(draft="int8")` path) this
    is deterministic given the key chain, so draft-on serving stays
    byte-identical to draft-off (tested) and the engine's batchmate-
    invariance carries over unchanged.

    The draft shares the slot KV cache: its int8-computed K/V land at the
    slab's positions and the verify pass overwrites them with the target's
    bf16 K/V before attending (per-layer write-then-attend ordering), so no
    second per-slot cache exists. The row's last emitted token is re-fed as
    slab position 0 each round (recoverable from `tokens`; BOS at step 0
    re-feeds its prefill position with identical KV — same trick as
    speculative.py), which keeps SlotStates' shape unchanged; only `logits`
    goes stale, and nothing reads it in spec mode (admit/pack_status/
    harvest are logits-free). Requires the bf16 cache (no kv_int8) and the
    Turbo chain (cfg_mode=False); the host must size the cache for
    prefix + step + K extra positions (ContinuousTTSServer handles both).
    """
    cfg = hp.backbone
    Sn = state.seen.shape[0]
    V = hp.speech_tokens_dict_size
    K = n_draft
    stop = hp.stop_speech_token
    t_max = state.cache[0].shape[3]
    cap = state.tokens.shape[1]
    rows = jnp.arange(Sn)
    start_onehot = jax.nn.one_hot(hp.start_speech_token, V, dtype=jnp.bool_)
    sp = S.SamplerParams(
        temperature=state.temperature[:, None],
        top_p=state.top_p[:, None],
        min_p=state.min_p[:, None],
        repetition_penalty=state.repetition_penalty[:, None],
        cfg_weight=state.cfg_weight[:, None],
    )
    sp3 = jax.tree.map(lambda a: a[:, None], sp)    # (S,1,1): per-position

    class _C(NamedTuple):
        i: jnp.ndarray
        st: SlotStates

    def cond_fn(c):
        return (c.i < n_rounds) & jnp.any(c.st.active & ~c.st.done)

    def body_fn(c):
        s = c.st
        running = s.active & ~s.done

        # per-row key chain: sub_j samples token step+j; after emitting
        # n_emit tokens the chain state is chain[n_emit-1] — exactly the
        # splits sequential decode would have consumed (split(k)[0] chains,
        # split(k)[1] samples, one per emitted token)
        def _split_chain(k, _):
            pair = jax.random.split(k, 2)
            return pair[0], (pair[0], pair[1])
        def _row_chain(k0):
            _, (chain, subs) = jax.lax.scan(_split_chain, k0, None,
                                            length=K + 1)
            return chain, subs
        chain, subs = jax.vmap(_row_chain)(s.keys)   # (S,K+1) keys each

        # slab position 0 re-feeds the row's pending token (last emitted;
        # BOS at step 0, whose KV/logits the re-feed reproduces)
        prev = s.tokens[rows, jnp.clip(s.step - 1, 0, cap - 1)]
        f_tok = jnp.where(s.step == 0, hp.start_speech_token, prev)
        pos0 = s.prefix_lens + s.step - 1               # (S,) slab base pos
        k_pos = jnp.arange(t_max)[None, :]

        # ---- draft: K single-token int8 steps ----------------------------
        def draft_step(carry, j):
            cache, tok, seen_loc = carry
            emb = t3m.speech_embed_token(qparams, hp, tok, s.step + j)
            pos = pos0 + j
            mask = (k_pos <= pos[:, None])[:, None, None]
            hidden, cache = bb.backbone_apply_unrolled(
                qparams["backbone"], cfg, emb, pos[:, None], cache,
                pos, mask)
            q_log = t3m.speech_logits(
                qparams, hidden[:, 0]).astype(jnp.float32)
            pen = seen_loc | (start_onehot[None] & ((s.step + j) == 0)[:, None])
            q_proc = S.process_logits_turbo(q_log, pen, sp, top_k)
            q_filtered = jnp.all(q_proc <= S.NEG_INF, axis=-1)
            d = jax.vmap(S.sample_categorical)(subs[:, j], q_proc)
            d = jnp.where(q_filtered, stop, d).astype(jnp.int32)
            seen_next = seen_loc.at[rows, d].set(True)
            return (cache, d, seen_next), (d, pen)

        (cache_d, _, seen_last), (d_all, pens) = jax.lax.scan(
            draft_step, (s.cache, f_tok, s.seen),
            jnp.arange(K, dtype=jnp.int32))
        d_all = jnp.swapaxes(d_all, 0, 1)               # (S, K)
        # pens rows 0..K-1 are positions 0..K-1; position K (bonus) sees
        # seen ∪ {d_0..d_{K-1}}
        pens = jnp.concatenate(
            [jnp.swapaxes(pens, 0, 1), seen_last[:, None]], 1)  # (S,K+1,V)

        # ---- verify: ONE bf16 forward over [f, d_0..d_{K-1}] -------------
        slab = jnp.concatenate([f_tok[:, None], d_all], axis=1)  # (S,K+1)
        emb = nn_embed_slab(params, hp, slab, s.step)
        pos_q = pos0[:, None] + jnp.arange(K + 1)[None]          # (S,K+1)
        mask = (k_pos[None] <= pos_q[:, :, None])[:, None]       # (S,1,K+1,T)
        hidden, cache_t = bb.backbone_apply_unrolled(
            params["backbone"], cfg, emb, pos_q, cache_d, pos0, mask)
        p_log = t3m.speech_logits(params, hidden).astype(jnp.float32)
        p_proc = S.process_logits_turbo(p_log, pens, sp3, top_k)  # (S,K+1,V)
        p_filtered = jnp.all(p_proc <= S.NEG_INF, axis=-1)        # (S,K+1)
        y = jax.vmap(S.sample_categorical)(
            subs.reshape(Sn * (K + 1)), p_proc.reshape(-1, V),
        ).reshape(Sn, K + 1)
        # the all-(-inf) guard, exactly as sequential applies it
        y = jnp.where(p_filtered, stop, y).astype(jnp.int32)

        # ---- accept by token match, truncate at EOS/max_new --------------
        m = y[:, :K] == d_all                            # (S, K)
        n_match = jnp.where(jnp.all(m, axis=1), K, jnp.argmin(m, axis=1))
        within = jnp.arange(K + 1)[None] <= n_match[:, None]
        is_stop = (y == stop) & within
        first_stop = jnp.argmax(is_stop, axis=1)
        n_s = jnp.where(jnp.any(is_stop, axis=1), first_stop + 1,
                        n_match + 1)
        rem = jnp.maximum(s.max_new - s.step, 1)
        n_emit = jnp.where(running, jnp.minimum(n_s, rem), 0)
        emitted = jnp.arange(K + 1)[None] < n_emit[:, None]      # (S,K+1)
        done_new = s.done | (running & (
            jnp.any(is_stop & emitted, axis=1)
            | (s.step + n_emit >= s.max_new)))

        tokens = s.tokens
        for j in range(K + 1):
            wpos = jnp.clip(s.step + j, 0, cap - 1)
            tokens = tokens.at[rows, wpos].set(
                jnp.where(emitted[:, j], y[:, j], tokens[rows, wpos]))
        seen = s.seen | jnp.any(
            jax.nn.one_hot(y, V, dtype=jnp.bool_) & emitted[:, :, None], 1)
        # [unchanged | chain...] indexed by n_emit: running rows advance by
        # their emitted count, idle/done rows keep their key state
        stacked = jnp.concatenate([s.keys[:, None], chain], axis=1)
        keys_next = stacked[rows, n_emit]
        st = s._replace(cache=cache_t, seen=seen,
                        step=s.step + n_emit, done=done_new,
                        keys=keys_next, tokens=tokens)
        return _C(c.i + 1, st)

    f = jax.lax.while_loop(cond_fn, body_fn,
                           _C(jnp.zeros((), jnp.int32), state))
    return f.st


def nn_embed_slab(params: dict, hp: T3Config, slab: jnp.ndarray,
                  step: jnp.ndarray) -> jnp.ndarray:
    """Embed a (S, s) slab of speech tokens whose row-r position-j speech
    index is step[r]+j (the sequential loop embeds token t at index t+1;
    slab position j holds token step-1+j)."""
    emb = nn.embedding(params["speech_emb"], slab)           # (S, s, D)
    if hp.input_pos_emb == "learned":
        idx = step[:, None] + jnp.arange(slab.shape[1])[None]
        emb = emb + jnp.take(params["speech_pos_emb"]["w"], idx, axis=0)
    return emb.astype(params["speech_emb"]["w"].dtype)


@jax.jit
def pack_status(state: SlotStates) -> jnp.ndarray:
    """Everything the host scheduler needs, as ONE int32 array so one fetch
    (= one relay round-trip) per round covers harvesting:
    [done(S) | active(S) | step(S) | tokens(S*cap)]."""
    i32 = lambda a: a.astype(jnp.int32)
    return jnp.concatenate([i32(state.done), i32(state.active),
                            i32(state.step), state.tokens.reshape(-1)])


@functools.partial(jax.jit, static_argnames=("new_t_cap",))
def grow_slot_cache(state: SlotStates, *, new_t_cap: int) -> SlotStates:
    """Pad the slot cache's time axis (bucketed growth; rows are
    left-aligned so existing K/V stay valid). Works for both KVCache and
    KVCacheInt8; int8 caps are tile-aligned up so the pallas kernel keeps
    engaging after growth."""
    if isinstance(state.cache, bb.KVCacheInt8):
        from ..ops.pallas_attention import TT
        new_t_cap = ((new_t_cap + TT - 1) // TT) * TT
    pad = new_t_cap - state.cache[0].shape[3]
    assert pad >= 0
    grown = type(state.cache)(*[
        jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
        for f in state.cache])
    return state._replace(cache=grown)


class _SlotStream:
    """Per-slot streaming state: a StreamingVocoder fed at fixed token-count
    boundaries. The feed schedule is a pure function of the row's token
    stream (first feed at `first_chunk` VALID tokens, then every
    `stream_chunk`; final feed = remainder + 3 silence tokens for Turbo,
    remainder alone for the CFG family), so a request's chunk byte-stream
    is identical whether it runs solo or beside concurrent streams (rows
    are already batchmate-invariant — test_continuous.py)."""

    __slots__ = ("voc", "cb", "fed_raw", "buf", "next_feed", "n_valid",
                 "first_fed")

    def __init__(self, voc, cb, first_chunk: int):
        self.voc = voc
        self.cb = cb              # cb(chunk: np.ndarray, final: bool)
        self.fed_raw = 0          # raw tokens consumed from the slot row
        self.buf = np.zeros((0,), np.int32)   # valid tokens awaiting a feed
        self.next_feed = first_chunk   # boundary for the NEXT feed
        self.n_valid = 0          # total valid tokens seen (empty-stream edge)
        self.first_fed = False    # first audio delivered (TTFA phase over)


class ContinuousTTSServer:
    """Host-side serving loop over the slot machine: submit anytime; requests
    join at the next chunk boundary and are harvested the moment their row
    finishes — no batch drain.

    Streaming requests (`submit(req, on_chunk=...)`) additionally get their
    audio pushed chunk-by-chunk WHILE their slot decodes: each round's status
    snapshot already carries every row's tokens (pack_status), so newly
    decoded tokens feed a per-request StreamingVocoder with no extra decode
    sync. N streaming clients share one batched decode instead of
    serializing the device (the reference serves one request at a time,
    total — ref: gradio_tts_app.py:90-93)."""

    def __init__(self, t3_params, hp: T3Config, n_slots: int = 8,
                 text_bucket: int = 64, max_new_tokens: int = 1000,
                 chunk: int = 16, top_k: int = 1000, seed: int = 0,
                 s3gen=None, cfg: bool = False, kv_int8: bool = False,
                 stream_chunk: int = 25, first_chunk: Optional[int] = None,
                 draft_int8: bool = False, n_draft: int = 8):
        """cfg=True serves the 520M/MTL CFG family: each request occupies a
        cond/uncond physical row pair; text_tokens must arrive SOT/EOT-framed
        (the CFG pipelines' framing); per-request min_p/cfg_weight honored.

        stream_chunk: token granularity of streaming feeds (25 tokens = 1 s
        of audio, matching the pipelines' generate_stream default).

        first_chunk: token boundary of a stream's FIRST feed (default:
        stream_chunk). A smaller first chunk (e.g. 12 ≈ 0.5 s of audio)
        cuts concurrent-stream TTFA two ways: the first feed needs fewer
        decoded tokens, and decode rounds shorten to first_chunk steps
        while any stream is still waiting for its first audio (first-feed
        prioritization in _dispatch_round). The feed schedule stays a pure
        function of the row's token stream — first feed at first_chunk
        valid tokens, then every stream_chunk — so chunk byte-streams
        remain batchmate-invariant."""
        self.t3_params = t3_params
        self.hp = hp
        self.n_slots = n_slots
        self.text_bucket = text_bucket
        self.max_new_tokens = max_new_tokens
        self.chunk = chunk
        self.top_k = top_k
        self.s3gen = s3gen
        self.cfg = cfg
        self.stream_chunk = stream_chunk
        self.first_chunk = first_chunk or stream_chunk
        from ..models.s3gen.flow import PRE_LOOKAHEAD_LEN
        # a first feed at or under the vocoder lookahead yields NO audio —
        # it would push first-audio PAST the plain schedule, not ahead of it
        assert PRE_LOOKAHEAD_LEN < self.first_chunk <= stream_chunk, \
            (self.first_chunk, stream_chunk)
        # opt-in int8 slot cache: decode rounds read it with the pallas
        # streamed-int8 kernel (quality A/B: tools/ab_int8.py)
        self.kv_int8 = kv_int8
        # opt-in speculation (decode_chunk_multi_spec): the model's own
        # int8 weights draft n_draft tokens/row/round, one bf16 verify
        # emits them — token streams stay byte-identical to draft-off.
        # Pays at LOW occupancy (per-stream latency); a full batch already
        # amortizes the weight reads speculation saves.
        self.draft = draft_int8
        self.n_draft = n_draft
        self._qparams = None
        if draft_int8:
            assert not cfg, "speculation covers the Turbo chain only"
            assert not kv_int8, \
                "speculation verifies into the bf16 slot cache"
            assert "w_q" not in str(
                jax.tree_util.tree_structure(t3_params)), \
                "draft_int8 needs the float model as the verify target"
            from ..utils.quantize import (best_serving_mode,
                                          quantize_t3_backbone)
            self._qparams = quantize_t3_backbone(
                t3_params, mode=best_serving_mode(hp.backbone))
        # bucketed cache: start at one chunk's worth of headroom and grow as
        # the furthest slot advances (host-side upper bounds, no extra syncs)
        Lc = t3m.cond_len(hp)
        self._cap_base = Lc + text_bucket + (2 if cfg else 1)
        # spec rounds write a K+1 slab whose tail can overhang the last
        # emitted token by K positions (rejected drafts) — size for it
        self._t_full = (self._cap_base + max_new_tokens
                        + (n_draft + 1 if draft_int8 else 0))
        self._t_cap = min(self._t_full,
                          self._cap_base + max(4 * chunk, 16))
        self.state = init_slots(hp, n_slots, text_bucket, max_new_tokens,
                                t_cap=self._t_cap, cfg=cfg,
                                kv_int8=kv_int8)
        self._slot_bound: list = [0] * n_slots   # host upper bound on
                                                 # prefix_len + step per slot
        self._fresh: set = set()   # slots admitted AFTER the lagged status
                                   # snapshot was captured (see serve_round)
        self._key = jax.random.key(seed)
        self._pending: list = []            # (request, on_chunk) FIFO
        self._slot_req: list = [None] * n_slots
        self._slot_stream: list = [None] * n_slots   # _SlotStream | None
        self.results: dict = {}             # request_id -> np token array
        self.wavs: dict = {}                # request_id -> waveform (if vocoding)
        self._voc_pending = None            # (request_ids, dispatch handle)
        self._await_wav: set = set()        # rids harvested but wav in flight
        self._lagged = None                 # serve_round's deferred status

    # ------------------------------------------------------------------
    def submit(self, req, on_chunk=None) -> None:
        """req: serve.batching.TTSRequest (turbo framing).

        on_chunk (optional): makes this a STREAMING request — a callable
        (chunk: float32 np.ndarray, final: bool) invoked from the serving
        loop as the request's audio is synthesized; chunks arrive every
        `stream_chunk` decoded tokens (~1 s of audio each at the default;
        the first after `first_chunk`). The final call carries final=True
        (its chunk may be empty). Requires an s3gen engine and a req.ref
        voice bundle. Works for BOTH families: the CFG family streams with
        progressive first-EOS truncation — a token is final (and audible)
        the moment it exists, since the decode row stops at its first EOS
        and the <6561 filter drops specials (incl. a stray SOS token
        itself). This matches the reference's slice-at-SOS/EOS tail
        (ref: models/s3tokenizer/__init__.py:11-30) on every stream a real
        checkpoint produces; the one divergence is a mid-stream SOS (random-
        weight territory), where the sliced tail would retroactively drop
        the tokens BEFORE the SOS — audio already streamed cannot be
        retracted, so streaming keeps them. Streaming requests' harvested
        token results use the same progressive semantics (self-consistent
        with their audio)."""
        if on_chunk is not None:
            if self.s3gen is None:
                raise ValueError("streaming requests need an s3gen engine")
            if getattr(req, "ref", None) is None:
                raise ValueError("streaming requests need req.ref "
                                 "(the voice's S3Gen RefDict)")
        self._pending.append((req, on_chunk))

    def _admit_pending(self):
        for slot in range(self.n_slots):
            if not self._pending:
                break
            if self._slot_req[slot] is not None:
                continue
            req, on_chunk = self._pending.pop(0)
            ids = np.asarray(req.text_tokens).reshape(-1)[: self.text_bucket]
            text = np.zeros((1, self.text_bucket), np.int32)
            text[0, : len(ids)] = ids
            self._key, k = jax.random.split(self._key)
            key = jax.random.key(req.seed) if req.seed is not None else k
            spr = req.sampler
            # family defaults match the pipelines' generate() signatures
            # (api/pipelines.py: CFG top_p=1.0/min_p=.05/w=.5; Turbo .95/0/0)
            top_p, min_p, cfg_w = ((1.0, 0.05, 0.5) if self.cfg
                                   else (0.95, 0.0, 0.0))
            self.state = admit(
                self.t3_params, self.hp, self.state, jnp.asarray(slot),
                req.cond.as_arrays() if hasattr(req.cond, "as_arrays")
                else req.cond,
                jnp.asarray(text), jnp.asarray(len(ids), jnp.int32), key,
                jnp.asarray(self.max_new_tokens, jnp.int32)
                if getattr(req, "max_new", None) is None
                else jnp.asarray(req.max_new, jnp.int32),
                jnp.asarray(float(spr.temperature) if spr else 0.8),
                jnp.asarray(float(spr.top_p) if spr else top_p),
                jnp.asarray(float(spr.repetition_penalty) if spr else 1.2),
                min_p=jnp.asarray(float(spr.min_p) if spr else min_p),
                cfg_weight=jnp.asarray(float(spr.cfg_weight) if spr else cfg_w),
                cfg_mode=self.cfg,
            )
            self._slot_req[slot] = req
            self._fresh.add(slot)
            self._slot_bound[slot] = (t3m.cond_len(self.hp) + len(ids)
                                      + (2 if self.cfg else 1))
            if on_chunk is not None:
                from ..serve.streaming import StreamingVocoder
                # seed-derived vocoder key: the stream's audio is a pure
                # function of the request (same derivation as the batched
                # vocode path), independent of batchmates
                if req.seed is not None:
                    vk = jax.random.fold_in(jax.random.key(req.seed), 1)
                else:
                    self._key, vk = jax.random.split(self._key)
                self._slot_stream[slot] = _SlotStream(
                    StreamingVocoder(self.s3gen, req.ref, vk), on_chunk,
                    self.first_chunk)

    def _flush_vocode(self):
        """Fetch the previous round's batched vocode (its compute overlapped
        this round's decode chunk on the device)."""
        if self._voc_pending is None:
            return
        rids, handle = self._voc_pending
        self._voc_pending = None
        for rid, w in zip(rids, self.s3gen.inference_batch_fetch(handle)):
            self.wavs[rid] = w

    def _pop_blocks(self, st: _SlotStream):
        """Whole feed blocks currently buffered (first_chunk, then
        stream_chunk boundaries)."""
        blocks = []
        while len(st.buf) >= st.next_feed:
            blocks.append(st.buf[: st.next_feed])
            st.buf = st.buf[st.next_feed:]
            st.next_feed = self.stream_chunk
        return blocks

    def _stream_feed(self, done, steps, tokens, skip=()):
        """Advance every in-flight stream: pull the slot's newly decoded
        tokens out of this round's status snapshot (already fetched — no
        extra sync) and collect the due feed blocks. Blocks of a DONE row
        are collected by _finish_feeds in the same harvest, so the feed
        schedule — hence the chunk byte-stream — is a pure function of the
        row's token stream. Returns (st, block, final) feed tuples for
        _run_feeds (nothing is dispatched here)."""
        feeds = []
        for i in range(self.n_slots):
            st = self._slot_stream[i]
            if st is None or self._slot_req[i] is None or i in skip:
                continue
            avail = int(steps[i])
            if avail > st.fed_raw:
                raw = tokens[i, st.fed_raw: avail]
                st.fed_raw = avail
                valid = raw[raw < 6561].astype(np.int32)
                st.n_valid += len(valid)
                st.buf = np.concatenate([st.buf, valid])
            if done[i]:
                continue
            feeds += [(st, blk, False) for blk in self._pop_blocks(st)]
        return feeds

    def _finish_feeds(self, st: _SlotStream):
        """Feed tuples that retire a finished stream: drain whole chunks,
        then the final feed — remainder + 3 silence tokens for Turbo
        (ref: tts_turbo.py:308-311); for the CFG family the remainder alone
        (the reference appends no silence, ref: tts.py:260-264), with the
        engine's one-silence-token fallback when the whole stream produced
        nothing (models/s3gen/model.py _pack_from_decode)."""
        from ..models.s3gen.model import SIL_TOKEN
        feeds = [(st, blk, False) for blk in self._pop_blocks(st)]
        if self.cfg:
            tail = (st.buf if st.n_valid
                    else np.full(1, SIL_TOKEN, np.int32))
        else:
            tail = np.concatenate([st.buf, np.full(3, SIL_TOKEN, np.int32)])
        feeds.append((st, tail, True))
        return feeds

    def _run_feeds(self, feeds):
        """Two-phase feed execution: dispatch every block's vocode program
        back-to-back (per-stream order preserved — a stream's blocks stay
        consecutive), then fetch. Steady state fetches all audio in ONE
        gather (N concurrent streams' feeds cost max(compute) + one
        round-trip instead of N sequential dispatch+fetch round-trips).
        While any stream in the batch is still waiting for its FIRST audio,
        fetches stagger per-feed instead: each callback fires as soon as
        its own vocode lands rather than after the whole batch — an
        earlier-dispatched stream's TTFA stops paying for its batchmates'
        vocodes (the later fetch round-trips overlap the still-running
        feeds' device compute). Audio bit-identical either way: same
        programs, same inputs; only fetch timing differs."""
        if not feeds:
            return
        handles = [st.voc.feed_dispatch(blk, final=final)
                   for st, blk, final in feeds]
        stagger = any(not st.first_fed for st, _b, _f in feeds)

        def _deliver(st, final, audio):
            if len(audio) or final:
                if len(audio):
                    st.first_fed = True
                st.cb(audio, final)

        if stagger:
            for (st, _blk, final), h in zip(feeds, handles):
                _deliver(st, final, st.voc.feed_fetch(h))
            return
        # one gather for every device handle (None/host handles pass through)
        devs = [h[0] for h in handles if isinstance(h, tuple)]
        fetched = iter(jax.device_get(devs))
        for (st, _blk, final), h in zip(feeds, handles):
            if isinstance(h, tuple):
                audio = st.voc.feed_fetch((np.asarray(next(fetched)), h[1]))
            else:
                audio = st.voc.feed_fetch(h)
            _deliver(st, final, audio)

    def _harvest(self, status: np.ndarray = None, skip=()):
        """Retire finished rows. `status` is a pack_status snapshot (possibly
        one round stale — done rows' step/tokens no longer change, so a lagged
        snapshot harvests identically); without one, fetch fresh.

        skip: slots admitted AFTER the snapshot was captured — the snapshot
        still carries the slot's PREVIOUS occupant (its done flag and token
        row), so acting on it would retire/stream-feed the new request with
        the old request's tokens. serve_round passes the fresh-admit set."""
        if status is None:
            status = np.asarray(pack_status(self.state))
        Sn = self.n_slots
        done = status[:Sn].astype(bool)
        active = status[Sn: 2 * Sn].astype(bool)
        steps = status[2 * Sn: 3 * Sn]
        tokens = status[3 * Sn:].reshape(Sn, -1)
        finished = [i for i in range(self.n_slots)
                    if active[i] and done[i] and i not in skip
                    and self._slot_req[i] is not None]
        self._flush_vocode()
        feeds = self._stream_feed(done, steps, tokens, skip=skip)
        if not finished:
            self._run_feeds(feeds)
            return []
        out, voc_rows, voc_refs, voc_keys, voc_rids = [], [], [], [], []
        for i in finished:
            req = self._slot_req[i]
            t = tokens[i, : steps[i]]
            st = self._slot_stream[i]
            if self.cfg and st is None:
                # CFG family slices between SOS/EOS (ref: tts.py:260);
                # STREAMING requests instead use the progressive semantics
                # their audio was produced with (see submit)
                from ..api.pipelines import drop_invalid_tokens_sliced
                t = drop_invalid_tokens_sliced(t)
            t = t[t < 6561]                       # strip EOS/specials
            self.results[req.request_id] = t
            if st is not None:
                feeds += self._finish_feeds(st)
                self._slot_stream[i] = None
            elif self.s3gen is not None and getattr(req, "ref", None) is not None:
                voc_rows.append(t if len(t) else np.zeros((1,), np.int32))
                voc_refs.append(req.ref)
                self._key, k = jax.random.split(self._key)
                voc_keys.append(
                    jax.random.fold_in(jax.random.key(req.seed), 1)
                    if getattr(req, "seed", None) is not None else k)
                voc_rids.append(req.request_id)
            out.append(req.request_id)
            self._slot_req[i] = None
            self._slot_bound[i] = 0
        self.state = self.state._replace(
            active=self.state.active.at[np.asarray(finished)].set(False))
        if voc_rows:
            # ONE batched dispatch for every request finishing this round;
            # the fetch is deferred so the next decode chunk isn't stalled
            handle = self.s3gen.inference_batch_dispatch(
                voc_rows, voc_refs, jnp.stack(voc_keys))
            self._voc_pending = (voc_rids, handle)
            self._await_wav.update(voc_rids)
        # feeds run AFTER the batched vocode dispatch: their gather fetch
        # overlaps its device compute
        self._run_feeds(feeds)
        return out

    def _dispatch_round(self) -> bool:
        """Admit pending requests and dispatch one decode chunk (async).
        Returns False when no slot is occupied (nothing dispatched).

        First-feed prioritization: while any stream is still waiting for its
        first audio, rounds shorten to `first_chunk` steps so its first feed
        boundary is reached in one round instead of stalling behind a full
        `chunk`-step bulk round. Round length never changes token CONTENT
        (rows advance step-wise with per-row RNG chains), only when the host
        observes it — feed schedules stay pure functions of the stream."""
        self._admit_pending()
        if not any(r is not None for r in self._slot_req):
            return False
        n_steps = self.chunk
        if self.first_chunk < self.chunk and any(
                st is not None and st.fed_raw < self.first_chunk
                for st in self._slot_stream):
            n_steps = self.first_chunk
        # spec rounds emit up to K+1 tokens each; match the round's token
        # budget. The slab's K-position overhang past the last emitted token
        # is transient (rewritten next dispatch), so it enters `needed` but
        # not the cumulative per-slot bound.
        K1 = self.n_draft + 1
        n_rounds = -(-n_steps // K1) if self.draft else 0
        adv = n_rounds * K1 if self.draft else n_steps
        over = self.n_draft if self.draft else 0
        # bucketed growth: ensure the cache covers every slot's next chunk.
        # Clamp to the full capacity: a finished-but-unharvested slot's bound
        # keeps advancing for one lagged round and may exceed it (rows never
        # write past t_full — done rows don't advance).
        needed = min(max(b for b in self._slot_bound) + adv + over,
                     self._t_full)
        if needed > self._t_cap:
            new_cap = self._t_cap
            while new_cap < needed:
                new_cap = min(self._t_full,
                              self._cap_base
                              + 2 * (new_cap - self._cap_base))
            self.state = grow_slot_cache(self.state, new_t_cap=new_cap)
            self._t_cap = new_cap
        if self.draft:
            self.state = decode_chunk_multi_spec(
                self.t3_params, self._qparams, self.hp, self.state,
                n_rounds=n_rounds, n_draft=self.n_draft, top_k=self.top_k)
        else:
            self.state = decode_chunk_multi(
                self.t3_params, self.hp, self.state, n_steps=n_steps,
                top_k=self.top_k, cfg_mode=self.cfg)
        for i in range(self.n_slots):         # advance host upper bounds
            if self._slot_req[i] is not None:
                self._slot_bound[i] += adv
        return True

    def step(self) -> list:
        """One scheduling round: admit pending → decode a chunk → harvest.
        Returns the request_ids completed this round."""
        if not self._dispatch_round():
            return []
        out = self._harvest()      # fresh snapshot (fetched post-admit)
        self._fresh.clear()
        return out

    def serve_round(self) -> bool:
        """One overlapped scheduling round for an external driver (the
        threaded ContinuousServingLoop): dispatch a decode chunk (admitting
        pending requests first), then harvest the PREVIOUS round from its
        lagged status snapshot — the status fetch (one relay round-trip)
        rides this round's device compute instead of serializing with it.
        Done rows' step/tokens are frozen, so harvesting from a one-round-
        stale snapshot yields identical results; the only cost is that a
        finished slot is re-admitted one round later.

        Returns True while work is in flight; on False the server is idle
        and every result (and wav, when vocoding in-loop) is materialized."""
        status = pack_status(self.state) if self._dispatch_round() else None
        if self._lagged is not None:
            # skip slots whose occupant was admitted after the lagged
            # snapshot: the snapshot still shows the slot's PREVIOUS
            # occupant, and harvesting it would hand the new request the
            # old one's tokens (hit when a slot is reused back-to-back)
            self._harvest(np.asarray(self._lagged), skip=self._fresh)
        self._lagged = status       # captured post-admit: covers everyone
        self._fresh = set()
        idle = (status is None and not self._pending
                and all(r is None for r in self._slot_req))
        if idle:
            self.flush_vocode()
        return not idle

    def run_until_idle(self, max_rounds: int = 10_000) -> dict:
        """Drive serve_round until every submitted request has completed."""
        for _ in range(max_rounds):
            if not self.serve_round():
                break
        self.flush_vocode()     # no-op unless max_rounds cut the loop short
        return self.results

    def flush_vocode(self) -> None:
        """Fetch any deferred vocode batch (serve_round does this itself on
        the round the server goes idle)."""
        if self.s3gen is not None:
            self._flush_vocode()

    def pop_ready(self) -> list:
        """Pop finished requests whose outputs are fully materialized, as
        (request_id, tokens, wav_or_None) triples. Requests vocoded in-loop
        become ready one round after their tokens (the deferred wav fetch);
        token-only requests are ready at harvest."""
        out = []
        for rid in list(self.results):
            if rid in self._await_wav and rid not in self.wavs:
                continue
            out.append((rid, self.results.pop(rid),
                        self.wavs.pop(rid, None)))
            self._await_wav.discard(rid)
        return out

    # ------------------------------------------------------------------
    def warmup(self, cond, ref=None, *, max_gen: Optional[int] = None,
               min_gen: int = 1, batch_sizes=None) -> None:
        """Compile every device program real traffic can reach, up front.

        The serving loop's compile surface is: `admit`, `decode_chunk_multi`
        and `pack_status` at EVERY bucketed cache capacity on the doubling
        growth schedule (grow_slot_cache), plus — when vocoding in-loop —
        the batched vocode grid (S3GenEngine.warmup_grid). Instead of
        decoding max_gen real tokens to trigger the growths, this walks the
        schedule directly: one admit + one chunk + one status fetch per
        capacity. Content is synthetic (`cond` supplies real shapes; `ref`
        the voice bundle for the vocode grid) and all state is re-initialised
        afterwards, leaving the server pristine. With the persistent compile
        cache the cost is one-time per image.

        max_gen: generation-length envelope to warm for (default: the
        server's max_new_tokens); min_gen: known workload floor — skips
        vocode bucket combos only shorter generations can reach.
        batch_sizes: vocode batch buckets (default: powers of two up to
        n_slots)."""
        max_gen = max_gen or self.max_new_tokens
        # start from the canonical initial capacity so the walked schedule
        # is exactly the one _dispatch_round's doubling produces
        self._t_cap = min(self._t_full,
                          self._cap_base + max(4 * self.chunk, 16))
        self.state = init_slots(self.hp, self.n_slots, self.text_bucket,
                                self.max_new_tokens, t_cap=self._t_cap,
                                cfg=self.cfg, kv_int8=self.kv_int8)
        cond_arr = cond.as_arrays() if hasattr(cond, "as_arrays") else cond
        text = jnp.zeros((1, self.text_bucket), jnp.int32)
        args = (jnp.asarray(1, jnp.int32), jax.random.key(0),
                jnp.asarray(max_gen, jnp.int32), jnp.asarray(0.8),
                jnp.asarray(0.95), jnp.asarray(1.2))

        def _touch():
            self.state = admit(self.t3_params, self.hp, self.state,
                               jnp.asarray(0), cond_arr, text, *args,
                               min_p=jnp.asarray(0.05),
                               cfg_weight=jnp.asarray(0.5),
                               cfg_mode=self.cfg)
            if self.draft:
                K1 = self.n_draft + 1
                for n_steps in {self.chunk, self.first_chunk}:
                    self.state = decode_chunk_multi_spec(
                        self.t3_params, self._qparams, self.hp, self.state,
                        n_rounds=-(-n_steps // K1), n_draft=self.n_draft,
                        top_k=self.top_k)
            else:
                self.state = decode_chunk_multi(
                    self.t3_params, self.hp, self.state, n_steps=self.chunk,
                    top_k=self.top_k, cfg_mode=self.cfg)
                if self.first_chunk < self.chunk:
                    # the short first-feed-prioritization round program
                    self.state = decode_chunk_multi(
                        self.t3_params, self.hp, self.state,
                        n_steps=self.first_chunk, top_k=self.top_k,
                        cfg_mode=self.cfg)
            np.asarray(pack_status(self.state))

        _touch()
        # +2 chunks: one for the in-flight round, one for the lagged harvest
        cap_target = min(self._t_full,
                         self._cap_base + max_gen + 2 * self.chunk)
        while self._t_cap < cap_target:
            self._t_cap = min(self._t_full,
                              self._cap_base
                              + 2 * (self._t_cap - self._cap_base))
            self.state = grow_slot_cache(self.state, new_t_cap=self._t_cap)
            _touch()
        if self.s3gen is not None and ref is not None:
            if batch_sizes is None:
                # a harvest round can retire up to n_slots rows; the vocode
                # dispatch pow2-pads, so warm through next_pow2(n_slots)
                from ..serve.batching import pow2_sizes
                batch_sizes = pow2_sizes(self.n_slots)
            self.s3gen.warmup_grid(ref, max_gen=max_gen, min_gen=min_gen,
                                   batch_sizes=tuple(batch_sizes))
        # reset to a pristine idle server at the initial (small) capacity
        self._t_cap = min(self._t_full,
                          self._cap_base + max(4 * self.chunk, 16))
        self.state = init_slots(self.hp, self.n_slots, self.text_bucket,
                                self.max_new_tokens, t_cap=self._t_cap,
                                cfg=self.cfg, kv_int8=self.kv_int8)
        self._slot_req = [None] * self.n_slots
        self._slot_stream = [None] * self.n_slots
        self._slot_bound = [0] * self.n_slots
        self._fresh = set()
        self._pending.clear()
        self.results.clear()
        self.wavs.clear()
        self._voc_pending = None
        self._await_wav.clear()
        self._lagged = None
