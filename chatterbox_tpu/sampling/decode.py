"""T3 decode engine: prefill + token-at-a-time `lax.while_loop`, fully
on-device.

This replaces the reference's host-side python loop over HF model calls
(ref: models/t3/t3.py:325-390 for the CFG path, t3.py:392-468 for Turbo)
with a single jitted program:

  * the padded prefix [cond | text | BOS] is packed densely (BOS placed at a
    dynamic offset inside a bucketed buffer) so cache positions match the
    reference's unpadded sequence exactly;
  * the KV cache is preallocated at (prefix_bucket + max_new_tokens) and
    updated in place (XLA donation) — no per-step reallocation;
  * CFG runs as batch 2 in the same forward (cond row 0, uncond row 1 with
    zeroed text embeddings — ref: t3.py:113-114, 310);
  * sampling (rep-penalty / temperature / min-p / top-p / top-k +
    categorical) is on-device (ops/sampling.py), with the repetition history
    tracked in a vocab-sized "seen" buffer;
  * the loop exits early on EOS via the while-loop condition
    (ref EOS checks: t3.py:366-368, t3.py:459-460).
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


class GenResult(NamedTuple):
    tokens: jnp.ndarray    # (max_new_tokens,) int32, stop-token padded
    n_tokens: jnp.ndarray  # () int32 — number of generated tokens incl. EOS


@functools.partial(
    jax.jit,
    static_argnames=("hp", "max_new_tokens", "top_k", "cfg_mode", "cfg_batch2",
                     "ignore_eos", "fused_attn", "kv_int8"),
)
def t3_generate(params: dict, hp: T3Config, cond: t3m.T3CondArrays,
                text_tokens: jnp.ndarray, text_len: jnp.ndarray,
                sp: S.SamplerParams, key,
                *, max_new_tokens: int = 1000, top_k: int = 0,
                cfg_mode: bool = True, cfg_batch2: bool = True,
                ignore_eos: bool = False,
                fused_attn: bool | None = None,
                kv_int8: bool = False) -> GenResult:
    """Generate speech tokens for one utterance.

    Args:
      text_tokens: (1, Lt_bucket) int32, SOT/EOT framed, right-padded.
      text_len: () int32 — true length including SOT/EOT.
      cfg_mode: True → 520M CFG pipeline (rep→temp→min_p→top_p);
                False → Turbo pipeline (batch-1, temp→top_k→top_p→rep).
      cfg_batch2: with cfg_mode, run the cond+uncond batch-2 forward. The
                reference runs batch-1 when cfg_weight==0 (ref: tts.py:237-238)
                — pass False there to halve decode cost (the combine is the
                identity at w=0, so outputs match the batch-2 program).
    """
    cfg = hp.backbone
    Lc = t3m.cond_len(hp)
    Ltp = text_tokens.shape[1]
    B = 2 if (cfg_mode and cfg_batch2) else 1
    # the reference's shipped CFG loop feeds the speech BOS embed TWICE:
    # prepare_input_embeds already appends it (ref: t3.py:258-268) and the
    # loop concatenates bos_embed again (ref: t3.py:305-313), both at learned
    # speech pos 0 — the published checkpoints run with that prefix, so the
    # CFG-family prefix here is [cond | text | BOS | BOS]. Turbo feeds one
    # BOS (ref: t3.py:409-415).
    n_bos = 2 if cfg_mode else 1
    P_pad = Lc + Ltp + n_bos
    t_max = P_pad + max_new_tokens
    if fused_attn is None:
        # measured on v5e: XLA mha wins at every generation length (the
        # streamed kernel's per-tile compute eats its O(cur_len) DMA saving
        # — 857 vs 830 tok/s even at max_new=1000); keep it opt-in.
        fused_attn = False
    if fused_attn:
        from ..ops.pallas_attention import TT
        t_max = ((t_max + TT - 1) // TT) * TT     # tile-align the cache
    V = hp.speech_tokens_dict_size

    # ---- build the packed prefix -----------------------------------------
    ce = t3m.cond_embeds(params, hp, cond)                    # (1, Lc, D)
    ce = jnp.broadcast_to(ce, (B,) + ce.shape[1:])
    tokens_b = jnp.broadcast_to(text_tokens, (B, Ltp))
    te = jnp.take(params["text_emb"]["w"], tokens_b, axis=0)  # (B, Ltp, D)
    if cfg_mode and cfg_batch2:
        # uncond row: zero the text token embeddings (ref: t3.py:113-114)
        te = te * jnp.array([1.0, 0.0])[:, None, None]
    if hp.input_pos_emb == "learned":
        te = te + jnp.take(params["text_pos_emb"]["w"], jnp.arange(Ltp), axis=0)

    bos = t3m.speech_embed_token(
        params, hp, jnp.full((B,), hp.start_speech_token, jnp.int32),
        jnp.zeros((), jnp.int32))                             # (B, 1, D)
    bos = jnp.concatenate([bos] * n_bos, axis=1)              # (B, n_bos, D)

    dt = params["speech_emb"]["w"].dtype                      # compute dtype
    ce, te, bos = ce.astype(dt), te.astype(dt), bos.astype(dt)
    x = jnp.concatenate([ce, te, jnp.zeros_like(bos)], axis=1)  # (B, P_pad, D)
    x = jax.lax.dynamic_update_slice(x, bos, (0, Lc + text_len, 0))

    prefill_len = Lc + text_len + n_bos                        # dynamic scalar
    lens = jnp.full((B,), prefill_len, jnp.int32)

    # ---- prefill ----------------------------------------------------------
    # kv_int8: int8 cache halves decode-attention HBM reads; quality A/B is
    # one command — tools/ab_int8.py
    if kv_int8:
        cache_cls = bb.KVCacheInt8
    elif jax.default_backend() == "cpu":
        # per-layer cache tensors: XLA:CPU does not alias the stacked
        # cache's in-loop updates — each layer write copied the whole
        # (L,B,H,T,D) buffer (~40 ms/token at Nano size, profiled; see
        # bb.KVCacheLayers). Identical semantics, CPU-only trace branch.
        cache_cls = bb.KVCacheLayers
    else:
        cache_cls = bb.KVCache
    cache = cache_cls.zeros(cfg, B, t_max, dtype=jnp.bfloat16)
    mask = bb.prefill_mask(P_pad, t_max, lens)
    positions = jnp.tile(jnp.arange(P_pad)[None], (B, 1))
    hidden, cache = bb.backbone_apply_unrolled(
        params["backbone"], cfg, x, positions, cache,
        jnp.zeros((), jnp.int32), mask)
    last_h = jnp.take_along_axis(
        hidden, jnp.full((B, 1, 1), prefill_len - 1), axis=1)[:, 0]
    logits0 = t3m.speech_logits(params, last_h)                # (B, V)

    # ---- decode loop -------------------------------------------------------
    start_onehot = jax.nn.one_hot(hp.start_speech_token, V, dtype=jnp.bool_)
    seen0 = start_onehot if cfg_mode else jnp.zeros((V,), jnp.bool_)

    class _State(NamedTuple):
        step: jnp.ndarray
        logits: jnp.ndarray
        cache: bb.KVCache
        seen: jnp.ndarray
        tokens: jnp.ndarray
        done: jnp.ndarray
        key: jnp.ndarray

    init = _State(
        step=jnp.zeros((), jnp.int32),
        logits=logits0.astype(jnp.float32),
        cache=cache,
        seen=seen0,
        tokens=jnp.full((max_new_tokens,), hp.stop_speech_token, jnp.int32),
        done=jnp.zeros((), jnp.bool_),
        key=key,
    )

    def cond_fn(s: _State):
        return (s.step < max_new_tokens) & ~s.done

    def body_fn(s: _State):
        key, sub = jax.random.split(s.key)
        if cfg_mode:
            # without the uncond row the combine is the identity (w=0 path)
            uncond = s.logits[1] if cfg_batch2 else s.logits[0]
            logits = S.process_logits_cfg(s.logits[0], uncond, s.seen, sp)
        else:
            # turbo penalizes only the start token on step 0, then only
            # generated tokens (ref: t3.py:428, 448-449)
            pen_mask = s.seen | (start_onehot & (s.step == 0))
            logits = S.process_logits_turbo(s.logits[0], pen_mask, sp, top_k)
        # all-(-inf) guard (ref: t3.py:450-452): stop instead of sampling noise
        all_filtered = jnp.all(logits <= S.NEG_INF)
        token = S.sample_categorical(sub, logits).astype(jnp.int32)
        token = jnp.where(all_filtered, hp.stop_speech_token, token)

        tokens = s.tokens.at[s.step].set(token)
        seen = s.seen.at[token].set(True)
        if ignore_eos:  # benchmarking mode: always run max_new_tokens steps
            done = jnp.zeros((), jnp.bool_)
        else:
            done = token == hp.stop_speech_token

        emb = t3m.speech_embed_token(
            params, hp, jnp.full((B,), token, jnp.int32), s.step + 1)
        pos_now = prefill_len + s.step
        cur = jnp.full((B,), pos_now, jnp.int32)
        mask = bb.decode_mask(t_max, cur)
        hidden, cache = bb.backbone_apply_unrolled(params["backbone"],
                                                  cfg, emb, cur[:, None],
                                                  s.cache, pos_now, mask,
                                                  fused_attn=fused_attn)
        logits_new = t3m.speech_logits(params, hidden[:, 0]).astype(jnp.float32)
        return _State(s.step + 1, logits_new, cache, seen, tokens, done, key)

    final = jax.lax.while_loop(cond_fn, body_fn, init)
    return GenResult(tokens=final.tokens, n_tokens=final.step)


# text-length buckets: one compile per bucket (kept coarse to limit recompiles)
TEXT_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048)


def text_bucket(n: int) -> int:
    for b in TEXT_BUCKETS:
        if n <= b:
            return b
    return TEXT_BUCKETS[-1]
