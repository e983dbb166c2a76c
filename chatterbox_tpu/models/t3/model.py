"""T3: token-to-token TTS transformer (conditioning + embeddings + heads).

Reimplements the behavior of the reference T3 (ref: models/t3/t3.py:39-130,
models/t3/modules/cond_enc.py, models/t3/modules/perceiver.py,
models/t3/modules/learned_pos_emb.py) as pure functions over a param pytree.

The conditioning prefix is
    [speaker_emb (1 tok), cond_prompt_speech (perceiver→32 toks or raw
     150/375 toks), emotion_adv (1 tok)]
(ref: cond_enc.py:91-96). Sampling lives in sampling/decode.py.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...nn import core as nn
from .config import T3Config
from . import backbone as bb


class T3CondArrays(NamedTuple):
    """Device-array form of the reference's T3Cond dataclass
    (ref: cond_enc.py:11-38)."""
    speaker_emb: jnp.ndarray                    # (B, 256)
    cond_prompt_speech_tokens: Optional[jnp.ndarray]  # (B, plen) int or None
    emotion_adv: Optional[jnp.ndarray]          # (B, 1, 1) or None


# ---------------------------------------------------------------------------
# Perceiver resampler (520M models only; ref: perceiver.py:173-213)
# ---------------------------------------------------------------------------

def perceiver_init(key, dim: int = 1024, n_queries: int = 32, n_heads: int = 4) -> dict:
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    qv = math.sqrt(3.0) * math.sqrt(2.0 / (n_queries + n_queries))
    return {
        "query": jax.random.uniform(k0, (1, n_queries, dim), jnp.float32, -qv, qv),
        "norm": nn.layer_norm_init(dim),
        "to_q": nn.linear_init(k1, dim, dim),
        "to_k": nn.linear_init(k2, dim, dim),
        "to_v": nn.linear_init(k3, dim, dim),
        "proj_out": nn.linear_init(k4, dim, dim),
    }


def _perceiver_attn_block(p, x1, x2, n_heads: int = 4):
    """AttentionBlock2 (ref: perceiver.py:113-170): shared LayerNorm on both
    streams, separate q/k/v projections, SDPA, residual. The reference
    perceiver always uses 4 heads (ref: perceiver.py:175)."""
    x1n = nn.layer_norm(p["norm"], x1)
    x2n = nn.layer_norm(p["norm"], x2)
    q = nn.split_heads(nn.linear(p["to_q"], x1n), n_heads)
    k = nn.split_heads(nn.linear(p["to_k"], x2n), n_heads)
    v = nn.split_heads(nn.linear(p["to_v"], x2n), n_heads)
    h = nn.merge_heads(nn.mha(q, k, v))
    return x1 + nn.linear(p["proj_out"], h)


def perceiver_apply(p, h: jnp.ndarray) -> jnp.ndarray:
    """h: (B, T, D) speech-prompt embeds -> (B, 32, D) resampled
    (cross-attend then self-attend with the same block; ref: perceiver.py:200-212)."""
    query = jnp.broadcast_to(p["query"], (h.shape[0],) + p["query"].shape[1:])
    pre = _perceiver_attn_block(p, query, h)
    return _perceiver_attn_block(p, pre, pre)


# ---------------------------------------------------------------------------
# T3 parameters
# ---------------------------------------------------------------------------

def t3_init(key, hp: T3Config) -> dict:
    cfg = hp.backbone
    D = cfg.hidden_size
    # jnp.take's out-of-bounds mode fills NaN: a start/stop token outside
    # the embedding table silently NaN-poisons every prefill (found when a
    # tiny-test config shrank the dict below the special-token ids)
    assert max(hp.start_speech_token, hp.stop_speech_token) < \
        hp.speech_tokens_dict_size, (
        f"speech specials ({hp.start_speech_token}/{hp.stop_speech_token}) "
        f"outside the embedding table (dict {hp.speech_tokens_dict_size})")
    keys = jax.random.split(key, 12)
    params = {
        "backbone": bb.init_backbone(keys[0], cfg),
        "text_emb": nn.embedding_init(keys[1], hp.text_tokens_dict_size, D),
        "speech_emb": nn.embedding_init(keys[2], hp.speech_tokens_dict_size, D),
        "text_head": nn.linear_init(keys[3], D, hp.text_tokens_dict_size, bias=False),
        # speech head has a bias only for the gpt2 family (ref: t3.py:85)
        "speech_head": nn.linear_init(keys[4], D, hp.speech_tokens_dict_size,
                                      bias=cfg.is_gpt),
        "cond_enc": {
            "spkr_enc": nn.linear_init(keys[5], hp.speaker_embed_size, D),
        },
    }
    if hp.emotion_adv:
        params["cond_enc"]["emotion_adv_fc"] = nn.linear_init(keys[6], 1, D, bias=False)
    if hp.use_perceiver_resampler:
        params["cond_enc"]["perceiver"] = perceiver_init(keys[7], D)
    if hp.input_pos_emb == "learned":
        params["text_pos_emb"] = nn.embedding_init(keys[8], hp.max_text_tokens + 2, D)
        params["speech_pos_emb"] = nn.embedding_init(keys[9], hp.max_speech_tokens + 4, D)
    return params


def cond_len(hp: T3Config) -> int:
    """Static length of the conditioning prefix."""
    n = 1  # speaker
    if hp.speech_cond_prompt_len:
        n += 32 if hp.use_perceiver_resampler else hp.speech_cond_prompt_len
    if hp.emotion_adv:
        n += 1
    return n


def cond_embeds(params: dict, hp: T3Config, cond: T3CondArrays) -> jnp.ndarray:
    """Build the conditioning prefix (B, cond_len, D).
    (ref: t3.py:92-100 + cond_enc.py:64-97)"""
    ce = params["cond_enc"]
    spkr = nn.linear(ce["spkr_enc"], cond.speaker_emb.reshape(-1, hp.speaker_embed_size))
    parts = [spkr[:, None]]                       # (B, 1, D)
    if cond.cond_prompt_speech_tokens is not None:
        emb = nn.embedding(params["speech_emb"], cond.cond_prompt_speech_tokens)
        if hp.input_pos_emb == "learned":
            T = cond.cond_prompt_speech_tokens.shape[1]
            emb = emb + nn.embedding(params["speech_pos_emb"], jnp.arange(T))
        if hp.use_perceiver_resampler:
            emb = perceiver_apply(ce["perceiver"], emb)
        parts.append(emb)
    if hp.emotion_adv:
        emo = nn.linear(ce["emotion_adv_fc"], cond.emotion_adv.reshape(-1, 1, 1))
        parts.append(emo)
    return jnp.concatenate(parts, axis=1)


def text_embeds(params: dict, hp: T3Config, text_tokens: jnp.ndarray) -> jnp.ndarray:
    """(B, Lt) -> (B, Lt, D) with learned positional embedding if configured."""
    emb = nn.embedding(params["text_emb"], text_tokens)
    if hp.input_pos_emb == "learned":
        emb = emb + nn.embedding(params["text_pos_emb"], jnp.arange(text_tokens.shape[1]))
    return emb


def speech_embed_token(params: dict, hp: T3Config, token: jnp.ndarray,
                       speech_pos: jnp.ndarray) -> jnp.ndarray:
    """Embed one speech token (B,) at speech-stream position speech_pos (scalar)."""
    emb = nn.embedding(params["speech_emb"], token)          # (B, D)
    if hp.input_pos_emb == "learned":
        emb = emb + jnp.take(params["speech_pos_emb"]["w"], speech_pos, axis=0)
    return emb[:, None]                                      # (B, 1, D)


def speech_logits(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    return nn.linear(params["speech_head"], hidden)


def text_logits(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    return nn.linear(params["text_head"], hidden)


# ---------------------------------------------------------------------------
# Teacher-forced full-sequence forward (training path; ref: t3.py:132-223)
# ---------------------------------------------------------------------------

def t3_forward(params: dict, hp: T3Config, cond: T3CondArrays,
               text_tokens: jnp.ndarray, speech_tokens: jnp.ndarray,
               remat: bool = False):
    """Dense [cond | text | speech] forward returning (text_logits,
    speech_logits) over the text/speech segments. Static segment boundaries
    (padded inputs; mask in the loss)."""
    cfg = hp.backbone
    B, Lt = text_tokens.shape
    Ls = speech_tokens.shape[1]
    ce = cond_embeds(params, hp, cond)
    if ce.shape[0] != B:
        ce = jnp.broadcast_to(ce, (B,) + ce.shape[1:])
    te = text_embeds(params, hp, text_tokens)
    se = nn.embedding(params["speech_emb"], speech_tokens)
    if hp.input_pos_emb == "learned":
        se = se + nn.embedding(params["speech_pos_emb"], jnp.arange(Ls))
    x = jnp.concatenate([ce, te, se], axis=1)
    T = x.shape[1]
    lens = jnp.full((B,), T, jnp.int32)
    cache = bb.KVCache.zeros(cfg, B, T, dtype=x.dtype)
    mask = bb.prefill_mask(T, T, lens)
    positions = jnp.tile(jnp.arange(T)[None], (B, 1))
    start = jnp.zeros((B,), jnp.int32)
    hidden, _ = bb.backbone_apply(params["backbone"], cfg, x, positions, cache,
                                  start, mask, remat=remat)
    Lc = ce.shape[1]
    text_h = hidden[:, Lc:Lc + Lt]
    speech_h = hidden[:, Lc + Lt: Lc + Lt + Ls]
    return text_logits(params, text_h), speech_logits(params, speech_h)


def t3_loss(params: dict, hp: T3Config, cond: T3CondArrays,
            text_tokens: jnp.ndarray, text_lens: jnp.ndarray,
            speech_tokens: jnp.ndarray, speech_lens: jnp.ndarray,
            remat: bool = False):
    """Masked next-token CE losses (ref: t3.py:189-223). Reference computes
    CE of segment logits against the same-position tokens (its heads are
    trained with this alignment), masked beyond per-row lengths."""
    tl, sl = t3_forward(params, hp, cond, text_tokens, speech_tokens, remat=remat)

    def masked_ce(logits, targets, lens):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        mask = jnp.arange(targets.shape[1])[None] < lens[:, None]
        return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1)

    loss_text = masked_ce(tl, text_tokens, text_lens)
    loss_speech = masked_ce(sl, speech_tokens, speech_lens)
    return loss_text, loss_speech
