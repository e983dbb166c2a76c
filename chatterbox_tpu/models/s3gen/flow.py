"""Flow front: speech tokens → encoder features (mu) → CFM → mel.

Matches the reference CausalMaskedDiffWithXvec (ref: models/s3gen/flow.py:43-198):
token embedding (6561→512) of [prompt_tokens | gen_tokens], upsample conformer
encoder (2× to mel rate), 512→80 projection, prompt-mel conditioning, x-vector
192→80 affine, CFM solve, prompt region sliced off.

TPU-first: the token axis is bucketed; all dynamic lengths (prompt/gen) are
carried as scalars with masks, so one compiled program serves a bucket.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...nn import core as nn
from .encoder import upsample_encoder_init, upsample_encoder_apply
from .unet import unet_init
from .cfm import cfm_inference

VOCAB_SIZE = 6561
INPUT_SIZE = 512
OUTPUT_SIZE = 80
SPK_EMBED_DIM = 192
TOKEN_MEL_RATIO = 2          # ref: flow.py:52
PRE_LOOKAHEAD_LEN = 3        # ref: flow.py:53


def flow_init(key, meanflow: bool = False) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "input_embedding": nn.embedding_init(k1, VOCAB_SIZE, INPUT_SIZE),
        "spk_embed_affine": nn.linear_init(k2, SPK_EMBED_DIM, OUTPUT_SIZE),
        "encoder": upsample_encoder_init(k3),
        "encoder_proj": nn.linear_init(k4, INPUT_SIZE, OUTPUT_SIZE),
        "decoder": unet_init(k5, meanflow=meanflow),
    }


def flow_inference(params: dict, *,
                   token: jnp.ndarray,           # (B, T_tok) int32, bucketed
                   token_len: jnp.ndarray,       # (B,) total valid tokens (prompt+gen)
                   prompt_len: jnp.ndarray,      # (B,) prompt token count
                   prompt_feat: jnp.ndarray,     # (B, T_feat, 80) prompt mels (padded)
                   embedding: jnp.ndarray,       # (B, 192) x-vector
                   key,
                   n_timesteps: int = 10,
                   meanflow: bool = False,
                   noise: Optional[jnp.ndarray] = None,
                   finalize: bool = True) -> jnp.ndarray:
    """Returns mels (B, 2*T_tok, 80); the valid generated region is
    [2*prompt_len, 2*token_len) per row (prompt region already part of the
    buffer — callers slice with these bounds).

    `token` must contain [prompt_tokens | gen_tokens] packed densely
    (ref concat: flow.py:161). With finalize=False the last
    PRE_LOOKAHEAD_LEN*2 frames are dropped by the caller (streaming,
    ref: flow.py:170-171).
    """
    B, T_tok = token.shape

    # x-vector projection (ref: flow.py:148-151)
    emb = embedding / jnp.linalg.norm(embedding, axis=-1, keepdims=True)
    spks = nn.linear(params["spk_embed_affine"], emb)            # (B, 80)

    # token embedding, masked (ref: flow.py:162-166)
    mask_tok = jnp.arange(T_tok)[None] < token_len[:, None]
    x = nn.embedding(params["input_embedding"], token) * mask_tok[..., None]

    # conformer encode + 2× upsample (ref: flow.py:169)
    h, h_lens = upsample_encoder_apply(params["encoder"], x, token_len)
    mu = nn.linear(params["encoder_proj"], h)                    # (B, 2T_tok, 80)

    T_mel = mu.shape[1]
    mel_positions = jnp.arange(T_mel)[None]
    mask_mel = mel_positions < h_lens[:, None]

    # conds: prompt mels then zeros (ref: flow.py:177-180)
    prompt_mel_len = prompt_len * TOKEN_MEL_RATIO
    pf = prompt_feat
    if pf.shape[1] < T_mel:
        pf = jnp.pad(pf, ((0, 0), (0, T_mel - pf.shape[1]), (0, 0)))
    else:
        pf = pf[:, :T_mel]
    conds = jnp.where(mel_positions[..., None] < prompt_mel_len[:, None, None], pf, 0.0)

    mels = cfm_inference(params["decoder"], mu, mask_mel, spks, conds, key,
                         n_timesteps=n_timesteps, meanflow=meanflow,
                         noise=noise, prompt_len=prompt_mel_len[0] if noise is not None else None)
    return mels
