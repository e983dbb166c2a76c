"""Upsample conformer encoder: speech-token features → 2× upsampled mel-rate
features (the "flow front" encoder of S3Gen).

Architecture (matching ref: models/s3gen/transformer/upsample_encoder.py,
instantiated at models/s3gen/s3gen.py:64-79):
    linear embed + LN → espnet-rel-pos → PreLookahead(3) → 6 conformer blocks
    → nearest-2× upsample conv → linear embed + LN → 4 conformer blocks → LN
Each block: pre-norm rel-pos MHA (Transformer-XL pos_bias_u/v + rel_shift,
ref: transformer/attention.py:200-330) + pre-norm FF(2048, SiLU). No macaron,
no conv module (both disabled at runtime, ref: s3gen.py:77-78).

TPU notes: everything is (B, T, C) static-shaped; the rel-pos bias term is a
single extra (T, 2T-1) matmul + shift — MXU friendly; padding handled by a
key-mask, so T can be bucketed.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...nn import core as nn


# ---------------------------------------------------------------------------
# espnet relative positional encoding (ref: transformer/embedding.py:201-294)
# ---------------------------------------------------------------------------

def espnet_rel_pos(T: int, d_model: int) -> np.ndarray:
    """Returns the (1, 2T-1, d) relative position encoding, ordered positive
    positions reversed then negative — exactly the slice the espnet encoding
    produces for a length-T query."""
    pos = np.arange(T, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe_pos = np.zeros((T, d_model))
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((T, d_model))
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    pe = np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)   # (2T-1, d)
    return pe[None].astype(np.float32)


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, 2T-1) -> (B, H, T, T) Transformer-XL shift
    (ref: transformer/attention.py:225-247)."""
    B, H, T, L = x.shape
    zero_pad = jnp.zeros((B, H, T, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)        # (B,H,T,2T)
    x_padded = x_padded.reshape(B, H, L + 1, T)
    x = x_padded[:, :, 1:].reshape(B, H, T, L)
    return x[..., : L // 2 + 1]


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

def rel_attn_init(key, d: int, n_heads: int) -> dict:
    ks = jax.random.split(key, 7)
    hd = d // n_heads
    bound = math.sqrt(6.0 / (n_heads + hd))   # xavier_uniform on (H, hd)
    return {
        "q": nn.linear_init(ks[0], d, d),
        "k": nn.linear_init(ks[1], d, d),
        "v": nn.linear_init(ks[2], d, d),
        "out": nn.linear_init(ks[3], d, d),
        "pos": nn.linear_init(ks[4], d, d, bias=False),
        "pos_bias_u": jax.random.uniform(ks[5], (n_heads, hd), jnp.float32, -bound, bound),
        "pos_bias_v": jax.random.uniform(ks[6], (n_heads, hd), jnp.float32, -bound, bound),
    }


def rel_attn_apply(p: dict, x: jnp.ndarray, pos_emb: jnp.ndarray, n_heads: int,
                   key_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Rel-pos self-attention. x: (B, T, D); pos_emb: (1, 2T-1, D);
    key_mask: bool (B, T) or None."""
    B, T, D = x.shape
    hd = D // n_heads
    q = nn.split_heads(nn.linear(p["q"], x), n_heads)          # (B,H,T,hd)
    k = nn.split_heads(nn.linear(p["k"], x), n_heads)
    v = nn.split_heads(nn.linear(p["v"], x), n_heads)
    pe = nn.linear(p["pos"], pos_emb)                          # (1, 2T-1, D)
    pe = pe.reshape(1, -1, n_heads, hd).transpose(0, 2, 1, 3)  # (1,H,2T-1,hd)

    q_u = q + p["pos_bias_u"][None, :, None, :]
    q_v = q + p["pos_bias_v"][None, :, None, :]
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k, preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, pe, preferred_element_type=jnp.float32)
    bd = rel_shift(bd)                                         # (B,H,T,T)
    scores = (ac + bd) / math.sqrt(hd)
    if key_mask is not None:
        m = key_mask[:, None, None, :]                         # (B,1,1,T)
        scores = jnp.where(m, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    if key_mask is not None:
        probs = jnp.where(key_mask[:, None, None, :], probs, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return nn.linear(p["out"], nn.merge_heads(out))


def conformer_layer_init(key, d: int, n_heads: int, ff: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm_mha": nn.layer_norm_init(d),
        "attn": rel_attn_init(k1, d, n_heads),
        "norm_ff": nn.layer_norm_init(d),
        "ff_in": nn.linear_init(k2, d, ff),
        "ff_out": nn.linear_init(k3, ff, d),
    }


def conformer_layer_apply(p: dict, x: jnp.ndarray, pos_emb: jnp.ndarray,
                          n_heads: int, key_mask) -> jnp.ndarray:
    """Pre-norm attention + pre-norm SiLU FF, LN eps 1e-12
    (ref: transformer/encoder_layer.py:145-146, 201-231)."""
    h = nn.layer_norm(p["norm_mha"], x, eps=1e-12)
    x = x + rel_attn_apply(p["attn"], h, pos_emb, n_heads, key_mask)
    h = nn.layer_norm(p["norm_ff"], x, eps=1e-12)
    x = x + nn.linear(p["ff_out"], nn.silu(nn.linear(p["ff_in"], h)))
    return x


def upsample_encoder_init(key, d: int = 512, n_heads: int = 8, ff: int = 2048,
                          n_blocks: int = 6, n_up_blocks: int = 4,
                          lookahead: int = 3) -> dict:
    ks = jax.random.split(key, n_blocks + n_up_blocks + 8)
    i = 0
    p = {}
    p["embed"] = {"linear": nn.linear_init(ks[i], d, d), "norm": nn.layer_norm_init(d)}; i += 1
    p["pre_lookahead"] = {
        "conv1": nn.conv1d_init(ks[i], d, d, lookahead + 1),
        "conv2": nn.conv1d_init(ks[i + 1], d, d, 3),
    }; i += 2
    p["blocks"] = [conformer_layer_init(ks[i + j], d, n_heads, ff) for j in range(n_blocks)]
    i += n_blocks
    p["up_conv"] = nn.conv1d_init(ks[i], d, d, 5); i += 1
    p["up_embed"] = {"linear": nn.linear_init(ks[i], d, d), "norm": nn.layer_norm_init(d)}; i += 1
    p["up_blocks"] = [conformer_layer_init(ks[i + j], d, n_heads, ff) for j in range(n_up_blocks)]
    i += n_up_blocks
    p["after_norm"] = nn.layer_norm_init(d)
    return p


def _embed(p: dict, x: jnp.ndarray, d: int):
    """LinearNoSubsampling (+espnet rel-pos): Linear + LN(eps 1e-5), scale by
    sqrt(d) (ref: transformer/subsampling.py:69-110, embedding.py:256-270)."""
    x = nn.layer_norm(p["norm"], nn.linear(p["linear"], x), eps=1e-5)
    x = x * math.sqrt(d)
    pos = jnp.asarray(espnet_rel_pos(x.shape[1], d))
    return x, pos


def pre_lookahead_apply(p: dict, x: jnp.ndarray, lookahead: int = 3) -> jnp.ndarray:
    """Right-context conv + causal conv, residual
    (ref: transformer/upsample_encoder.py:66-96)."""
    h = nn.conv1d(p["conv1"], x, padding=(0, lookahead))
    h = nn.leaky_relu(h, 0.01)
    h = nn.conv1d(p["conv2"], h, padding=(2, 0))
    return x + h


def upsample_apply(p: dict, x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """Nearest ×2 then left-padded conv k=5
    (ref: transformer/upsample_encoder.py:37-63)."""
    B, T, C = x.shape
    up = jnp.repeat(x, stride, axis=1)
    return nn.conv1d(p["up_conv"], up, padding=(stride * 2, 0))


def upsample_encoder_apply(params: dict, x: jnp.ndarray, lens: jnp.ndarray,
                           d: int = 512, n_heads: int = 8) -> tuple:
    """x: (B, T, 512) token features, lens: (B,) valid lengths.
    Returns (y (B, 2T, 512), out_lens (B,))."""
    T = x.shape[1]
    key_mask = jnp.arange(T)[None] < lens[:, None]
    x, pos = _embed(params["embed"], x, d)
    # zero the pad region so the lookahead conv sees the same zeros a dense
    # (unpadded) run would see at its right edge
    x = x * key_mask[..., None]
    x = pre_lookahead_apply(params["pre_lookahead"], x)
    for blk in params["blocks"]:
        x = conformer_layer_apply(blk, x, pos, n_heads, key_mask)
    x = upsample_apply(params, x)
    lens2 = lens * 2
    T2 = x.shape[1]
    key_mask2 = jnp.arange(T2)[None] < lens2[:, None]
    x, pos2 = _embed(params["up_embed"], x, d)
    for blk in params["up_blocks"]:
        x = conformer_layer_apply(blk, x, pos2, n_heads, key_mask2)
    x = nn.layer_norm(params["after_norm"], x, eps=1e-5)
    return x, lens2
