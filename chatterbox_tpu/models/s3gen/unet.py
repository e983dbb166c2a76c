"""Causal 1-D UNet — the flow-matching velocity estimator of S3Gen.

Matches the reference ConditionalDecoder (ref: models/s3gen/decoder.py:99-333,
instantiated at models/s3gen/s3gen.py:81-93): in 320ch (x|mu|spks|cond, 80
each), channels [256], 1 down + 12 mid + 1 up stage, each stage a causal
resnet block + 4 transformer blocks (8 heads × 64, exact-GELU FF 4×); no
actual time-axis down/upsampling at runtime (single channel stage → the
"downsample"/"upsample" are stride-1 causal convs). Meanflow variants mix a
second time embedding r through a diagonal-init linear
(ref: models/s3gen/utils/intmeanflow.py:5-16).

TPU-first: channels-last (B, T, C) everywhere, attention via one fused MHA,
fp32 throughout (the reference pins the estimator to fp32 —
ref: s3gen.py:259).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ...nn import core as nn


# ---------------------------------------------------------------------------
# time embedding
# ---------------------------------------------------------------------------

def sinusoidal_time_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """(B,) -> (B, dim). (ref: matcha/decoder.py:14-29)"""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
    args = scale * t[:, None] * freqs[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _causal_block_init(key, c_in: int, c_out: int) -> dict:
    return {"conv": nn.conv1d_init(key, c_in, c_out, 3), "norm": nn.layer_norm_init(c_out)}


def _causal_block_apply(p: dict, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """CausalBlock1D (ref: decoder.py:49-62): causal conv k3 → LN → Mish."""
    h = nn.causal_conv1d(p["conv"], x * mask, k=3)
    h = nn.mish(nn.layer_norm(p["norm"], h))
    return h * mask


def resnet_init(key, c_in: int, c_out: int, temb_dim: int) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "mlp": nn.linear_init(k1, temb_dim, c_out),
        "block1": _causal_block_init(k2, c_in, c_out),
        "block2": _causal_block_init(k3, c_out, c_out),
        "res_conv": nn.conv1d_init(k4, c_in, c_out, 1),
    }


def resnet_apply(p: dict, x: jnp.ndarray, mask: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
    """CausalResnetBlock1D (ref: decoder.py:65-69 + matcha/decoder.py:46-61)."""
    h = _causal_block_apply(p["block1"], x, mask)
    h = h + nn.linear(p["mlp"], nn.mish(temb))[:, None, :]
    h = _causal_block_apply(p["block2"], h, mask)
    return h + nn.conv1d(p["res_conv"], x * mask)


def tfmr_block_init(key, dim: int, n_heads: int, head_dim: int) -> dict:
    inner = n_heads * head_dim
    ff_inner = dim * 4
    ks = jax.random.split(key, 6)
    return {
        "norm1": nn.layer_norm_init(dim),
        "to_q": nn.linear_init(ks[0], dim, inner, bias=False),
        "to_k": nn.linear_init(ks[1], dim, inner, bias=False),
        "to_v": nn.linear_init(ks[2], dim, inner, bias=False),
        "to_out": nn.linear_init(ks[3], inner, dim),
        "norm3": nn.layer_norm_init(dim),
        "ff_in": nn.linear_init(ks[4], dim, ff_inner),
        "ff_out": nn.linear_init(ks[5], ff_inner, dim),
    }


def tfmr_block_apply(p: dict, x: jnp.ndarray, key_mask: Optional[jnp.ndarray],
                     n_heads: int) -> jnp.ndarray:
    """diffusers BasicTransformerBlock, self-attn only
    (ref: matcha/transformer.py:137-316): LN → MHA (no qkv bias) → +res;
    LN → GELU-FF → +res."""
    h = nn.layer_norm(p["norm1"], x)
    q = nn.split_heads(nn.linear(p["to_q"], h), n_heads)
    k = nn.split_heads(nn.linear(p["to_k"], h), n_heads)
    v = nn.split_heads(nn.linear(p["to_v"], h), n_heads)
    m = key_mask[:, None, None, :] if key_mask is not None else None
    a = nn.merge_heads(nn.mha(q, k, v, mask=m))
    x = x + nn.linear(p["to_out"], a)
    h = nn.layer_norm(p["norm3"], x)
    x = x + nn.linear(p["ff_out"], nn.gelu_exact(nn.linear(p["ff_in"], h)))
    return x


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def unet_init(key, in_channels: int = 320, out_channels: int = 80,
              channels: int = 256, n_blocks: int = 4, num_mid_blocks: int = 12,
              n_heads: int = 8, head_dim: int = 64, meanflow: bool = False) -> dict:
    temb_dim = channels * 4
    ks = iter(jax.random.split(key, 200))
    p = {
        "time_mlp": {
            "lin1": nn.linear_init(next(ks), in_channels, temb_dim),
            "lin2": nn.linear_init(next(ks), temb_dim, temb_dim),
        },
    }
    if meanflow:
        # diagonal init: output = e_t at init (ref: utils/intmeanflow.py:5-16)
        eye = jnp.concatenate([jnp.eye(temb_dim), jnp.zeros((temb_dim, temb_dim))], axis=0)
        p["time_mixer"] = {"w": eye}

    def stage(c_in, c_out, with_updown):
        d = {
            "resnet": resnet_init(next(ks), c_in, c_out, temb_dim),
            "tfmr": [tfmr_block_init(next(ks), c_out, n_heads, head_dim)
                     for _ in range(n_blocks)],
        }
        if with_updown:
            d["updown"] = nn.conv1d_init(next(ks), c_out, c_out, 3)
        return d

    p["down"] = [stage(in_channels, channels, True)]
    p["mid"] = [stage(channels, channels, False) for _ in range(num_mid_blocks)]
    p["up"] = [stage(channels * 2, channels, True)]
    p["final_block"] = _causal_block_init(next(ks), channels, channels)
    p["final_proj"] = nn.conv1d_init(next(ks), channels, out_channels, 1)
    return p


def unet_apply(params: dict, x: jnp.ndarray, mask: jnp.ndarray, mu: jnp.ndarray,
               t: jnp.ndarray, spks: jnp.ndarray, cond: jnp.ndarray,
               r: Optional[jnp.ndarray] = None, n_heads: int = 8,
               in_channels: int = 320) -> jnp.ndarray:
    """Estimator forward (ref: decoder.py:243-333).

    Args (all channels-last, fp32):
      x:    (B, T, 80) noisy mels
      mask: (B, T) bool or {0,1}
      mu:   (B, T, 80) encoder output
      t:    (B,) flow time
      spks: (B, 80) projected x-vector
      cond: (B, T, 80) prompt-mel conditioning
      r:    (B,) meanflow end-time (None for plain flow matching)
    Returns (B, T, 80) velocity.
    """
    # harmonize to the param dtype (bf16 when the engine's cfm_dtype knob is
    # set) — internal constructions (sinusoidal emb, masks) would otherwise
    # promote activations back to fp32 mid-stack
    pdt = params["time_mlp"]["lin1"]["w"].dtype
    x, mu, spks, cond = (a.astype(pdt) for a in (x, mu, spks, cond))
    t = t.astype(pdt)
    if r is not None:
        r = r.astype(pdt)
    mask_f = mask.astype(x.dtype)[..., None]          # (B, T, 1)
    key_mask = mask.astype(bool)

    def time_mlp(v):
        e = sinusoidal_time_emb(v, in_channels).astype(pdt)
        e = nn.linear(params["time_mlp"]["lin1"], e)
        return nn.linear(params["time_mlp"]["lin2"], nn.silu(e))

    temb = time_mlp(t)
    if r is not None:
        remb = time_mlp(r)
        temb = nn.linear(params["time_mixer"], jnp.concatenate([temb, remb], axis=-1))

    spks_t = jnp.broadcast_to(spks[:, None, :], mu.shape)
    h = jnp.concatenate([x, mu, spks_t, cond], axis=-1)    # (B, T, 320)

    skips = []
    for st in params["down"]:
        h = resnet_apply(st["resnet"], h, mask_f, temb)
        for blk in st["tfmr"]:
            h = tfmr_block_apply(blk, h, key_mask, n_heads)
        skips.append(h)
        h = nn.causal_conv1d(st["updown"], h * mask_f, k=3)

    for st in params["mid"]:
        h = resnet_apply(st["resnet"], h, mask_f, temb)
        for blk in st["tfmr"]:
            h = tfmr_block_apply(blk, h, key_mask, n_heads)

    for st in params["up"]:
        skip = skips.pop()
        h = jnp.concatenate([h, skip], axis=-1)
        h = resnet_apply(st["resnet"], h, mask_f, temb)
        for blk in st["tfmr"]:
            h = tfmr_block_apply(blk, h, key_mask, n_heads)
        h = nn.causal_conv1d(st["updown"], h * mask_f, k=3)

    h = _causal_block_apply(params["final_block"], h, mask_f)
    out = nn.conv1d(params["final_proj"], h * mask_f)
    return out * mask_f
