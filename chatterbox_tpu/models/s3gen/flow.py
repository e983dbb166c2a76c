"""Flow front: speech tokens → encoder features (mu) → CFM → mel.

Matches the reference CausalMaskedDiffWithXvec (ref: models/s3gen/flow.py:43-198):
token embedding (6561→512) of [prompt_tokens | gen_tokens], upsample conformer
encoder (2× to mel rate), 512→80 projection, prompt-mel conditioning, x-vector
192→80 affine, CFM solve, prompt region sliced off.

TPU-first: the token axis is bucketed; all dynamic lengths (prompt/gen) are
carried as scalars with masks, so one compiled program serves a bucket.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...nn import core as nn
from .encoder import upsample_encoder_init, upsample_encoder_apply
from .unet import unet_init, unet_apply
from .cfm import cfm_inference, SIGMA_MIN

VOCAB_SIZE = 6561
INPUT_SIZE = 512
OUTPUT_SIZE = 80
SPK_EMBED_DIM = 192
TOKEN_MEL_RATIO = 2          # ref: flow.py:52
PRE_LOOKAHEAD_LEN = 3        # ref: flow.py:53


@dataclass(frozen=True)
class FlowDims:
    """Architecture sizes (defaults = the reference S3Gen,
    ref: s3gen.py:64-93)."""
    enc_dim: int = 512
    enc_heads: int = 8
    enc_ff: int = 2048
    enc_blocks: int = 6
    enc_up_blocks: int = 4
    unet_channels: int = 256
    unet_blocks: int = 4
    unet_mid: int = 12
    unet_heads: int = 8
    unet_head_dim: int = 64

    @classmethod
    def tiny_test(cls):
        return cls(enc_dim=32, enc_heads=2, enc_ff=64, enc_blocks=1,
                   enc_up_blocks=1, unet_channels=16, unet_blocks=1,
                   unet_mid=1, unet_heads=2, unet_head_dim=8)


def flow_init(key, meanflow: bool = False, dims: FlowDims = FlowDims()) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "input_embedding": nn.embedding_init(k1, VOCAB_SIZE, dims.enc_dim),
        "spk_embed_affine": nn.linear_init(k2, SPK_EMBED_DIM, OUTPUT_SIZE),
        "encoder": upsample_encoder_init(k3, d=dims.enc_dim, n_heads=dims.enc_heads,
                                         ff=dims.enc_ff, n_blocks=dims.enc_blocks,
                                         n_up_blocks=dims.enc_up_blocks),
        "encoder_proj": nn.linear_init(k4, dims.enc_dim, OUTPUT_SIZE),
        "decoder": unet_init(k5, channels=dims.unet_channels,
                             n_blocks=dims.unet_blocks, num_mid_blocks=dims.unet_mid,
                             n_heads=dims.unet_heads, head_dim=dims.unet_head_dim,
                             meanflow=meanflow),
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
                   noise_aligned: bool = False,
                   finalize: bool = True,
                   dims: FlowDims = FlowDims(),
                   est_dtype=None) -> jnp.ndarray:
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

    # conformer encode + 2× upsample (ref: flow.py:169). If the engine
    # cast the encoder weights (enc_dtype knob), run the encoder in that
    # dtype; mu and everything downstream stay fp32.
    enc_dt = params["encoder"]["after_norm"]["g"].dtype
    h, h_lens = upsample_encoder_apply(params["encoder"], x.astype(enc_dt),
                                       token_len,
                                       d=dims.enc_dim, n_heads=dims.enc_heads)
    mu = nn.linear(params["encoder_proj"], h.astype(jnp.float32))  # (B, 2T_tok, 80)

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

    # noise placement: `noise_aligned` means the caller pre-aligned the noise
    # to the packed [prompt|gen] mel buffer (streaming uses one fixed
    # per-utterance buffer so every feed re-denoises the same realization);
    # otherwise meanflow noise covers only the generated region and is
    # shifted after the prompt (ref: s3gen.py:313-316, flow_matching.py:218-220).
    mels = cfm_inference(params["decoder"], mu, mask_mel, spks, conds, key,
                         n_timesteps=n_timesteps, meanflow=meanflow,
                         noise=noise,
                         prompt_len=(None if noise is None or noise_aligned
                                     else prompt_mel_len),
                         n_heads=dims.unet_heads, est_dtype=est_dtype)
    return mels


TRAINING_CFG_RATE = 0.2      # ref: models/s3gen/configs.py CFM_PARAMS


def cfm_interpolate(x1: jnp.ndarray, z: jnp.ndarray, t: jnp.ndarray,
                    sigma_min: float = SIGMA_MIN):
    """OT-CFM path point and regression target
    (ref: flow_matching.py:174-177): given target x1, noise z and per-row
    t ∈ (0,1), returns (x_t, u) with x_t = (1-(1-σ)t)·z + t·x1 and
    u = x1 - (1-σ)·z."""
    t_ = t[:, None, None]
    y = (1.0 - (1.0 - sigma_min) * t_) * z + t_ * x1
    u = x1 - (1.0 - sigma_min) * z
    return y, u


def flow_compute_loss(params: dict, key, *,
                      token: jnp.ndarray,        # (B, T_tok) int32, bucketed
                      token_len: jnp.ndarray,    # (B,) valid tokens
                      feat: jnp.ndarray,         # (B, T_mel, 80) target mels
                      feat_len: jnp.ndarray,     # (B,) valid mel frames
                      embedding: jnp.ndarray,    # (B, 192) x-vector
                      dims: FlowDims = FlowDims(),
                      sigma_min: float = SIGMA_MIN,
                      training_cfg_rate: float = TRAINING_CFG_RATE,
                      remat: bool = False) -> jnp.ndarray:
    """Masked conditional-flow-matching loss — the reference's dormant
    training method rebuilt (ref: flow.py:86-129 front + the CFM loss
    flow_matching.py:147-193):

      * encoder front identical to inference (token embed → upsample
        conformer → 80-d projection = mu);
      * per-row random conditioning prefix: with p=0.5 the first
        U[0, 0.3*feat_len] target frames are given as `cond` (the prompt
        mechanism the model sees at inference), else zeros;
      * t ~ U(0,1) cosine-warped, x_t = (1-(1-σ)t)·z + t·x1,
        target u = x1 - (1-σ)·z;
      * classifier-free dropout: each row's (mu, spks, cond) is zeroed with
        p=training_cfg_rate — what makes inference-time CFG possible;
      * MSE over valid frames only: sum(mask·(pred-u)²)/(sum(mask)·80).

    `feat` uses this codebase's channels-last (B, T, 80) layout (the
    reference is (B, 80, T)). Shapes are bucketed; all dynamic lengths
    travel as scalars + masks, so one compiled program serves a bucket.
    """
    B, T_tok = token.shape
    k_cond_keep, k_cond_len, k_t, k_z, k_cfg = jax.random.split(key, 5)

    # x-vector projection (ref: flow.py:100-102)
    emb = embedding / jnp.linalg.norm(embedding, axis=-1, keepdims=True)
    spks = nn.linear(params["spk_embed_affine"], emb)            # (B, 80)

    mask_tok = jnp.arange(T_tok)[None] < token_len[:, None]
    x = nn.embedding(params["input_embedding"],
                     jnp.maximum(token, 0)) * mask_tok[..., None]

    enc = upsample_encoder_apply
    if remat:
        enc = jax.checkpoint(enc, static_argnums=(3, 4))
        h, h_lens = enc(params["encoder"], x, token_len,
                        dims.enc_dim, dims.enc_heads)
    else:
        h, h_lens = enc(params["encoder"], x, token_len,
                        d=dims.enc_dim, n_heads=dims.enc_heads)
    mu = nn.linear(params["encoder_proj"], h)                    # (B, 2T_tok, 80)

    T_mel = mu.shape[1]
    x1 = feat[:, :T_mel]
    if x1.shape[1] < T_mel:
        x1 = jnp.pad(x1, ((0, 0), (0, T_mel - x1.shape[1]), (0, 0)))
    frames = jnp.arange(T_mel)[None]
    mask = (frames < h_lens[:, None]).astype(mu.dtype)           # (B, T_mel)
    x1 = x1 * mask[..., None]

    # random conditioning prefix (ref: flow.py:112-117)
    keep = jax.random.uniform(k_cond_keep, (B,)) >= 0.5
    frac = jax.random.uniform(k_cond_len, (B,))
    prefix = jnp.floor(frac * 0.3 * feat_len).astype(jnp.int32)
    prefix = jnp.where(keep, prefix, 0)
    conds = jnp.where(frames[..., None] < prefix[:, None, None], x1, 0.0)

    # CFM interpolation (ref: flow_matching.py:168-177)
    t = jax.random.uniform(k_t, (B,), mu.dtype)
    t = 1.0 - jnp.cos(t * 0.5 * jnp.pi)                          # cosine warp
    z = jax.random.normal(k_z, x1.shape, mu.dtype)
    y, u = cfm_interpolate(x1, z, t, sigma_min)

    # classifier-free dropout (ref: flow_matching.py:179-184)
    if training_cfg_rate > 0:
        cfg_keep = (jax.random.uniform(k_cfg, (B,))
                    > training_cfg_rate).astype(mu.dtype)
        mu = mu * cfg_keep[:, None, None]
        spks = spks * cfg_keep[:, None]
        conds = conds * cfg_keep[:, None, None]

    est = unet_apply
    if remat:
        est = jax.checkpoint(
            lambda p, yy, mm, muu, tt, ss, cc, nh, ic: unet_apply(
                p, yy, mm, muu, tt, ss, cc, n_heads=nh, in_channels=ic),
            static_argnums=(7, 8))
        in_ch = params["decoder"]["time_mlp"]["lin1"]["w"].shape[0]
        pred = est(params["decoder"], y, mask, mu, t, spks, conds,
                   dims.unet_heads, in_ch)
    else:
        in_ch = params["decoder"]["time_mlp"]["lin1"]["w"].shape[0]
        pred = est(params["decoder"], y, mask, mu, t, spks, conds,
                   n_heads=dims.unet_heads, in_channels=in_ch)

    m = mask[..., None]
    num = jnp.sum(((pred - u) * m) ** 2)
    den = jnp.sum(mask) * u.shape[-1] + 1e-8
    return (num / den).astype(jnp.float32)
