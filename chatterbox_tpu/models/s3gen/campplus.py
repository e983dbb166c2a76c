"""CAMPPlus speaker-verification x-vector model.

Matches the reference (ref: models/s3gen/xvector.py:61-428, used at
models/s3gen/s3gen.py:57-61,152): Kaldi fbank-80 (mean-normalized) → FCM 2-D
resnet stem → 3 dense CAM-TDNN blocks (12/24/16 layers, growth 32, dilations
1/2/2) with transit layers → stats pooling → 192-d embedding.

Channels-last throughout; inference-mode batch norms are folded affine ops.

Masked variant: every entry point takes an optional per-row valid length so
a length-padded batch computes EXACTLY the unpadded result (pad-to-bucket +
mask replaces truncation everywhere in this codebase). The invariant is that
positions >= the valid length are zero before every time-mixing conv — then
each valid output position reads the same zeros the reference's own conv
zero-padding would supply — and every pooled statistic (CAM context, seg
pooling, stats pooling, fbank mean) divides by the true length.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn import core as nn
from ...audio.mels import kaldi_fbank_80


# ---------------------------------------------------------------------------
# FCM stem (2-D convs over (freq, time); ref: xvector.py:94-127)
# ---------------------------------------------------------------------------

def _res2d_init(key, c_in: int, c_out: int, stride: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": nn.conv2d_init(k1, c_in, c_out, 3, bias=False),
        "bn1": nn.batch_norm_init(c_out),
        "conv2": nn.conv2d_init(k2, c_out, c_out, 3, bias=False),
        "bn2": nn.batch_norm_init(c_out),
    }
    if stride != 1 or c_in != c_out:
        p["shortcut_conv"] = nn.conv2d_init(k3, c_in, c_out, 1, bias=False)
        p["shortcut_bn"] = nn.batch_norm_init(c_out)
    return p


def _res2d_apply(p: dict, x: jnp.ndarray, stride: int,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """mask: (B, 1, T, 1) time mask — re-applied after each BN (whose shift
    makes padded positions nonzero) so the 3x3 convs never read garbage."""
    h = jax.nn.relu(nn.batch_norm(p["bn1"], nn.conv2d(p["conv1"], x, stride=(stride, 1), padding=(1, 1))))
    h = _m(h, mask)
    h = nn.batch_norm(p["bn2"], nn.conv2d(p["conv2"], h, padding=(1, 1)))
    if "shortcut_conv" in p:
        sc = nn.batch_norm(p["shortcut_bn"], nn.conv2d(p["shortcut_conv"], x, stride=(stride, 1), padding=(0, 0)))
    else:
        sc = x
    return _m(jax.nn.relu(h + sc), mask)


def _m(h: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    return h if mask is None else h * mask


def fcm_init(key, m_channels: int = 32, feat_dim: int = 80) -> dict:
    ks = jax.random.split(key, 8)
    return {
        "conv1": nn.conv2d_init(ks[0], 1, m_channels, 3, bias=False),
        "bn1": nn.batch_norm_init(m_channels),
        "layer1": [_res2d_init(ks[1], m_channels, m_channels, 2),
                   _res2d_init(ks[2], m_channels, m_channels, 1)],
        "layer2": [_res2d_init(ks[3], m_channels, m_channels, 2),
                   _res2d_init(ks[4], m_channels, m_channels, 1)],
        "conv2": nn.conv2d_init(ks[5], m_channels, m_channels, 3, bias=False),
        "bn2": nn.batch_norm_init(m_channels),
    }


def fcm_apply(p: dict, x: jnp.ndarray,
              mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """x: (B, T, 80) fbank -> (B, T, 320) stem features.
    mask: optional (B, T, 1) valid-frame mask (time never strided here)."""
    m4 = None if mask is None else jnp.swapaxes(mask, 1, 2)[..., None]  # (B,1,T,1)
    h = jnp.swapaxes(x, 1, 2)[..., None]                     # (B, F=80, T, 1)
    h = _m(jax.nn.relu(nn.batch_norm(p["bn1"], nn.conv2d(p["conv1"], h, padding=(1, 1)))), m4)
    for i, blk in enumerate(p["layer1"]):
        h = _res2d_apply(blk, h, 2 if i == 0 else 1, m4)
    for i, blk in enumerate(p["layer2"]):
        h = _res2d_apply(blk, h, 2 if i == 0 else 1, m4)
    h = _m(jax.nn.relu(nn.batch_norm(p["bn2"], nn.conv2d(p["conv2"], h, stride=(2, 1), padding=(1, 1)))), m4)
    # (B, F'=10, T, C=32) -> (B, T, C*F')
    B, F, T, C = h.shape
    h = jnp.transpose(h, (0, 2, 3, 1)).reshape(B, T, C * F)
    return h


# ---------------------------------------------------------------------------
# TDNN / CAM layers (ref: xvector.py:160-337)
# ---------------------------------------------------------------------------

def tdnn_init(key, c_in: int, c_out: int, k: int) -> dict:
    return {"conv": nn.conv1d_init(key, c_in, c_out, k, bias=False),
            "bn": nn.batch_norm_init(c_out)}


def tdnn_apply(p: dict, x: jnp.ndarray, k: int, stride: int = 1,
               dilation: int = 1,
               mask: jnp.ndarray | None = None) -> jnp.ndarray:
    pad = (k - 1) // 2 * dilation
    h = nn.conv1d(p["conv"], x, stride=stride, padding=pad, dilation=dilation)
    return _m(jax.nn.relu(nn.batch_norm(p["bn"], h)), mask)


def cam_layer_init(key, bn_ch: int, out_ch: int, k: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "local": nn.conv1d_init(k1, bn_ch, out_ch, k, bias=False),
        "lin1": nn.conv1d_init(k2, bn_ch, bn_ch // 2, 1),
        "lin2": nn.conv1d_init(k3, bn_ch // 2, out_ch, 1),
    }


def _seg_pool(x: jnp.ndarray, seg_len: int = 100,
              t_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Average-pool over fixed segments then re-expand (ref: xvector.py:221-231).

    With t_valid (B,) given, x must be zero past the valid length; each
    segment divides by its clipped VALID count, matching the reference's
    avg_pool1d(ceil_mode=True) on the unpadded sequence. Segments fully past
    t_valid divide by 1 and produce garbage that downstream masking kills.
    """
    B, T, C = x.shape
    n_seg = -(-T // seg_len)
    pad = n_seg * seg_len - T
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    if t_valid is None:
        counts = jnp.minimum(seg_len, jnp.maximum(0, T - jnp.arange(n_seg) * seg_len))
        counts = counts[None, :, None]
    else:
        counts = jnp.clip(t_valid[:, None] - jnp.arange(n_seg)[None] * seg_len,
                          1, seg_len)[..., None]
    seg = xp.reshape(B, n_seg, seg_len, C).sum(axis=2) / counts
    seg = jnp.repeat(seg, seg_len, axis=1)[:, :T]
    return seg


def cam_layer_apply(p: dict, x: jnp.ndarray, k: int, dilation: int,
                    mask: jnp.ndarray | None = None,
                    t_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    pad = (k - 1) // 2 * dilation
    y = nn.conv1d(p["local"], x, padding=pad, dilation=dilation)
    if t_valid is None:
        gmean = jnp.mean(x, axis=1, keepdims=True)
    else:
        gmean = jnp.sum(x, axis=1, keepdims=True) / t_valid[:, None, None]
    context = gmean + _seg_pool(x, t_valid=t_valid)
    m = jax.nn.sigmoid(nn.conv1d(p["lin2"], jax.nn.relu(nn.conv1d(p["lin1"], context))))
    return _m(y * m, mask)


def cam_dense_layer_init(key, c_in: int, out_ch: int, bn_ch: int, k: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "bn1": nn.batch_norm_init(c_in),
        "lin1": nn.conv1d_init(k1, c_in, bn_ch, 1, bias=False),
        "bn2": nn.batch_norm_init(bn_ch),
        "cam": cam_layer_init(k2, bn_ch, out_ch, k),
    }


def cam_dense_layer_apply(p: dict, x: jnp.ndarray, k: int, dilation: int,
                          mask: jnp.ndarray | None = None,
                          t_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    h = nn.conv1d(p["lin1"], jax.nn.relu(nn.batch_norm(p["bn1"], x)))
    h = _m(jax.nn.relu(nn.batch_norm(p["bn2"], h)), mask)
    return cam_layer_apply(p["cam"], h, k, dilation, mask, t_valid)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

BLOCK_SPECS = ((12, 3, 1), (24, 3, 2), (16, 3, 2))  # (layers, kernel, dilation)
GROWTH = 32
BN_SIZE = 4
INIT_CHANNELS = 128


def campplus_init(key, embedding_size: int = 192) -> dict:
    ks = iter(jax.random.split(key, 128))
    p = {"fcm": fcm_init(next(ks))}
    channels = 320
    p["tdnn"] = tdnn_init(next(ks), channels, INIT_CHANNELS, 5)
    channels = INIT_CHANNELS
    p["blocks"] = []
    p["transits"] = []
    for num_layers, k, dil in BLOCK_SPECS:
        layers = []
        for i in range(num_layers):
            layers.append(cam_dense_layer_init(next(ks), channels + i * GROWTH,
                                               GROWTH, BN_SIZE * GROWTH, k))
        p["blocks"].append(layers)
        channels += num_layers * GROWTH
        p["transits"].append({"bn": nn.batch_norm_init(channels),
                              "conv": nn.conv1d_init(next(ks), channels, channels // 2, 1, bias=False)})
        channels //= 2
    p["out_bn"] = nn.batch_norm_init(channels)
    p["dense"] = {"conv": nn.conv1d_init(next(ks), channels * 2, embedding_size, 1, bias=False),
                  "bn": nn.batch_norm_init(embedding_size)}
    return p


def campplus_apply(params: dict, fbank: jnp.ndarray,
                   t_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """fbank: (B, T, 80) (already mean-normalized) -> (B, 192) x-vector.

    t_valid: optional (B,) int32 valid frame counts. When given, rows padded
    past t_valid (which must be zero on entry) produce exactly the result of
    an unpadded forward — see module docstring.
    """
    if t_valid is None:
        mask = None
    else:
        T = fbank.shape[1]
        mask = (jnp.arange(T)[None, :] < t_valid[:, None]).astype(fbank.dtype)[..., None]
        fbank = fbank * mask
    h = fcm_apply(params["fcm"], fbank, mask)
    if t_valid is not None:
        # the k=5/stride-2 TDNN halves time: valid length becomes ceil(Tv/2)
        t_valid = (t_valid + 1) // 2
        T2 = -(-h.shape[1] // 2)
        mask = (jnp.arange(T2)[None, :] < t_valid[:, None]).astype(h.dtype)[..., None]
    h = tdnn_apply(params["tdnn"], h, k=5, stride=2, mask=mask)
    for (num_layers, k, dil), layers, transit in zip(BLOCK_SPECS, params["blocks"],
                                                     params["transits"]):
        for lp in layers:
            h = jnp.concatenate(
                [h, cam_dense_layer_apply(lp, h, k, dil, mask, t_valid)], axis=-1)
        h = _m(nn.conv1d(transit["conv"], jax.nn.relu(nn.batch_norm(transit["bn"], h))), mask)
    h = _m(jax.nn.relu(nn.batch_norm(params["out_bn"], h)), mask)
    # stats pooling: mean + unbiased std (ref: xvector.py:146-157)
    if t_valid is None:
        mean = jnp.mean(h, axis=1)
        var = jnp.var(h, axis=1) * h.shape[1] / (h.shape[1] - 1)
    else:
        tv = t_valid[:, None].astype(h.dtype)
        mean = jnp.sum(h, axis=1) / tv
        var = jnp.sum(jnp.square(h - mean[:, None, :]) * mask, axis=1) / (tv - 1)
    stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)       # (B, 2C)
    e = nn.conv1d(params["dense"]["conv"], stats[:, None, :])[:, 0]
    return nn.batch_norm(params["dense"]["bn"], e, affine=False)


def campplus_embed_wav(params: dict, wav_16k: jnp.ndarray,
                       n_samples: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, T) 16 kHz waveform -> (B, 192) x-vector, incl. the fbank frontend
    with per-utterance mean subtraction (ref: xvector.py:45-58).

    n_samples: optional (B,) int32 valid sample counts for rows padded with
    trailing zeros; the result matches an unpadded forward exactly (the
    fbank mean and all pooled stats use only the valid frames).
    """
    fb = kaldi_fbank_80(wav_16k)
    if n_samples is None:
        return campplus_apply(params, fb - jnp.mean(fb, axis=1, keepdims=True))
    # snip_edges frame count: frames fully inside the valid samples
    t_valid = jnp.maximum((n_samples - 400) // 160 + 1, 1).astype(jnp.int32)
    fmask = (jnp.arange(fb.shape[1])[None, :] < t_valid[:, None]).astype(fb.dtype)[..., None]
    fmean = jnp.sum(fb * fmask, axis=1, keepdims=True) / t_valid[:, None, None]
    return campplus_apply(params, (fb - fmean) * fmask, t_valid)
