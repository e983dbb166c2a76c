"""CAMPPlus speaker-verification x-vector model.

Matches the reference (ref: models/s3gen/xvector.py:61-428, used at
models/s3gen/s3gen.py:57-61,152): Kaldi fbank-80 (mean-normalized) → FCM 2-D
resnet stem → 3 dense CAM-TDNN blocks (12/24/16 layers, growth 32, dilations
1/2/2) with transit layers → stats pooling → 192-d embedding.

Channels-last throughout; inference-mode batch norms are folded affine ops.
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


def _res2d_apply(p: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    h = jax.nn.relu(nn.batch_norm(p["bn1"], nn.conv2d(p["conv1"], x, stride=(stride, 1), padding=(1, 1))))
    h = nn.batch_norm(p["bn2"], nn.conv2d(p["conv2"], h, padding=(1, 1)))
    if "shortcut_conv" in p:
        sc = nn.batch_norm(p["shortcut_bn"], nn.conv2d(p["shortcut_conv"], x, stride=(stride, 1), padding=(0, 0)))
    else:
        sc = x
    return jax.nn.relu(h + sc)


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


def fcm_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, 80) fbank -> (B, T, 320) stem features."""
    h = jnp.swapaxes(x, 1, 2)[..., None]                     # (B, F=80, T, 1)
    h = jax.nn.relu(nn.batch_norm(p["bn1"], nn.conv2d(p["conv1"], h, padding=(1, 1))))
    for i, blk in enumerate(p["layer1"]):
        h = _res2d_apply(blk, h, 2 if i == 0 else 1)
    for i, blk in enumerate(p["layer2"]):
        h = _res2d_apply(blk, h, 2 if i == 0 else 1)
    h = jax.nn.relu(nn.batch_norm(p["bn2"], nn.conv2d(p["conv2"], h, stride=(2, 1), padding=(1, 1))))
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
               dilation: int = 1) -> jnp.ndarray:
    pad = (k - 1) // 2 * dilation
    h = nn.conv1d(p["conv"], x, stride=stride, padding=pad, dilation=dilation)
    return jax.nn.relu(nn.batch_norm(p["bn"], h))


def cam_layer_init(key, bn_ch: int, out_ch: int, k: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "local": nn.conv1d_init(k1, bn_ch, out_ch, k, bias=False),
        "lin1": nn.conv1d_init(k2, bn_ch, bn_ch // 2, 1),
        "lin2": nn.conv1d_init(k3, bn_ch // 2, out_ch, 1),
    }


def _seg_pool(x: jnp.ndarray, seg_len: int = 100) -> jnp.ndarray:
    """Average-pool over fixed segments then re-expand (ref: xvector.py:221-231)."""
    B, T, C = x.shape
    n_seg = -(-T // seg_len)
    pad = n_seg * seg_len - T
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    counts = jnp.minimum(seg_len, jnp.maximum(0, T - jnp.arange(n_seg) * seg_len))
    seg = xp.reshape(B, n_seg, seg_len, C).sum(axis=2) / counts[None, :, None]
    seg = jnp.repeat(seg, seg_len, axis=1)[:, :T]
    return seg


def cam_layer_apply(p: dict, x: jnp.ndarray, k: int, dilation: int) -> jnp.ndarray:
    pad = (k - 1) // 2 * dilation
    y = nn.conv1d(p["local"], x, padding=pad, dilation=dilation)
    context = jnp.mean(x, axis=1, keepdims=True) + _seg_pool(x)
    m = jax.nn.sigmoid(nn.conv1d(p["lin2"], jax.nn.relu(nn.conv1d(p["lin1"], context))))
    return y * m


def cam_dense_layer_init(key, c_in: int, out_ch: int, bn_ch: int, k: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "bn1": nn.batch_norm_init(c_in),
        "lin1": nn.conv1d_init(k1, c_in, bn_ch, 1, bias=False),
        "bn2": nn.batch_norm_init(bn_ch),
        "cam": cam_layer_init(k2, bn_ch, out_ch, k),
    }


def cam_dense_layer_apply(p: dict, x: jnp.ndarray, k: int, dilation: int) -> jnp.ndarray:
    h = nn.conv1d(p["lin1"], jax.nn.relu(nn.batch_norm(p["bn1"], x)))
    h = jax.nn.relu(nn.batch_norm(p["bn2"], h))
    return cam_layer_apply(p["cam"], h, k, dilation)


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


def campplus_apply(params: dict, fbank: jnp.ndarray) -> jnp.ndarray:
    """fbank: (B, T, 80) (already mean-normalized) -> (B, 192) x-vector."""
    h = fcm_apply(params["fcm"], fbank)
    h = tdnn_apply(params["tdnn"], h, k=5, stride=2)
    for (num_layers, k, dil), layers, transit in zip(BLOCK_SPECS, params["blocks"],
                                                     params["transits"]):
        for lp in layers:
            h = jnp.concatenate([h, cam_dense_layer_apply(lp, h, k, dil)], axis=-1)
        h = nn.conv1d(transit["conv"], jax.nn.relu(nn.batch_norm(transit["bn"], h)))
    h = jax.nn.relu(nn.batch_norm(params["out_bn"], h))
    # stats pooling: mean + unbiased std (ref: xvector.py:146-157)
    mean = jnp.mean(h, axis=1)
    var = jnp.var(h, axis=1) * h.shape[1] / (h.shape[1] - 1)
    stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)       # (B, 2C)
    e = nn.conv1d(params["dense"]["conv"], stats[:, None, :])[:, 0]
    return nn.batch_norm(params["dense"]["bn"], e, affine=False)


def campplus_embed_wav(params: dict, wav_16k: jnp.ndarray) -> jnp.ndarray:
    """(B, T) 16 kHz waveform -> (B, 192) x-vector, incl. the fbank frontend
    with per-utterance mean subtraction (ref: xvector.py:45-58)."""
    fb = kaldi_fbank_80(wav_16k)
    fb = fb - jnp.mean(fb, axis=1, keepdims=True)
    return campplus_apply(params, fb)
