"""HiFT vocoder (HiFTNet: neural source filter + iSTFT synthesis head).

Matches the reference HiFTGenerator (ref: models/s3gen/hifigan.py:286-474,
instantiated at models/s3gen/s3gen.py:244-252): ConvRNNF0Predictor → ×480 f0
upsample → harmonic SineGen source → source-STFT (n_fft 16, hop 4) fused into
a 3-stage ConvTranspose upsampler (rates 8·5·3, Snake resblocks) → conv_post
→ exp-magnitude/sin-phase iSTFT → clamp ±0.99.

TPU-first notes:
  * channels-last convs throughout; weight-norm folded at conversion time;
  * the iSTFT is an overlap-add matmul (audio/stft.py) — no FFT primitive;
  * SineGen's cumulative phase is one `jnp.cumsum` over the sample axis
    (bandwidth-bound, negligible next to the conv stack);
  * randomness (harmonic phases + source noise) comes from an explicit PRNG
    key, so synthesis is reproducible.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...nn import core as nn
from ...audio.filters import hann_window
from ...audio.stft import stft_real_imag, istft_overlap_add


# static architecture constants (ref: s3gen.py:244-252 + hifigan.py defaults)
UPSAMPLE_RATES = (8, 5, 3)
UPSAMPLE_KERNELS = (16, 11, 7)
SOURCE_RES_KERNELS = (7, 7, 11)
RES_KERNELS = (3, 7, 11)
RES_DILATIONS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
ISTFT_NFFT = 16
ISTFT_HOP = 4
NB_HARMONICS = 8
BASE_CHANNELS = 512
SINE_AMP = 0.1
NOISE_STD = 0.003
VOICED_THRESHOLD = 10.0
AUDIO_LIMIT = 0.99
SAMPLE_RATE = 24000
TOTAL_UPSAMPLE = 8 * 5 * 3 * ISTFT_HOP  # 480 samples per mel frame


def _resblock_init(key, ch: int, k: int, dilations) -> dict:
    ks = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [nn.conv1d_init(ks[2 * i], ch, ch, k) for i in range(len(dilations))],
        "convs2": [nn.conv1d_init(ks[2 * i + 1], ch, ch, k) for i in range(len(dilations))],
        "alpha1": [jnp.ones((ch,)) for _ in dilations],
        "alpha2": [jnp.ones((ch,)) for _ in dilations],
    }


def _resblock_apply(p: dict, x: jnp.ndarray, k: int, dilations) -> jnp.ndarray:
    """Snake-activated residual block (ref: hifigan.py:106-161)."""
    for i, d in enumerate(dilations):
        xt = nn.snake(x, p["alpha1"][i])
        xt = nn.conv1d(p["convs1"][i], xt, padding=(k * d - d) // 2, dilation=d)
        xt = nn.snake(xt, p["alpha2"][i])
        xt = nn.conv1d(p["convs2"][i], xt, padding=(k - 1) // 2)
        x = x + xt
    return x


def f0_predictor_init(key, in_ch: int = 80, ch: int = 512) -> dict:
    ks = jax.random.split(key, 6)
    return {
        "convs": [nn.conv1d_init(ks[i], in_ch if i == 0 else ch, ch, 3) for i in range(5)],
        "classifier": nn.linear_init(ks[5], ch, 1),
    }


def f0_predictor_apply(p: dict, mel: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 80) mel -> (B, T) f0 in Hz (ref: models/s3gen/f0_predictor.py:19-55)."""
    x = mel
    for c in p["convs"]:
        x = nn.elu(nn.conv1d(c, x, padding=1))
    return jnp.abs(nn.linear(p["classifier"], x))[..., 0]


def hift_init(key, base_channels: int = BASE_CHANNELS) -> dict:
    ks = iter(jax.random.split(key, 64))
    p = {
        "f0_predictor": f0_predictor_init(next(ks), ch=max(base_channels, 8)),
        "m_source_linear": nn.linear_init(next(ks), NB_HARMONICS + 1, 1),
        "conv_pre": nn.conv1d_init(next(ks), 80, base_channels, 7),
        "ups": [], "source_downs": [], "source_resblocks": [], "resblocks": [],
    }
    down_cum = (15, 3, 1)
    for i, (u, k) in enumerate(zip(UPSAMPLE_RATES, UPSAMPLE_KERNELS)):
        ch_out = base_channels // (2 ** (i + 1))
        p["ups"].append(nn.conv_transpose1d_init(next(ks), base_channels // (2 ** i), ch_out, k))
        dc = down_cum[i]
        if dc == 1:
            p["source_downs"].append(nn.conv1d_init(next(ks), ISTFT_NFFT + 2, ch_out, 1))
        else:
            p["source_downs"].append(nn.conv1d_init(next(ks), ISTFT_NFFT + 2, ch_out, dc * 2))
        p["source_resblocks"].append(
            _resblock_init(next(ks), ch_out, SOURCE_RES_KERNELS[i], RES_DILATIONS[i]))
        for k_r, d_r in zip(RES_KERNELS, RES_DILATIONS):
            p["resblocks"].append(_resblock_init(next(ks), ch_out, k_r, d_r))
    p["conv_post"] = nn.conv1d_init(next(ks), base_channels // 8, ISTFT_NFFT + 2, 7)
    return p


def hift_source(params: dict, key, f0: jnp.ndarray,
                phase_carry: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """f0 (B, T_mel) -> source signal s (B, T_mel*480, 1).

    key: a scalar PRNG key (batch-shaped draws, the single-stream path) or a
    (B,) key array — then each row's harmonic phases/noise are drawn from its
    own key, so a row's output is independent of its batchmates (per-request
    reproducibility in the serving batch).

    phase_carry (B, NB_HARMONICS+1): accumulated Σ f/sr over all samples
    BEFORE this window — lets a streaming caller continue the harmonic phase
    across windows instead of restarting the cumsum (the continuity the
    reference's dormant `cache_source` hook provides — ref: hifigan.py:471-473)."""
    f0_up = jnp.repeat(f0, TOTAL_UPSAMPLE, axis=1)                   # (B, T*480)
    B, T = f0_up.shape
    harmonics = jnp.arange(1, NB_HARMONICS + 2, dtype=jnp.float32)
    f_mat = f0_up[..., None] * harmonics / SAMPLE_RATE
    cum = jnp.cumsum(f_mat, axis=1)
    if phase_carry is not None:
        cum = cum + phase_carry[:, None, :]
    theta = 2.0 * jnp.pi * (cum % 1.0)
    if nn.is_key_batch(key):                                # per-row keys (B,)
        def draw(k):
            kp, kn = jax.random.split(k)
            p = jax.random.uniform(kp, (1, NB_HARMONICS + 1),
                                   minval=-jnp.pi, maxval=jnp.pi)
            n = jax.random.normal(kn, (T, NB_HARMONICS + 1))
            return p, n
        phase, noise_u = jax.vmap(draw)(key)         # (B,1,9), (B,T,9)
    else:
        k_phase, k_noise = jax.random.split(key)
        phase = jax.random.uniform(k_phase, (B, 1, NB_HARMONICS + 1),
                                   minval=-jnp.pi, maxval=jnp.pi)
        noise_u = jax.random.normal(k_noise, (B, T, NB_HARMONICS + 1))
    phase = phase.at[:, :, 0].set(0.0)
    sine = SINE_AMP * jnp.sin(theta + phase)
    uv = (f0_up > VOICED_THRESHOLD).astype(jnp.float32)[..., None]
    noise_amp = uv * NOISE_STD + (1.0 - uv) * SINE_AMP / 3.0
    noise = noise_amp * noise_u
    sine = sine * uv + noise                                         # (B, T, 9)
    return jnp.tanh(nn.linear(params["m_source_linear"], sine))     # (B, T, 1)


_hift_window = hann_window(ISTFT_NFFT)


def hift_decode(params: dict, mel: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """mel (B, T, 80), s (B, T*480, 1) -> wav (B, T*480)
    (ref: hifigan.py:412-444)."""
    # source STFT: (B, T*480) -> (B, 9, F) ×2 -> concat 18 channels, (B, F, 18)
    re, im = stft_real_imag(s[..., 0], ISTFT_NFFT, ISTFT_HOP, _hift_window, center=True)
    s_stft = jnp.concatenate([re, im], axis=-2)                     # (B, 18, F)
    s_stft = jnp.swapaxes(s_stft, -1, -2)                           # (B, F, 18)

    x = nn.conv1d(params["conv_pre"], mel, padding=3)
    down_cum = (15, 3, 1)
    for i, (u, k) in enumerate(zip(UPSAMPLE_RATES, UPSAMPLE_KERNELS)):
        x = nn.leaky_relu(x, 0.1)
        x = nn.conv_transpose1d(params["ups"][i], x, stride=u, k=k, padding=(k - u) // 2)
        if i == len(UPSAMPLE_RATES) - 1:
            # reflection pad (1, 0) on the time axis (ref: hifigan.py:378,422)
            x = jnp.concatenate([x[:, 1:2], x], axis=1)
        dc = down_cum[i]
        if dc == 1:
            si = nn.conv1d(params["source_downs"][i], s_stft)
        else:
            si = nn.conv1d(params["source_downs"][i], s_stft, stride=dc,
                           padding=dc // 2)
        si = _resblock_apply(params["source_resblocks"][i], si,
                             SOURCE_RES_KERNELS[i], RES_DILATIONS[i])
        x = x + si
        acc = None
        for j in range(len(RES_KERNELS)):
            r = _resblock_apply(params["resblocks"][i * len(RES_KERNELS) + j], x,
                                RES_KERNELS[j], RES_DILATIONS[j])
            acc = r if acc is None else acc + r
        x = acc / len(RES_KERNELS)

    x = nn.leaky_relu(x, 0.01)
    x = nn.conv1d(params["conv_post"], x, padding=3)                 # (B, F, 18)
    n_half = ISTFT_NFFT // 2 + 1
    magnitude = jnp.clip(jnp.exp(x[..., :n_half]), max=1e2)
    phase = jnp.sin(x[..., n_half:])
    re_o = magnitude * jnp.cos(phase)
    im_o = magnitude * jnp.sin(phase)
    wav = istft_overlap_add(jnp.swapaxes(re_o, -1, -2), jnp.swapaxes(im_o, -1, -2),
                            ISTFT_NFFT, ISTFT_HOP, _hift_window)
    return jnp.clip(wav, -AUDIO_LIMIT, AUDIO_LIMIT)


def hift_inference(params: dict, key, mel: jnp.ndarray,
                   cache_source: Optional[jnp.ndarray] = None,
                   cache_len: Optional[jnp.ndarray] = None,
                   phase_carry: Optional[jnp.ndarray] = None):
    """mel (B, T, 80) -> (wav (B, T*480), source (B, T*480, 1), f0 (B, T))
    (ref: hifigan.py:462-474). cache_source, if given, replaces the source
    prefix for glitch-free streaming joins (ref: hifigan.py:471-473):
      * cache_len=None: host path — cache_source is the exact-length prefix,
        concatenated with the fresh suffix;
      * cache_len given: jit path — cache_source is a full-length buffer and
        the first cache_len samples are taken from it (masked overwrite, so
        the program shape is independent of the cache length)."""
    f0 = f0_predictor_apply(params["f0_predictor"], mel)             # (B, T)
    s = hift_source(params, key, f0, phase_carry=phase_carry)
    if cache_source is not None:
        if cache_len is None:
            if cache_source.shape[1] > 0:
                n = cache_source.shape[1]
                s = jnp.concatenate([cache_source, s[:, n:]], axis=1)
        else:
            idx = jnp.arange(s.shape[1])[None, :, None]
            s = jnp.where(idx < jnp.reshape(cache_len, (-1, 1, 1)), cache_source, s)
    wav = hift_decode(params, mel, s)
    return wav, s, f0
