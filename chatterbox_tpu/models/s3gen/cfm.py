"""Conditional flow matching solvers (mel decoder of S3Gen).

Two inference modes, matching the reference (ref: models/s3gen/flow_matching.py):
  * plain CFM (520M / multilingual): cosine t-schedule, Euler solver with
    classifier-free guidance folded into a single batch-2B estimator call per
    step, cfg rate 0.7 (ref: flow_matching.py:78-145; params configs.py:3-10);
  * meanflow (Turbo/Nano distilled): plain linear t-schedule, 2-step Euler,
    estimator takes both step endpoints (t, r), no CFG
    (ref: flow_matching.py:235-246).

TPU-first: the step loop is a `lax.fori_loop` over stacked (t, r) pairs —
one compiled program regardless of step count; the CFG duplication is a
concat on the batch axis (one estimator call per step, batch 2B).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import core as nn
from .unet import unet_apply

SIGMA_MIN = 1e-6
INFERENCE_CFG_RATE = 0.7


def t_span_cosine(n_timesteps: int) -> np.ndarray:
    t = np.linspace(0.0, 1.0, n_timesteps + 1)
    return (1.0 - np.cos(t * 0.5 * np.pi)).astype(np.float32)


def t_span_linear(n_timesteps: int) -> np.ndarray:
    return np.linspace(0.0, 1.0, n_timesteps + 1, dtype=np.float32)


def _unet_dims(params: dict, n_heads: int):
    in_ch = params["time_mlp"]["lin1"]["w"].shape[0]
    return dict(n_heads=n_heads, in_channels=in_ch)


def solve_euler_cfg(params: dict, z: jnp.ndarray, t_span: jnp.ndarray,
                    mu: jnp.ndarray, mask: jnp.ndarray, spks: jnp.ndarray,
                    cond: jnp.ndarray, cfg_rate: float = INFERENCE_CFG_RATE,
                    n_heads: int = 8, est_dtype=None) -> jnp.ndarray:
    """Euler ODE with in-solver CFG (ref: flow_matching.py:78-145).

    z/mu/cond: (B, T, 80); mask: (B, T); spks: (B, 80).
    The unconditional half zeroes mu, spks and cond (ref: flow_matching.py:100-132).
    est_dtype: optional estimator compute dtype (e.g. bf16) — the Euler state
    stays f32; the reference marks (but never reads) estimator_dtype="fp32"
    (ref: s3gen.py:259), so fp32 is the parity default and bf16 an opt-in
    speed knob.
    """
    B = mu.shape[0]
    mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond_in = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask_in = jnp.concatenate([mask, mask], axis=0)
    n_steps = t_span.shape[0] - 1

    def body(i, x):
        t = t_span[i]
        r = t_span[i + 1]
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.full((2 * B,), t, x.dtype)
        if est_dtype is not None:
            dxdt = unet_apply(params, x_in.astype(est_dtype), mask_in,
                              mu_in.astype(est_dtype), t_in.astype(est_dtype),
                              spks_in.astype(est_dtype),
                              cond_in.astype(est_dtype),
                              **_unet_dims(params, n_heads)).astype(x.dtype)
        else:
            dxdt = unet_apply(params, x_in, mask_in, mu_in, t_in, spks_in,
                              cond_in, **_unet_dims(params, n_heads))
        d_cond, d_uncond = dxdt[:B], dxdt[B:]
        d = (1.0 + cfg_rate) * d_cond - cfg_rate * d_uncond
        return x + (r - t) * d

    return jax.lax.fori_loop(0, n_steps, body, z)


def solve_euler_meanflow(params: dict, z: jnp.ndarray, t_span: jnp.ndarray,
                         mu: jnp.ndarray, mask: jnp.ndarray, spks: jnp.ndarray,
                         cond: jnp.ndarray, n_heads: int = 8,
                         est_dtype=None) -> jnp.ndarray:
    """basic_euler for distilled meanflow models (ref: flow_matching.py:235-246):
    estimator receives both step endpoints, no CFG."""
    B = mu.shape[0]
    n_steps = t_span.shape[0] - 1

    def body(i, x):
        t = t_span[i]
        r = t_span[i + 1]
        t_in = jnp.full((B,), t, x.dtype)
        r_in = jnp.full((B,), r, x.dtype)
        if est_dtype is not None:
            dxdt = unet_apply(params, x.astype(est_dtype), mask,
                              mu.astype(est_dtype), t_in.astype(est_dtype),
                              spks.astype(est_dtype), cond.astype(est_dtype),
                              r=r_in.astype(est_dtype),
                              **_unet_dims(params, n_heads)).astype(x.dtype)
        else:
            dxdt = unet_apply(params, x, mask, mu, t_in, spks, cond, r=r_in,
                              **_unet_dims(params, n_heads))
        return x + (r - t) * dxdt

    return jax.lax.fori_loop(0, n_steps, body, z)


def cfm_inference(params: dict, mu: jnp.ndarray, mask: jnp.ndarray,
                  spks: jnp.ndarray, cond: jnp.ndarray, key,
                  n_timesteps: int = 10, meanflow: bool = False,
                  noise: Optional[jnp.ndarray] = None,
                  prompt_len: Optional[jnp.ndarray] = None,
                  n_heads: int = 8, est_dtype=None) -> jnp.ndarray:
    """Sample mels from the flow (ref: flow_matching.py:195-233).

    noise: optional pre-drawn noise for the *generated* region (meanflow mode
    pre-draws it — ref: s3gen.py:313-316); it is placed after `prompt_len`
    frames, matching `z[..., prompt_len:] = noised_mels`
    (ref: flow_matching.py:218-220). `prompt_len` may be a scalar or a (B,)
    array of per-row prompt-mel offsets (heterogeneous batched serving).
    """
    if nn.is_key_batch(key):   # (B,) per-row keys: row output independent of batch
        z = jax.vmap(lambda k: jax.random.normal(k, mu.shape[1:], mu.dtype))(key)
    else:
        z = jax.random.normal(key, mu.shape, mu.dtype)
    if noise is not None:
        if prompt_len is None:
            z = noise
        else:
            T = mu.shape[1]
            idx = jnp.arange(T)[None, :, None]
            plen = jnp.asarray(prompt_len).reshape(-1)        # (B,) or (1,)
            shifted = jax.vmap(lambda n, p: jnp.roll(n, p, axis=0))(
                jnp.broadcast_to(noise, mu.shape), jnp.broadcast_to(plen, (mu.shape[0],)))
            z = jnp.where(idx >= plen[:, None, None], shifted, z)
    span = t_span_linear(n_timesteps) if meanflow else t_span_cosine(n_timesteps)
    t_span = jnp.asarray(span)
    if meanflow:
        return solve_euler_meanflow(params, z, t_span, mu, mask, spks, cond,
                                    n_heads=n_heads, est_dtype=est_dtype)
    return solve_euler_cfg(params, z, t_span, mu, mask, spks, cond,
                           n_heads=n_heads, est_dtype=est_dtype)
