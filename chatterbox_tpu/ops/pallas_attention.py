"""Pallas TPU kernel: fused single-token decode attention over the KV cache.

One kernel computes scores → masked softmax → weighted sum for all heads of
one decode step (the XLA path is ~6 separate ops per layer). The whole
KV slice fits VMEM at Chatterbox sizes (H≤16, T≤2048, D=64 → ≤4 MB per
tensor), so no streaming/double-buffering is needed.

Falls back to the jnp implementation off-TPU (tests run interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(len_ref, q_ref, k_ref, v_ref, out_ref):
    """q: (H, D); k/v: (H, T, D); len: (1,) SMEM; out: (H, D)."""
    H, T, D = k_ref.shape
    q = q_ref[:].astype(jnp.float32)                       # (H, D)
    k = k_ref[:].astype(jnp.float32)                       # (H, T, D)
    v = v_ref[:].astype(jnp.float32)
    scale = 1.0 / (D ** 0.5)
    # scores: (H, T) = sum_d q[h,d] * k[h,t,d]
    scores = jax.lax.dot_general(
        q[:, None, :], k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :] * scale                                     # (H, T)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (H, T), 1)
    valid = t_idx <= len_ref[0]
    scores = jnp.where(valid, scores, jnp.finfo(jnp.float32).min)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = jnp.where(valid, p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    out = jax.lax.dot_general(
        p[:, None, :], v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]                                             # (H, D)
    out_ref[:] = out.astype(out_ref.dtype)


def _on_tpu() -> bool:
    platform = jax.devices()[0].platform
    return platform in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     cur_len: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """q: (B, H, 1, D); k/v: (B, H, T, D); cur_len: (B,) — keys at positions
    <= cur_len[b] attend. Returns (B, H, 1, D)."""
    B, H, _, D = q.shape
    if interpret is None:
        interpret = not _on_tpu()

    def one(qb, kb, vb, lb):
        return pl.pallas_call(
            _decode_attn_kernel,
            out_shape=jax.ShapeDtypeStruct((H, D), qb.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(lb[None], qb[:, 0], kb, vb)

    out = jax.vmap(one)(q, k, v, cur_len)
    return out[:, :, None, :]
