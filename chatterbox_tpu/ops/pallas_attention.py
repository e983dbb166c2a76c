"""Pallas TPU kernel: fused single-token decode attention over the KV cache.

One kernel computes scores → masked softmax → weighted sum for all heads of
one decode step (the XLA path is ~6 separate ops per layer). The whole
KV slice fits VMEM at Chatterbox sizes (H≤16, T≤2048, D=64 → ≤4 MB per
tensor), so no streaming/double-buffering is needed. Batch rides the pallas
grid (CFG uses B=2; batched serving more).

Falls back to interpret mode off-TPU (tests run on CPU).

Status: library kernel, off by default. It beat the XLA attention while the
KV cache was being round-tripped by the layer scan (+12 %), but after the
in-place-cache fix the XLA path wins (895 vs 863 tok/s on v5e) — the
kernel's blocking VMEM copy-in of the cache slice costs more than the op
fusion saves. Revisit with grid-pipelined streaming.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(len_ref, q_ref, k_ref, v_ref, out_ref):
    """Grid: (B,). len: (B,) SMEM; q: (1, H, D); k/v: (1, H, T, D);
    out: (1, H, D)."""
    b = pl.program_id(0)
    _, H, T, D = k_ref.shape
    q = q_ref[0].astype(jnp.float32)                       # (H, D)
    k = k_ref[0].astype(jnp.float32)                       # (H, T, D)
    v = v_ref[0].astype(jnp.float32)
    scale = 1.0 / (D ** 0.5)
    scores = jax.lax.dot_general(
        q[:, None, :], k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :] * scale                                     # (H, T)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (H, T), 1)
    valid = t_idx <= len_ref[b]
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
    out_ref[0] = out.astype(out_ref.dtype)


def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     cur_len: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """q: (B, H, 1, D); k/v: (B, H, T, D); cur_len: (B,) — keys at positions
    <= cur_len[b] attend. Returns (B, H, 1, D)."""
    B, H, _, D = q.shape
    T = k.shape[2]
    if interpret is None:
        interpret = not _on_tpu()

    out = pl.pallas_call(
        _decode_attn_kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, T, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, T, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cur_len.astype(jnp.int32), q[:, :, 0], k, v)
    return out[:, :, None, :]
