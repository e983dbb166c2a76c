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
    from . import on_tpu
    return on_tpu()


# ---------------------------------------------------------------------------
# streamed flash-decode kernel
# ---------------------------------------------------------------------------

TT = 256          # cache tile (keys per grid step)


def _flash_decode_kernel(lt_ref, cl_ref, lo_ref, q_ref, k_ref, v_ref, out_ref,
                         m_scr, l_scr, acc_scr):
    """Grid (B, T//TT), t innermost. Scalar-prefetch: lt (B,) last valid tile,
    cl (B,) current length, lo (B,) first valid position (left-pad lower
    bound; 0 for dense layouts). q (1, H, D); k/v (1, H, TT, D) streamed
    tiles — the index map clamps t to [lo[b]//TT, lt[b]], so tiles outside
    the valid region repeat an adjacent block index and Pallas SKIPS their
    DMA: the HBM traffic per step is O(cur_len - lo), not O(T_max). Flash
    accumulation (running max / sum) in f32 scratch; out (1, H, D) written
    on the last tile."""
    b, t = pl.program_id(0), pl.program_id(1)
    n_t = pl.num_programs(1)
    H, D = q_ref.shape[1], q_ref.shape[2]

    @pl.when(t == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when((t >= lo_ref[b] // TT) & (t <= lt_ref[b]))
    def _():
        # k-leading operand order + f32 operands: Mosaic only lowers batched
        # matvecs as [B,N,K]x[B,K] with f32 (bf16 variants fail to compile)
        q = q_ref[0].astype(jnp.float32)                # (H, D)
        k = k_ref[0].astype(jnp.float32)                # (H, TT, D)
        scale = 1.0 / (D ** 0.5)
        scores = jax.lax.dot_general(
            k, q,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                       # (H, TT) f32
        pos = t * TT + jax.lax.broadcasted_iota(jnp.int32, (H, TT), 1)
        valid = (pos >= lo_ref[b]) & (pos <= cl_ref[b])
        scores = jnp.where(valid, scores, -jnp.inf)
        m_prev = m_scr[:, 0:1]                          # (H, 1)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        # all-masked tile guard (can't happen for lo//TT<=t<=lt, keep exp finite)
        m_new = jnp.maximum(m_new, -3.0e38)
        alpha = jnp.exp(m_prev - m_new)                 # (H, 1)
        p = jnp.exp(scores - m_new)
        p = jnp.where(valid, p, 0.0)
        l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # v^T-leading f32 batched matvec (H, D, TT) x (H, TT) -> (H, D):
        # the transpose keeps the contraction on the LAST dim of both
        # operands (the only batched-matvec form Mosaic lowers). Measured
        # faster than a VPU broadcast+sublane-reduce formulation (7.8 vs
        # 14.2 us/layer at T=1024).
        pv = jax.lax.dot_general(
            jnp.swapaxes(v_ref[0].astype(jnp.float32), 1, 2), p,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                               # (H, D) f32
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:, 0:1] = m_new
        l_scr[:, 0:1] = l_new

    @pl.when(t == n_t - 1)
    def _():
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        out_ref[0] = (acc_scr[:] / denom).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_streamed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              cur_len: jnp.ndarray,
                              interpret: bool | None = None,
                              lo: jnp.ndarray | None = None) -> jnp.ndarray:
    """Streamed single-token decode attention over the KV cache.

    q: (B, H, 1, D); k/v: (B, H, T, D) with T % TT == 0; cur_len: (B,) —
    keys at positions lo[b] <= pos <= cur_len[b] attend (lo defaults to 0:
    the dense single-request layout; the left-padded batched layout passes
    its per-row pad as lo). Returns (B, H, 1, D).

    PRECONDITION: lo[b] <= cur_len[b] for every row. An empty window
    (lo[b] > cur_len[b]) executes zero tiles and silently returns ~0
    attention output (the flash denominator is clamped, not asserted) —
    current callers can't hit this (pad < P_pad <= cur_len), but new
    lower-bound callers must guarantee it.

    Unlike `decode_attention` (whole-slice VMEM copy-in, blocking), the
    cache streams in TT-sized tiles that Pallas double-buffers across grid
    steps, and tiles outside [lo[b], cur_len[b]] are never fetched (clamped
    block index ⇒ DMA skipped), so per-step attention cost tracks the true
    sequence length — the static T_max buffer is free."""
    B, H, _, D = q.shape
    T = k.shape[2]
    assert T % TT == 0, f"cache length {T} not a multiple of {TT}"
    if interpret is None:
        interpret = not _on_tpu()
    n_t = T // TT
    cur_len = cur_len.astype(jnp.int32)
    last_tile = jnp.minimum(cur_len // TT, n_t - 1)
    lo = (jnp.zeros((B,), jnp.int32) if lo is None
          else jnp.asarray(lo, jnp.int32))

    def _kv_idx(b, t, lt, cl, lo):
        return (b, 0, jnp.clip(t, lo[b] // TT, lt[b]), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, t, lt, cl, lo: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, TT, D), _kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, TT, D), _kv_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b, t, lt, cl, lo: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, 128), jnp.float32),   # running max (col 0)
            pltpu.VMEM((H, 128), jnp.float32),   # running sum (col 0)
            pltpu.VMEM((H, D), jnp.float32),     # weighted-value accumulator
        ],
    )
    out = pl.pallas_call(
        _flash_decode_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(last_tile, cur_len, lo, q[:, :, 0], k, v)
    return out[:, :, None, :]


def _flash_decode_int8_kernel(lt_ref, cl_ref, lo_ref, q_ref, kq_ref, ks_ref,
                              vq_ref, vs_ref, out_ref, m_scr, l_scr, acc_scr):
    """Int8-KV variant of `_flash_decode_kernel`: k/v tiles arrive as int8
    (HALF the HBM bytes of the bf16 cache — the decode step's dominant read
    at long contexts) plus one scale per (head, position). The dequantize
    never materializes a bf16 cache: K's scale folds into the score matrix
    (scores *= k_s) and V's into the softmax weights (p *= v_s) — two
    (H, TT) elementwise multiplies instead of 2·(H, TT, D) upcasts. This is
    the fusion XLA refuses (the scale-multiply runs as a separate full-cache
    pass there — measured 614 vs 862 tok/s, DESIGN.md); here it rides the
    tile loop for free. lo (B,) is the per-row left-pad lower bound (0 for
    dense layouts; the batched engine's right-aligned rows pass their pad)."""
    b, t = pl.program_id(0), pl.program_id(1)
    n_t = pl.num_programs(1)
    H, D = q_ref.shape[1], q_ref.shape[2]

    @pl.when(t == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when((t >= lo_ref[b] // TT) & (t <= lt_ref[b]))
    def _():
        q = q_ref[0].astype(jnp.float32)                # (H, D)
        k = kq_ref[0].astype(jnp.float32)               # (H, TT, D) int8→f32
        scale = 1.0 / (D ** 0.5)
        scores = jax.lax.dot_general(
            k, q,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                       # (H, TT) f32
        scores = scores * ks_ref[0].astype(jnp.float32)
        pos = t * TT + jax.lax.broadcasted_iota(jnp.int32, (H, TT), 1)
        valid = (pos >= lo_ref[b]) & (pos <= cl_ref[b])
        scores = jnp.where(valid, scores, -jnp.inf)
        m_prev = m_scr[:, 0:1]                          # (H, 1)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        m_new = jnp.maximum(m_new, -3.0e38)
        alpha = jnp.exp(m_prev - m_new)                 # (H, 1)
        p = jnp.exp(scores - m_new)
        p = jnp.where(valid, p, 0.0)
        l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        p = p * vs_ref[0].astype(jnp.float32)           # fold V's dequant in
        pv = jax.lax.dot_general(
            jnp.swapaxes(vq_ref[0].astype(jnp.float32), 1, 2), p,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                               # (H, D) f32
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:, 0:1] = m_new
        l_scr[:, 0:1] = l_new

    @pl.when(t == n_t - 1)
    def _():
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        out_ref[0] = (acc_scr[:] / denom).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_streamed_int8(q: jnp.ndarray,
                                   k_q: jnp.ndarray, k_s: jnp.ndarray,
                                   v_q: jnp.ndarray, v_s: jnp.ndarray,
                                   cur_len: jnp.ndarray,
                                   interpret: bool | None = None,
                                   lo: jnp.ndarray | None = None
                                   ) -> jnp.ndarray:
    """Streamed single-token decode attention reading the int8 KV cache.

    q: (B, H, 1, D); k_q/v_q: (B, H, T, D) int8 with T % TT == 0;
    k_s/v_s: (B, H, T) per-position dequant scales; cur_len: (B,);
    lo: (B,) optional per-row lower bound (left-padded batched layout) —
    keys at positions lo[b] <= pos <= cur_len[b] attend. Returns
    (B, H, 1, D). Matches
    `decode_attention_streamed(q, k_q*k_s[...,None], v_q*v_s[...,None])`
    while moving half the HBM bytes; tiles outside [lo, cur_len] are never
    fetched (clamped block index ⇒ DMA skipped), as in the bf16 kernel.

    PRECONDITION: lo[b] <= cur_len[b] for every row (see
    decode_attention_streamed — an empty window silently yields ~0)."""
    B, H, _, D = q.shape
    T = k_q.shape[2]
    assert T % TT == 0, f"cache length {T} not a multiple of {TT}"
    if interpret is None:
        interpret = not _on_tpu()
    n_t = T // TT
    cur_len = cur_len.astype(jnp.int32)
    last_tile = jnp.minimum(cur_len // TT, n_t - 1)
    lo = (jnp.zeros((B,), jnp.int32) if lo is None
          else jnp.asarray(lo, jnp.int32))

    def _kv_idx(b, t, lt, cl, lo):
        return (b, 0, jnp.clip(t, lo[b] // TT, lt[b]), 0)

    def _s_idx(b, t, lt, cl, lo):
        return (b, 0, jnp.clip(t, lo[b] // TT, lt[b]))

    kv_spec = pl.BlockSpec((1, H, TT, D), _kv_idx, memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, H, TT), _s_idx, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, t, lt, cl, lo: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, s_spec, kv_spec, s_spec,
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b, t, lt, cl, lo: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, 128), jnp.float32),   # running max (col 0)
            pltpu.VMEM((H, 128), jnp.float32),   # running sum (col 0)
            pltpu.VMEM((H, D), jnp.float32),     # weighted-value accumulator
        ],
    )
    out = pl.pallas_call(
        _flash_decode_int8_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(last_tile, cur_len, lo, q[:, :, 0], k_q, k_s, v_q, v_s)
    return out[:, :, None, :]


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
