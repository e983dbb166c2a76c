"""Pallas TPU kernels: fused GPT-2 decode-layer phases (int4 weights).

At batch≤2 single-token decode the step cost is weight HBM bytes plus a
per-XLA-op fixed overhead (~20 fusions/layer × 24 layers dominates once the
weights are int4 — see DESIGN.md perf log). These kernels collapse each
layer into TWO pallas launches around the (XLA) attention core:

  kernel A  ln_qkv_int4:          y = LN1(x); out = y @ Wqkv + b
  kernel B  attnout_ln_mlp_int4:  r = x + attn @ Wo + bo
                                  y = LN2(r)
                                  out = r + gelu_new(y@W1 + b1) @ W2 + b2

Both stream their int4-packed weights HBM→VMEM in grid-indexed blocks
(Pallas double-buffers consecutive grid steps, overlapping each tile's DMA
with the previous tile's compute), unpack nibbles with int32 mask arithmetic
in VMEM, and apply the group-wise dequant scales to the dot RESULT (scales
are constant within a k-group), exactly like ops/int4_matmul.py.

Packing layouts (utils/quantize.py):
  * Wqkv, Wo, W2: row split-half — byte[r,n] = (W[r,n] lo, W[r+K/2,n] hi).
  * W1 (fc_in): COLUMN split-half — byte[r,c] = (W[r,c] lo, W[r,c+I/2] hi) —
    because MLP grid phase j needs hidden units {j·TW..} ∪ {I/2+j·TW..}
    (the W2 row pairs), which col-pairing makes ONE contiguous block.

Used by models/t3/backbone.backbone_apply_unrolled for layers carrying a
"fused" operand dict (built by prepare_fused_gpt2_layer at quantization
time). Interpret-mode fallback keeps CPU tests exact.

Reference behavior being reproduced: GPT2Block forward (HF modeling_gpt2;
the reference's Turbo T3 backbone — /root/reference/src/chatterbox/models/
t3/llama_configs.py:35-71 selects GPT2 medium).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .int4_matmul import TK  # k-tile == scale group (256)

TN = 512          # kernel A n-tile over the 3D qkv columns
TW = 512          # kernel B hidden-unit tile (per half; phase covers 2*TW units)


def _on_tpu() -> bool:
    from . import on_tpu
    return on_tpu()


def _unpack(wp_i8):
    """int8 nibble block -> (lo, hi) bf16. lo = 4-bit sign decode of the low
    nibble, hi = arithmetic >>4 (int32 ops: int8 shifts don't lower in
    Mosaic)."""
    wp = wp_i8.astype(jnp.int32)
    lo = (jnp.bitwise_xor(jnp.bitwise_and(wp, 15), 8) - 8).astype(jnp.bfloat16)
    hi = jnp.right_shift(wp, 4).astype(jnp.bfloat16)
    return lo, hi


def _layer_norm_f32(x_f32, g_row, b_row, eps):
    mu = jnp.mean(x_f32, axis=-1, keepdims=True)
    var = jnp.mean((x_f32 - mu) ** 2, axis=-1, keepdims=True)
    y = (x_f32 - mu) * jax.lax.rsqrt(var + eps)
    return y * g_row.astype(jnp.float32) + b_row.astype(jnp.float32)


def _gelu_new_f32(x):
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


# ---------------------------------------------------------------------------
# kernel A: LN1 + QKV projection
# ---------------------------------------------------------------------------

def _ln_qkv_kernel(x_ref, g_ref, b_ref, wp_ref, slo_ref, shi_ref, bias_ref,
                   out_ref, y_scr, *, eps):
    """Grid (3D//TN, K2//TK), k innermost. x (B, D) const; g/b (8, D) const
    (row 0 live); wp (TK, TN) streamed tile; slo/shi (G, TN) column; bias
    (8, TN) column; out (B, TN) f32 accumulated over k; y_scr (B, D) f32."""
    n, k = pl.program_id(0), pl.program_id(1)

    @pl.when((n == 0) & (k == 0))
    def _():
        y_scr[:] = _layer_norm_f32(x_ref[:].astype(jnp.float32),
                                   g_ref[0:1, :], b_ref[0:1, :], eps)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.broadcast_to(
            bias_ref[0:1, :].astype(jnp.float32), out_ref.shape)

    lo, hi = _unpack(wp_ref[:])
    K2 = y_scr.shape[1] // 2
    xl = y_scr[:, pl.ds(k * TK, TK)].astype(jnp.bfloat16)
    xh = y_scr[:, pl.ds(K2 + k * TK, TK)].astype(jnp.bfloat16)
    acc_lo = jax.lax.dot_general(
        xl, lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_hi = jax.lax.dot_general(
        xh, hi, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] += (acc_lo * slo_ref[pl.ds(k, 1), :].astype(jnp.float32)
                   + acc_hi * shi_ref[pl.ds(k, 1), :].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def ln_qkv_int4(x, g8, b8, wp, s_lo, s_hi, bias8, *, eps: float,
                interpret: bool | None = None):
    """x (B, D) -> LN(x) @ Wqkv + bias, (B, 3D) f32.

    g8/b8/bias8 are the LN/bias vectors broadcast to 8 rows (sublane-tile-
    aligned VMEM operands); wp (D/2, 3D) row-split int4; s_* (D/2//TK, 3D)."""
    if interpret is None:
        interpret = not _on_tpu()
    B, D = x.shape
    K2, N3 = wp.shape
    G = K2 // TK
    assert D == 2 * K2 and K2 % TK == 0 and N3 % TN == 0
    grid = (N3 // TN, G)
    return pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, N3), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, D), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, D), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, TN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, TN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        interpret=interpret,
    )(x, g8, b8, wp, s_lo, s_hi, bias8)


# ---------------------------------------------------------------------------
# kernel B: attn-out projection + residual + LN2 + MLP
# ---------------------------------------------------------------------------

def _attnout_ln_mlp_kernel(a_ref, xres_ref, wo_ref, so_lo_ref, so_hi_ref,
                           bo_ref, g2_ref, be2_ref, w1c_ref, s1_lo_ref,
                           s1_hi_ref, b1_ref, w2p_ref, s2_lo_ref, s2_hi_ref,
                           b2_ref, out_ref, y2_scr, *, eps):
    """Grid (1 + IH//TW,). Phase 0: out = r = xres + a@Wo + bo (+ b2),
    y2 = LN2(r). Phases j>0: out += gelu(y2@W1[cols jj]) @ W2[rows jj].

    Streamed blocks: w1c (D, TW) col-split tile, s1_* (G1, TW), w2p (TW, D)
    row-split tile. Constant operands: a/xres (B, D), wo (D/2, D) + scales,
    8-row-broadcast vectors, s2_* (G2, D), b1 (8, I)."""
    j = pl.program_id(0)
    B = a_ref.shape[0]
    D = a_ref.shape[1]
    D2 = D // 2
    G_D = D2 // TK

    @pl.when(j == 0)
    def _():
        lo, hi = _unpack(wo_ref[:])
        a = a_ref[:].astype(jnp.bfloat16)
        acc = jnp.zeros((B, D), jnp.float32)
        for g in range(G_D):                     # static python loop
            sl = slice(g * TK, (g + 1) * TK)
            acc += jax.lax.dot_general(
                a[:, sl], lo[sl, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * so_lo_ref[g:g + 1, :].astype(jnp.float32)
            acc += jax.lax.dot_general(
                a[:, D2 + g * TK:D2 + (g + 1) * TK], hi[sl, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * so_hi_ref[g:g + 1, :].astype(jnp.float32)
        r = (xres_ref[:].astype(jnp.float32) + acc
             + bo_ref[0:1, :].astype(jnp.float32))
        y2_scr[:] = _layer_norm_f32(r, g2_ref[0:1, :], be2_ref[0:1, :], eps)
        out_ref[:] = r + b2_ref[0:1, :].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        jj = j - 1
        IH = b1_ref.shape[1] // 2
        G1 = D // TK
        lo1, hi1 = _unpack(w1c_ref[:])          # (D, TW) each
        uA = jnp.broadcast_to(
            b1_ref[0:1, pl.ds(jj * TW, TW)].astype(jnp.float32), (B, TW))
        uB = jnp.broadcast_to(
            b1_ref[0:1, pl.ds(IH + jj * TW, TW)].astype(jnp.float32), (B, TW))
        for g in range(G1):                      # static python loop
            sl = slice(g * TK, (g + 1) * TK)
            yg = y2_scr[:, sl].astype(jnp.bfloat16)
            uA += jax.lax.dot_general(
                yg, lo1[sl, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s1_lo_ref[g:g + 1, :].astype(jnp.float32)
            uB += jax.lax.dot_general(
                yg, hi1[sl, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s1_hi_ref[g:g + 1, :].astype(jnp.float32)
        hA = _gelu_new_f32(uA).astype(jnp.bfloat16)
        hB = _gelu_new_f32(uB).astype(jnp.bfloat16)

        lo2, hi2 = _unpack(w2p_ref[:])          # (TW, D) each
        for g in range(TW // TK):                # static python loop
            sl = slice(g * TK, (g + 1) * TK)
            out_ref[:] += jax.lax.dot_general(
                hA[:, sl], lo2[sl, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s2_lo_ref[pl.ds(jj * (TW // TK) + g, 1), :].astype(jnp.float32)
            out_ref[:] += jax.lax.dot_general(
                hB[:, sl], hi2[sl, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s2_hi_ref[pl.ds(jj * (TW // TK) + g, 1), :].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def attnout_ln_mlp_int4(a, xres, wo, so_lo, so_hi, bo8, g28, be28,
                        w1c, s1_lo, s1_hi, b18, w2p, s2_lo, s2_hi, b28,
                        *, eps: float, interpret: bool | None = None):
    """Fused second half of a GPT-2 decode layer; returns new x, (B, D) f32.

    a: merged attention output (B, D); xres: residual input (B, D).
    wo (D/2, D) row-split int4 + so_* (D/2//TK, D).
    w1c (D, I/2) COLUMN-split int4 + s1_* (D//TK, I/2).
    w2p (I/2, D) row-split int4 + s2_* (I/2//TK, D).
    bo8/g28/be28/b28 (8, D), b18 (8, I): 8-row broadcast vectors."""
    if interpret is None:
        interpret = not _on_tpu()
    B, D = a.shape
    IH = w1c.shape[1]
    G1, G2, G_D = D // TK, IH // TK, (D // 2) // TK
    assert w1c.shape == (D, IH) and w2p.shape == (IH, D)
    assert IH % TW == 0 and D % (2 * TK) == 0
    grid = (1 + IH // TW,)
    c = lambda j: (0, 0)                        # constant-resident operands
    stream1 = lambda j: (0, jnp.maximum(j - 1, 0))
    stream2 = lambda j: (jnp.maximum(j - 1, 0), 0)
    return pl.pallas_call(
        functools.partial(_attnout_ln_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), c, memory_space=pltpu.VMEM),       # a
            pl.BlockSpec((B, D), c, memory_space=pltpu.VMEM),       # xres
            pl.BlockSpec((D // 2, D), c, memory_space=pltpu.VMEM),  # wo
            pl.BlockSpec((G_D, D), c, memory_space=pltpu.VMEM),     # so_lo
            pl.BlockSpec((G_D, D), c, memory_space=pltpu.VMEM),     # so_hi
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),       # bo8
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),       # g28
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),       # be28
            pl.BlockSpec((D, TW), stream1, memory_space=pltpu.VMEM),   # w1c
            pl.BlockSpec((G1, TW), stream1, memory_space=pltpu.VMEM),  # s1_lo
            pl.BlockSpec((G1, TW), stream1, memory_space=pltpu.VMEM),  # s1_hi
            pl.BlockSpec((8, 2 * IH), c, memory_space=pltpu.VMEM),  # b18
            pl.BlockSpec((TW, D), stream2, memory_space=pltpu.VMEM),   # w2p
            pl.BlockSpec((G2, D), c, memory_space=pltpu.VMEM),      # s2_lo
            pl.BlockSpec((G2, D), c, memory_space=pltpu.VMEM),      # s2_hi
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),       # b28
        ],
        out_specs=pl.BlockSpec((B, D), c, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        interpret=interpret,
    )(a, xres, wo, so_lo, so_hi, bo8, g28, be28,
      w1c, s1_lo, s1_hi, b18, w2p, s2_lo, s2_hi, b28)


# ---------------------------------------------------------------------------
# int8 variants — same fusion structure, XLA-equivalent weight bytes.
# Measured rationale (v5e): the int8 XLA matvecs already stream at ~700 GB/s,
# while int4 unpack is VPU-bound (~2 Tops) and loses; what's left on the
# table is per-XLA-op dispatch (~0.26 us × ~20 ops × 24 layers ≈ 130 us of
# the 880 us step). These kernels keep int8's 1-op-per-weight convert and
# only collapse the launch/op count.
# ---------------------------------------------------------------------------

TK8 = 512         # int8 k-tile (contraction rows per grid step)


def _ln_qkv_kernel_i8(x_ref, g_ref, b_ref, w_ref, s_ref, bias_ref,
                      out_ref, y_scr, *, eps, tk):
    """Grid (3D//tn, D//tk), k innermost. w (tk, tn) int8 streamed tile;
    s (8, tn) per-out-channel scale; out accumulates raw dots, scale+bias
    applied on the last k step."""
    n, k = pl.program_id(0), pl.program_id(1)
    n_k = pl.num_programs(1)

    @pl.when((n == 0) & (k == 0))
    def _():
        y_scr[:] = _layer_norm_f32(x_ref[:].astype(jnp.float32),
                                   g_ref[0:1, :], b_ref[0:1, :], eps)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = w_ref[:].astype(jnp.bfloat16)
    xk = y_scr[:, pl.ds(k * tk, tk)].astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        xk, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = (out_ref[:] * s_ref[0:1, :].astype(jnp.float32)
                      + bias_ref[0:1, :].astype(jnp.float32))


def _qkv_tiles(D: int, N: int):
    """Largest aligned tiles: fewer grid steps (measured per-grid-step
    overhead ~0.4 us dominates these small DMAs)."""
    tk = 1024 if D % 1024 == 0 else TK8
    tn = 1024 if N % 1024 == 0 else TN
    return tk, tn


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def ln_qkv_int8(x, g8, b8, w, s8, bias8, *, eps: float,
                interpret: bool | None = None):
    """x (B, D) -> LN(x) @ W + bias, (B, N) f32. w (D, N) int8 with
    per-out-channel scale s8 (8, N) (row 0 live)."""
    if interpret is None:
        interpret = not _on_tpu()
    B, D = x.shape
    _, N = w.shape
    tk, tn = _qkv_tiles(D, N)
    assert D % tk == 0 and N % tn == 0
    grid = (N // tn, D // tk)
    return pl.pallas_call(
        functools.partial(_ln_qkv_kernel_i8, eps=eps, tk=tk),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, D), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, D), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tn), lambda n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tn), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        interpret=interpret,
    )(x, g8, b8, w, s8, bias8)


def _attnout_ln_mlp_kernel_i8(a_ref, xres_ref, wo_ref, so_ref, bo_ref,
                              g2_ref, be2_ref, w1_ref, s1_ref, b1_ref,
                              w2_ref, s2_ref, b2_ref, out_ref, y2_scr,
                              *, eps):
    """Grid (1 + I//TW8,). Phase 0: r = xres + a@Wo*so + bo; y2 = LN2(r);
    out = r + b2. Phases j>0: out += gelu(y2 @ W1[:, jj] * s1 + b1) @
    (W2[jj] * s2-postdot). W1 tile (D, TW8); W2 tile (TW8, D)."""
    j = pl.program_id(0)
    B, D = a_ref.shape

    @pl.when(j == 0)
    def _():
        wo = wo_ref[:].astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            a_ref[:].astype(jnp.bfloat16), wo,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = (xres_ref[:].astype(jnp.float32)
             + acc * so_ref[0:1, :].astype(jnp.float32)
             + bo_ref[0:1, :].astype(jnp.float32))
        y2_scr[:] = _layer_norm_f32(r, g2_ref[0:1, :], be2_ref[0:1, :], eps)
        out_ref[:] = r + b2_ref[0:1, :].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        jj = j - 1
        TW8 = w1_ref.shape[1]
        u = jax.lax.dot_general(
            y2_scr[:].astype(jnp.bfloat16), w1_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        u = (u * s1_ref[0:1, pl.ds(jj * TW8, TW8)].astype(jnp.float32)
             + b1_ref[0:1, pl.ds(jj * TW8, TW8)].astype(jnp.float32))
        h = _gelu_new_f32(u).astype(jnp.bfloat16)
        pd = jax.lax.dot_general(
            h, w2_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # W2's per-out-channel scale is k-independent: apply per partial dot
        out_ref[:] += pd * s2_ref[0:1, :].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("eps", "tw", "interpret"))
def attnout_ln_mlp_int8(a, xres, wo, so8, bo8, g28, be28, w1, s18, b18,
                        w2, s28, b28, *, eps: float, tw: int = 1024,
                        interpret: bool | None = None):
    """Fused second half of a GPT-2 decode layer, int8 weights.

    wo (D, D), w1 (D, I), w2 (I, D) int8; s*8 (8, N) per-out-channel scales
    broadcast to 8 rows; b*8 (8, N) biases. Returns new x (B, D) f32."""
    if interpret is None:
        interpret = not _on_tpu()
    B, D = a.shape
    I = w1.shape[1]
    assert I % tw == 0
    grid = (1 + I // tw,)
    c = lambda j: (0, 0)
    s1m = lambda j: (0, jnp.maximum(j - 1, 0))
    s2m = lambda j: (jnp.maximum(j - 1, 0), 0)
    return pl.pallas_call(
        functools.partial(_attnout_ln_mlp_kernel_i8, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), c, memory_space=pltpu.VMEM),       # a
            pl.BlockSpec((B, D), c, memory_space=pltpu.VMEM),       # xres
            pl.BlockSpec((D, D), c, memory_space=pltpu.VMEM),       # wo
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),       # so
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),       # bo
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),       # g2
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),       # be2
            pl.BlockSpec((D, tw), s1m, memory_space=pltpu.VMEM),    # w1
            pl.BlockSpec((8, I), c, memory_space=pltpu.VMEM),       # s1
            pl.BlockSpec((8, I), c, memory_space=pltpu.VMEM),       # b1
            pl.BlockSpec((tw, D), s2m, memory_space=pltpu.VMEM),    # w2
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),       # s2
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),       # b2
        ],
        out_specs=pl.BlockSpec((B, D), c, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        interpret=interpret,
    )(a, xres, wo, so8, bo8, g28, be28, w1, s18, b18, w2, s28, b28)


# ---------------------------------------------------------------------------
# llama-family int8 fused decode-layer kernels (the 520M CFG backbone):
#   kernel A  rms_qkv_int8:        y = RMSNorm(x)·g; out = y @ [Wq|Wk|Wv]
#                                  (RoPE + attention stay outside)
#   kernel B  attnout_rms_glu_int8: r = x + attn @ Wo
#                                   y = RMSNorm(r)·g2
#                                   out = r + (silu(y@Wg) * (y@Wu)) @ Wd
# Same fusion rationale as the GPT-2 pair: per-XLA-op dispatch dominates the
# int8 decode step; these collapse ~22 XLA ops/layer into two launches.
# Reference behavior: LlamaDecoderLayer (HF modeling_llama; the reference's
# 520M T3 backbone — /root/reference/src/chatterbox/models/t3/
# llama_configs.py:1-33).
# ---------------------------------------------------------------------------


def _rms_norm_f32(x_f32, g_row, eps):
    var = jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True)
    return x_f32 * jax.lax.rsqrt(var + eps) * g_row.astype(jnp.float32)


def _silu_f32(x):
    return x * jax.lax.logistic(x)


def _rms_qkv_kernel_i8(x_ref, g_ref, w_ref, s_ref, out_ref, y_scr, *, eps,
                       tk):
    """Grid (N//tn, D//tk), k innermost. w (tk, tn) int8 streamed tile;
    s (8, tn) per-out-channel scale applied on the last k step."""
    n, k = pl.program_id(0), pl.program_id(1)
    n_k = pl.num_programs(1)

    @pl.when((n == 0) & (k == 0))
    def _():
        y_scr[:] = _rms_norm_f32(x_ref[:].astype(jnp.float32),
                                 g_ref[0:1, :], eps)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = w_ref[:].astype(jnp.bfloat16)
    xk = y_scr[:, pl.ds(k * tk, tk)].astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        xk, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = out_ref[:] * s_ref[0:1, :].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def rms_qkv_int8(x, g8, w, s8, *, eps: float, interpret: bool | None = None):
    """x (B, D) -> RMSNorm(x) @ W, (B, N) f32. w (D, N) int8, s8 (8, N)."""
    if interpret is None:
        interpret = not _on_tpu()
    B, D = x.shape
    _, N = w.shape
    tk, tn = _qkv_tiles(D, N)
    assert D % tk == 0 and N % tn == 0
    grid = (N // tn, D // tk)
    return pl.pallas_call(
        functools.partial(_rms_qkv_kernel_i8, eps=eps, tk=tk),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, D), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tn), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        interpret=interpret,
    )(x, g8, w, s8)


def _attnout_rms_glu_kernel_i8(a_ref, xres_ref, wo_ref, so_ref, g2_ref,
                               wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
                               out_ref, y2_scr, *, eps):
    """Grid (1 + I//TWL,). Phase 0: r = xres + a@Wo*so; y2 = RMSNorm(r);
    out = r. Phases j>0: out += (silu(y2@Wg_j*sg) * (y2@Wu_j*su)) @ Wd_j*sd.
    Streamed tiles: wg/wu (D, TWL), wd (TWL, D)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc = jax.lax.dot_general(
            a_ref[:].astype(jnp.bfloat16), wo_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = (xres_ref[:].astype(jnp.float32)
             + acc * so_ref[0:1, :].astype(jnp.float32))
        y2_scr[:] = _rms_norm_f32(r, g2_ref[0:1, :], eps)
        out_ref[:] = r

    @pl.when(j > 0)
    def _():
        jj = j - 1
        TWL = wg_ref.shape[1]
        y2 = y2_scr[:].astype(jnp.bfloat16)
        ug = jax.lax.dot_general(
            y2, wg_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        ) * sg_ref[0:1, pl.ds(jj * TWL, TWL)].astype(jnp.float32)
        uu = jax.lax.dot_general(
            y2, wu_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        ) * su_ref[0:1, pl.ds(jj * TWL, TWL)].astype(jnp.float32)
        h = (_silu_f32(ug) * uu).astype(jnp.bfloat16)
        pd = jax.lax.dot_general(
            h, wd_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # Wd's per-out-channel scale is k-independent: apply per partial dot
        out_ref[:] += pd * sd_ref[0:1, :].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("eps", "tw", "interpret"))
def attnout_rms_glu_int8(a, xres, wo, so8, g28, wg, sg8, wu, su8, wd, sd8,
                         *, eps: float, tw: int = 1024,
                         interpret: bool | None = None):
    """Fused second half of a llama decode layer, int8 weights.

    a: merged attention output (B, H·hd); xres (B, D); wo (H·hd, D),
    wg/wu (D, I), wd (I, D) int8; s*8 (8, N) per-out-channel scales.
    Returns new x (B, D) f32."""
    if interpret is None:
        interpret = not _on_tpu()
    B, D = xres.shape
    I = wg.shape[1]
    assert I % tw == 0
    grid = (1 + I // tw,)
    c = lambda j: (0, 0)
    scol = lambda j: (0, jnp.maximum(j - 1, 0))
    srow = lambda j: (jnp.maximum(j - 1, 0), 0)
    return pl.pallas_call(
        functools.partial(_attnout_rms_glu_kernel_i8, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, a.shape[1]), c, memory_space=pltpu.VMEM),   # a
            pl.BlockSpec((B, D), c, memory_space=pltpu.VMEM),            # xres
            pl.BlockSpec((a.shape[1], D), c, memory_space=pltpu.VMEM),   # wo
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),            # so
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),            # g2
            pl.BlockSpec((D, tw), scol, memory_space=pltpu.VMEM),        # wg
            pl.BlockSpec((8, I), c, memory_space=pltpu.VMEM),            # sg
            pl.BlockSpec((D, tw), scol, memory_space=pltpu.VMEM),        # wu
            pl.BlockSpec((8, I), c, memory_space=pltpu.VMEM),            # su
            pl.BlockSpec((tw, D), srow, memory_space=pltpu.VMEM),        # wd
            pl.BlockSpec((8, D), c, memory_space=pltpu.VMEM),            # sd
        ],
        out_specs=pl.BlockSpec((B, D), c, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        interpret=interpret,
    )(a, xres, wo, so8, g28, wg, sg8, wu, su8, wd, sd8)


def fused_llama_supported(cfg) -> bool:
    """Tile-alignment requirements of the llama int8 kernel pair."""
    D, I = cfg.hidden_size, cfg.intermediate_size
    N = (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim
    return (not cfg.is_gpt and D % TK8 == 0 and N % TN == 0
            and I % 512 == 0 and (cfg.num_heads * cfg.head_dim) == D)


def llama_mlp_tile(cfg) -> int:
    return 1024 if cfg.intermediate_size % 1024 == 0 else 512


def prepare_fused_llama_layer_int8(lp: dict) -> dict:
    """Fused-kernel operands from an int8-quantized llama layer dict
    ({"q","k","v","o","gate","up","down"} carrying {"w_q","w_scale"}).
    q|k|v are concatenated into one (D, (H+2KV)·hd) matvec operand (the
    separate per-projection tensors stay for prefill)."""
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        assert "w_q" in lp[name], "quantize int8 first"
    qkv_w = jnp.concatenate([lp["q"]["w_q"], lp["k"]["w_q"], lp["v"]["w_q"]],
                            axis=1)
    qkv_s = jnp.concatenate([lp["q"]["w_scale"], lp["k"]["w_scale"],
                             lp["v"]["w_scale"]])
    return {
        "g1_8": _bcast8(lp["input_ln"]["g"]),
        "qkv_w": qkv_w, "qkv_s8": _bcast8(qkv_s),
        "wo_w": lp["o"]["w_q"], "wo_s8": _bcast8(lp["o"]["w_scale"]),
        "g2_8": _bcast8(lp["post_ln"]["g"]),
        "wg": lp["gate"]["w_q"], "sg_8": _bcast8(lp["gate"]["w_scale"]),
        "wu": lp["up"]["w_q"], "su_8": _bcast8(lp["up"]["w_scale"]),
        "wd": lp["down"]["w_q"], "sd_8": _bcast8(lp["down"]["w_scale"]),
    }


def apply_fused_llama_qkv_int8(fl: dict, x2d, eps: float):
    """(B, D) -> (B, (H+2KV)·hd) f32 via the rms+qkv kernel."""
    return rms_qkv_int8(x2d, fl["g1_8"], fl["qkv_w"], fl["qkv_s8"], eps=eps)


def apply_fused_llama_mlp_int8(fl: dict, attn2d, xres2d, eps: float, tw: int):
    return attnout_rms_glu_int8(
        attn2d, xres2d, fl["wo_w"], fl["wo_s8"], fl["g2_8"],
        fl["wg"], fl["sg_8"], fl["wu"], fl["su_8"], fl["wd"], fl["sd_8"],
        eps=eps, tw=tw)


def prepare_fused_gpt2_layer_int8(lp: dict) -> dict:
    """Fused-kernel operands from an int8-quantized GPT-2 layer dict
    ({"qkv","attn_out","fc_in","fc_out"} carrying {"w_q","w_scale","b"})."""
    for name in ("qkv", "attn_out", "fc_in", "fc_out"):
        assert "w_q" in lp[name], "quantize int8 first"
    return {
        "g1_8": _bcast8(lp["ln1"]["g"]), "b1_8": _bcast8(lp["ln1"]["b"]),
        "qkv_w": lp["qkv"]["w_q"], "qkv_s8": _bcast8(lp["qkv"]["w_scale"]),
        "qkv_b8": _bcast8(lp["qkv"]["b"]),
        "wo_w": lp["attn_out"]["w_q"],
        "wo_s8": _bcast8(lp["attn_out"]["w_scale"]),
        "wo_b8": _bcast8(lp["attn_out"]["b"]),
        "g2_8": _bcast8(lp["ln2"]["g"]), "b2_8": _bcast8(lp["ln2"]["b"]),
        "w1": lp["fc_in"]["w_q"], "s1_8": _bcast8(lp["fc_in"]["w_scale"]),
        "fc1_b8": _bcast8(lp["fc_in"]["b"]),
        "w2": lp["fc_out"]["w_q"], "s2_8": _bcast8(lp["fc_out"]["w_scale"]),
        "fc2_b8": _bcast8(lp["fc_out"]["b"]),
    }


def apply_fused_gpt2_qkv_int8(fl: dict, x2d, eps: float):
    return ln_qkv_int8(x2d, fl["g1_8"], fl["b1_8"], fl["qkv_w"],
                       fl["qkv_s8"], fl["qkv_b8"], eps=eps)


def apply_fused_gpt2_mlp_int8(fl: dict, attn2d, xres2d, eps: float):
    return attnout_ln_mlp_int8(
        attn2d, xres2d, fl["wo_w"], fl["wo_s8"], fl["wo_b8"],
        fl["g2_8"], fl["b2_8"], fl["w1"], fl["s1_8"], fl["fc1_b8"],
        fl["w2"], fl["s2_8"], fl["fc2_b8"], eps=eps)


# ---------------------------------------------------------------------------
# operand preparation
# ---------------------------------------------------------------------------

def fused_gpt2_supported(cfg) -> bool:
    """Tile-alignment requirements of the two kernels."""
    D, I = cfg.hidden_size, cfg.intermediate_size
    return (cfg.is_gpt and D % (2 * TK) == 0 and (3 * D) % TN == 0
            and (I // 2) % TW == 0 and (I // 2) % TK == 0 and I % 2 == 0)


def _bcast8(v):
    return jnp.broadcast_to(jnp.asarray(v, jnp.float32)[None, :], (8, v.shape[-1]))


def prepare_fused_gpt2_layer(lp: dict, eps: float) -> dict:
    """Build the fused-kernel operand dict from an int4-quantized GPT-2 layer
    dict ({"ln1","qkv","attn_out","ln2","fc_in","fc_out"}). Row-packed
    weights (qkv/attn_out/fc_out) are shared by reference with the unfused
    params; fc_in must carry the COLUMN-split packing ("w_q4c")."""
    assert "w_q4" in lp["qkv"] and "w_q4" in lp["attn_out"], "quantize int4 first"
    assert "w_q4c" in lp["fc_in"], "fc_in needs col-split packing (int4_fused mode)"
    assert "w_q4" in lp["fc_out"]
    del eps  # eps comes from cfg at apply time (static jit arg)
    return {
        "g1_8": _bcast8(lp["ln1"]["g"]), "b1_8": _bcast8(lp["ln1"]["b"]),
        "qkv_wp": lp["qkv"]["w_q4"],
        "qkv_slo": lp["qkv"]["w_scale4_lo"], "qkv_shi": lp["qkv"]["w_scale4_hi"],
        "qkv_b8": _bcast8(lp["qkv"]["b"]),
        "wo_wp": lp["attn_out"]["w_q4"],
        "wo_slo": lp["attn_out"]["w_scale4_lo"],
        "wo_shi": lp["attn_out"]["w_scale4_hi"],
        "wo_b8": _bcast8(lp["attn_out"]["b"]),
        "g2_8": _bcast8(lp["ln2"]["g"]), "b2_8": _bcast8(lp["ln2"]["b"]),
        "w1c": lp["fc_in"]["w_q4c"],
        "s1_lo": lp["fc_in"]["w_scale4c_lo"], "s1_hi": lp["fc_in"]["w_scale4c_hi"],
        "fc1_b8": _bcast8(lp["fc_in"]["b"]),
        "w2p": lp["fc_out"]["w_q4"],
        "s2_lo": lp["fc_out"]["w_scale4_lo"], "s2_hi": lp["fc_out"]["w_scale4_hi"],
        "fc2_b8": _bcast8(lp["fc_out"]["b"]),
    }


def apply_fused_gpt2_qkv(fl: dict, x2d, eps: float):
    """(B, D) -> (B, 3D) f32 via kernel A."""
    return ln_qkv_int4(x2d, fl["g1_8"], fl["b1_8"], fl["qkv_wp"],
                       fl["qkv_slo"], fl["qkv_shi"], fl["qkv_b8"], eps=eps)


def apply_fused_gpt2_mlp(fl: dict, attn2d, xres2d, eps: float):
    """(B, D) attn + residual -> new x (B, D) f32 via kernel B."""
    return attnout_ln_mlp_int4(
        attn2d, xres2d, fl["wo_wp"], fl["wo_slo"], fl["wo_shi"], fl["wo_b8"],
        fl["g2_8"], fl["b2_8"], fl["w1c"], fl["s1_lo"], fl["s1_hi"],
        fl["fc1_b8"], fl["w2p"], fl["s2_lo"], fl["s2_hi"], fl["fc2_b8"],
        eps=eps)
