"""Pallas TPU kernel: grid-pipelined int4 weight-only matmul for decode.

Single-token decode is weight-bandwidth bound; int8 weights already halve the
HBM bytes vs bf16, and nibble-packed int4 halves them again. XLA cannot fuse
the nibble unpack into a dot's operand read (measured: the unpacked weights
round-trip HBM, 7x slower), so this kernel does it in VMEM:

  * the packed (K/2, N) byte matrix streams HBM→VMEM in (TK, TN) grid tiles —
    Pallas double-buffers consecutive grid steps, so the DMA of tile i+1
    overlaps the compute on tile i (the property the round-1 whole-weight
    VMEM kernel lacked);
  * SPLIT-HALF packing (utils/quantize.py): low nibble = row r, high nibble =
    row r + K/2, so unpacking is two shift ops and NO sublane interleave —
    the tile feeds two MXU dots (x_lo @ W_lo + x_hi @ W_hi);
  * the per-group dequant scales are constant within a k-tile (group = TK),
    so they multiply the (B, TN) dot RESULT, not the weight tile.

Used by nn.linear for {"w_q4", ...} params on TPU; interpret-mode fallback
elsewhere keeps CPU tests exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TK = 256          # packed k-tile (rows of the packed matrix) == scale group
TN = 512          # n-tile


def _int4_matvec_kernel(x_ref, wp_ref, slo_ref, shi_ref, out_ref):
    """Grid (N//TN, K2//TK), k innermost. x (B, K) whole; wp (TK, TN) tile;
    slo/shi (n_groups, TN) whole-k column (row k selected in-kernel — a
    (1, TN) block would violate the (8,128) tiling rule); out (B, TN) f32
    accumulated across k steps."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # int32 mask arithmetic (int8 shifts don't lower reliably in Mosaic):
    # byte = q_hi*16 + (q_lo & 15)  →  hi = byte >> 4 (arithmetic floor),
    # lo = ((byte & 15) ^ 8) - 8 (4-bit sign decode)
    wp = wp_ref[:].astype(jnp.int32)
    lo = (jnp.bitwise_xor(jnp.bitwise_and(wp, 15), 8) - 8).astype(jnp.bfloat16)
    hi = jnp.right_shift(wp, 4).astype(jnp.bfloat16)

    K2 = x_ref.shape[1] // 2
    xl = x_ref[:, pl.ds(k * TK, TK)].astype(jnp.bfloat16)
    xh = x_ref[:, pl.ds(K2 + k * TK, TK)].astype(jnp.bfloat16)

    acc_lo = jax.lax.dot_general(
        xl, lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_hi = jax.lax.dot_general(
        xh, hi, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    slo = slo_ref[pl.ds(k, 1), :].astype(jnp.float32)
    shi = shi_ref[pl.ds(k, 1), :].astype(jnp.float32)
    out_ref[:] += acc_lo * slo + acc_hi * shi


def _on_tpu() -> bool:
    from . import on_tpu
    return on_tpu()


def int4_supported(in_dim: int, out_dim: int) -> bool:
    return (in_dim % (2 * TK) == 0) and (out_dim % TN == 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_int4(x: jnp.ndarray, w_packed: jnp.ndarray, scale_lo: jnp.ndarray,
                scale_hi: jnp.ndarray, interpret: bool | None = None):
    """x (B, K) @ int4-packed weights -> (B, N) float32.

    w_packed (K/2, N) split-half nibbles; scale_lo/hi (K/2/TK, N)."""
    if interpret is None:
        interpret = not _on_tpu()
    B, K = x.shape
    K2, N = w_packed.shape
    assert K == 2 * K2 and K2 % TK == 0 and N % TN == 0
    assert scale_lo.shape == (K2 // TK, N)
    grid = (N // TN, K2 // TK)
    return pl.pallas_call(
        _int4_matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda n, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2 // TK, TN), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2 // TK, TN), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w_packed, scale_lo, scale_hi)


def matmul_int4c_xla(x: jnp.ndarray, w_packed: jnp.ndarray,
                     scale_lo: jnp.ndarray, scale_hi: jnp.ndarray):
    """XLA path for COLUMN-split int4 packing (quantize_linear_weight_int4_
    colsplit): w_packed (K, N/2), byte[r,c] = (W[r,c] lo, W[r, c+N/2] hi);
    scales (K//group, N/2) along the contraction dim. Used for prefill-sized
    inputs; the decode path consumes this packing inside the fused layer
    kernel (ops/fused_layer.py)."""
    from ..utils.quantize import unpack_int4
    K, NH = w_packed.shape
    n_g = scale_lo.shape[0]
    g = K // n_g
    lo, hi = unpack_int4(w_packed, x.dtype)
    w_lo = (lo.reshape(n_g, g, NH) * scale_lo[:, None, :].astype(x.dtype)
            ).reshape(K, NH)
    w_hi = (hi.reshape(n_g, g, NH) * scale_hi[:, None, :].astype(x.dtype)
            ).reshape(K, NH)
    return jnp.concatenate([x @ w_lo, x @ w_hi], axis=-1).astype(jnp.float32)


def matmul_int4_xla(x: jnp.ndarray, w_packed: jnp.ndarray,
                    scale_lo: jnp.ndarray, scale_hi: jnp.ndarray):
    """Pure-XLA reference/fallback (slow on TPU: the unpack materializes)."""
    from ..utils.quantize import unpack_int4
    K2, N = w_packed.shape
    n_g = scale_lo.shape[0]
    g = K2 // n_g
    lo, hi = unpack_int4(w_packed, x.dtype)
    w_lo = (lo.reshape(n_g, g, N) * scale_lo[:, None, :].astype(x.dtype)
            ).reshape(K2, N)
    w_hi = (hi.reshape(n_g, g, N) * scale_hi[:, None, :].astype(x.dtype)
            ).reshape(K2, N)
    return (x[:, :K2] @ w_lo + x[:, K2:] @ w_hi).astype(jnp.float32)
