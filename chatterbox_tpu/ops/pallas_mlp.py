"""Pallas TPU kernel: fused decode-step MLP block.

Computes  x + fc_out(gelu_new(fc_in(layer_norm(x))))  for a single-token
decode step in one kernel — the XLA path is ~5 separate ops whose tiny
intermediates round-trip through HBM. Weights are weight-only int8
(utils/quantize.py) and fit VMEM (GPT2-medium: 4 MB + 4 MB).

Library kernel, currently NOT wired into the decode loop: measured slower
than the XLA path on v5e (the whole-weight VMEM copy-in is a blocking
prologue, while XLA's dot streams weights overlapped with compute). Kept for
future double-buffered variants and batched experimentation.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                b2_ref, out_ref):
    """x: (B, D); ln params (D,); w1 int8 (D, I), s1 (I,), b1 (I,);
    w2 int8 (I, D), s2 (D,), b2 (D,). out: (B, D)."""
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) * (x - mu), axis=-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    h = h * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)

    h1 = jax.lax.dot_general(
        h.astype(jnp.bfloat16), w1_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h1 = h1 * s1_ref[:].astype(jnp.float32) + b1_ref[:].astype(jnp.float32)
    # gelu_new (tanh approximation, GPT-2)
    c = math.sqrt(2.0 / math.pi)
    h1 = 0.5 * h1 * (1.0 + jnp.tanh(c * (h1 + 0.044715 * h1 * h1 * h1)))

    h2 = jax.lax.dot_general(
        h1.astype(jnp.bfloat16), w2_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h2 = h2 * s2_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32)
    out_ref[:] = (x + h2).astype(out_ref.dtype)


def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mlp_int8(x: jnp.ndarray, ln_g, ln_b, w1_q, s1, b1, w2_q, s2, b2,
                   interpret: bool | None = None) -> jnp.ndarray:
    """x: (B, D) single-token hidden. Returns x + MLP(LN(x))."""
    if interpret is None:
        interpret = not _on_tpu()
    return pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, ln_g, ln_b, w1_q, s1, b1, w2_q, s2, b2)
