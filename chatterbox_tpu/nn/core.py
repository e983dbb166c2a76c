"""Functional NN building blocks (pure JAX, channels-last).

Design notes (TPU-first):
  * Parameters are plain nested dicts of jnp arrays ("pytrees") — trivially
    shardable with jax.sharding and donate-able across jit boundaries.
  * All sequence tensors are (B, T, C) — the feature axis maps onto TPU
    lanes and matmuls hit the MXU without layout churn (the torch reference
    is channels-first; the weight converter transposes once at load time).
  * Linear weights are stored (in, out) so application is `x @ w`.
  * Conv kernels are stored (K, Cin, Cout) for lax dimension_numbers
    ("NWC", "WIO", "NWC"). Transposed convs are stored pre-flipped so they
    lower to a single input-dilated regular conv.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True) -> dict:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": _uniform(k1, (in_dim, out_dim), bound)}
    if bias:
        p["b"] = _uniform(k2, (out_dim,), bound)
    return p


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p:
        # weight-only int8 (utils/quantize.py): convert fuses into the dot's
        # weight read; per-output-channel scale applied post-matmul
        y = x @ p["w_q"].astype(x.dtype)
        y = y * p["w_scale"].astype(y.dtype)
    elif "w_q4" in p:
        # weight-only int4 (split-half nibble-packed, ops/int4_matmul.py):
        # grid-pipelined Pallas kernel unpacks in VMEM — halves the decode
        # step's weight HBM traffic vs int8
        from ..ops.int4_matmul import matmul_int4, matmul_int4_xla
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if x2.shape[0] <= 8:
            y = matmul_int4(x2, p["w_q4"], p["w_scale4_lo"], p["w_scale4_hi"])
        else:  # prefill-sized rows: one XLA unpack amortizes fine
            y = matmul_int4_xla(x2, p["w_q4"], p["w_scale4_lo"], p["w_scale4_hi"])
        y = y.astype(x.dtype).reshape(*lead, -1)
    elif "w_q4c" in p:
        # COLUMN-split int4 packing (fc_in inside a fused decode layer —
        # ops/fused_layer.py). Only prefill reaches this branch; the decode
        # step consumes w_q4c inside the fused kernel directly.
        from ..ops.int4_matmul import matmul_int4c_xla
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        y = matmul_int4c_xla(x2, p["w_q4c"], p["w_scale4c_lo"], p["w_scale4c_hi"])
        y = y.astype(x.dtype).reshape(*lead, -1)
    else:
        y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def embedding_init(key, num: int, dim: int, std: float = 0.02) -> dict:
    return {"w": jax.random.normal(key, (num, dim), jnp.float32) * std}


def embedding(p: dict, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["w"], ids, axis=0)


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int) -> dict:
    return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * p["g"] + p["b"]


def rms_norm_init(dim: int) -> dict:
    return {"g": jnp.ones((dim,))}


def rms_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # llama RMSNorm: normalize in fp32, scale, cast back.
    dt = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    return (y * p["g"]).astype(dt)


def group_norm_init(channels: int) -> dict:
    return {"g": jnp.ones((channels,)), "b": jnp.zeros((channels,))}


def group_norm(p: dict, x: jnp.ndarray, groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """x: (B, T, C) channels-last. torch.nn.GroupNorm semantics (stats over
    (T, C//G) per group)."""
    B, T, C = x.shape
    g = x.reshape(B, T, groups, C // groups)
    mu = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.var(g, axis=(1, 3), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(B, T, C) * p["g"] + p["b"]


def batch_norm_init(channels: int) -> dict:
    # inference-only batch norm: running stats + affine
    return {"g": jnp.ones((channels,)), "b": jnp.zeros((channels,)),
            "mean": jnp.zeros((channels,)), "var": jnp.ones((channels,))}


def batch_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5, affine: bool = True) -> jnp.ndarray:
    """Inference-mode BatchNorm over the channel (last) axis."""
    y = (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)
    if affine:
        y = y * p["g"] + p["b"]
    return y


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x):
    """GPT-2's gelu ('gelu_new' in HF): tanh approximation."""
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def is_key_batch(key) -> bool:
    """True iff `key` is a (B,) array of TYPED prng keys (per-row RNG fan-out).

    A legacy uint32 `jax.random.PRNGKey` is shape (2,) with ndim 1 too, so
    the dtype check is required — legacy keys must take the scalar-key path
    (they still work with split/normal/uniform)."""
    import jax.dtypes
    return key.ndim == 1 and jax.dtypes.issubdtype(key.dtype,
                                                   jax.dtypes.prng_key)


def snake(x, alpha, eps: float = 1e-9):
    """Snake activation x + sin^2(alpha x)/alpha, per-channel alpha.
    x: (B, T, C), alpha: (C,).  (ref: models/s3gen/hifigan.py:73-84)"""
    s = jnp.sin(x * alpha)
    return x + s * s / (alpha + eps)


def leaky_relu(x, slope: float = 0.1):
    return jnp.where(x >= 0, x, x * slope)


def elu(x):
    return jnp.where(x > 0, x, jnp.expm1(x))


ACT = {
    "relu": jax.nn.relu,
    "silu": silu,
    "swish": silu,
    "gelu": gelu_exact,
    "gelu_new": gelu_new,
    "mish": mish,
    "elu": elu,
    "tanh": jnp.tanh,
}


# ---------------------------------------------------------------------------
# convolutions (channels-last)
# ---------------------------------------------------------------------------

_CONV_DN = ("NWC", "WIO", "NWC")


def conv1d_init(key, in_ch: int, out_ch: int, k: int, bias: bool = True,
                groups: int = 1) -> dict:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch // groups * k)
    p = {"w": _uniform(k1, (k, in_ch // groups, out_ch), bound)}
    if bias:
        p["b"] = _uniform(k2, (out_ch,), bound)
    return p


def conv1d(p: dict, x: jnp.ndarray, stride: int = 1, padding=0, dilation: int = 1,
           groups: int = 1) -> jnp.ndarray:
    """x: (B, T, C). padding: int (symmetric) or (lo, hi) tuple or 'SAME'."""
    if isinstance(padding, int):
        pad = [(padding, padding)]
    elif padding == "SAME":
        pad = "SAME"
    else:
        pad = [tuple(padding)]
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=pad,
        rhs_dilation=(dilation,), dimension_numbers=_CONV_DN,
        feature_group_count=groups)
    if "b" in p:
        y = y + p["b"]
    return y


def causal_conv1d(p: dict, x: jnp.ndarray, k: int, dilation: int = 1) -> jnp.ndarray:
    """Left-padded conv (ref: models/s3gen/decoder.py:72-98)."""
    return conv1d(p, x, padding=((k - 1) * dilation, 0), dilation=dilation)


def conv_transpose1d_init(key, in_ch: int, out_ch: int, k: int, bias: bool = True) -> dict:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * k)  # torch uses fan_in = in_ch*k for transpose too
    # stored in regular-conv orientation (K, Cout_as_in? no): we store the
    # kernel already flipped + transposed so apply is one dilated conv:
    # shape (K, Cin, Cout).
    p = {"w": _uniform(k1, (k, in_ch, out_ch), bound)}
    if bias:
        p["b"] = _uniform(k2, (out_ch,), bound)
    return p


def conv_transpose1d(p: dict, x: jnp.ndarray, stride: int, k: int, padding: int = 0) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d equivalent. Kernel stored pre-flipped
    (converter does w_t.permute(2,0,1)[::-1]); here it is a plain
    input-dilated conv — XLA lowers this efficiently on TPU."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,), dimension_numbers=_CONV_DN)
    if "b" in p:
        y = y + p["b"]
    return y


def conv2d_init(key, in_ch: int, out_ch: int, k, stride=1, bias: bool = True) -> dict:
    if isinstance(k, int):
        k = (k, k)
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * k[0] * k[1])
    p = {"w": _uniform(k1, (*k, in_ch, out_ch), bound)}
    if bias:
        p["b"] = _uniform(k2, (out_ch,), bound)
    return p


def conv2d(p: dict, x: jnp.ndarray, stride=(1, 1), padding=(0, 0)) -> jnp.ndarray:
    """x: (B, H, W, C) channels-last 2-D conv (for CAMPPlus's FCM stem)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# LSTM (for the GE2E voice encoder)
# ---------------------------------------------------------------------------

def lstm_init(key, input_size: int, hidden_size: int, num_layers: int) -> dict:
    layers = []
    for i in range(num_layers):
        in_dim = input_size if i == 0 else hidden_size
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        bound = 1.0 / math.sqrt(hidden_size)
        layers.append({
            "w_ih": _uniform(k1, (in_dim, 4 * hidden_size), bound),
            "w_hh": _uniform(k2, (hidden_size, 4 * hidden_size), bound),
            "b_ih": _uniform(k3, (4 * hidden_size,), bound),
            "b_hh": _uniform(k4, (4 * hidden_size,), bound),
        })
    return {"layers": layers}


def lstm(p: dict, x: jnp.ndarray):
    """Multi-layer LSTM over (B, T, C). Returns (outputs, (h_n, c_n)) with
    torch gate ordering (i, f, g, o). Runs as lax.scan over time."""
    B, T, _ = x.shape
    h_last, c_last = [], []
    for lp in p["layers"]:
        H = lp["w_hh"].shape[0]
        x_proj = x @ lp["w_ih"] + lp["b_ih"] + lp["b_hh"]  # (B, T, 4H)

        def step(carry, xt):
            h, c = carry
            gates = xt + h @ lp["w_hh"]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
        (h_n, c_n), ys = jax.lax.scan(step, init, jnp.swapaxes(x_proj, 0, 1))
        x = jnp.swapaxes(ys, 0, 1)
        h_last.append(h_n)
        c_last.append(c_n)
    return x, (jnp.stack(h_last), jnp.stack(c_last))


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        scale: Optional[float] = None) -> jnp.ndarray:
    """Multi-head attention core.

    q: (B, H, Tq, D), k/v: (B, H, Tk, D). bias added to scores; mask is a
    boolean keep-mask broadcastable to (B, H, Tq, Tk). fp32 softmax.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if mask is not None:
        probs = jnp.where(mask, probs, 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    B, T, C = x.shape
    return x.reshape(B, T, n_heads, C // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, H, T, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * D)
