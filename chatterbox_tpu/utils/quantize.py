"""Weight-only int8 quantization for serving.

Halves the HBM bytes per decode step — the T3 decode loop is weight-bandwidth
bound at batch 1, so this directly raises tokens/sec. Per-output-channel
symmetric scales; the dequant (`convert` + per-channel multiply) fuses into
the XLA dot on TPU.

Applied to 2-D linear weights in the backbone (attention/MLP/heads);
embeddings, norms and biases stay in high precision.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_linear_weight(w: jnp.ndarray):
    """(in, out) float -> (w_q int8 (in,out), scale (out,) fp32)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


INT4_GROUP = 256          # contraction-dim group per scale (= kernel k-tile)


def quantize_linear_weight_int4(w: jnp.ndarray, group: int = INT4_GROUP):
    """(in, out) float -> (w_q4 int8 (in//2, out) nibble-packed split-half,
                           scale_lo/scale_hi (in//2//group, out) fp32).

    Group-wise symmetric scales along the contraction dim: int4 has only 15
    levels, so per-output-channel scaling (the int8 scheme) loses too much.

    SPLIT-HALF packing: byte[r, n] holds row r in the low nibble and row
    r + in/2 in the high nibble. Unpacking is then two shift ops + NO row
    interleave — the int4 matvec kernel (ops/int4_matmul.py) computes
    x_lo @ W_lo + x_hi @ W_hi directly from the packed block, and the scales
    are constant within a k-tile so they apply AFTER the dot. (Native
    jnp.int4 arrays hit a relay bug when passed as jit arguments on the axon
    backend, so the packing is explicit.)"""
    in_dim, out_dim = w.shape
    assert in_dim % 2 == 0
    half = in_dim // 2
    if half % group != 0:
        group = half                         # degenerate: one group per half
    n_g = half // group

    def q_half(wh):                          # (half, out) -> int8 vals + scale
        wg = wh.astype(jnp.float32).reshape(n_g, group, out_dim)
        amax = jnp.max(jnp.abs(wg), axis=1)
        scale = jnp.maximum(amax / 7.0, 1e-12)
        q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
        return q.reshape(half, out_dim).astype(jnp.int8), scale.astype(jnp.float32)

    q_lo, s_lo = q_half(w[:half])
    q_hi, s_hi = q_half(w[half:])
    packed = (jnp.left_shift(q_hi, 4) | (q_lo & 0x0F)).astype(jnp.int8)
    return packed, s_lo, s_hi


def quantize_linear_weight_int4_colsplit(w: jnp.ndarray, group: int = INT4_GROUP):
    """(in, out) float -> (w_q4c int8 (in, out//2) nibble-packed COLUMN-split,
                           scale_lo/scale_hi (in//group, out//2) fp32).

    Column-split packing: byte[r, c] holds W[r, c] in the low nibble and
    W[r, c + out/2] in the high nibble. Used by the fused decode-layer kernel
    (ops/fused_layer.py) for fc_in, whose grid phase j consumes hidden units
    {j·TW..} ∪ {out/2 + j·TW..} — with column pairing those are ONE contiguous
    packed block. Scales are group-wise along the contraction (row) dim so
    they still apply to the dot result per k-group."""
    in_dim, out_dim = w.shape
    assert out_dim % 2 == 0
    half = out_dim // 2
    if in_dim % group != 0:
        group = in_dim
    n_g = in_dim // group

    def q_half(wh):                          # (in, half) -> int8 vals + scale
        wg = wh.astype(jnp.float32).reshape(n_g, group, half)
        amax = jnp.max(jnp.abs(wg), axis=1)
        scale = jnp.maximum(amax / 7.0, 1e-12)
        q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
        return q.reshape(in_dim, half).astype(jnp.int8), scale.astype(jnp.float32)

    q_lo, s_lo = q_half(w[:, :half])
    q_hi, s_hi = q_half(w[:, half:])
    packed = (jnp.left_shift(q_hi, 4) | (q_lo & 0x0F)).astype(jnp.int8)
    return packed, s_lo, s_hi


def unpack_int4(w_packed: jnp.ndarray, dtype=jnp.float32):
    """(in//2, out) split-half packed int8 -> (lo (in//2,out), hi (in//2,out))
    int values in [-7, 7] (rows [0, in/2) and [in/2, in) respectively)."""
    lo = jnp.right_shift(jnp.left_shift(w_packed, 4), 4)      # sign-extend
    hi = jnp.right_shift(w_packed, 4)                         # arithmetic
    return lo.astype(dtype), hi.astype(dtype)


def quantize_tree(params, min_size: int = 1 << 16, mode: str = "int8",
                  group: int = INT4_GROUP):
    """Replace {"w": 2-D float} dicts with {"w_q", "w_scale"} (int8) or
    {"w_q4", "w_scale4"} (int4) throughout a param tree (only matmul weights
    above min_size elements)."""
    def walk(node):
        if isinstance(node, dict):
            if ("w" in node and hasattr(node["w"], "ndim") and node["w"].ndim == 2
                    and node["w"].size >= min_size
                    and jnp.issubdtype(node["w"].dtype, jnp.floating)):
                out = {k: walk(v) for k, v in node.items() if k != "w"}
                from ..ops.int4_matmul import int4_supported
                if mode == "int4" and int4_supported(*node["w"].shape):
                    w_q, s_lo, s_hi = quantize_linear_weight_int4(node["w"], group)
                    out["w_q4"] = w_q
                    out["w_scale4_lo"] = s_lo
                    out["w_scale4_hi"] = s_hi
                else:
                    w_q, scale = quantize_linear_weight(node["w"])
                    out["w_q"] = w_q
                    out["w_scale"] = scale
                return out
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node
    return walk(params)


def _quantize_gpt2_layer_fused(lp: dict, eps: float) -> dict:
    """int4-quantize one GPT-2 layer for the fused decode kernels
    (ops/fused_layer.py): qkv/attn_out/fc_out row-split packed, fc_in
    COLUMN-split packed, plus the precomputed "fused" operand dict (which
    shares the packed arrays by reference — no weight duplication)."""
    from ..ops.fused_layer import prepare_fused_gpt2_layer
    out = {}
    for name in ("qkv", "attn_out", "fc_out"):
        w_q, s_lo, s_hi = quantize_linear_weight_int4(lp[name]["w"])
        out[name] = {"w_q4": w_q, "w_scale4_lo": s_lo, "w_scale4_hi": s_hi,
                     "b": lp[name]["b"]}
    w_q, s_lo, s_hi = quantize_linear_weight_int4_colsplit(lp["fc_in"]["w"])
    out["fc_in"] = {"w_q4c": w_q, "w_scale4c_lo": s_lo, "w_scale4c_hi": s_hi,
                    "b": lp["fc_in"]["b"]}
    out["ln1"], out["ln2"] = lp["ln1"], lp["ln2"]
    out["fused"] = prepare_fused_gpt2_layer(out, eps)
    return out


def best_serving_mode(cfg) -> str:
    """Pick the fastest measured quantization mode for a backbone config.

    v5e measurements (DESIGN.md): plain int8 XLA matvecs stream at ~700 GB/s;
    the fused int8 decode-layer kernels (ops/fused_layer.py) add +18 % by
    collapsing per-op dispatch (1331 vs 1130 tok/s, GPT2-medium); int4 is
    VPU-unpack-bound and loses. The fused kernels need tile-aligned dims."""
    from ..ops.fused_layer import fused_llama_supported
    if (cfg.is_gpt and cfg.hidden_size % 512 == 0
            and (3 * cfg.hidden_size) % 512 == 0
            and cfg.intermediate_size % 1024 == 0):
        return "int8_fused"
    if fused_llama_supported(cfg):
        return "int8_fused"
    return "int8"


def quantize_t3_backbone(t3_params: dict, mode: str = "int8",
                         ln_eps: float = 1e-5) -> dict:
    """Quantize the backbone layers + output heads of a T3 param tree
    (embeddings incl. wpe, norms and the cond encoder stay in float — they
    are gathers or tiny). The heads stay int8 even in int4 modes: their
    output dim (vocab) isn't tile-aligned for the int4 kernel, and the head
    read is a small fraction of the step.

    mode="int4_fused" (GPT-2 backbones only) additionally precomputes the
    fused decode-layer operands (ops/fused_layer.py) — two pallas launches
    per layer instead of ~20 XLA fusions."""
    out = dict(t3_params)
    backbone = dict(t3_params["backbone"])
    if mode == "int4_fused":
        backbone["layers"] = [
            _quantize_gpt2_layer_fused(lp, ln_eps)
            for lp in t3_params["backbone"]["layers"]]
    elif mode == "int8_fused":
        from ..ops.fused_layer import (prepare_fused_gpt2_layer_int8,
                                       prepare_fused_llama_layer_int8)
        layers = quantize_tree(t3_params["backbone"]["layers"], mode="int8")
        for lp in layers:
            lp["fused"] = (prepare_fused_gpt2_layer_int8(lp) if "qkv" in lp
                           else prepare_fused_llama_layer_int8(lp))
        backbone["layers"] = layers
    else:
        backbone["layers"] = quantize_tree(t3_params["backbone"]["layers"], mode=mode)
    out["backbone"] = backbone
    out["speech_head"] = quantize_tree(t3_params["speech_head"], mode="int8")
    out["text_head"] = quantize_tree(t3_params["text_head"], mode="int8")
    return out
