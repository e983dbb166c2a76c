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


def quantize_tree(params, min_size: int = 1 << 16):
    """Replace {"w": 2-D float} dicts with {"w_q", "w_scale"} throughout a
    param tree (only matmul weights above min_size elements)."""
    def walk(node):
        if isinstance(node, dict):
            if ("w" in node and hasattr(node["w"], "ndim") and node["w"].ndim == 2
                    and node["w"].size >= min_size
                    and jnp.issubdtype(node["w"].dtype, jnp.floating)):
                w_q, scale = quantize_linear_weight(node["w"])
                out = {k: walk(v) for k, v in node.items() if k != "w"}
                out["w_q"] = w_q
                out["w_scale"] = scale
                return out
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node
    return walk(params)


def quantize_t3_backbone(t3_params: dict) -> dict:
    """Quantize the backbone layers + output heads of a T3 param tree
    (embeddings incl. wpe, norms and the cond encoder stay in float — they
    are gathers or tiny)."""
    out = dict(t3_params)
    backbone = dict(t3_params["backbone"])
    backbone["layers"] = quantize_tree(t3_params["backbone"]["layers"])
    out["backbone"] = backbone
    out["speech_head"] = quantize_tree(t3_params["speech_head"])
    out["text_head"] = quantize_tree(t3_params["text_head"])
    return out
