"""T3 decoder-only transformer backbones (llama-style and gpt2-style).

TPU-native design — not a port of HF modeling code:
  * one prefill function (full padded prefix, causal-masked, writes the KV
    cache in one shot) and one single-token decode function (reads the cache
    with a length mask) — both pure and jittable with static shapes;
  * KV cache is a preallocated (L, B, H, Tmax, D) pair, donated across decode
    steps inside a `lax.while_loop` (see sampling/decode.py) via direct
    dynamic_update_slice on the full (L,B,H,T,D) buffers;
  * classifier-free guidance rides the batch axis (B=2), so cond+uncond is a
    single forward — no second pass (ref behavior: models/t3/t3.py:310-344);
  * bf16 matmul-friendly: params can be cast with utils.dtypes.cast_params.

Behavioral parity targets:
  * llama family: LlamaModel(Llama_520M) — 30L/1024d/16h, llama3 RoPE
    scaling θ=5e5 (ref: models/t3/llama_configs.py:1-33)
  * gpt2 family: GPT2Model medium/small — learned wpe, gelu_new, fused qkv
    (ref: models/t3/llama_configs.py:35-103)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import core as nn
from .config import BackboneConfig


# ---------------------------------------------------------------------------
# RoPE (llama3 scaling)
# ---------------------------------------------------------------------------

def llama3_inv_freq(cfg: BackboneConfig) -> np.ndarray:
    """Llama-3-style frequency scaling (ref config: llama_configs.py:23-29)."""
    d = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    low_wl = cfg.rope_original_max_pos / cfg.rope_low_freq_factor
    high_wl = cfg.rope_original_max_pos / cfg.rope_high_freq_factor
    wavelen = 2.0 * np.pi / inv_freq
    scaled = inv_freq / cfg.rope_scaling_factor
    smooth = (cfg.rope_original_max_pos / wavelen - cfg.rope_low_freq_factor) / (
        cfg.rope_high_freq_factor - cfg.rope_low_freq_factor)
    smoothed = (1 - smooth) * scaled + smooth * inv_freq
    out = np.where(wavelen < high_wl, inv_freq, np.where(wavelen > low_wl, scaled, smoothed))
    return out.astype(np.float32)


def rope_cos_sin(inv_freq: jnp.ndarray, positions: jnp.ndarray):
    """positions: (B, T) int -> cos/sin (B, T, head_dim)."""
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (B, T, d/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, T, D); HF rotate-half convention."""
    cos = cos[:, None]   # (B, 1, T, D)
    sin = sin[:, None]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rot * sin


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init_backbone(key, cfg: BackboneConfig) -> dict:
    D, I = cfg.hidden_size, cfg.intermediate_size
    layers = []
    for _ in range(cfg.num_layers):
        key, *ks = jax.random.split(key, 10)
        if cfg.is_gpt:
            layers.append({
                "ln1": nn.layer_norm_init(D),
                "qkv": nn.linear_init(ks[0], D, 3 * D),
                "attn_out": nn.linear_init(ks[1], D, D),
                "ln2": nn.layer_norm_init(D),
                "fc_in": nn.linear_init(ks[2], D, I),
                "fc_out": nn.linear_init(ks[3], I, D),
            })
        else:
            H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
            layers.append({
                "input_ln": nn.rms_norm_init(D),
                "q": nn.linear_init(ks[0], D, H * hd, bias=False),
                "k": nn.linear_init(ks[1], D, KV * hd, bias=False),
                "v": nn.linear_init(ks[2], D, KV * hd, bias=False),
                "o": nn.linear_init(ks[3], H * hd, D, bias=False),
                "post_ln": nn.rms_norm_init(D),
                "gate": nn.linear_init(ks[4], D, I, bias=False),
                "up": nn.linear_init(ks[5], D, I, bias=False),
                "down": nn.linear_init(ks[6], I, D, bias=False),
            })
    params = {"layers": layers}
    if cfg.is_gpt:
        key, k1 = jax.random.split(key)
        params["wpe"] = nn.embedding_init(k1, cfg.max_positions, D, std=0.01)
        params["ln_f"] = nn.layer_norm_init(D)
    else:
        params["norm"] = nn.rms_norm_init(D)
    return params


class KVCache(NamedTuple):
    k: jnp.ndarray   # (L, B, H_kv, T_max, head_dim)
    v: jnp.ndarray

    @classmethod
    def zeros(cls, cfg: BackboneConfig, batch: int, max_len: int,
              dtype=jnp.bfloat16) -> "KVCache":
        kv_heads = cfg.num_kv_heads if not cfg.is_gpt else cfg.num_heads
        shape = (cfg.num_layers, batch, kv_heads, max_len, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class KVCacheLayers(NamedTuple):
    """Per-layer KV cache: a tuple of (B, H_kv, T_max, head_dim) arrays
    instead of one stacked (L, ...) tensor.

    XLA:CPU's thunk runtime does NOT alias the stacked cache's per-layer
    dynamic-update-slices inside a while_loop — each of the 2L writes
    copies the WHOLE (L, B, H, T, D) buffer (profiled on the Nano decode:
    ~24 copy fusions × ~1.6 ms ≈ 40 ms/token, 2× the step's matmul time;
    DESIGN.md round-5 table). With per-layer tensors each write copies at
    most its own layer. TPU keeps the stacked layout (`KVCache`): there XLA
    aliases the full-buffer write in place, and one tensor beats 2L small
    ones for layout/fusion."""
    k: tuple   # L × (B, H_kv, T_max, head_dim)
    v: tuple

    @classmethod
    def zeros(cls, cfg: BackboneConfig, batch: int, max_len: int,
              dtype=jnp.bfloat16) -> "KVCacheLayers":
        kv_heads = cfg.num_kv_heads if not cfg.is_gpt else cfg.num_heads
        shape = (batch, kv_heads, max_len, cfg.head_dim)
        return cls(tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
                   tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)))


class KVCacheInt8(NamedTuple):
    """Int8-quantized KV cache: values in int8 + one bf16 scale per
    (layer, row, head, position). Halves decode-attention HBM traffic vs
    the bf16 cache (the decode step's dominant read at long contexts); the
    dequantize folds into the attention matmul's operand read. Quality is
    measured, not assumed — tools/ab_int8.py reports logit error and token
    divergence vs the bf16 cache at real sizes."""
    k_q: jnp.ndarray   # (L, B, H_kv, T_max, head_dim) int8
    v_q: jnp.ndarray
    k_s: jnp.ndarray   # (L, B, H_kv, T_max, 1) bf16 per-position scales
    v_s: jnp.ndarray

    @classmethod
    def zeros(cls, cfg: BackboneConfig, batch: int, max_len: int,
              dtype=jnp.bfloat16) -> "KVCacheInt8":
        kv_heads = cfg.num_kv_heads if not cfg.is_gpt else cfg.num_heads
        shape = (cfg.num_layers, batch, kv_heads, max_len, cfg.head_dim)
        sshape = shape[:-1] + (1,)
        return cls(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                   jnp.zeros(sshape, dtype), jnp.zeros(sshape, dtype))


def quantize_kv(x: jnp.ndarray):
    """x (B, H, t, D) -> (int8 values, (B, H, t, 1) scales). Symmetric
    per-position max-abs scaling (the head_dim axis shares one scale)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(s, 1e-8))
    return jnp.clip(q, -127, 127).astype(jnp.int8), s


def _write_cache(cache_layer: jnp.ndarray, new: jnp.ndarray, start: jnp.ndarray):
    """cache_layer (B, H, Tmax, D) <- new (B, H, t, D) at offset `start`.

    start may be a scalar (shared offset — one dynamic_update_slice, the
    fast path used by single-stream decode where every row is at the same
    position) or per-row (B,) (vmapped DUS → scatter; batched serving)."""
    new = new.astype(cache_layer.dtype)
    if start.ndim == 0:
        return jax.lax.dynamic_update_slice(
            cache_layer, new, (0, 0, start, 0))
    def upd(c, n, s):
        return jax.lax.dynamic_update_slice(c, n, (0, s, 0))
    return jax.vmap(upd)(cache_layer, new, start)


def _write_cache_full(all_cache: jnp.ndarray, new: jnp.ndarray, layer: jnp.ndarray,
                      start: jnp.ndarray):
    """all_cache (L, B, H, Tmax, D) <- new (B, H, t, D) at (layer, :, :, start).
    One in-place dynamic_update_slice on the full loop-carried buffer —
    avoids the slice-out/slice-in round trip of per-layer cache handling.
    Requires a scalar shared start (per-row starts use _write_cache)."""
    return jax.lax.dynamic_update_slice(
        all_cache, new.astype(all_cache.dtype)[None], (layer, 0, 0, start, 0))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _attn_core(q, ck, cv, start, kv_mask, fused: bool, kv_lo=None):
    """Attention over the cache: Pallas decode kernel for single-token steps
    (ops/pallas_attention.py), XLA mha otherwise. The streamed flash variant
    (tile-clamped DMA ⇒ O(cur_len) traffic) is used when the cache length is
    tile-aligned; it wins over XLA mha when T_max far exceeds the current
    length (long-form generation). kv_lo: optional (B,) per-row lower bound
    (left-padded batched layout) — only the streamed kernel honors it, the
    whole-slice kernel falls back to XLA mha (kv_mask carries both bounds)."""
    if fused and q.shape[2] == 1:
        from ...ops.pallas_attention import (
            TT, decode_attention, decode_attention_streamed)
        cur = jnp.broadcast_to(start, (q.shape[0],)) if start.ndim == 0 else start
        if ck.shape[2] % TT == 0:
            return decode_attention_streamed(q, ck, cv, cur, lo=kv_lo)
        if kv_lo is None:
            return decode_attention(q, ck, cv, cur)
    return nn.mha(q, ck, cv, mask=kv_mask)


def _gpt2_attn(lp, x, cfg: BackboneConfig, cache_k, cache_v, start, kv_mask,
               fused: bool = False):
    qkv = nn.linear(lp["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = nn.split_heads(q, cfg.num_heads)
    k = nn.split_heads(k, cfg.num_heads)
    v = nn.split_heads(v, cfg.num_heads)
    cache_k = _write_cache(cache_k, k, start)
    cache_v = _write_cache(cache_v, v, start)
    out = _attn_core(q, cache_k.astype(q.dtype), cache_v.astype(q.dtype),
                     start, kv_mask, fused)
    return nn.linear(lp["attn_out"], nn.merge_heads(out)), cache_k, cache_v


def _llama_attn(lp, x, cfg: BackboneConfig, cos, sin, cache_k, cache_v, start,
                kv_mask, fused: bool = False):
    q = nn.split_heads(nn.linear(lp["q"], x), cfg.num_heads)
    k = nn.split_heads(nn.linear(lp["k"], x), cfg.num_kv_heads)
    v = nn.split_heads(nn.linear(lp["v"], x), cfg.num_kv_heads)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    cache_k = _write_cache(cache_k, k, start)
    cache_v = _write_cache(cache_v, v, start)
    ck, cv = cache_k.astype(q.dtype), cache_v.astype(q.dtype)
    if cfg.num_kv_heads != cfg.num_heads:
        rep = cfg.num_heads // cfg.num_kv_heads
        ck = jnp.repeat(ck, rep, axis=1)
        cv = jnp.repeat(cv, rep, axis=1)
    out = _attn_core(q, ck, cv, start, kv_mask, fused)
    return nn.linear(lp["o"], nn.merge_heads(out)), cache_k, cache_v


def backbone_apply(params: dict, cfg: BackboneConfig, embeds: jnp.ndarray,
                   positions: jnp.ndarray, cache: KVCache, start: jnp.ndarray,
                   kv_mask: jnp.ndarray, remat: bool = False):
    """Run the transformer over `embeds` (B, t, D), writing K/V into `cache`
    at per-row offset `start` (B,), attending under `kv_mask`
    (bool, broadcastable to (B, 1, t, T_max)).

    Used for both prefill (t = padded prefix length, start = 0) and decode
    (t = 1, start = current length). Returns (hidden, new_cache).
    remat=True rematerializes each layer on the backward pass (training
    memory ↔ FLOPs trade — jax.checkpoint).
    """
    x = embeds
    if cfg.is_gpt:
        pos_emb = jnp.take(params["wpe"]["w"], positions, axis=0).astype(x.dtype)
        x = x + pos_emb
        cos = sin = None
    else:
        inv_freq = jnp.asarray(llama3_inv_freq(cfg))
        cos, sin = rope_cos_sin(inv_freq, positions)
        cos = cos.astype(x.dtype)
        sin = sin.astype(x.dtype)

    def layer(lp, x, ck_in, cv_in):
        if cfg.is_gpt:
            h = nn.layer_norm(lp["ln1"], x, cfg.layer_norm_eps)
            attn, ck, cv = _gpt2_attn(lp, h, cfg, ck_in, cv_in, start, kv_mask)
            x = x + attn
            h = nn.layer_norm(lp["ln2"], x, cfg.layer_norm_eps)
            x = x + nn.linear(lp["fc_out"], nn.gelu_new(nn.linear(lp["fc_in"], h)))
        else:
            h = nn.rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
            attn, ck, cv = _llama_attn(lp, h, cfg, cos, sin, ck_in, cv_in,
                                       start, kv_mask)
            x = x + attn
            h = nn.rms_norm(lp["post_ln"], x, cfg.rms_norm_eps)
            x = x + nn.linear(lp["down"], nn.silu(nn.linear(lp["gate"], h)) * nn.linear(lp["up"], h))
        return x, ck, cv

    if remat:
        layer = jax.checkpoint(layer)

    new_k, new_v = [], []
    for i, lp in enumerate(params["layers"]):
        x, ck, cv = layer(lp, x, cache.k[i], cache.v[i])
        new_k.append(ck)
        new_v.append(cv)

    if cfg.is_gpt:
        x = nn.layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
    else:
        x = nn.rms_norm(params["norm"], x, cfg.rms_norm_eps)
    return x, KVCache(jnp.stack(new_k), jnp.stack(new_v))


def backbone_apply_unrolled(params: dict, cfg: BackboneConfig,
                            embeds: jnp.ndarray, positions: jnp.ndarray,
                            cache: KVCache, start: jnp.ndarray,
                            kv_mask: jnp.ndarray, fused_attn: bool = False,
                            kv_lo: jnp.ndarray | None = None):
    """Decode-loop fast path: python-unrolled layers (STATIC weight indexing —
    no per-layer weight gather/copy) + in-place full-cache writes.

    kv_lo: optional (B,) per-row first valid cache position (the batched
    engine's left-pad); threaded to the pallas decode kernels so their
    tile DMA and masks respect the lower bound.

    Perf history (v5e, GPT2-medium int8, see DESIGN.md): the scan version
    round-tripped the cache (~440 tok/s); the fori_loop version fixed the
    cache but `dynamic_index_in_dim` on stacked weights copied every layer's
    weights each step (~2× weight traffic, ~860 tok/s); this unrolled version
    reads weights exactly once per step."""
    x = embeds
    if cfg.is_gpt:
        pos_emb = jnp.take(params["wpe"]["w"], positions, axis=0).astype(x.dtype)
        x = x + pos_emb
        cos = sin = None
    else:
        inv_freq = jnp.asarray(llama3_inv_freq(cfg))
        cos, sin = rope_cos_sin(inv_freq, positions)
        cos = cos.astype(x.dtype)
        sin = sin.astype(x.dtype)

    int8_cache = isinstance(cache, KVCacheInt8)
    layered = isinstance(cache, KVCacheLayers)
    if int8_cache:
        all_k, all_v, all_ks, all_vs = cache
    elif layered:
        all_k, all_v = list(cache.k), list(cache.v)
    else:
        all_k, all_v = cache.k, cache.v
    shared_start = start.ndim == 0
    for i, lp in enumerate(params["layers"]):
        # fused decode-layer fast path: two pallas launches per layer
        # (norm+QKV, attn_out+norm+MLP) with streamed weights —
        # ops/fused_layer.py. Single-token steps only.
        fused_layer = "fused" in lp and x.shape[1] == 1
        if fused_layer and cfg.is_gpt:
            from ...ops.fused_layer import (apply_fused_gpt2_qkv,
                                            apply_fused_gpt2_qkv_int8)
            f_qkv = (apply_fused_gpt2_qkv if "qkv_wp" in lp["fused"]
                     else apply_fused_gpt2_qkv_int8)
            qkv = f_qkv(
                lp["fused"], x[:, 0], cfg.layer_norm_eps
            ).astype(x.dtype)[:, None, :]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = nn.split_heads(q, cfg.num_heads)
            k = nn.split_heads(k, cfg.num_heads)
            v = nn.split_heads(v, cfg.num_heads)
        elif fused_layer:
            from ...ops.fused_layer import apply_fused_llama_qkv_int8
            qkv = apply_fused_llama_qkv_int8(
                lp["fused"], x[:, 0], cfg.rms_norm_eps
            ).astype(x.dtype)[:, None, :]
            nq = cfg.num_heads * cfg.head_dim
            nkv = cfg.num_kv_heads * cfg.head_dim
            q = nn.split_heads(qkv[..., :nq], cfg.num_heads)
            k = nn.split_heads(qkv[..., nq: nq + nkv], cfg.num_kv_heads)
            v = nn.split_heads(qkv[..., nq + nkv:], cfg.num_kv_heads)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        elif cfg.is_gpt:
            y = nn.layer_norm(lp["ln1"], x, cfg.layer_norm_eps)
            qkv = nn.linear(lp["qkv"], y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = nn.split_heads(q, cfg.num_heads)
            k = nn.split_heads(k, cfg.num_heads)
            v = nn.split_heads(v, cfg.num_heads)
        else:
            y = nn.rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
            q = nn.split_heads(nn.linear(lp["q"], y), cfg.num_heads)
            k = nn.split_heads(nn.linear(lp["k"], y), cfg.num_kv_heads)
            v = nn.split_heads(nn.linear(lp["v"], y), cfg.num_kv_heads)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        li = jnp.asarray(i, jnp.int32)
        if int8_cache:
            k, ks = quantize_kv(k)
            v, vs = quantize_kv(v)
            ks, vs = ks.astype(all_ks.dtype), vs.astype(all_vs.dtype)
        if layered:
            # per-layer tensors: the update touches only this layer's
            # buffer (scalar or per-row start both via _write_cache)
            all_k[i] = _write_cache(all_k[i], k, start)
            all_v[i] = _write_cache(all_v[i], v, start)
        elif shared_start:
            all_k = _write_cache_full(all_k, k, li, start)
            all_v = _write_cache_full(all_v, v, li, start)
            if int8_cache:
                all_ks = _write_cache_full(all_ks, ks, li, start)
                all_vs = _write_cache_full(all_vs, vs, li, start)
        else:
            ck_l = _write_cache(all_k[i], k, start)
            cv_l = _write_cache(all_v[i], v, start)
            all_k = all_k.at[i].set(ck_l)
            all_v = all_v.at[i].set(cv_l)
            if int8_cache:
                all_ks = all_ks.at[i].set(_write_cache(all_ks[i], ks, start))
                all_vs = all_vs.at[i].set(_write_cache(all_vs[i], vs, start))

        if int8_cache:
            from ...ops.pallas_attention import (
                TT, decode_attention_streamed_int8)
            mha_heads = cfg.is_gpt or cfg.num_kv_heads == cfg.num_heads
            if (fused_attn and q.shape[2] == 1 and mha_heads
                    and all_k.shape[3] % TT == 0):
                # int8 tiles streamed straight into the kernel: half the
                # HBM bytes, dequant folded into score/weight multiplies —
                # the fusion XLA refuses (DESIGN.md: 614 vs 862 tok/s)
                cur = (jnp.broadcast_to(start, (q.shape[0],))
                       if start.ndim == 0 else start)
                attn = decode_attention_streamed_int8(
                    q, all_k[i], all_ks[i][..., 0],
                    all_v[i], all_vs[i][..., 0], cur, lo=kv_lo)
                ck = cv = None
            else:
                # dequant folds into the attention matmul's operand read
                ck = (all_k[i].astype(q.dtype) * all_ks[i].astype(q.dtype))
                cv = (all_v[i].astype(q.dtype) * all_vs[i].astype(q.dtype))
        else:
            ck = all_k[i].astype(q.dtype)
            cv = all_v[i].astype(q.dtype)
        if ck is not None:
            if not cfg.is_gpt and cfg.num_kv_heads != cfg.num_heads:
                rep = cfg.num_heads // cfg.num_kv_heads
                ck = jnp.repeat(ck, rep, axis=1)
                cv = jnp.repeat(cv, rep, axis=1)
            attn = _attn_core(q, ck, cv, start, kv_mask, fused_attn,
                              kv_lo=kv_lo)
        if fused_layer and cfg.is_gpt:
            from ...ops.fused_layer import (apply_fused_gpt2_mlp,
                                            apply_fused_gpt2_mlp_int8)
            f_mlp = (apply_fused_gpt2_mlp if "qkv_wp" in lp["fused"]
                     else apply_fused_gpt2_mlp_int8)
            x = f_mlp(
                lp["fused"], nn.merge_heads(attn)[:, 0].astype(x.dtype),
                x[:, 0], cfg.layer_norm_eps).astype(x.dtype)[:, None, :]
        elif fused_layer:
            from ...ops.fused_layer import (apply_fused_llama_mlp_int8,
                                            llama_mlp_tile)
            x = apply_fused_llama_mlp_int8(
                lp["fused"], nn.merge_heads(attn)[:, 0].astype(x.dtype),
                x[:, 0], cfg.rms_norm_eps,
                tw=llama_mlp_tile(cfg)).astype(x.dtype)[:, None, :]
        elif cfg.is_gpt:
            x = x + nn.linear(lp["attn_out"], nn.merge_heads(attn))
            y = nn.layer_norm(lp["ln2"], x, cfg.layer_norm_eps)
            x = x + nn.linear(lp["fc_out"], nn.gelu_new(nn.linear(lp["fc_in"], y)))
        else:
            x = x + nn.linear(lp["o"], nn.merge_heads(attn))
            y = nn.rms_norm(lp["post_ln"], x, cfg.rms_norm_eps)
            x = x + nn.linear(lp["down"],
                              nn.silu(nn.linear(lp["gate"], y)) * nn.linear(lp["up"], y))

    if cfg.is_gpt:
        x = nn.layer_norm(params["ln_f"], x, cfg.layer_norm_eps)
    else:
        x = nn.rms_norm(params["norm"], x, cfg.rms_norm_eps)
    if int8_cache:
        return x, KVCacheInt8(all_k, all_v, all_ks, all_vs)
    if layered:
        return x, KVCacheLayers(tuple(all_k), tuple(all_v))
    return x, KVCache(all_k, all_v)


def prefill_mask(t: int, t_max: int, lens: jnp.ndarray) -> jnp.ndarray:
    """Causal + length mask for prefill: (B, 1, t, t_max)."""
    q_pos = jnp.arange(t)[:, None]
    k_pos = jnp.arange(t_max)[None, :]
    causal = k_pos <= q_pos                       # (t, t_max)
    valid = k_pos[None] < lens[:, None, None]     # (B, t, t_max)
    return (causal[None] & valid)[:, None]


def decode_mask(t_max: int, cur_len: jnp.ndarray) -> jnp.ndarray:
    """Key mask for a single decode step at position cur_len: (B, 1, 1, t_max)."""
    k_pos = jnp.arange(t_max)[None, :]
    return (k_pos <= cur_len[:, None])[:, None, None]
