"""Pallas kernel tests (interpret mode — CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_tpu.ops.pallas_attention import decode_attention
from chatterbox_tpu.nn import core as nn


class TestDecodeAttention:
    def test_matches_mha(self):
        B, H, T, D = 2, 4, 32, 16
        key = jax.random.key(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, H, 1, D))
        k = jax.random.normal(kk, (B, H, T, D))
        v = jax.random.normal(kv, (B, H, T, D))
        cur = jnp.array([10, 31], jnp.int32)
        ref_mask = (jnp.arange(T)[None, :] <= cur[:, None])[:, None, None]
        ref = nn.mha(q, k, v, mask=ref_mask)
        ours = decode_attention(q, k, v, cur, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


class TestFusedMLP:
    def test_matches_jnp(self):
        from chatterbox_tpu.ops.pallas_mlp import fused_mlp_int8
        from chatterbox_tpu.utils.quantize import quantize_linear_weight
        key = jax.random.key(3)
        ks = jax.random.split(key, 5)
        D, I = 64, 256
        x = jax.random.normal(ks[0], (2, D))
        g = jax.random.normal(ks[1], (D,)) * 0.1 + 1.0
        b = jax.random.normal(ks[2], (D,)) * 0.1
        w1 = jax.random.normal(ks[3], (D, I)) * 0.05
        w2 = jax.random.normal(ks[4], (I, D)) * 0.05
        b1 = jnp.zeros((I,)) + 0.01
        b2 = jnp.zeros((D,)) - 0.01
        w1q, s1 = quantize_linear_weight(w1)
        w2q, s2 = quantize_linear_weight(w2)
        ref_h = nn.layer_norm({"g": g, "b": b}, x)
        ref = x + ((nn.gelu_new((ref_h @ (w1q.astype(jnp.float32) * s1)) + b1)
                    @ (w2q.astype(jnp.float32) * s2)) + b2)
        out = fused_mlp_int8(x, g, b, w1q, s1, b1, w2q, s2, b2, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2, rtol=1e-2)


class TestStreamedDecodeAttention:
    """Interpret-mode parity for the tile-streamed flash-decode kernels
    (the TPU path additionally skips DMA for tiles past cur_len)."""

    def test_streamed_matches_mha(self):
        from chatterbox_tpu.ops.pallas_attention import (
            TT, decode_attention_streamed)
        B, H, D = 2, 4, 16
        T = 2 * TT
        key = jax.random.key(1)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, H, 1, D))
        k = jax.random.normal(kk, (B, H, T, D))
        v = jax.random.normal(kv, (B, H, T, D))
        cur = jnp.array([7, TT + 13], jnp.int32)   # 1-tile and 2-tile rows
        ref_mask = (jnp.arange(T)[None, :] <= cur[:, None])[:, None, None]
        ref = nn.mha(q, k, v, mask=ref_mask)
        ours = decode_attention_streamed(q, k, v, cur, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=1e-5)

    def test_streamed_lower_bound_matches_mha(self):
        """Per-row lo (left-padded batched layout): only keys in
        [lo[b], cur[b]] attend."""
        from chatterbox_tpu.ops.pallas_attention import (
            TT, decode_attention_streamed)
        B, H, D = 3, 4, 16
        T = 3 * TT
        key = jax.random.key(6)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, H, 1, D))
        k = jax.random.normal(kk, (B, H, T, D))
        v = jax.random.normal(kv, (B, H, T, D))
        # row 0 dense; row 1 pad inside tile 0; row 2 pad past a full tile
        lo = jnp.array([0, 17, TT + 5], jnp.int32)
        cur = jnp.array([TT - 1, TT + 40, 2 * TT + 9], jnp.int32)
        pos = jnp.arange(T)[None, :]
        ref_mask = ((pos >= lo[:, None])
                    & (pos <= cur[:, None]))[:, None, None]
        ref = nn.mha(q, k, v, mask=ref_mask)
        ours = decode_attention_streamed(q, k, v, cur, interpret=True, lo=lo)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=1e-5)

    def test_int8_streamed_lower_bound_matches_dequant(self):
        from chatterbox_tpu.ops.pallas_attention import (
            TT, decode_attention_streamed_int8)
        from chatterbox_tpu.models.t3.backbone import quantize_kv
        B, H, D = 2, 4, 16
        T = 2 * TT
        key = jax.random.key(7)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, H, 1, D))
        k = jax.random.normal(kk, (B, H, T, D)) * 0.3
        v = jax.random.normal(kv, (B, H, T, D)) * 0.3
        k_q, k_s = quantize_kv(k)
        v_q, v_s = quantize_kv(v)
        lo = jnp.array([9, TT + 3], jnp.int32)
        cur = jnp.array([TT + 6, 2 * TT - 1], jnp.int32)
        deq_k = k_q.astype(jnp.float32) * k_s
        deq_v = v_q.astype(jnp.float32) * v_s
        pos = jnp.arange(T)[None, :]
        ref_mask = ((pos >= lo[:, None])
                    & (pos <= cur[:, None]))[:, None, None]
        ref = nn.mha(q, deq_k, deq_v, mask=ref_mask)
        ours = decode_attention_streamed_int8(
            q, k_q, k_s[..., 0], v_q, v_s[..., 0], cur, interpret=True, lo=lo)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=1e-5)

    def test_int8_streamed_matches_dequant(self):
        """Int8-KV kernel == bf16 math on the dequantized cache (the scales
        fold into scores/weights inside the kernel; reference dequantizes
        up front)."""
        from chatterbox_tpu.ops.pallas_attention import (
            TT, decode_attention_streamed_int8)
        from chatterbox_tpu.models.t3.backbone import quantize_kv
        B, H, D = 2, 4, 16
        T = 2 * TT
        key = jax.random.key(2)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, H, 1, D))
        k = jax.random.normal(kk, (B, H, T, D)) * 0.3
        v = jax.random.normal(kv, (B, H, T, D)) * 0.3
        k_q, k_s = quantize_kv(k)
        v_q, v_s = quantize_kv(v)
        cur = jnp.array([TT - 1, T - 1], jnp.int32)
        deq_k = k_q.astype(jnp.float32) * k_s
        deq_v = v_q.astype(jnp.float32) * v_s
        ref_mask = (jnp.arange(T)[None, :] <= cur[:, None])[:, None, None]
        ref = nn.mha(q, deq_k, deq_v, mask=ref_mask)
        ours = decode_attention_streamed_int8(
            q, k_q, k_s[..., 0], v_q, v_s[..., 0], cur, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=1e-5)

    def test_int8_decode_loop_uses_kernel(self):
        """backbone_apply_unrolled(int8 cache, fused_attn=True) routes
        through the int8 kernel when the cache is tile-aligned, and stays
        close to the bf16-cache decode (quantization noise only)."""
        from chatterbox_tpu.ops.pallas_attention import TT
        from chatterbox_tpu.models.t3 import backbone as bb
        from chatterbox_tpu.models.t3.config import BackboneConfig
        cfg = BackboneConfig(family="gpt2", hidden_size=64, num_layers=2,
                             num_heads=4, head_dim=16, intermediate_size=128,
                             vocab_size=96)
        key = jax.random.key(4)
        params = bb.init_backbone(key, cfg)
        B, t_max = 2, 2 * TT
        emb = jax.random.normal(jax.random.key(5), (B, 1, 64)) * 0.1
        cur = jnp.array([3, 5], jnp.int32)
        kv_mask = (jnp.arange(t_max)[None, :]
                   <= cur[:, None])[:, None, None]
        c8 = bb.KVCacheInt8.zeros(cfg, B, t_max)
        cbf = bb.KVCache.zeros(cfg, B, t_max)
        h8, _ = bb.backbone_apply_unrolled(
            params, cfg, emb, cur[:, None], c8, cur, kv_mask,
            fused_attn=True)
        hb, _ = bb.backbone_apply_unrolled(
            params, cfg, emb, cur[:, None], cbf, cur, kv_mask)
        np.testing.assert_allclose(np.asarray(h8), np.asarray(hb),
                                   atol=0.05, rtol=0.05)
