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
