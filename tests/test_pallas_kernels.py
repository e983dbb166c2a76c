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
