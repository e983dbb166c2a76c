"""Weight-only int8 quantization tests."""
import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_tpu.nn import core as nn
from chatterbox_tpu.utils.quantize import quantize_linear_weight, quantize_tree, \
    quantize_t3_backbone
from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.sampling.decode import t3_generate
from chatterbox_tpu.ops.sampling import SamplerParams


class TestQuantize:
    def test_linear_roundtrip_error(self):
        key = jax.random.key(0)
        w = jax.random.normal(key, (256, 512)) * 0.02
        w_q, scale = quantize_linear_weight(w)
        w_deq = w_q.astype(jnp.float32) * scale
        rel = jnp.abs(w_deq - w) / (jnp.abs(w).max())
        assert float(rel.max()) < 0.005  # <0.5% of max magnitude

    def test_linear_apply_quantized(self):
        key = jax.random.key(1)
        k1, k2 = jax.random.split(key)
        p = nn.linear_init(k1, 256, 512)
        x = jax.random.normal(k2, (3, 256))
        ref = nn.linear(p, x)
        w_q, scale = quantize_linear_weight(p["w"])
        pq = {"w_q": w_q, "w_scale": scale, "b": p["b"]}
        out = nn.linear(pq, x)
        err = jnp.abs(out - ref) / (jnp.abs(ref).max() + 1e-9)
        assert float(err.max()) < 0.02

    def test_quantized_decode_runs(self):
        hp = T3Config.tiny_test("gpt2")
        params = t3m.t3_init(jax.random.key(0), hp)
        pq = quantize_t3_backbone(params)
        cond = t3m.T3CondArrays(
            speaker_emb=jnp.zeros((1, 256)),
            cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len), jnp.int32),
            emotion_adv=None)
        text = jnp.pad(jnp.arange(1, 7, dtype=jnp.int32)[None], ((0, 0), (0, 10)))
        r = t3_generate(pq, hp, cond, text, jnp.asarray(6),
                        SamplerParams.make(cfg_weight=0.0), jax.random.key(1),
                        max_new_tokens=8, top_k=40, cfg_mode=False)
        toks = np.asarray(r.tokens)
        assert (toks >= 0).all() and (toks < hp.speech_tokens_dict_size).all()

    def test_int4_roundtrip_error(self):
        from chatterbox_tpu.utils.quantize import (quantize_linear_weight_int4,
                                                   unpack_int4)
        key = jax.random.key(2)
        w = jax.random.normal(key, (1024, 512)) * 0.02
        w_q, s_lo, s_hi = quantize_linear_weight_int4(w, group=128)
        assert w_q.dtype == jnp.int8 and w_q.shape == (512, 512)
        assert s_lo.shape == (4, 512) and s_hi.shape == (4, 512)
        lo, hi = unpack_int4(w_q)
        w_deq = jnp.concatenate([
            (lo.reshape(4, 128, 512) * s_lo[:, None, :]).reshape(512, 512),
            (hi.reshape(4, 128, 512) * s_hi[:, None, :]).reshape(512, 512),
        ], axis=0)
        rel = jnp.abs(w_deq - w) / jnp.abs(w).max()
        # symmetric 4-bit: step = group_amax/7 → max error ≈ amax/14 ≈ 7.1%
        assert float(rel.max()) < 0.08
        assert float(jnp.abs(w_deq - w).mean() / jnp.abs(w).max()) < 0.025

    def test_int4_linear_apply(self):
        from chatterbox_tpu.utils.quantize import quantize_linear_weight_int4
        k1, k2 = jax.random.split(jax.random.key(3))
        p = nn.linear_init(k1, 1024, 512)
        x = jax.random.normal(k2, (3, 1024))
        ref = nn.linear(p, x)
        w_q, s_lo, s_hi = quantize_linear_weight_int4(p["w"])
        pq = {"w_q4": w_q, "w_scale4_lo": s_lo, "w_scale4_hi": s_hi, "b": p["b"]}
        out = nn.linear(pq, x)
        err = jnp.abs(out - ref) / (jnp.abs(ref).max() + 1e-9)
        assert float(err.max()) < 0.12       # 4-bit activations error bound
        assert float(err.mean()) < 0.02

    def test_int4_kernel_matches_xla(self):
        """Pallas int4 matvec (interpret mode) vs the pure-XLA reference."""
        from chatterbox_tpu.ops.int4_matmul import matmul_int4, matmul_int4_xla
        from chatterbox_tpu.utils.quantize import quantize_linear_weight_int4
        k1, k2 = jax.random.split(jax.random.key(5))
        for B, K, N in [(1, 1024, 512), (4, 1024, 1024), (1, 4096, 512)]:
            w = jax.random.normal(k1, (K, N)) * 0.02
            x = jax.random.normal(k2, (B, K)).astype(jnp.bfloat16)
            w_q, s_lo, s_hi = quantize_linear_weight_int4(w)
            got = matmul_int4(x, w_q, s_lo, s_hi, interpret=True)
            want = matmul_int4_xla(x.astype(jnp.float32), w_q, s_lo, s_hi)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-2, atol=2e-3,
                                       err_msg=f"B={B} K={K} N={N}")

    def test_int4_decode_runs(self):
        hp = T3Config.tiny_test("gpt2")
        params = t3m.t3_init(jax.random.key(4), hp)
        pq = quantize_t3_backbone(params, mode="int4")
        cond = t3m.T3CondArrays(
            speaker_emb=jnp.zeros((1, 256)),
            cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len), jnp.int32),
            emotion_adv=None)
        text = jnp.pad(jnp.arange(1, 7, dtype=jnp.int32)[None], ((0, 0), (0, 10)))
        r = t3_generate(pq, hp, cond, text, jnp.asarray(6),
                        SamplerParams.make(cfg_weight=0.0), jax.random.key(5),
                        max_new_tokens=8, top_k=40, cfg_mode=False)
        toks = np.asarray(r.tokens)
        assert (toks >= 0).all() and (toks < hp.speech_tokens_dict_size).all()

    def test_small_weights_not_quantized(self):
        tree = {"w": jnp.ones((4, 4))}
        out = quantize_tree(tree, min_size=1 << 16)
        assert "w" in out and "w_q" not in out
