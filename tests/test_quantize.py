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

    def test_small_weights_not_quantized(self):
        tree = {"w": jnp.ones((4, 4))}
        out = quantize_tree(tree, min_size=1 << 16)
        assert "w" in out and "w_q" not in out
