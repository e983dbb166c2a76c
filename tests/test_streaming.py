"""Chunked decode + streaming generation tests (tiny configs, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.sampling.decode import t3_generate
from chatterbox_tpu.sampling.chunked import t3_prefill, t3_decode_chunk
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.models.s3gen.flow import FlowDims
from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
from chatterbox_tpu.api.pipelines import ChatterboxTurboTTS


class TestChunkedDecode:
    def test_matches_one_shot(self):
        """Chunked decode must reproduce the one-shot engine token-for-token
        (identical RNG consumption order)."""
        hp = T3Config.tiny_test("gpt2")
        params = t3m.t3_init(jax.random.key(0), hp)
        cond = t3m.T3CondArrays(
            speaker_emb=jnp.zeros((1, 256)),
            cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len), jnp.int32),
            emotion_adv=None)
        text = jnp.pad(jnp.arange(1, 7, dtype=jnp.int32)[None], ((0, 0), (0, 10)))
        sp = SamplerParams.make(cfg_weight=0.0, top_p=0.9)
        key = jax.random.key(42)
        MAX = 12

        ref = t3_generate(params, hp, cond, text, jnp.asarray(6), sp, key,
                          max_new_tokens=MAX, top_k=40, cfg_mode=False,
                          ignore_eos=True)
        ref_toks = np.asarray(ref.tokens)

        state = t3_prefill(params, hp, cond, text, jnp.asarray(6), key,
                           max_new_tokens=MAX, cfg_mode=False)
        got = []
        for _ in range(MAX // 4):
            state, toks, n = t3_decode_chunk(params, hp, state, sp, n_steps=4,
                                             top_k=40, cfg_mode=False,
                                             ignore_eos=True)
            got.extend(np.asarray(toks)[: int(n)].tolist())
        np.testing.assert_array_equal(np.asarray(got), ref_toks)

    def test_eos_stops_chunks(self):
        hp = T3Config.tiny_test("gpt2")
        params = t3m.t3_init(jax.random.key(1), hp)
        cond = t3m.T3CondArrays(
            speaker_emb=jnp.zeros((1, 256)),
            cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len), jnp.int32),
            emotion_adv=None)
        text = jnp.pad(jnp.arange(1, 5, dtype=jnp.int32)[None], ((0, 0), (0, 12)))
        sp = SamplerParams.make(cfg_weight=0.0)
        state = t3_prefill(params, hp, cond, text, jnp.asarray(4),
                           jax.random.key(2), max_new_tokens=40, cfg_mode=False)
        total = 0
        for _ in range(10):
            state, toks, n = t3_decode_chunk(params, hp, state, sp, n_steps=4,
                                             top_k=40, cfg_mode=False)
            total += int(n)
            if bool(state.done):
                break
        assert total <= 40


class TestStreamingPipeline:
    def test_generate_stream_yields_audio(self):
        class FakeTok:
            def text_to_tokens(self, text, **kw):
                return np.asarray([[1 + (ord(c) % 50) for c in text[:12]]], np.int32)

        hp = T3Config.tiny_test("gpt2")
        m = ChatterboxTurboTTS.random_init(
            nano=True, tokenizer=FakeTok(), hp=hp,
            flow_dims=FlowDims.tiny_test(),
            tok_cfg=S3TokenizerConfig.tiny_test(), hift_base=32)
        # build conds directly (no file IO)
        rng = np.random.default_rng(0)
        ref_wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)
        m._prepare_from_wav(ref_wav, 0.0)
        chunks = list(m.generate_stream("Hello.", max_new_tokens=10,
                                        chunk_tokens=4, top_k=40))
        assert len(chunks) >= 1
        total = np.concatenate(chunks)
        assert np.isfinite(total).all()
        assert len(total) > 0
