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


def _tiny_engine(seed=0, meanflow=True):
    from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init
    tok_cfg = S3TokenizerConfig.tiny_test()
    dims = FlowDims.tiny_test()
    return S3GenEngine(
        s3gen_init(jax.random.key(seed), meanflow=meanflow, tok_cfg=tok_cfg,
                   dims=dims, hift_base=32),
        meanflow=meanflow, tok_cfg=tok_cfg, dims=dims, n_timesteps=2)


class TestStreamingContinuity:
    def test_vocoder_stream_matches_oneshot(self):
        """Growing-window vocoding with the source cache + fixed key must
        reproduce the one-shot decode sample-for-sample (outside the
        receptive-field lookahead)."""
        eng = _tiny_engine()
        rng = np.random.default_rng(1)
        T = 80
        mel = rng.standard_normal((1, T, 80)).astype(np.float32) * 0.5
        key = jax.random.key(7)
        wav_full = eng.mel_to_wav_stream(mel, key)[0][0]

        LA = 16   # mel-frame lookahead > HiFT receptive field
        cache, clen, emitted, out = None, 0, 0, []
        for i, Tc in enumerate((32, 56, 80)):
            final = Tc == T
            wav, src, _ = eng.mel_to_wav_stream(mel[:, :Tc], key,
                                                cache_source=cache,
                                                cache_len=clen)
            upto = (Tc if final else Tc - LA) * 480
            out.append(wav[0, emitted:upto])
            emitted = upto
            cache, clen = src, Tc * 480
        stream = np.concatenate(out)
        assert len(stream) == len(wav_full)
        np.testing.assert_allclose(stream, wav_full, atol=1e-4)

    def test_phase_carry_window_exact(self, monkeypatch):
        """Windowed source generation with the phase carry must equal the
        full-sequence source exactly (noise disabled: deterministic sine)."""
        from chatterbox_tpu.models.s3gen import hift as H
        monkeypatch.setattr(H, "NOISE_STD", 0.0)
        params = H.hift_init(jax.random.key(3), base_channels=32)
        key = jax.random.key(9)
        f0 = jnp.full((1, 12), 220.0)                     # voiced everywhere
        s_full = np.asarray(H.hift_source(params, key, f0))

        t0 = 6
        harmonics = np.arange(1, 10, dtype=np.float64)
        f_sum = float(np.asarray(f0)[0, :t0].sum()) * 480
        carry = (f_sum * harmonics[None] / 24000.0) % 1.0
        s_win = np.asarray(H.hift_source(
            params, key, f0[:, t0:], jnp.asarray(carry, jnp.float32)))
        np.testing.assert_allclose(s_win[0], s_full[0, t0 * 480:], atol=2e-4)

    def test_exact_mode_stream(self):
        """End-to-end StreamingVocoder (exact mode): length bookkeeping,
        finiteness, and no gross clicks at chunk joins."""
        from chatterbox_tpu.serve.streaming import StreamingVocoder
        eng = _tiny_engine(seed=2)
        rng = np.random.default_rng(3)
        ref = eng.embed_ref((rng.standard_normal(24000) * 0.1).astype(np.float32),
                            24000)
        voc = StreamingVocoder(eng, ref, jax.random.key(11))
        tokens = rng.integers(0, 6561, 24).astype(np.int32)
        chunks, joins = [], []
        pos = 0
        for i in range(3):
            final = i == 2
            c = voc.feed(tokens[i * 8: (i + 1) * 8], final=final)
            if len(c) and pos > 0:
                joins.append(pos)
            pos += len(c)
            chunks.append(c)
        stream = np.concatenate(chunks)
        assert len(stream) == 24 * 2 * 480
        assert np.isfinite(stream).all()
        d = np.abs(np.diff(stream))
        for j in joins:
            assert abs(stream[j] - stream[j - 1]) <= max(5 * d.max(), 1e-3)

    def test_windowed_mode_bounded_and_streams(self):
        """Windowed mode: per-feed flow work stays O(window), emitted length
        is exact, output finite."""
        from chatterbox_tpu.serve import streaming as SS
        eng = _tiny_engine(seed=4)
        rng = np.random.default_rng(5)
        ref = eng.embed_ref((rng.standard_normal(24000) * 0.1).astype(np.float32),
                            24000)
        voc = SS.StreamingVocoder(eng, ref, jax.random.key(13),
                                  window_tokens=16)
        seen_widths = []
        orig = eng.flow_to_mel
        def spy(tokens, *a, **kw):
            seen_widths.append(np.asarray(tokens).reshape(1, -1).shape[1])
            return orig(tokens, *a, **kw)
        eng.flow_to_mel = spy
        tokens = rng.integers(0, 6561, 64).astype(np.int32)
        out = []
        for i in range(8):
            out.append(voc.feed(tokens[i * 8: (i + 1) * 8], final=(i == 7)))
        stream = np.concatenate(out)
        assert len(stream) == 64 * 2 * 480
        assert np.isfinite(stream).all()
        assert max(seen_widths) <= 16          # O(window), not O(total)


class TestWindowedBigFeeds:
    def test_feed_larger_than_window_loses_no_audio(self):
        """Regression: a feed chunk >= window - lookahead used to silently
        drop the tokens the window start had scrolled past (emitted tokens
        advanced without vocoding them)."""
        from chatterbox_tpu.serve import streaming as SS
        eng = _tiny_engine(seed=6)
        rng = np.random.default_rng(7)
        ref = eng.embed_ref((rng.standard_normal(24000) * 0.1).astype(np.float32),
                            24000)
        voc = SS.StreamingVocoder(eng, ref, jax.random.key(17),
                                  window_tokens=16)
        tokens = rng.integers(0, 6561, 64).astype(np.int32)
        out = []
        for i in range(4):                      # 16-token feeds == window
            out.append(voc.feed(tokens[i * 16: (i + 1) * 16], final=(i == 3)))
        stream = np.concatenate(out)
        assert len(stream) == 64 * 2 * 480      # every token vocoded
        assert np.isfinite(stream).all()

    def test_window_must_exceed_lookahead(self):
        from chatterbox_tpu.serve import streaming as SS
        eng = _tiny_engine(seed=6)
        rng = np.random.default_rng(8)
        ref = eng.embed_ref((rng.standard_normal(24000) * 0.1).astype(np.float32),
                            24000)
        with pytest.raises(ValueError):
            SS.StreamingVocoder(eng, ref, jax.random.key(1), window_tokens=4)


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


class TestBucketedGenerate:
    """t3_generate_bucketed must produce the one-shot program's exact token
    stream (same RNG chain) while growing the cache in segments."""

    def _setup(self, family):
        hp = T3Config.tiny_test(family)
        params = t3m.t3_init(jax.random.key(0), hp)
        cond = t3m.T3CondArrays(
            speaker_emb=jnp.zeros((1, 256)),
            cond_prompt_speech_tokens=jnp.zeros(
                (1, hp.speech_cond_prompt_len), jnp.int32),
            emotion_adv=(0.5 * jnp.ones((1, 1, 1))
                         if hp.emotion_adv else None))
        text = jnp.ones((1, 8), jnp.int32)
        return hp, params, cond, text

    def test_matches_one_shot_turbo(self):
        from chatterbox_tpu.sampling.chunked import t3_generate_bucketed
        from chatterbox_tpu.ops.sampling import SamplerParams
        hp, params, cond, text = self._setup("gpt2")
        sp = SamplerParams.make(temperature=0.8, top_p=0.95,
                                repetition_penalty=1.2, cfg_weight=0.0)
        kw = dict(max_new_tokens=11, top_k=40, cfg_mode=False,
                  ignore_eos=True)
        one = t3_generate(params, hp, cond, text, jnp.asarray(8), sp,
                          jax.random.key(3), **kw)
        buck = t3_generate_bucketed(params, hp, cond, text, jnp.asarray(8),
                                    sp, jax.random.key(3), first_segment=4,
                                    **kw)
        np.testing.assert_array_equal(np.asarray(one.tokens),
                                      np.asarray(buck.tokens))
        assert int(one.n_tokens) == int(buck.n_tokens)

    def test_matches_one_shot_cfg_with_eos(self):
        from chatterbox_tpu.sampling.chunked import t3_generate_bucketed
        from chatterbox_tpu.ops.sampling import SamplerParams
        hp, params, cond, text = self._setup("llama")
        sp = SamplerParams.make(temperature=0.8, top_p=1.0, min_p=0.02,
                                repetition_penalty=1.2, cfg_weight=0.5)
        kw = dict(max_new_tokens=12, cfg_mode=True, ignore_eos=False)
        one = t3_generate(params, hp, cond, text, jnp.asarray(8), sp,
                          jax.random.key(5), top_k=0, **kw)
        buck = t3_generate_bucketed(params, hp, cond, text, jnp.asarray(8),
                                    sp, jax.random.key(5), first_segment=5,
                                    **kw)
        np.testing.assert_array_equal(np.asarray(one.tokens),
                                      np.asarray(buck.tokens))
        assert int(one.n_tokens) == int(buck.n_tokens)


class TestPrefillDecodeFusion:
    """t3_prefill_decode (one dispatch) must reproduce the two-call
    prefill→chunk path token-for-token (same RNG chain), and continue
    correctly into subsequent t3_decode_chunk calls."""

    def test_fused_start_matches_two_calls(self):
        from chatterbox_tpu.sampling.chunked import (
            t3_prefill, t3_decode_chunk, t3_prefill_decode)
        from chatterbox_tpu.models.t3.config import T3Config
        from chatterbox_tpu.models.t3 import model as t3m
        from chatterbox_tpu.ops.sampling import SamplerParams

        hp = T3Config.tiny_test("gpt2")
        params = t3m.t3_init(jax.random.key(0), hp)
        cond = t3m.T3CondArrays(
            speaker_emb=jax.random.normal(jax.random.key(1), (1, 256)),
            cond_prompt_speech_tokens=jnp.zeros(
                (1, hp.speech_cond_prompt_len), jnp.int32),
            emotion_adv=None)
        text = jnp.pad(jnp.arange(1, 9, dtype=jnp.int32)[None],
                       ((0, 0), (0, 8)))
        sp = SamplerParams.make(temperature=0.8, top_p=0.9,
                                repetition_penalty=1.2)
        key = jax.random.key(5)

        s1 = t3_prefill(params, hp, cond, text, jnp.asarray(8), key,
                        max_new_tokens=16, cfg_mode=False)
        s1, t1, n1 = t3_decode_chunk(params, hp, s1, sp, n_steps=6,
                                     top_k=40, cfg_mode=False,
                                     ignore_eos=True)
        s2, t2, n2 = t3_prefill_decode(params, hp, cond, text,
                                       jnp.asarray(8), sp, key,
                                       max_new_tokens=16, n_steps=6,
                                       top_k=40, cfg_mode=False,
                                       ignore_eos=True)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        assert int(n1) == int(n2) == 6
        # continuation stays identical too
        _, c1, _ = t3_decode_chunk(params, hp, s1, sp, n_steps=5,
                                   top_k=40, cfg_mode=False, ignore_eos=True)
        _, c2, _ = t3_decode_chunk(params, hp, s2, sp, n_steps=5,
                                   top_k=40, cfg_mode=False, ignore_eos=True)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
