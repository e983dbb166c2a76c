"""Batched decode + serving loop + streaming tests (tiny configs, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.sampling.batched import t3_generate_batched
from chatterbox_tpu.sampling.decode import t3_generate
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.serve.batching import BatchDecoder, ServingLoop, TTSRequest
from chatterbox_tpu.serve.streaming import chunk_text
from chatterbox_tpu.api.pipelines import T3CondHost


@pytest.fixture(scope="module")
def setup():
    hp = T3Config.tiny_test("gpt2")
    params = t3m.t3_init(jax.random.key(0), hp)
    return hp, params


@pytest.fixture(scope="module")
def setup_cfg():
    hp = T3Config.tiny_test("llama")
    params = t3m.t3_init(jax.random.key(3), hp)
    return hp, params


def _cond(hp, B):
    return t3m.T3CondArrays(
        speaker_emb=jax.random.normal(jax.random.key(1), (B, 256)),
        cond_prompt_speech_tokens=jnp.zeros((B, hp.speech_cond_prompt_len), jnp.int32),
        emotion_adv=(0.5 * jnp.ones((B, 1, 1)) if hp.emotion_adv else None),
    )


def _cond_row(hp, i):
    """Row i of _cond(hp, B) as a standalone batch-1 conditioning."""
    c = _cond(hp, 4)
    return t3m.T3CondArrays(
        speaker_emb=c.speaker_emb[i : i + 1],
        cond_prompt_speech_tokens=c.cond_prompt_speech_tokens[i : i + 1],
        emotion_adv=(None if c.emotion_adv is None else c.emotion_adv[i : i + 1]),
    )


class TestBatchedDecode:
    def test_batched_shapes_and_bookkeeping(self, setup):
        hp, params = setup
        B = 3
        text = jnp.tile(jnp.arange(1, 9, dtype=jnp.int32)[None], (B, 1))
        text = jnp.pad(text, ((0, 0), (0, 8)))
        lens = jnp.array([8, 5, 8], jnp.int32)
        sp = SamplerParams.make(cfg_weight=0.0, top_p=0.9)
        res = t3_generate_batched(params, hp, _cond(hp, B), text, lens, sp,
                                  jax.random.split(jax.random.key(2), B),
                                  max_new_tokens=10, top_k=40)
        toks = np.asarray(res.tokens)
        ns = np.asarray(res.n_tokens)
        assert toks.shape == (B, 10)
        assert ((ns > 0) & (ns <= 10)).all()
        assert (toks >= 0).all() and (toks < hp.speech_tokens_dict_size).all()

    def test_row_independence(self, setup):
        """Changing one row's text must not change another row's output."""
        hp, params = setup
        sp = SamplerParams.make(cfg_weight=0.0, top_p=0.9)
        keys = jax.random.split(jax.random.key(5), 2)
        base = np.zeros((2, 16), np.int32)
        base[0, :6] = np.arange(1, 7)
        base[1, :6] = np.arange(7, 13)
        r1 = t3_generate_batched(params, hp, _cond(hp, 2), jnp.asarray(base),
                                 jnp.asarray([6, 6]), sp, keys,
                                 max_new_tokens=8, top_k=40)
        mod = base.copy()
        mod[1, :6] = np.arange(20, 26)
        r2 = t3_generate_batched(params, hp, _cond(hp, 2), jnp.asarray(mod),
                                 jnp.asarray([6, 6]), sp, keys,
                                 max_new_tokens=8, top_k=40)
        np.testing.assert_array_equal(np.asarray(r1.tokens)[0], np.asarray(r2.tokens)[0])

    def test_per_row_samplers(self, setup):
        """Heterogeneous SamplerParams: a near-greedy row must pick the argmax
        while a hot row with the same key/text is free to differ."""
        hp, params = setup
        B = 2
        text = jnp.tile(jnp.arange(1, 7, dtype=jnp.int32)[None], (B, 1))
        text = jnp.pad(text, ((0, 0), (0, 10)))
        lens = jnp.full((B,), 6, jnp.int32)
        k = jax.random.key(7)
        keys = jnp.stack([k, k])
        sp = SamplerParams(
            temperature=jnp.asarray([1e-4, 5.0], jnp.float32),
            top_p=jnp.asarray([1.0, 1.0], jnp.float32),
            min_p=jnp.asarray([0.0, 0.0], jnp.float32),
            repetition_penalty=jnp.asarray([1.0, 1.0], jnp.float32),
            cfg_weight=jnp.asarray([0.0, 0.0], jnp.float32),
        )
        res = t3_generate_batched(params, hp, _cond(hp, B), text, lens, sp, keys,
                                  max_new_tokens=8, top_k=0, ignore_eos=True)
        # near-greedy row must equal an explicit greedy re-run
        sp_g = SamplerParams(
            temperature=jnp.asarray([1e-4, 1e-4], jnp.float32),
            top_p=jnp.asarray([1.0, 1.0], jnp.float32),
            min_p=jnp.asarray([0.0, 0.0], jnp.float32),
            repetition_penalty=jnp.asarray([1.0, 1.0], jnp.float32),
            cfg_weight=jnp.asarray([0.0, 0.0], jnp.float32),
        )
        res_g = t3_generate_batched(params, hp, _cond(hp, B), text, lens, sp_g,
                                    keys, max_new_tokens=8, top_k=0,
                                    ignore_eos=True)
        np.testing.assert_array_equal(np.asarray(res.tokens)[0],
                                      np.asarray(res_g.tokens)[0])

    def test_cfg_batched_matches_isolated(self, setup_cfg):
        """4 heterogeneous CFG requests decoded together must match each one
        decoded alone (same per-row keys + per-row samplers)."""
        hp, params = setup_cfg
        B = 4
        rng = np.random.default_rng(0)
        text = np.zeros((B, 16), np.int32)
        lens = np.array([6, 9, 4, 12], np.int32)
        for i in range(B):
            text[i, : lens[i]] = rng.integers(1, hp.text_tokens_dict_size, lens[i])
        sp = SamplerParams(
            temperature=jnp.asarray([0.6, 0.8, 1.0, 1.2], jnp.float32),
            top_p=jnp.asarray([0.9, 1.0, 0.95, 0.8], jnp.float32),
            min_p=jnp.asarray([0.05, 0.0, 0.1, 0.05], jnp.float32),
            repetition_penalty=jnp.asarray([1.2, 1.0, 1.5, 1.2], jnp.float32),
            cfg_weight=jnp.asarray([0.5, 0.3, 0.7, 0.0], jnp.float32),
        )
        keys = jax.random.split(jax.random.key(11), B)
        res = t3_generate_batched(params, hp, _cond(hp, B), jnp.asarray(text),
                                  jnp.asarray(lens), sp, keys,
                                  max_new_tokens=8, cfg_mode=True)
        for i in range(B):
            sp_i = SamplerParams(*[jnp.asarray([v[i]]) for v in sp])
            r = t3_generate_batched(params, hp, _cond_row(hp, i),
                                    jnp.asarray(text[i : i + 1]),
                                    jnp.asarray(lens[i : i + 1]), sp_i,
                                    keys[i : i + 1],
                                    max_new_tokens=8, cfg_mode=True)
            np.testing.assert_array_equal(np.asarray(res.tokens)[i],
                                          np.asarray(r.tokens)[0],
                                          err_msg=f"row {i}")
            assert int(res.n_tokens[i]) == int(r.n_tokens[0])


class TestServingLoop:
    def test_kv_int8_batched_matches_isolated(self, setup_cfg):
        """Batched int8-KV decode (pallas streamed-int8 kernel with the
        per-row left-pad lower bound) must reproduce each request decoded
        alone with kv_int8 — same layout ⇒ same quantization ⇒ identical
        token streams."""
        hp, params = setup_cfg
        B = 3
        rng = np.random.default_rng(4)
        text = np.zeros((B, 16), np.int32)
        lens = np.array([6, 11, 4], np.int32)
        for i in range(B):
            text[i, : lens[i]] = rng.integers(1, hp.text_tokens_dict_size,
                                              lens[i])
        sp = SamplerParams.make(cfg_weight=0.5, top_p=0.95,
                                repetition_penalty=1.2)
        keys = jax.random.split(jax.random.key(13), B)
        res = t3_generate_batched(params, hp, _cond(hp, B),
                                  jnp.asarray(text), jnp.asarray(lens), sp,
                                  keys, max_new_tokens=8, cfg_mode=True,
                                  kv_int8=True)
        for i in range(B):
            r = t3_generate_batched(params, hp, _cond_row(hp, i),
                                    jnp.asarray(text[i : i + 1]),
                                    jnp.asarray(lens[i : i + 1]), sp,
                                    keys[i : i + 1], max_new_tokens=8,
                                    cfg_mode=True, kv_int8=True)
            np.testing.assert_array_equal(np.asarray(res.tokens)[i],
                                          np.asarray(r.tokens)[0],
                                          err_msg=f"row {i}")

    def test_kv_int8_bucketed_matches_oneshot(self, setup):
        """Bucketed cache growth composes with the int8 cache: identical
        token streams to the one-shot int8 loop (same per-step RNG chain,
        tiles past the valid region contribute nothing)."""
        from chatterbox_tpu.sampling.batched import (
            t3_generate_batched_bucketed)
        hp, params = setup
        B = 2
        text = jnp.tile(jnp.arange(1, 8, dtype=jnp.int32)[None], (B, 1))
        text = jnp.pad(text, ((0, 0), (0, 9)))
        lens = jnp.array([7, 5], jnp.int32)
        sp = SamplerParams.make(cfg_weight=0.0, top_p=0.9)
        keys = jax.random.split(jax.random.key(17), B)
        one = t3_generate_batched(params, hp, _cond(hp, B), text, lens, sp,
                                  keys, max_new_tokens=12, top_k=40,
                                  kv_int8=True)
        buck = t3_generate_batched_bucketed(params, hp, _cond(hp, B), text,
                                            lens, sp, keys,
                                            max_new_tokens=12, top_k=40,
                                            first_segment=4, kv_int8=True)
        np.testing.assert_array_equal(np.asarray(one.tokens),
                                      np.asarray(buck.tokens))
        np.testing.assert_array_equal(np.asarray(one.n_tokens),
                                      np.asarray(buck.n_tokens))

    def test_kv_int8_grow_pads_across_tile_boundary(self, setup):
        """With tiny configs every small budget tile-aligns to the SAME
        256-slot cache, so grow_cache pads zero int8 bytes (r3 advisor
        finding). This budget crosses the TT=256 tile boundary, so at least
        one grow actually pads the int8 cache (and its scales) — parity
        with the one-shot loop proves the padded region contributes
        nothing."""
        from chatterbox_tpu.sampling.batched import (
            t3_generate_batched_bucketed)
        from chatterbox_tpu.ops.pallas_attention import TT
        from chatterbox_tpu.models.t3 import model as t3m
        from chatterbox_tpu.sampling.chunked import segment_schedule
        hp, params = setup
        N = TT + 12                       # crosses the 256-slot boundary
        text = jnp.pad(jnp.arange(1, 8, dtype=jnp.int32)[None],
                       ((0, 0), (0, 9)))
        lens = jnp.array([7], jnp.int32)
        # the growth schedule must produce >1 distinct tile-aligned cap,
        # else this test silently degenerates to the zero-pad case again
        P_pad = t3m.cond_len(hp) + text.shape[1] + 1
        caps, c = [], 0
        for s in segment_schedule(N, 32):
            c += s
            caps.append(-(-(P_pad + c) // TT) * TT)
        assert len(set(caps)) > 1, caps
        sp = SamplerParams.make(cfg_weight=0.0, top_p=0.9)
        keys = jax.random.split(jax.random.key(23), 1)
        one = t3_generate_batched(params, hp, _cond(hp, 1), text, lens, sp,
                                  keys, max_new_tokens=N, top_k=40,
                                  kv_int8=True, ignore_eos=True)
        buck = t3_generate_batched_bucketed(params, hp, _cond(hp, 1), text,
                                            lens, sp, keys,
                                            max_new_tokens=N, top_k=40,
                                            first_segment=32, kv_int8=True,
                                            ignore_eos=True)
        np.testing.assert_array_equal(np.asarray(one.tokens),
                                      np.asarray(buck.tokens))

    def test_batch_decoder_and_loop(self, setup):
        hp, params = setup
        dec = BatchDecoder(params, hp, max_batch=4, max_new_tokens=6, top_k=40)
        results = []
        loop = ServingLoop(dec, on_result=results.append, batch_wait_s=0.05)
        loop.start()
        cond = T3CondHost(np.zeros((1, 256), np.float32),
                          np.zeros((1, hp.speech_cond_prompt_len), np.int32))
        for i in range(3):
            loop.submit(TTSRequest(text_tokens=np.arange(1, 6, dtype=np.int32),
                                   cond=cond, request_id=i))
        import time
        for _ in range(200):
            if len(results) == 3:
                break
            time.sleep(0.2)
        loop.stop()
        assert len(results) == 3
        assert sorted(r.request_id for r in results) == [0, 1, 2]
        for r in results:
            assert (r.speech_tokens < 6561).all()


class TestBatchPow2Padding:
    def _req(self, hp, cond, i):
        rng = np.random.default_rng(40 + i)
        return TTSRequest(text_tokens=rng.integers(1, 60, 5 + i).astype(np.int32),
                          cond=cond, request_id=i, seed=40 + i,
                          sampler=SamplerParams.make(cfg_weight=0.0))

    def test_padded_batch_matches_isolated(self, setup):
        """A batch of 3 (padded to 4 rows on device) returns per-request
        results identical to each request decoded alone — the pad rows are
        invisible."""
        hp, params = setup
        cond = T3CondHost(np.zeros((1, 256), np.float32),
                          np.zeros((1, hp.speech_cond_prompt_len), np.int32))
        dec = BatchDecoder(params, hp, max_batch=4, max_new_tokens=6, top_k=40)
        batch = dec.decode_batch([self._req(hp, cond, i) for i in range(3)])
        assert len(batch) == 3                     # pad row not returned
        for i, b in enumerate(batch):
            solo = dec.decode_batch([self._req(hp, cond, i)])[0]
            assert b.request_id == solo.request_id == i
            np.testing.assert_array_equal(b.speech_tokens, solo.speech_tokens)

    def test_decoder_warmup_grid(self, setup):
        """warmup compiles pow2-batch × text-bucket cells and leaves the
        decoder fully functional."""
        hp, params = setup
        cond = T3CondHost(np.zeros((1, 256), np.float32),
                          np.zeros((1, hp.speech_cond_prompt_len), np.int32))
        dec = BatchDecoder(params, hp, max_batch=4, max_new_tokens=6, top_k=40)
        n = dec.warmup(cond, max_text_len=5)
        assert n == 3          # B ∈ {1,2,4} × one text bucket (32)
        out = dec.decode_batch([self._req(hp, cond, 0)])
        assert (out[0].speech_tokens < 6561).all()


class TestChunkText:
    def test_sentence_chunking(self):
        text = "One. Two! Three? " + "x" * 10
        chunks = chunk_text(text, max_chars=12)
        assert all(len(c) <= 12 for c in chunks)
        assert "".join(chunks).replace(" ", "") == text.replace(" ", "")

    def test_single_chunk(self):
        assert chunk_text("Short text.") == ["Short text."]


class TestBatchedS3Gen:
    def test_inference_batch_matches_single(self):
        """Batched vocoding must be row-independent and shape-correct."""
        from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, S3GEN_SR
        from chatterbox_tpu.models.s3gen.flow import FlowDims
        from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
        tok_cfg = S3TokenizerConfig.tiny_test()
        dims = FlowDims.tiny_test()
        eng = S3GenEngine(s3gen_init(jax.random.key(0), tok_cfg=tok_cfg, dims=dims,
                                     hift_base=32),
                          tok_cfg=tok_cfg, dims=dims, n_timesteps=2)
        rng = np.random.default_rng(0)
        refs = []
        for i in range(2):
            wav = (rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32)
            refs.append(eng.embed_ref(wav, S3GEN_SR))
        rows = [rng.integers(0, 6561, 20).astype(np.int32),
                rng.integers(0, 6561, 12).astype(np.int32)]
        wavs = eng.inference_batch(rows, refs, jax.random.key(3))
        assert len(wavs) == 2
        assert len(wavs[0]) == 20 * 2 * 480
        assert len(wavs[1]) == 12 * 2 * 480
        for w in wavs:
            assert np.isfinite(w).all()
            assert np.abs(w[:480]).max() == 0.0  # trim fade applied per row

    def test_serving_loop_with_vocoding(self, setup):
        """ServingLoop joined with S3Gen: results carry finished audio."""
        from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, S3GEN_SR
        from chatterbox_tpu.models.s3gen.flow import FlowDims
        from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
        hp, params = setup
        tok_cfg = S3TokenizerConfig.tiny_test()
        dims = FlowDims.tiny_test()
        eng = S3GenEngine(s3gen_init(jax.random.key(6), tok_cfg=tok_cfg,
                                     dims=dims, hift_base=32),
                          tok_cfg=tok_cfg, dims=dims, n_timesteps=2)
        rng = np.random.default_rng(8)
        ref = eng.embed_ref((rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32),
                            S3GEN_SR)
        dec = BatchDecoder(params, hp, max_batch=4, max_new_tokens=6, top_k=40)
        results = []
        loop = ServingLoop(dec, on_result=results.append, batch_wait_s=0.05,
                           s3gen=eng)
        loop.start()
        cond = T3CondHost(np.zeros((1, 256), np.float32),
                          np.zeros((1, hp.speech_cond_prompt_len), np.int32))
        for i in range(2):
            loop.submit(TTSRequest(text_tokens=np.arange(1, 6, dtype=np.int32),
                                   cond=cond, request_id=i, ref=ref))
        import time
        for _ in range(300):
            if len(results) == 2:
                break
            time.sleep(0.2)
        loop.stop()
        assert len(results) == 2
        for r in results:
            assert r.wav is not None and np.isfinite(r.wav).all()

    def test_tts_server_end_to_end(self, setup):
        from chatterbox_tpu.serve.batching import TTSServer
        from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, S3GEN_SR
        from chatterbox_tpu.models.s3gen.flow import FlowDims
        from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
        hp, params = setup
        tok_cfg = S3TokenizerConfig.tiny_test()
        dims = FlowDims.tiny_test()
        eng = S3GenEngine(s3gen_init(jax.random.key(1), tok_cfg=tok_cfg, dims=dims,
                                     hift_base=32),
                          tok_cfg=tok_cfg, dims=dims, n_timesteps=2)
        dec = BatchDecoder(params, hp, max_batch=4, max_new_tokens=6, top_k=40)
        server = TTSServer(dec, eng)
        cond = T3CondHost(np.zeros((1, 256), np.float32),
                          np.zeros((1, hp.speech_cond_prompt_len), np.int32))
        reqs = [TTSRequest(text_tokens=np.arange(1, 6, dtype=np.int32),
                           cond=cond, request_id=i) for i in range(3)]
        rng = np.random.default_rng(4)
        refs = []
        for i in range(3):
            wav = (rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32)
            refs.append(eng.embed_ref(wav, S3GEN_SR))
        wavs = server.synthesize_batch(reqs, refs)
        assert len(wavs) == 3
        for w in wavs:
            assert np.isfinite(w).all() and len(w) > 0


class TestBatchedBucketed:
    def test_matches_one_shot(self):
        """t3_generate_batched_bucketed must reproduce t3_generate_batched
        row-for-row (same per-row RNG chains across segment boundaries)."""
        from chatterbox_tpu.sampling.batched import (
            t3_generate_batched, t3_generate_batched_bucketed)
        from chatterbox_tpu.models.t3.config import T3Config
        from chatterbox_tpu.models.t3 import model as t3m
        from chatterbox_tpu.ops.sampling import SamplerParams
        import jax.numpy as jnp

        for family, cfg_mode in (("gpt2", False), ("llama", True)):
            hp = T3Config.tiny_test(family)
            params = t3m.t3_init(jax.random.key(0), hp)
            B = 3
            cond = t3m.T3CondArrays(
                speaker_emb=jnp.zeros((B, 256)),
                cond_prompt_speech_tokens=jnp.zeros(
                    (B, hp.speech_cond_prompt_len), jnp.int32),
                emotion_adv=(0.5 * jnp.ones((B, 1, 1))
                             if hp.emotion_adv else None))
            text = jnp.tile(jnp.arange(1, 9, dtype=jnp.int32)[None], (B, 1))
            lens = jnp.asarray([8, 5, 7], jnp.int32)
            sp = SamplerParams.make(cfg_weight=0.5 if cfg_mode else 0.0)
            keys = jax.random.split(jax.random.key(4), B)
            kw = dict(max_new_tokens=11, top_k=0 if cfg_mode else 40,
                      cfg_mode=cfg_mode, ignore_eos=False)
            one = t3_generate_batched(params, hp, cond, text, lens, sp,
                                      keys, **kw)
            buck = t3_generate_batched_bucketed(params, hp, cond, text, lens,
                                                sp, keys, first_segment=4,
                                                **kw)
            np.testing.assert_array_equal(np.asarray(one.tokens),
                                          np.asarray(buck.tokens), family)
            np.testing.assert_array_equal(np.asarray(one.n_tokens),
                                          np.asarray(buck.n_tokens), family)
