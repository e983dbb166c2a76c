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


def _cond(hp, B):
    return t3m.T3CondArrays(
        speaker_emb=jax.random.normal(jax.random.key(1), (B, 256)),
        cond_prompt_speech_tokens=jnp.zeros((B, hp.speech_cond_prompt_len), jnp.int32),
        emotion_adv=None,
    )


class TestBatchedDecode:
    def test_batched_matches_single(self, setup):
        """A batch of identical requests must produce the same tokens as the
        single-request engine given the same RNG path is deterministic per
        row... (rows share one key stream, so instead check per-row validity
        and EOS bookkeeping)."""
        hp, params = setup
        B = 3
        text = jnp.tile(jnp.arange(1, 9, dtype=jnp.int32)[None], (B, 1))
        text = jnp.pad(text, ((0, 0), (0, 8)))
        lens = jnp.array([8, 5, 8], jnp.int32)
        sp = SamplerParams.make(cfg_weight=0.0, top_p=0.9)
        res = t3_generate_batched(params, hp, _cond(hp, B), text, lens, sp,
                                  jax.random.key(2), max_new_tokens=10, top_k=40)
        toks = np.asarray(res.tokens)
        ns = np.asarray(res.n_tokens)
        assert toks.shape == (B, 10)
        assert ((ns > 0) & (ns <= 10)).all()
        assert (toks >= 0).all() and (toks < hp.speech_tokens_dict_size).all()

    def test_row_independence(self, setup):
        """Changing one row's text must not change another row's output."""
        hp, params = setup
        sp = SamplerParams.make(cfg_weight=0.0, top_p=0.9)
        base = np.zeros((2, 16), np.int32)
        base[0, :6] = np.arange(1, 7)
        base[1, :6] = np.arange(7, 13)
        r1 = t3_generate_batched(params, hp, _cond(hp, 2), jnp.asarray(base),
                                 jnp.asarray([6, 6]), sp, jax.random.key(5),
                                 max_new_tokens=8, top_k=40)
        mod = base.copy()
        mod[1, :6] = np.arange(20, 26)
        r2 = t3_generate_batched(params, hp, _cond(hp, 2), jnp.asarray(mod),
                                 jnp.asarray([6, 6]), sp, jax.random.key(5),
                                 max_new_tokens=8, top_k=40)
        np.testing.assert_array_equal(np.asarray(r1.tokens)[0], np.asarray(r2.tokens)[0])


class TestServingLoop:
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
