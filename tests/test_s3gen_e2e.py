"""End-to-end S3Gen engine smoke tests on tiny dims (the VC path:
wav → tokens → mels → wav, no T3). Exercises exactly the stack the
reference's ChatterboxVC isolates (ref: vc.py:83-104)."""
import numpy as np
import jax
import pytest

from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, S3GEN_SR, S3_SR
from chatterbox_tpu.models.s3gen.flow import FlowDims
from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig


@pytest.fixture(scope="module")
def engine():
    tok_cfg = S3TokenizerConfig.tiny_test()
    dims = FlowDims.tiny_test()
    params = s3gen_init(jax.random.key(0), tok_cfg=tok_cfg, dims=dims, hift_base=32)
    return S3GenEngine(params, tok_cfg=tok_cfg, dims=dims, n_timesteps=2)


class TestS3GenEngine:
    def test_embed_ref(self, engine):
        rng = np.random.default_rng(0)
        ref_wav = (rng.standard_normal(S3GEN_SR * 2) * 0.1).astype(np.float32)  # 2 s
        ref = engine.embed_ref(ref_wav, S3GEN_SR)
        assert ref.prompt_feat.shape[1] == 100          # 2 s × 50 fps
        assert ref.embedding.shape == (1, 192)
        assert int(ref.prompt_token_len[0]) == 50       # 2 s × 25 tok/s
        assert ref.prompt_token.shape[1] * 2 == ref.prompt_feat.shape[1]

    def test_tokenize(self, engine):
        rng = np.random.default_rng(1)
        wav = (rng.standard_normal(S3_SR) * 0.1).astype(np.float32)  # 1 s
        tokens, tlen = engine.tokenize(wav)
        assert tokens.shape[1] == 25
        assert (tokens >= 0).all() and (tokens < 6561).all()

    def test_vc_full_path(self, engine):
        rng = np.random.default_rng(2)
        ref_wav = (rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32)
        ref = engine.embed_ref(ref_wav, S3GEN_SR)
        src = (rng.standard_normal(S3_SR) * 0.1).astype(np.float32)
        tokens, _ = engine.tokenize(src)
        wav = engine.inference(tokens, ref, jax.random.key(3))
        # 25 tokens → 50 mel frames → 24000 samples (1 s at 24 kHz)
        assert wav.shape == (1, tokens.shape[1] * 2 * 480)
        assert np.isfinite(wav).all()
        assert np.abs(wav).max() <= 0.99 + 1e-6
        # trim fade silences the first 20 ms
        assert np.abs(wav[0, :480]).max() == 0.0

    def test_determinism(self, engine):
        rng = np.random.default_rng(4)
        ref_wav = (rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32)
        ref = engine.embed_ref(ref_wav, S3GEN_SR)
        tokens = rng.integers(0, 6561, size=(1, 30)).astype(np.int32)
        w1 = engine.inference(tokens, ref, jax.random.key(7))
        w2 = engine.inference(tokens, ref, jax.random.key(7))
        np.testing.assert_array_equal(w1, w2)
