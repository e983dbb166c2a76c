"""Long-form narration soak: windowed StreamingVocoder at unbounded length.

Exercises the reference's dormant streaming hooks (hifigan.py:471-473,
flow.py:170-171) at a scale past the fixed noise buffer's span (~164 s of
audio ⇒ cyclic noise reuse), asserting bounded state, sample-accounting,
and join quality. Token count is scaled down (tiny models on CPU) but the
BUFFER geometry is the real one: 5000 tokens → 2·(P+5000) mel frames,
well past MAX_MEL_FRAMES=8192.
"""
import numpy as np
import pytest
import jax

from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, RefDict
from chatterbox_tpu.models.s3gen.flow import FlowDims, TOKEN_MEL_RATIO
from chatterbox_tpu.models.s3gen.hift import TOTAL_UPSAMPLE
from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
from chatterbox_tpu.serve.streaming import StreamingVocoder, chunk_text


@pytest.fixture(scope="module")
def engine():
    dims = FlowDims.tiny_test()
    params = s3gen_init(jax.random.key(0), meanflow=True,
                        tok_cfg=S3TokenizerConfig.tiny_test(),
                        dims=dims, hift_base=32)
    return S3GenEngine(params, meanflow=True,
                       tok_cfg=S3TokenizerConfig.tiny_test(), dims=dims)


@pytest.fixture(scope="module")
def ref():
    rng = np.random.default_rng(1)
    P = 11
    return RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32),
    )


class TestLongFormSoak:
    def test_windowed_soak_past_noise_buffer(self, engine, ref):
        """5000 tokens (≈200 s at production rate) through the windowed
        vocoder: cyclic noise wraparound, bounded state, exact sample
        accounting, and no pathological joins."""
        N, CHUNK = 5000, 40
        rng = np.random.default_rng(2)
        tokens = rng.integers(0, 6561, N).astype(np.int32)
        voc = StreamingVocoder(engine, ref, jax.random.key(3),
                               window_tokens=64, ctx_mel=16)
        assert 2 * (11 + N) > voc.MAX_MEL_FRAMES   # wraparound IS exercised

        total = 0
        boundary_rms, interior_rms = [], []
        for i in range(0, N, CHUNK):
            final = i + CHUNK >= N
            chunk = voc.feed(tokens[i: i + CHUNK], final=final)
            assert np.isfinite(chunk).all()
            if len(chunk):
                # join statistics: RMS right at the emit boundary vs interior
                k = min(480, len(chunk))
                boundary_rms.append(float(np.sqrt(np.mean(chunk[:k] ** 2))))
                interior_rms.append(float(np.sqrt(np.mean(chunk ** 2))))
            total += len(chunk)
            # bounded state: the mel tail and phase carry never grow
            assert voc._mel_tail.shape[1] <= 16
            assert np.isfinite(voc._phase_carry).all()

        assert total == N * TOKEN_MEL_RATIO * TOTAL_UPSAMPLE
        # joins must not be systematically hotter than the running audio
        # (a glitchy join shows up as a boundary energy spike)
        b, inner = np.median(boundary_rms), np.median(interior_rms)
        assert b < 4.0 * inner + 1e-6, (b, inner)

    def test_cyclic_noise_is_window_consistent(self, engine, ref):
        """The same absolute token span must vocode identically whether
        reached in one feed or across several (noise indexed by absolute
        frame, cyclically)."""
        N = 220
        rng = np.random.default_rng(4)
        tokens = rng.integers(0, 6561, N).astype(np.int32)

        one = StreamingVocoder(engine, ref, jax.random.key(5),
                               window_tokens=64, ctx_mel=16)
        outs_a = [one.feed(tokens[:100], final=False),
                  one.feed(tokens[100:], final=True)]

        two = StreamingVocoder(engine, ref, jax.random.key(5),
                               window_tokens=64, ctx_mel=16)
        outs_b = [two.feed(tokens[i: i + 20], final=(i + 20 >= N))
                  for i in range(0, N, 20)]
        a = np.concatenate(outs_a)
        b = np.concatenate(outs_b)
        assert len(a) == len(b) == N * TOKEN_MEL_RATIO * TOTAL_UPSAMPLE
        # identical windows → identical audio; different window alignments
        # re-denoise the same fixed noise → close, not bit-equal
        assert np.sqrt(np.mean((a - b) ** 2)) < 0.35 * np.sqrt(np.mean(a ** 2))


class TestChunkText:
    def test_long_text_chunking_round_trip(self):
        text = " ".join(f"Sentence number {i} is here." for i in range(100))
        chunks = chunk_text(text, max_chars=120)
        assert all(len(c) <= 120 for c in chunks)
        assert " ".join(chunks) == text
