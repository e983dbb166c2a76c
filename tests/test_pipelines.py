"""Full-pipeline smoke tests on tiny random-init models (CPU).

Covers the reference's de-facto verification (its example scripts synthesize
wavs end-to-end; SURVEY.md §4) at tiny scale: text → tokens → T3 decode →
S3Gen → waveform for all four pipelines.
"""
import numpy as np
import pytest
import jax

from chatterbox_tpu.api.pipelines import (
    ChatterboxTTS, ChatterboxTurboTTS, ChatterboxMultilingualTTS, ChatterboxVC,
    Conditionals, T3CondHost, drop_invalid_tokens_sliced, SUPPORTED_LANGUAGES,
)
from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.s3gen.flow import FlowDims
from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
from chatterbox_tpu.text.tokenizer import punc_norm


class FakeTokenizer:
    """Char-level stand-in for the BPE tokenizers (tiny vocab)."""

    def __init__(self, vocab=60):
        self.vocab = vocab

    def text_to_tokens(self, text, language_id=None, **kw):
        ids = [1 + (ord(c) % (self.vocab - 2)) for c in text[:20]]
        return np.asarray(ids, np.int32)[None]


TINY = dict(flow_dims=FlowDims.tiny_test(), tok_cfg=S3TokenizerConfig.tiny_test(),
            hift_base=32)


def _make_ref_wav(seconds=2, sr=24000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(seconds * sr) / sr
    return (0.1 * np.sin(2 * np.pi * 220 * t)
            + 0.02 * rng.standard_normal(seconds * sr)).astype(np.float32)


class TestPuncNorm:
    def test_variants(self):
        assert punc_norm("") == "You need to add some text for me to talk."
        assert punc_norm("hello world") == "Hello world."
        # ';' → ', ' keeps the original following space (reference behavior)
        assert punc_norm("Hi; there") == "Hi,  there."
        # turbo keeps "..." (no triple-dot replacement; trailing dot kept)
        assert punc_norm("Wait...", variant="turbo") == "Wait..."
        # mtl accepts CJK enders
        assert punc_norm("你好。", variant="mtl") == "你好。"

    def test_drop_invalid_sliced(self):
        toks = np.array([5, 6561, 10, 20, 6562, 30])
        np.testing.assert_array_equal(drop_invalid_tokens_sliced(toks), [10, 20])
        toks = np.array([10, 20, 30])
        np.testing.assert_array_equal(drop_invalid_tokens_sliced(toks), [10, 20, 30])


class TestTurboPipeline:
    @pytest.fixture(scope="class")
    def model(self):
        hp = T3Config.tiny_test("gpt2")
        m = ChatterboxTurboTTS.random_init(nano=True, tokenizer=FakeTokenizer(),
                                           hp=hp, **TINY)
        return m

    def test_generate_with_prompt_wav(self, model, tmp_path):
        from chatterbox_tpu.utils.audio_io import save_wav
        wav_path = tmp_path / "ref.wav"
        save_wav(str(wav_path), _make_ref_wav(6), 24000)
        out = model.generate("Hello there.", audio_prompt_path=str(wav_path),
                             max_new_tokens=8, top_k=50)
        assert out.ndim == 2 and out.shape[0] == 1
        assert out.shape[1] > 0
        assert np.isfinite(out).all()

    def test_generate_with_draft(self, model, tmp_path):
        """Speculative decoding through the pipeline: a second tiny model
        drafts, `model` verifies (sampling/speculative.py)."""
        from chatterbox_tpu.utils.audio_io import save_wav
        wav_path = tmp_path / "ref_draft.wav"
        save_wav(str(wav_path), _make_ref_wav(6), 24000)
        hp = T3Config.tiny_test("gpt2")
        draft = ChatterboxTurboTTS.random_init(
            key=jax.random.key(9), nano=True, tokenizer=FakeTokenizer(),
            hp=hp, **TINY)
        out = model.generate("Hello there.", audio_prompt_path=str(wav_path),
                             max_new_tokens=8, top_k=50, draft=draft,
                             n_draft=3)
        assert out.ndim == 2 and out.shape[0] == 1 and out.shape[1] > 0
        assert np.isfinite(out).all()

    def test_generate_with_int8_self_draft(self, model, tmp_path):
        """`draft="int8"`: the model's own int8-quantized weights draft,
        the float model verifies — lossless speculative mode. The quant
        view is built once and shares conditionals with the target."""
        from chatterbox_tpu.utils.audio_io import save_wav
        wav_path = tmp_path / "ref_qdraft.wav"
        save_wav(str(wav_path), _make_ref_wav(6), 24000)
        out = model.generate("Hello there.", audio_prompt_path=str(wav_path),
                             max_new_tokens=8, top_k=50, draft="int8",
                             n_draft=3)
        assert out.ndim == 2 and out.shape[0] == 1 and out.shape[1] > 0
        assert np.isfinite(out).all()
        view = model._qdraft
        assert view is not None and view.conds is model.conds
        out2 = model.generate("Hello again.", max_new_tokens=8, top_k=50,
                              draft="int8", n_draft=3)
        assert model._qdraft is view        # cached, not rebuilt
        assert np.isfinite(out2).all()

    def test_conditionals_save_load(self, model, tmp_path):
        path = tmp_path / "conds.npz"
        model.conds.save(str(path))
        loaded = Conditionals.load(str(path))
        np.testing.assert_array_equal(loaded.gen.prompt_token,
                                      model.conds.gen.prompt_token)
        np.testing.assert_allclose(loaded.t3.speaker_emb, model.conds.t3.speaker_emb)

    def test_conditionals_pt_roundtrip(self, model, tmp_path):
        """.pt export must round-trip through our loader AND instantiate the
        reference T3Cond dataclass (interop with ref: tts.py:91-103)."""
        if model.conds is None:
            model._prepare_from_wav(_make_ref_wav(6), 0.0)
        path = tmp_path / "conds.pt"
        model.conds.save(str(path))
        loaded = Conditionals.load(str(path))
        np.testing.assert_array_equal(loaded.gen.prompt_token,
                                      model.conds.gen.prompt_token)
        np.testing.assert_allclose(loaded.gen.prompt_feat,
                                   model.conds.gen.prompt_feat, atol=1e-6)
        np.testing.assert_allclose(loaded.t3.speaker_emb,
                                   model.conds.t3.speaker_emb, atol=1e-6)
        assert loaded.t3.emotion_adv == model.conds.t3.emotion_adv

        import torch
        from tests.ref_loader import load_ref_module
        cond_mod = load_ref_module("chatterbox.models.t3.modules.cond_enc")
        data = torch.load(str(path), weights_only=True)
        ref_cond = cond_mod.T3Cond(**data["t3"])     # exact field-name match
        np.testing.assert_allclose(ref_cond.speaker_emb.numpy(),
                                   model.conds.t3.speaker_emb, atol=1e-6)
        assert set(data["gen"].keys()) == {
            "prompt_token", "prompt_token_len", "prompt_feat",
            "prompt_feat_len", "embedding"}


class TestCfgPipeline:
    def test_english_tts(self, tmp_path):
        hp = T3Config.tiny_test("llama")
        m = ChatterboxTTS.random_init(hp=hp, tokenizer=FakeTokenizer(), **TINY)
        from chatterbox_tpu.utils.audio_io import save_wav
        wav_path = tmp_path / "ref.wav"
        save_wav(str(wav_path), _make_ref_wav(2, seed=1), 24000)
        out = m.generate("Test.", audio_prompt_path=str(wav_path),
                         max_new_tokens=6)
        assert out.ndim == 2 and np.isfinite(out).all()
        # cfg_weight=0 takes the batch-1 decode path (ref: tts.py:237-238)
        out0 = m.generate("Test.", cfg_weight=0.0, max_new_tokens=6)
        assert out0.ndim == 2 and np.isfinite(out0).all()


class TestVCPipeline:
    def test_vc(self, tmp_path):
        m = ChatterboxVC.random_init(**TINY)
        from chatterbox_tpu.utils.audio_io import save_wav
        ref_path = tmp_path / "ref.wav"
        src_path = tmp_path / "src.wav"
        save_wav(str(ref_path), _make_ref_wav(1, seed=2), 24000)
        save_wav(str(src_path), _make_ref_wav(1, seed=3), 24000)
        out = m.generate(str(src_path), target_voice_path=str(ref_path))
        assert out.shape[0] == 1 and out.shape[1] > 0
        assert np.isfinite(out).all()


class TestMTL:
    def test_language_validation(self):
        hp = T3Config.tiny_test("llama")
        m = ChatterboxMultilingualTTS.random_init(hp=hp, tokenizer=FakeTokenizer(), **TINY)
        with pytest.raises(ValueError, match="Unsupported language_id"):
            m.generate("x", language_id="xx")

    def test_supported_languages(self):
        assert len(SUPPORTED_LANGUAGES) == 23
        assert ChatterboxMultilingualTTS.get_supported_languages()["zh"] == "Chinese"


class TestBucketedPipelineSwitch:
    """The CFG pipelines switch to bucketed-cache decode at long budgets;
    the audio must be identical to the plain one-shot path (token parity is
    pinned at engine level — this checks the pipeline wiring end-to-end)."""

    def test_cfg_bucketed_audio_identical(self, monkeypatch):
        hp = T3Config.tiny_test("llama")
        m = ChatterboxTTS.random_init(hp=hp, tokenizer=FakeTokenizer(), **TINY)
        from chatterbox_tpu.utils.audio_io import save_wav
        import tempfile, os
        d = tempfile.mkdtemp()
        save_wav(os.path.join(d, "ref.wav"), _make_ref_wav(2), 24000)
        m.prepare_conditionals(os.path.join(d, "ref.wav"))

        m.set_seed(0)
        plain = m.generate("Bucketed parity.", max_new_tokens=12)

        import chatterbox_tpu.sampling.chunked as chunked
        monkeypatch.setattr(chunked, "BUCKETED_DECODE_THRESHOLD", 4)
        m.set_seed(0)
        bucketed = m.generate("Bucketed parity.", max_new_tokens=12)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(bucketed))

    def test_mtl_bucketed_audio_identical(self, monkeypatch):
        hp = T3Config.tiny_test("llama")
        m = ChatterboxMultilingualTTS.random_init(hp=hp,
                                                  tokenizer=FakeTokenizer(),
                                                  **TINY)
        from chatterbox_tpu.utils.audio_io import save_wav
        import tempfile, os
        d = tempfile.mkdtemp()
        save_wav(os.path.join(d, "ref.wav"), _make_ref_wav(2), 24000)
        m.prepare_conditionals(os.path.join(d, "ref.wav"))

        m.set_seed(3)
        plain = m.generate("Salut.", language_id="fr", max_new_tokens=12)

        import chatterbox_tpu.sampling.chunked as chunked
        monkeypatch.setattr(chunked, "BUCKETED_DECODE_THRESHOLD", 4)
        m.set_seed(3)
        bucketed = m.generate("Salut.", language_id="fr", max_new_tokens=12)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(bucketed))


class _IdentityWM:
    def apply_watermark(self, wav, **kw):
        return np.asarray(wav, np.float32)


class TestCfgStreamingPipeline:
    """CFG-family generate_stream (round-5): the concatenated stream must
    track generate() on the same seed — same RNG chain (decode key then
    vocode key), identical token stream (budget-clamped chunks; progressive
    first-EOS == the sliced tail on any stream without a mid-stream SOS), so
    sample-count-exact; amplitudes are close-not-byte-equal because the
    growing-window flow re-estimates earlier frames as the bidirectional
    conformer sees more tokens (same semantics as the Turbo stream — the
    byte-identity invariant lives at the continuous engine, solo vs
    concurrent, test_continuous.py). Watermark stubbed to identity — the
    real embed is envelope/filter-transient chunk-dependent by design."""

    def test_english_stream_matches_generate(self):
        hp = T3Config.tiny_test("llama")
        m = ChatterboxTTS.random_init(hp=hp, tokenizer=FakeTokenizer(), **TINY)
        m._prepare_from_wav(_make_ref_wav(2, seed=1), 0.5)
        m.watermarker = _IdentityWM()
        m.set_seed(11)
        full = np.asarray(m.generate("Stream parity.", max_new_tokens=12))[0]
        m.set_seed(11)
        chunks = list(m.generate_stream("Stream parity.", max_new_tokens=12,
                                        chunk_tokens=5))
        assert len(chunks) >= 1
        total = np.concatenate(chunks)
        assert total.shape == full.shape      # token stream identical
        np.testing.assert_allclose(total, full, atol=0.02)

    def test_mtl_stream_matches_generate_with_trim(self):
        hp = T3Config.tiny_test("llama")
        m = ChatterboxMultilingualTTS.random_init(
            hp=hp, tokenizer=FakeTokenizer(), **TINY)
        m._prepare_from_wav(_make_ref_wav(2, seed=2), 0.5)
        m.watermarker = _IdentityWM()
        m.set_seed(5)
        full = np.asarray(m.generate("Salut toi.", language_id="fr",
                                     max_new_tokens=12))[0]
        m.set_seed(5)
        chunks = list(m.generate_stream("Salut toi.", language_id="fr",
                                        max_new_tokens=12, chunk_tokens=5))
        total = np.concatenate(chunks)
        # the 40 ms final-token trim must match generate()'s tail bound
        assert total.shape == full.shape
        np.testing.assert_allclose(total, full, atol=0.02)
