"""Fused S3Gen inference program vs a manually staged composition.

The fused program (models/s3gen/model.py `_fused`) packs flow →
gen-region slice → HiFT → trim-fade into one jitted graph. These tests pin
its semantics against an explicit host-staged recomputation with the same
key schedule, so slicing/masking/fade regressions can't hide inside the
fusion. (Ref behavior being matched: s3gen.py:329-362 + 254-258.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatterbox_tpu.models.s3gen.model import (
    S3GenEngine, s3gen_init, RefDict, MEL_FLOOR, trim_fade, _bucket,
    TOKEN_BUCKETS, GEN_MEL_BUCKETS)
from chatterbox_tpu.models.s3gen.flow import (
    FlowDims, flow_inference, TOKEN_MEL_RATIO)
from chatterbox_tpu.models.s3gen.hift import hift_inference, TOTAL_UPSAMPLE
from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig


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


def staged_reference(engine, speech_tokens, ref, key, n_timesteps):
    """Replicates the fused program's math with explicit host staging."""
    speech_tokens = np.asarray(speech_tokens).reshape(1, -1)
    P = int(ref.prompt_token_len[0])
    G = speech_tokens.shape[1]
    bucket = _bucket(P + G, TOKEN_BUCKETS)
    token = np.zeros((1, bucket), np.int32)
    token[0, :P] = ref.prompt_token[0, :P]
    token[0, P: P + G] = speech_tokens[0]
    mel_bucket = _bucket(G * TOKEN_MEL_RATIO, GEN_MEL_BUCKETS)

    k_noise, k_flow, k_hift = jax.random.split(key, 3)
    noise = jax.random.normal(k_noise, (1, bucket * TOKEN_MEL_RATIO, 80))
    mels = np.asarray(flow_inference(
        engine.params["flow"], token=jnp.asarray(token),
        token_len=jnp.asarray([P + G]), prompt_len=jnp.asarray([P]),
        prompt_feat=jnp.asarray(ref.prompt_feat),
        embedding=jnp.asarray(ref.embedding), key=k_flow,
        n_timesteps=n_timesteps, meanflow=True, noise=noise,
        dims=engine.dims))
    gen = np.full((1, mel_bucket, 80), MEL_FLOOR, np.float32)
    gen[0, : G * TOKEN_MEL_RATIO] = mels[0, P * TOKEN_MEL_RATIO:
                                         (P + G) * TOKEN_MEL_RATIO]
    wav, _, _ = hift_inference(engine.params["mel2wav"], k_hift,
                               jnp.asarray(gen))
    wav = np.array(wav)[:, : G * TOKEN_MEL_RATIO * TOTAL_UPSAMPLE]
    fade = trim_fade()
    n = min(wav.shape[1], len(fade))
    wav[:, :n] *= fade[:n]
    return wav


class TestFusedInference:
    def test_matches_staged_composition(self, engine, ref):
        rng = np.random.default_rng(2)
        toks = rng.integers(0, 6561, (1, 30)).astype(np.int32)
        engine.pcm16_fetch = False
        try:
            fused = engine.inference(toks, ref, jax.random.key(9))
        finally:
            engine.pcm16_fetch = True
        staged = staged_reference(engine, toks, ref, jax.random.key(9),
                                  engine.n_timesteps)
        assert fused.shape == staged.shape
        np.testing.assert_allclose(fused, staged, atol=2e-4, rtol=0)

    def test_pcm16_quantization_bound(self, engine, ref):
        rng = np.random.default_rng(3)
        toks = rng.integers(0, 6561, (1, 24)).astype(np.int32)
        engine.pcm16_fetch = False
        try:
            f32 = engine.inference(toks, ref, jax.random.key(4))
        finally:
            engine.pcm16_fetch = True
        pcm = engine.inference(toks, ref, jax.random.key(4))
        assert np.abs(pcm - f32).max() <= 0.5 / 32767 + 1e-7

    def test_cfm_bf16_optin_close_to_fp32(self, engine, ref):
        """The bf16-estimator knob (S3GenEngine(cfm_dtype=...)) must stay a
        perturbation of the fp32 default, not a different animal."""
        rng = np.random.default_rng(8)
        toks = rng.integers(0, 6561, (1, 20)).astype(np.int32)
        eng16 = S3GenEngine(engine.params, meanflow=True,
                            tok_cfg=S3TokenizerConfig.tiny_test(),
                            dims=engine.dims, cfm_dtype=jnp.bfloat16)
        w32 = engine.inference(toks, ref, jax.random.key(11))
        w16 = eng16.inference(toks, ref, jax.random.key(11))
        assert w16.shape == w32.shape
        assert np.isfinite(w16).all()
        # same RNG realization; bf16 rounding inside the solver only
        err = np.abs(w16 - w32).max()
        assert err < 0.2, err

    def test_legacy_uint32_prngkey_accepted(self, engine, ref):
        """A legacy jax.random.PRNGKey (shape (2,) uint32) must take the
        scalar-key path, not be misread as a batch of 2 per-row keys."""
        rng = np.random.default_rng(9)
        toks = rng.integers(0, 6561, (1, 16)).astype(np.int32)
        wav = engine.inference(toks, ref, jax.random.PRNGKey(5))
        assert wav.shape == (1, 16 * TOKEN_MEL_RATIO * TOTAL_UPSAMPLE)
        assert np.isfinite(wav).all()

    def test_batch_rows_are_isolated(self, engine, ref):
        """Padding rows to a common bucket must not bleed across rows."""
        rng = np.random.default_rng(5)
        t1 = rng.integers(0, 6561, (12,)).astype(np.int32)
        t2 = rng.integers(0, 6561, (30,)).astype(np.int32)
        wavs = engine.inference_batch([t1, t2], [ref, ref], jax.random.key(6))
        assert len(wavs) == 2
        assert wavs[0].shape == (12 * TOKEN_MEL_RATIO * TOTAL_UPSAMPLE,)
        assert wavs[1].shape == (30 * TOKEN_MEL_RATIO * TOTAL_UPSAMPLE,)
        for w in wavs:
            assert np.isfinite(w).all()
            assert np.abs(w[:480]).max() == 0.0    # per-row trim fade

    def test_batch_pow2_padding_is_invisible(self, engine, ref):
        """A non-power-of-two batch is padded to the next pow2 bucket
        (last row replicated) so serving reuses one compiled program per
        bucket. With per-row keys, each row must come out identical to its
        own B=1 run, and only the real rows are returned."""
        rng = np.random.default_rng(6)
        rows = [rng.integers(0, 6561, (n,)).astype(np.int32)
                for n in (10, 17, 23)]
        keys = jnp.stack([jax.random.key(100 + i) for i in range(3)])
        wavs = engine.inference_batch(rows, [ref] * 3, keys)   # B=3 → pad 4
        assert len(wavs) == 3
        for i, (row, w) in enumerate(zip(rows, wavs)):
            solo = engine.inference_batch([row], [ref],
                                          keys[i: i + 1])[0]
            np.testing.assert_allclose(w, solo, atol=2e-4, rtol=0)


class TestBatchedBf16Default:
    """Round-5 VERDICT item 4: batched vocode defaults to bf16 flow at
    padded batch ≥16 (the measured knee — fp32 flow is activation-bound at
    ~5 % MXU there; bf16 was +17 % at B=32 with max|Δwav| 2.6e-3 on the
    520M-scale A/B). Below the bound, and with batched_bf16_min_b=None,
    audio must be bit-identical to the fp32 engine."""

    def _rows(self, n, length=9, seed=7):
        rng = np.random.default_rng(seed)
        return [rng.integers(0, 6561, (length,)).astype(np.int32)
                for _ in range(n)]

    def test_below_min_b_stays_fp32_bitwise(self, engine, ref):
        eng_off = S3GenEngine(engine.params, meanflow=True,
                              tok_cfg=S3TokenizerConfig.tiny_test(),
                              dims=FlowDims.tiny_test(),
                              batched_bf16_min_b=None)
        rows = self._rows(4)
        keys = jnp.stack([jax.random.key(i) for i in range(4)])
        a = engine.inference_batch(rows, [ref] * 4, keys)
        b = eng_off.inference_batch(rows, [ref] * 4, keys)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_at_min_b_bf16_close_to_fp32(self, engine, ref):
        eng_off = S3GenEngine(engine.params, meanflow=True,
                              tok_cfg=S3TokenizerConfig.tiny_test(),
                              dims=FlowDims.tiny_test(),
                              batched_bf16_min_b=None)
        rows = self._rows(16)
        keys = jnp.stack([jax.random.key(100 + i) for i in range(16)])
        a = engine.inference_batch(rows, [ref] * 16, keys)    # bf16 path
        b = eng_off.inference_batch(rows, [ref] * 16, keys)   # fp32 path
        assert len(a) == len(b) == 16
        for x, y in zip(a, b):
            assert x.shape == y.shape and np.isfinite(x).all()
            np.testing.assert_allclose(x, y, atol=0.05, rtol=0)

    def test_explicit_cfm_dtype_engine_not_overridden(self, engine, ref):
        """An engine the user already cast (cfm_dtype) keeps its dtype at
        every batch size — the default switch only upgrades fp32 engines."""
        eng_cast = S3GenEngine(engine.params, meanflow=True,
                               tok_cfg=S3TokenizerConfig.tiny_test(),
                               dims=FlowDims.tiny_test(),
                               cfm_dtype=jnp.bfloat16)
        assert eng_cast.batched_bf16_min_b == 16   # present but moot
        rows = self._rows(2)
        keys = jnp.stack([jax.random.key(5), jax.random.key(6)])
        wavs = eng_cast.inference_batch(rows, [ref] * 2, keys)
        assert all(np.isfinite(w).all() for w in wavs)
