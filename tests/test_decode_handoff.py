"""Fused decode→vocode handoff (models/s3gen/model.py `_pack_from_decode` +
`inference_from_decode`).

The handoff replaces the host tail (fetch tokens → drop_invalid → repack →
re-upload) with an on-device filter/pack program chained into the fused
vocoder. These tests pin the device filtering against the reference's host
semantics (tts.py:260-264, tts_turbo.py:308-311,
models/s3tokenizer/__init__.py:11-30) and the end audio against the staged
host path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatterbox_tpu.api.pipelines import drop_invalid_tokens_sliced
from chatterbox_tpu.models.s3gen.model import (
    S3GenEngine, s3gen_init, RefDict, SIL_TOKEN)
from chatterbox_tpu.models.s3gen.flow import FlowDims
from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig

SOS, EOS, VOCAB = 6561, 6562, 6561


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


def host_tail(gen_tokens, n_raw, *, cfg_slice, append_sil):
    """The reference's host-side token tail."""
    toks = np.asarray(gen_tokens)[:n_raw]
    if cfg_slice:
        toks = drop_invalid_tokens_sliced(toks, SOS, EOS)
    toks = toks[toks < VOCAB]
    if append_sil:
        toks = np.concatenate([toks, [SIL_TOKEN] * append_sil])
    if cfg_slice and not append_sil and len(toks) == 0:
        toks = np.array([SIL_TOKEN])
    return toks.astype(np.int32)


def run_pack(engine, ref, gen_tokens, n_raw, *, cfg_slice, append_sil,
             bucket=64):
    row, token_len = engine._pack_from_decode(
        jnp.asarray(gen_tokens, jnp.int32), jnp.asarray(n_raw, jnp.int32),
        jnp.asarray(ref.prompt_token), jnp.asarray(11, jnp.int32),
        bucket=bucket, append_sil=append_sil, cfg_slice=cfg_slice,
        sos=SOS, eos=EOS, vocab=VOCAB)
    return np.asarray(row)[0], int(token_len[0])


class TestPackFromDecode:
    def check(self, engine, ref, gen, n_raw, *, cfg_slice, append_sil=0):
        want = host_tail(gen, n_raw, cfg_slice=cfg_slice,
                         append_sil=append_sil)
        row, tl = run_pack(engine, ref, gen, n_raw, cfg_slice=cfg_slice,
                           append_sil=append_sil)
        P = 11
        assert tl == P + len(want)
        np.testing.assert_array_equal(row[:P], ref.prompt_token[0])
        np.testing.assert_array_equal(row[P:tl], want)
        assert (row[tl:] == 0).all()

    def test_turbo_filters_and_appends_sil(self, engine, ref):
        gen = np.array([5, 6562, 10, 6561, 20, 30, 7, 7], np.int32)
        self.check(engine, ref, gen, 6, cfg_slice=False, append_sil=3)

    def test_turbo_ignores_padding_past_n(self, engine, ref):
        gen = np.array([5, 10, 6562, 6562, 6562, 6562], np.int32)
        self.check(engine, ref, gen, 3, cfg_slice=False, append_sil=3)

    def test_cfg_slices_sos_eos(self, engine, ref):
        gen = np.array([5, 6561, 10, 20, 6562, 30, 40], np.int32)
        self.check(engine, ref, gen, 7, cfg_slice=True)

    def test_cfg_eos_only(self, engine, ref):
        gen = np.array([10, 20, 30, 6562, 0, 0], np.int32)
        self.check(engine, ref, gen, 4, cfg_slice=True)

    def test_cfg_empty_falls_back_to_silence(self, engine, ref):
        gen = np.array([6562, 0, 0], np.int32)
        self.check(engine, ref, gen, 1, cfg_slice=True)

    def test_cfg_no_sos_no_eos(self, engine, ref):
        gen = np.array([10, 20, 30], np.int32)
        self.check(engine, ref, gen, 3, cfg_slice=True)

    def test_eos_past_n_not_seen(self, engine, ref):
        # EOS beyond n_raw must not truncate the kept region
        gen = np.array([10, 20, 30, 6562], np.int32)
        self.check(engine, ref, gen, 3, cfg_slice=True)


class TestInferenceFromDecode:
    def test_matches_host_path_all_valid(self, engine, ref):
        """All-valid tokens: buckets coincide → bit-identical audio."""
        rng = np.random.default_rng(7)
        n = 20
        gen = np.zeros(32, np.int32)
        gen[:n] = rng.integers(0, 60, n)
        key = jax.random.key(3)

        host_toks = host_tail(gen, n, cfg_slice=False, append_sil=3)
        want = engine.inference(host_toks[None], ref, key)
        got, n_gen = engine.inference_from_decode(
            jnp.asarray(gen), n, ref, key, cfg_slice=False, append_sil=3,
            sos=SOS, eos=EOS, vocab=VOCAB)
        assert n_gen == len(host_toks) == n + 3
        np.testing.assert_array_equal(np.asarray(want), got)

    def test_matches_host_path_cfg_with_eos(self, engine, ref):
        rng = np.random.default_rng(8)
        n = 14
        gen = np.zeros(32, np.int32)
        gen[:n] = rng.integers(0, 60, n)
        gen[n - 1] = EOS                     # decode's stopping token
        key = jax.random.key(4)

        host_toks = host_tail(gen, n, cfg_slice=True, append_sil=0)
        assert len(host_toks) == n - 1
        want = engine.inference(host_toks[None], ref, key)
        got, n_gen = engine.inference_from_decode(
            jnp.asarray(gen), n, ref, key, cfg_slice=True,
            sos=SOS, eos=EOS, vocab=VOCAB)
        assert n_gen == n - 1
        # same token/mel buckets at these sizes → identical programs
        np.testing.assert_allclose(np.asarray(want), got, atol=1e-4)

    def test_budget_mode_same_bucket_bit_identical(self, engine, ref):
        """budget= (sync-free handoff, buckets from the token budget) must
        reproduce the synced path exactly when both land in the same
        token/mel buckets — the program is the same, only the host sync on
        n_tokens disappears (n rides through as a device scalar)."""
        rng = np.random.default_rng(9)
        n, budget = 20, 32            # bucket(P+23) == bucket(P+35) == 64
        gen = np.zeros(budget, np.int32)
        gen[:n] = rng.integers(0, 60, n)
        key = jax.random.key(5)

        want, n_want = engine.inference_from_decode(
            jnp.asarray(gen), n, ref, key, cfg_slice=False, append_sil=3,
            sos=SOS, eos=EOS, vocab=VOCAB)
        got, n_got = engine.inference_from_decode(
            jnp.asarray(gen), jnp.asarray(n, jnp.int32), ref, key,
            cfg_slice=False, append_sil=3, sos=SOS, eos=EOS, vocab=VOCAB,
            budget=budget)
        assert n_got == n_want == n + 3
        np.testing.assert_array_equal(np.asarray(want), got)

    def test_budget_mode_early_eos_larger_bucket(self, engine, ref):
        """Early EOS under a large budget: the budget bucket exceeds the
        content bucket. The audio realization may differ (the fused
        program's noise draw is bucket-shaped, like the reference's
        per-call draw — ref: s3gen.py:313-316) but the token filtering,
        output length, and determinism must hold."""
        rng = np.random.default_rng(10)
        budget, n = 120, 5            # mel bucket 256 vs the synced 128
        gen = np.full(budget, EOS, np.int32)
        gen[: n - 1] = rng.integers(0, 60, n - 1)
        key = jax.random.key(6)

        got, n_gen = engine.inference_from_decode(
            jnp.asarray(gen), jnp.asarray(n, jnp.int32), ref, key,
            cfg_slice=False, append_sil=3, sos=SOS, eos=EOS, vocab=VOCAB,
            budget=budget)
        # EOS (>= vocab) tokens are filtered; n-1 valid + 3 silence
        assert n_gen == (n - 1) + 3
        assert got.shape[1] == n_gen * 2 * 480
        assert np.isfinite(got).all()
        again, _ = engine.inference_from_decode(
            jnp.asarray(gen), jnp.asarray(n, jnp.int32), ref, key,
            cfg_slice=False, append_sil=3, sos=SOS, eos=EOS, vocab=VOCAB,
            budget=budget)
        np.testing.assert_array_equal(got, again)

    def test_device_ref_cache_reuses_upload(self, engine, ref):
        a = engine.device_ref(ref)
        b = engine.device_ref(ref)
        assert a[0] is b[0] and a[1] is b[1] and a[2] is b[2]
        # a different RefDict object gets its own entry
        other = RefDict(ref.prompt_token.copy(), ref.prompt_token_len.copy(),
                        ref.prompt_feat.copy(), ref.embedding.copy())
        c = engine.device_ref(other)
        assert c[0] is not a[0]


class TestStreamFeedFromDecode:
    """First streaming feed straight from decode device output
    (fused_stream_from_decode / StreamingVocoder.feed_from_decode)."""

    def _voc(self, engine, ref, key):
        from chatterbox_tpu.serve.streaming import StreamingVocoder
        return StreamingVocoder(engine, ref, key)

    def test_first_feed_matches_host_feed(self, engine, ref):
        """Same buckets (n=20 vs budget=24 → token bucket 64, mel bucket 128
        for both): the sync-free first feed must be bit-identical to the
        host-path feed, and the next feed must continue identically (same
        accumulated tokens, emitted count, and source cache)."""
        rng = np.random.default_rng(11)
        n, budget = 20, 24
        toks = rng.integers(0, 60, n).astype(np.int32)
        dev = np.zeros(budget, np.int32)
        dev[:n] = toks
        key = jax.random.key(7)

        host = self._voc(engine, ref, key)
        a1 = host.feed(toks)
        devv = self._voc(engine, ref, key)
        b1, n_valid, extras = devv.feed_from_decode(
            jnp.asarray(dev), jnp.asarray(n, jnp.int32),
            vocab=VOCAB, extra_fetch=(jnp.asarray(n),))
        assert n_valid == n and int(extras[0]) == n
        np.testing.assert_array_equal(a1, b1)
        np.testing.assert_array_equal(host._tokens, devv._tokens)
        assert host._emitted_samples == devv._emitted_samples
        assert host._src_cache_len == devv._src_cache_len

        more = rng.integers(0, 60, 10).astype(np.int32)
        a2 = host.feed(more, final=True)
        b2 = devv.feed(more, final=True)
        np.testing.assert_array_equal(a2, b2)

    def test_first_feed_filters_invalid(self, engine, ref):
        """Tokens >= vocab inside the first n_raw are dropped on device —
        same as the host loop's `toks[toks < vocab]`."""
        rng = np.random.default_rng(12)
        n, budget = 16, 24
        toks = rng.integers(0, 60, n).astype(np.int32)
        toks[3] = EOS
        toks[9] = SOS
        dev = np.zeros(budget, np.int32)
        dev[:n] = toks
        key = jax.random.key(8)

        keep = toks[toks < VOCAB]
        host = self._voc(engine, ref, key)
        a1 = host.feed(keep)
        devv = self._voc(engine, ref, key)
        b1, n_valid, _ = devv.feed_from_decode(
            jnp.asarray(dev), jnp.asarray(n, jnp.int32), vocab=VOCAB)
        assert n_valid == len(keep) == n - 2
        np.testing.assert_array_equal(devv._tokens[0], keep)
        np.testing.assert_array_equal(a1, b1)

    def test_first_feed_under_lookahead_emits_nothing(self, engine, ref):
        """n below the pre-lookahead length: no audio yet, state still
        primed so the next feed carries on."""
        rng = np.random.default_rng(13)
        dev = np.zeros(24, np.int32)
        dev[:2] = rng.integers(0, 60, 2)
        devv = self._voc(engine, ref, jax.random.key(9))
        out, n_valid, _ = devv.feed_from_decode(
            jnp.asarray(dev), jnp.asarray(2, jnp.int32), vocab=VOCAB)
        assert n_valid == 2 and out.size == 0
        tail = devv.feed(rng.integers(0, 60, 8).astype(np.int32), final=True)
        assert tail.size == 10 * 2 * 480 and np.isfinite(tail).all()

    def test_multi_chunk_device_feeds_match_host_feeds(self, engine, ref):
        """A whole stream through device feeds (resident token row, one
        fetch per chunk) must match the same stream through host feeds —
        state continuity across chunks AND across the final silence-append
        feed. Chunk sizes chosen so every feed's buckets coincide with the
        host path's."""
        rng = np.random.default_rng(14)
        c1, c2 = (rng.integers(0, 60, 16).astype(np.int32),
                  rng.integers(0, 60, 16).astype(np.int32))
        key = jax.random.key(15)

        host = self._voc(engine, ref, key)
        h = [host.feed(c1), host.feed(c2),
             host.feed(np.full(3, SIL_TOKEN, np.int32), final=True)]

        devv = self._voc(engine, ref, key)
        d = []
        for c in (c1, c2):
            out, n_valid, _ = devv.feed_from_decode(
                jnp.asarray(c), jnp.asarray(len(c), jnp.int32), vocab=VOCAB)
            assert n_valid == len(c)
            d.append(out)
        # final: empty chunk + 3 appended silence tokens, all on device
        out, n_valid, _ = devv.feed_from_decode(
            jnp.zeros((1,), jnp.int32), jnp.asarray(0, jnp.int32),
            vocab=VOCAB, final=True, append_sil=3)
        assert n_valid == 0
        d.append(out)

        np.testing.assert_array_equal(host._tokens, devv._tokens)
        for i, (a, b) in enumerate(zip(h, d)):
            assert a.shape == b.shape, (i, a.shape, b.shape)
            np.testing.assert_array_equal(a, b, err_msg=f"chunk {i}")

    def test_device_feed_after_host_feed_rebuilds_row(self, engine, ref):
        """Interleaving host feed() then feed_from_decode: the device row is
        rebuilt from the accumulated tokens and the stream continues as if
        all feeds were host feeds."""
        rng = np.random.default_rng(16)
        c1, c2 = (rng.integers(0, 60, 16).astype(np.int32),
                  rng.integers(0, 60, 16).astype(np.int32))
        key = jax.random.key(17)

        host = self._voc(engine, ref, key)
        a1, a2 = host.feed(c1), host.feed(c2)

        mix = self._voc(engine, ref, key)
        b1 = mix.feed(c1)
        b2, n_valid, _ = mix.feed_from_decode(
            jnp.asarray(c2), jnp.asarray(len(c2), jnp.int32), vocab=VOCAB)
        assert n_valid == len(c2)
        np.testing.assert_array_equal(a1, b1)
        np.testing.assert_array_equal(a2, b2)
