"""Token-level continuous batching tests (tiny config, CPU).

The VERDICT done-criterion: a request submitted mid-decode completes without
waiting for the batch to drain, with per-request outputs unchanged vs
isolated runs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.sampling.continuous import ContinuousTTSServer
from chatterbox_tpu.serve.batching import TTSRequest
from chatterbox_tpu.api.pipelines import T3CondHost


@pytest.fixture(scope="module")
def setup():
    hp = T3Config.tiny_test("gpt2")
    params = t3m.t3_init(jax.random.key(0), hp)
    cond = T3CondHost(np.zeros((1, 256), np.float32),
                      np.zeros((1, hp.speech_cond_prompt_len), np.int32))
    return hp, params, cond


def _req(cond, rid, seed, n_text=5, max_new=None, temperature=0.8):
    rng = np.random.default_rng(seed)
    return TTSRequest(
        text_tokens=rng.integers(1, 60, n_text).astype(np.int32),
        cond=cond, request_id=rid, seed=seed, max_new=max_new,
        sampler=SamplerParams.make(temperature=temperature, cfg_weight=0.0))


def _server(hp, params, **kw):
    return ContinuousTTSServer(params, hp, n_slots=3, text_bucket=16,
                               max_new_tokens=24, chunk=4, top_k=40, **kw)


class TestContinuousBatching:
    def test_mid_decode_admission_no_drain(self, setup):
        """r2 joins while r1 is mid-decode and finishes while r1 is still
        running — no waiting for the batch to drain."""
        hp, params, cond = setup
        srv = _server(hp, params)
        r1 = _req(cond, rid=1, seed=100, max_new=24)    # long request
        r2 = _req(cond, rid=2, seed=200, max_new=4)     # short request
        srv.submit(r1)
        srv.step()                                      # r1 decodes a chunk
        assert 1 not in srv.results
        srv.submit(r2)                                  # mid-decode admission
        finished = srv.step()                           # r2 joins + decodes 4
        assert 2 in finished or 2 in srv.results        # r2 done this round
        # r1 must still be in flight (not drained)
        assert 1 not in srv.results
        srv.run_until_idle()
        assert set(srv.results) == {1, 2}
        assert len(srv.results[2]) <= 4

    def test_outputs_match_isolated_runs(self, setup):
        """Per-request outputs are unchanged whether a request runs alone or
        joins a running batch mid-decode (same per-request seeds)."""
        hp, params, cond = setup
        reqs = [_req(cond, rid=i, seed=300 + i, n_text=4 + i, max_new=12,
                     temperature=0.6 + 0.2 * i) for i in range(3)]

        # isolated: each request alone on a fresh server
        iso = {}
        for r in reqs:
            srv = _server(hp, params)
            srv.submit(r)
            iso.update(srv.run_until_idle())

        # staggered: submit at different chunk boundaries
        srv = _server(hp, params)
        srv.submit(reqs[0])
        srv.step()
        srv.submit(reqs[1])
        srv.step()
        srv.submit(reqs[2])
        srv.run_until_idle()

        for r in reqs:
            np.testing.assert_array_equal(
                srv.results[r.request_id], iso[r.request_id],
                err_msg=f"request {r.request_id}")

    def test_kv_int8_outputs_match_isolated_runs(self, setup):
        """kv_int8 slot machine (int8 cache splice at admit + pallas
        streamed-int8 decode rounds + tile-aligned growth): per-request
        outputs are unchanged whether a request runs alone or joins a
        running batch mid-decode."""
        hp, params, cond = setup
        reqs = [_req(cond, rid=i, seed=500 + i, n_text=4 + i, max_new=12,
                     temperature=0.6 + 0.2 * i) for i in range(2)]
        iso = {}
        for r in reqs:
            srv = _server(hp, params, kv_int8=True)
            srv.submit(r)
            iso.update(srv.run_until_idle())
        srv = _server(hp, params, kv_int8=True)
        srv.submit(reqs[0])
        srv.step()
        srv.submit(reqs[1])
        srv.run_until_idle()
        for r in reqs:
            np.testing.assert_array_equal(
                srv.results[r.request_id], iso[r.request_id],
                err_msg=f"request {r.request_id}")

    def test_kv_int8_grow_crosses_tile_boundary(self, setup):
        """grow_slot_cache must actually PAD the int8 cache (+scales): tiny
        budgets tile-align every capacity to the same 256-slot cache, so the
        r3 suite never padded int8 bytes (advisor finding). A budget past
        TT=256 forces a 256→512 grow mid-decode; parity solo vs staggered
        proves the padded region contributes nothing."""
        from chatterbox_tpu.ops.pallas_attention import TT
        hp, params, cond = setup
        N = TT + 8
        reqs = [_req(cond, rid=i, seed=700 + i, n_text=4 + i, max_new=N,
                     temperature=0.8) for i in range(2)]
        iso = {}
        for r in reqs:
            srv = ContinuousTTSServer(params, hp, n_slots=3, text_bucket=16,
                                      max_new_tokens=N, chunk=32, top_k=40,
                                      kv_int8=True)
            assert srv.state.cache[0].shape[3] == TT   # starts at one tile
            srv.submit(r)
            iso.update(srv.run_until_idle())
            assert srv.state.cache[0].shape[3] >= 2 * TT  # grow happened
        srv = ContinuousTTSServer(params, hp, n_slots=3, text_bucket=16,
                                  max_new_tokens=N, chunk=32, top_k=40,
                                  kv_int8=True)
        srv.submit(reqs[0])
        srv.step()
        srv.submit(reqs[1])
        srv.run_until_idle()
        for r in reqs:
            np.testing.assert_array_equal(
                srv.results[r.request_id], iso[r.request_id],
                err_msg=f"request {r.request_id}")
            # the rows must have decoded past the tile boundary for the
            # grow to matter (EOS would shorten them)
            assert len(iso[r.request_id]) > TT - 64

    def test_continuous_with_vocoding(self, setup):
        """Full continuous serving: tokens AND audio per request."""
        from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, S3GEN_SR
        from chatterbox_tpu.models.s3gen.flow import FlowDims
        from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
        hp, params, cond = setup
        tok_cfg = S3TokenizerConfig.tiny_test()
        dims = FlowDims.tiny_test()
        eng = S3GenEngine(s3gen_init(jax.random.key(2), meanflow=True,
                                     tok_cfg=tok_cfg, dims=dims, hift_base=32),
                          meanflow=True, tok_cfg=tok_cfg, dims=dims,
                          n_timesteps=2)
        rng = np.random.default_rng(9)
        ref = eng.embed_ref((rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32),
                            S3GEN_SR)
        srv = _server(hp, params, s3gen=eng)
        for i in range(2):
            r = _req(cond, rid=i, seed=500 + i, max_new=6)
            r.ref = ref
            srv.submit(r)
        srv.run_until_idle()
        assert set(srv.wavs) == {0, 1}
        for rid, w in srv.wavs.items():
            assert np.isfinite(w).all()
            assert len(w) == max(len(srv.results[rid]), 1) * 2 * 480

    def test_more_requests_than_slots(self, setup):
        """Queue pressure: 6 requests through 3 slots all complete."""
        hp, params, cond = setup
        srv = _server(hp, params)
        for i in range(6):
            srv.submit(_req(cond, rid=i, seed=400 + i, max_new=6))
        results = srv.run_until_idle()
        assert set(results) == set(range(6))
        for t in results.values():
            assert (t < 6561).all()


class TestContinuousServingLoop:
    """The threaded loop over the slot machine (serve/batching.py) — same
    callback surface as ServingLoop, token-level admission underneath."""

    def test_loop_results_match_direct_run(self, setup):
        import threading
        from chatterbox_tpu.serve.batching import ContinuousServingLoop
        hp, params, cond = setup
        reqs = [_req(cond, rid=i, seed=600 + i, n_text=4 + i, max_new=8)
                for i in range(4)]

        direct = _server(hp, params)
        for r in reqs:
            direct.submit(r)
        expect = direct.run_until_idle()

        got, ev = {}, threading.Event()

        def on_result(res):
            assert res.wav is None          # token-only (no s3gen/ref)
            got[res.request_id] = res.speech_tokens
            if len(got) == len(reqs):
                ev.set()

        loop = ContinuousServingLoop(_server(hp, params), on_result)
        loop.start()
        for r in reqs:
            loop.submit(r)
        assert ev.wait(180), f"only {sorted(got)} completed"
        loop.stop()
        for r in reqs:
            np.testing.assert_array_equal(got[r.request_id],
                                          expect[r.request_id])

    def test_loop_vocodes_and_fires_wavs(self, setup):
        import threading
        from chatterbox_tpu.serve.batching import ContinuousServingLoop
        from chatterbox_tpu.models.s3gen.model import (S3GenEngine, s3gen_init,
                                                       S3GEN_SR)
        from chatterbox_tpu.models.s3gen.flow import FlowDims
        from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
        hp, params, cond = setup
        tok_cfg = S3TokenizerConfig.tiny_test()
        dims = FlowDims.tiny_test()
        eng = S3GenEngine(s3gen_init(jax.random.key(2), meanflow=True,
                                     tok_cfg=tok_cfg, dims=dims,
                                     hift_base=32),
                          meanflow=True, tok_cfg=tok_cfg, dims=dims,
                          n_timesteps=2)
        rng = np.random.default_rng(21)
        ref = eng.embed_ref(
            (rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32),
            S3GEN_SR)

        def reqs():
            out = []
            for i in range(2):
                r = _req(cond, rid=i, seed=800 + i, max_new=6)
                r.ref = ref
                out.append(r)
            return out

        direct = _server(hp, params, s3gen=eng)
        for r in reqs():
            direct.submit(r)
        direct.run_until_idle()

        got, ev = {}, threading.Event()

        def on_result(res):
            got[res.request_id] = res
            if len(got) == 2:
                ev.set()

        loop = ContinuousServingLoop(_server(hp, params, s3gen=eng),
                                     on_result)
        loop.start()
        for r in reqs():
            loop.submit(r)
        assert ev.wait(180)
        loop.stop()
        for rid in (0, 1):
            np.testing.assert_array_equal(got[rid].speech_tokens,
                                          direct.results[rid])
            np.testing.assert_array_equal(got[rid].wav, direct.wavs[rid])

    def test_stop_finishes_in_flight_requests(self, setup):
        import threading
        from chatterbox_tpu.serve.batching import ContinuousServingLoop
        hp, params, cond = setup
        got, ev = {}, threading.Event()

        def on_result(res):
            got[res.request_id] = res.speech_tokens
            ev.set()

        loop = ContinuousServingLoop(_server(hp, params), on_result)
        loop.submit(_req(cond, rid=7, seed=900, max_new=8))
        loop.start()
        loop.stop()               # graceful: drains and finishes first
        assert 7 in got and len(got[7]) >= 0

    def test_pop_ready_defers_until_wav_arrives(self, setup):
        """pop_ready must not release a vocoded request before its deferred
        wav fetch lands (tokens harvest one round earlier)."""
        hp, params, cond = setup

        class _StubEng:
            """Batched-vocode stub: dispatch returns rows, fetch echoes."""
            def inference_batch_dispatch(self, rows, refs, keys):
                return rows
            def inference_batch_fetch(self, handle):
                return [np.zeros(3, np.float32) for _ in handle]

        srv = _server(hp, params, s3gen=_StubEng())
        r = _req(cond, rid=1, seed=950, max_new=4)
        r.ref = object()
        srv.submit(r)
        saw_deferred = False
        for _ in range(100):
            busy = srv.serve_round()
            if 1 in srv.results and 1 not in srv.wavs:
                assert srv.pop_ready() == []      # tokens in, wav in flight
                saw_deferred = True
            if not busy:
                break
        assert saw_deferred
        ready = srv.pop_ready()
        assert [rid for rid, _, _ in ready] == [1]
        assert ready[0][2] is not None
        assert not srv.results and not srv.wavs and not srv._await_wav


class TestStaleSlotReuse:
    """Regression: serve_round harvests from a ONE-ROUND-STALE snapshot; a
    request admitted into a just-freed slot before that harvest must NOT be
    retired (or stream-fed) with the slot's previous occupant's tokens.
    Trigger: retire A, then submit B so it reuses A's slot while the lagged
    snapshot still carries A's done flag and token row."""

    def _drive(self, srv, reqs_then, stream_cb=None):
        """Submit reqs_then[0], run serve_round until it retires, then
        submit the rest immediately (slot reuse within one round)."""
        first, rest = reqs_then[0], reqs_then[1:]
        srv.submit(first) if stream_cb is None else srv.submit(
            first, on_chunk=stream_cb[0])
        for _ in range(100):
            srv.serve_round()
            if first.request_id in srv.results:
                break
        assert first.request_id in srv.results
        for i, r in enumerate(rest):
            srv.submit(r) if stream_cb is None else srv.submit(
                r, on_chunk=stream_cb[1 + i])
        while srv.serve_round():
            pass
        return srv.results

    def test_reused_slot_gets_its_own_tokens(self, setup):
        hp, params, cond = setup
        one_slot = lambda: ContinuousTTSServer(
            params, hp, n_slots=1, text_bucket=16, max_new_tokens=8,
            chunk=4, top_k=40)
        a = _req(cond, rid=1, seed=810, max_new=4)
        b = _req(cond, rid=2, seed=811, max_new=8)
        res = self._drive(one_slot(), [a, b])
        iso = one_slot()
        iso.submit(_req(cond, rid=2, seed=811, max_new=8))
        iso.run_until_idle()
        # without the fresh-slot skip, rid 2 is retired instantly with
        # rid 1's stale token row
        np.testing.assert_array_equal(res[2], iso.results[2])

    def test_reused_slot_stream_gets_its_own_audio(self, setup):
        from chatterbox_tpu.models.s3gen.model import (S3GenEngine,
                                                       s3gen_init, S3GEN_SR)
        from chatterbox_tpu.models.s3gen.flow import FlowDims
        from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
        hp, params, cond = setup
        eng = S3GenEngine(s3gen_init(jax.random.key(2), meanflow=True,
                                     tok_cfg=S3TokenizerConfig.tiny_test(),
                                     dims=FlowDims.tiny_test(),
                                     hift_base=32),
                          meanflow=True, tok_cfg=S3TokenizerConfig.tiny_test(),
                          dims=FlowDims.tiny_test(), n_timesteps=2)
        rng = np.random.default_rng(9)
        ref = eng.embed_ref(
            (rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32),
            S3GEN_SR)
        mk = lambda: ContinuousTTSServer(params, hp, n_slots=1,
                                         text_bucket=16, max_new_tokens=8,
                                         chunk=4, top_k=40, s3gen=eng,
                                         stream_chunk=4)
        chunks_a, chunks_b = [], []
        a = _req(cond, rid=1, seed=820, max_new=4)
        a.ref = ref
        b = _req(cond, rid=2, seed=821, max_new=8)
        b.ref = ref
        self._drive(mk(), [a, b],
                    stream_cb=[lambda c, f: chunks_a.append((c, f)),
                               lambda c, f: chunks_b.append((c, f))])
        solo_b = []
        iso = mk()
        bb = _req(cond, rid=2, seed=821, max_new=8)
        bb.ref = ref
        iso.submit(bb, on_chunk=lambda c, f: solo_b.append((c, f)))
        iso.run_until_idle()
        assert len(chunks_b) == len(solo_b) > 0
        for (c1, f1), (c2, f2) in zip(chunks_b, solo_b):
            assert f1 == f2
            np.testing.assert_array_equal(c1, c2)


class TestConcurrentStreaming:
    """Streaming requests ride the slot machine: N streams share one
    batched decode, and each request's chunk byte-stream is identical to
    the same request run solo (the round-4 VERDICT done-criterion)."""

    @pytest.fixture(scope="class")
    def engine(self):
        from chatterbox_tpu.models.s3gen.model import (S3GenEngine,
                                                       s3gen_init, S3GEN_SR)
        from chatterbox_tpu.models.s3gen.flow import FlowDims
        from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
        tok_cfg = S3TokenizerConfig.tiny_test()
        dims = FlowDims.tiny_test()
        eng = S3GenEngine(s3gen_init(jax.random.key(2), meanflow=True,
                                     tok_cfg=tok_cfg, dims=dims,
                                     hift_base=32),
                          meanflow=True, tok_cfg=tok_cfg, dims=dims,
                          n_timesteps=2)
        rng = np.random.default_rng(9)
        ref = eng.embed_ref(
            (rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32),
            S3GEN_SR)
        return eng, ref

    def _run(self, hp, params, cond, eng, ref, seeds, max_new=14):
        srv = ContinuousTTSServer(params, hp, n_slots=3, text_bucket=16,
                                  max_new_tokens=max_new, chunk=4, top_k=40,
                                  s3gen=eng, stream_chunk=5)
        chunks = {s: [] for s in seeds}
        for s in seeds:
            r = _req(cond, rid=s, seed=s, max_new=max_new)
            r.ref = ref
            srv.submit(r, on_chunk=lambda c, f, s=s: chunks[s].append((c, f)))
        srv.run_until_idle()
        return chunks, srv

    def test_streams_byte_identical_to_solo(self, setup, engine):
        """3 concurrent streams: every request's (chunk, final) sequence is
        byte-identical to its solo run — chunk boundaries included."""
        hp, params, cond = setup
        eng, ref = engine
        solos = {s: self._run(hp, params, cond, eng, ref, [s])[0][s]
                 for s in (71, 72, 73)}
        conc, srv = self._run(hp, params, cond, eng, ref, [71, 72, 73])
        for s, solo in solos.items():
            assert len(conc[s]) == len(solo) > 0, s
            for (c1, f1), (c2, f2) in zip(solo, conc[s]):
                assert f1 == f2
                np.testing.assert_array_equal(c1, c2)
        # exactly one final per stream, as the last callback
        for s in conc:
            finals = [f for _, f in conc[s]]
            assert finals[-1] and sum(finals) == 1

    def test_stream_audio_matches_tokens(self, setup, engine):
        """Concatenated stream covers every valid token (+3 silence pad):
        total samples == (n_valid + 3) * 2 * 480."""
        hp, params, cond = setup
        eng, ref = engine
        chunks, srv = self._run(hp, params, cond, eng, ref, [81])
        total = sum(c.size for c, _ in chunks[81])
        n_valid = len(srv.results[81])
        assert total == (n_valid + 3) * 2 * 480
        assert all(np.isfinite(c).all() for c, _ in chunks[81])

    def test_mixed_stream_and_batch_traffic(self, setup, engine):
        """A streaming request and plain requests share the slot machine;
        the plain requests' tokens are unchanged by the streaming slotmate."""
        hp, params, cond = setup
        eng, ref = engine
        srv = ContinuousTTSServer(params, hp, n_slots=3, text_bucket=16,
                                  max_new_tokens=10, chunk=4, top_k=40,
                                  s3gen=eng, stream_chunk=5)
        iso = ContinuousTTSServer(params, hp, n_slots=3, text_bucket=16,
                                  max_new_tokens=10, chunk=4, top_k=40,
                                  s3gen=eng, stream_chunk=5)
        got = []
        sreq = _req(cond, rid=1, seed=91, max_new=10)
        sreq.ref = ref
        srv.submit(sreq, on_chunk=lambda c, f: got.append((c, f)))
        srv.submit(_req(cond, rid=2, seed=92, max_new=8))
        srv.run_until_idle()
        iso.submit(_req(cond, rid=2, seed=92, max_new=8))
        iso.run_until_idle()
        np.testing.assert_array_equal(srv.results[2], iso.results[2])
        assert got and got[-1][1]

    def test_stream_requires_ref_and_engine(self, setup, engine):
        hp, params, cond = setup
        eng, ref = engine
        srv = ContinuousTTSServer(params, hp, n_slots=2, text_bucket=16,
                                  max_new_tokens=8, chunk=4, s3gen=eng)
        with pytest.raises(ValueError, match="ref"):
            srv.submit(_req(cond, rid=1, seed=1), on_chunk=lambda c, f: None)
        bare = ContinuousTTSServer(params, hp, n_slots=2, text_bucket=16,
                                   max_new_tokens=8, chunk=4)
        r = _req(cond, rid=1, seed=1)
        r.ref = ref
        with pytest.raises(ValueError, match="s3gen"):
            bare.submit(r, on_chunk=lambda c, f: None)

    def _run_cfg(self, hp, params, cond, eng, ref, seeds, max_new=14,
                 first_chunk=None, stream_chunk=5):
        srv = ContinuousTTSServer(params, hp, n_slots=3, text_bucket=16,
                                  max_new_tokens=max_new, chunk=4, top_k=40,
                                  s3gen=eng, stream_chunk=stream_chunk,
                                  first_chunk=first_chunk, cfg=True)
        chunks = {s: [] for s in seeds}
        for s in seeds:
            rng = np.random.default_rng(s)
            r = TTSRequest(text_tokens=rng.integers(1, 60, 5).astype(np.int32),
                           cond=cond, request_id=s, seed=s, max_new=max_new,
                           sampler=SamplerParams.make(
                               temperature=0.9, top_p=1.0, min_p=0.02,
                               repetition_penalty=1.2, cfg_weight=0.5),
                           ref=ref)
            srv.submit(r, on_chunk=lambda c, f, s=s: chunks[s].append((c, f)))
        srv.run_until_idle()
        return chunks, srv

    def test_cfg_streams_byte_identical_to_solo(self, setup, engine):
        """CFG-family streaming (round-5 VERDICT item 2): 3 concurrent CFG
        streams, each byte-identical to its solo run."""
        hp, params, cond = setup
        eng, ref = engine
        solos = {s: self._run_cfg(hp, params, cond, eng, ref, [s])[0][s]
                 for s in (171, 172, 173)}
        conc, srv = self._run_cfg(hp, params, cond, eng, ref,
                                  [171, 172, 173])
        for s, solo in solos.items():
            assert len(conc[s]) == len(solo) > 0, s
            for (c1, f1), (c2, f2) in zip(solo, conc[s]):
                assert f1 == f2
                np.testing.assert_array_equal(c1, c2)
        for s in conc:
            finals = [f for _, f in conc[s]]
            assert finals[-1] and sum(finals) == 1

    def test_cfg_stream_audio_matches_tokens(self, setup, engine):
        """CFG streams append NO silence pad (ref: tts.py:260-264): total
        samples == n_valid * 2 * 480, with the harvested result tokens
        matching the progressive semantics the audio streamed with."""
        hp, params, cond = setup
        eng, ref = engine
        chunks, srv = self._run_cfg(hp, params, cond, eng, ref, [181])
        total = sum(c.size for c, _ in chunks[181])
        n_valid = len(srv.results[181])
        assert total == max(n_valid, 1) * 2 * 480
        assert all(np.isfinite(c).all() for c, _ in chunks[181])

    def test_first_chunk_prioritization_byte_identical(self, setup, engine):
        """first_chunk < stream_chunk (concurrent-TTFA lever): the feed
        schedule shifts to (first_chunk, then every stream_chunk) but stays
        a pure function of the stream — solo == concurrent byte-wise, and
        the token payloads are unchanged vs the plain schedule."""
        hp, params, cond = setup
        eng, ref = engine
        solo = self._run_cfg(hp, params, cond, eng, ref, [191],
                             first_chunk=4)[0][191]
        conc, srv = self._run_cfg(hp, params, cond, eng, ref,
                                  [191, 192, 193], first_chunk=4)
        assert len(conc[191]) == len(solo) > 0
        for (c1, f1), (c2, f2) in zip(solo, conc[191]):
            assert f1 == f2
            np.testing.assert_array_equal(c1, c2)
        # same total audio as the plain schedule (token content invariant
        # to round length and feed boundaries)
        plain, srv_plain = self._run_cfg(hp, params, cond, eng, ref, [191])
        np.testing.assert_array_equal(srv.results[191],
                                      srv_plain.results[191])
        assert (sum(c.size for c, _ in conc[191])
                == sum(c.size for c, _ in plain[191]))

    def test_cfg_empty_stream_silence_fallback(self, setup, engine):
        """A CFG stream that produced zero valid tokens retires with the
        engine's one-silence-token fallback (matches _pack_from_decode)."""
        from chatterbox_tpu.sampling.continuous import _SlotStream
        from chatterbox_tpu.models.s3gen.model import SIL_TOKEN
        hp, params, cond = setup
        eng, ref = engine
        srv = ContinuousTTSServer(params, hp, n_slots=2, text_bucket=16,
                                  max_new_tokens=8, chunk=4, s3gen=eng,
                                  cfg=True)
        st = _SlotStream(voc=None, cb=lambda c, f: None, first_chunk=5)
        feeds = srv._finish_feeds(st)
        assert len(feeds) == 1
        st2, blk, final = feeds[0]
        assert final and list(blk) == [SIL_TOKEN]


class TestContinuousCFG:
    """cfg=True slot machine: each request runs as a cond/uncond physical
    row pair (the 520M/MTL family). Gold standard: token streams must
    EXACTLY match the batched CFG engine run isolated with the same seed."""

    def _cfg_req(self, cond, rid, seed, n_text, w=0.5, temperature=1.0):
        rng = np.random.default_rng(seed)
        return TTSRequest(
            text_tokens=rng.integers(1, 60, n_text).astype(np.int32),
            cond=cond, request_id=rid, seed=seed,
            sampler=SamplerParams.make(temperature=temperature, top_p=1.0,
                                       min_p=0.02, repetition_penalty=1.2,
                                       cfg_weight=w))

    def _batched_reference(self, hp, params, cond, req, max_new):
        from chatterbox_tpu.sampling.batched import t3_generate_batched
        from chatterbox_tpu.api.pipelines import drop_invalid_tokens_sliced
        ids = req.text_tokens
        text = np.zeros((1, 16), np.int32)
        text[0, : len(ids)] = ids
        out = t3_generate_batched(
            params, hp, cond.as_arrays(), jnp.asarray(text),
            jnp.asarray([len(ids)], np.int32), req.sampler,
            jnp.stack([jax.random.key(req.seed)]),
            max_new_tokens=max_new, cfg_mode=True)
        t = np.asarray(out.tokens[0, : int(out.n_tokens[0])])
        t = drop_invalid_tokens_sliced(t)
        return t[t < 6561]

    def test_staggered_matches_batched_engine(self, setup):
        """Requests admitted at different chunk boundaries produce EXACTLY
        the isolated batched-CFG streams (cross-engine, cross-layout)."""
        hp, params, cond = setup
        srv = ContinuousTTSServer(params, hp, n_slots=2, text_bucket=16,
                                  max_new_tokens=12, chunk=4, cfg=True)
        reqs = [self._cfg_req(cond, rid=i, seed=20 + i, n_text=4 + 2 * i,
                              w=0.3 + 0.2 * i, temperature=1.0 + 0.3 * i)
                for i in range(3)]
        for r in reqs:                      # 3 requests through 2 slots,
            srv.submit(r)                   # staggered joins
            srv.step()
        res = srv.run_until_idle()
        assert set(res) == {0, 1, 2}
        for r in reqs:
            expect = self._batched_reference(hp, params, cond, r, max_new=12)
            np.testing.assert_array_equal(res[r.request_id], expect,
                                          err_msg=f"request {r.request_id}")

    def test_mid_decode_admission_cfg(self, setup):
        hp, params, cond = setup
        srv = ContinuousTTSServer(params, hp, n_slots=2, text_bucket=16,
                                  max_new_tokens=24, chunk=4, cfg=True)
        long_r = self._cfg_req(cond, rid=1, seed=31, n_text=6)
        long_r.max_new = 24
        short_r = self._cfg_req(cond, rid=2, seed=32, n_text=4)
        short_r.max_new = 4
        srv.submit(long_r)
        srv.step()
        srv.submit(short_r)                 # joins while r1 is mid-decode
        srv.step()
        assert 2 in srv.results and 1 not in srv.results
        srv.run_until_idle()
        assert set(srv.results) == {1, 2}

    def test_cfg_cache_growth_results_unchanged(self, setup):
        from chatterbox_tpu.sampling.continuous import init_slots
        hp, params, cond = setup

        def build():
            return ContinuousTTSServer(params, hp, n_slots=2, text_bucket=16,
                                       max_new_tokens=24, chunk=4, cfg=True)

        srv_small = build()
        cap0 = srv_small._t_cap
        assert cap0 < srv_small._t_full
        srv_full = build()
        srv_full.state = init_slots(hp, 2, 16, 24, cfg=True)
        srv_full._t_cap = srv_full._t_full
        for i in range(2):
            for srv in (srv_small, srv_full):
                srv.submit(self._cfg_req(cond, rid=i, seed=40 + i, n_text=14))
        small = srv_small.run_until_idle()
        full = srv_full.run_until_idle()
        assert srv_small._t_cap > cap0
        assert set(small) == set(full) == {0, 1}
        for rid in small:
            np.testing.assert_array_equal(small[rid], full[rid])


class TestBucketedSlotCache:
    def test_cache_grows_and_results_unchanged(self, setup):
        """The slot cache starts small and grows as rows advance; results
        must match a server whose cache was full-size from the start."""
        from chatterbox_tpu.sampling.continuous import init_slots
        hp, params, cond = setup

        srv_small = _server(hp, params)
        cap0 = srv_small._t_cap
        assert cap0 < srv_small._t_full          # actually starts small

        srv_full = _server(hp, params)
        srv_full.state = init_slots(hp, srv_full.n_slots,
                                    srv_full.text_bucket,
                                    srv_full.max_new_tokens)   # full cap
        srv_full._t_cap = srv_full._t_full

        # long prefixes so prefix+steps exceeds the initial small cap
        for i in range(3):
            srv_small.submit(_req(cond, rid=i, seed=500 + i, n_text=14,
                                  max_new=24))
            srv_full.submit(_req(cond, rid=i, seed=500 + i, n_text=14,
                                 max_new=24))
        small = srv_small.run_until_idle()
        full = srv_full.run_until_idle()
        assert srv_small._t_cap > cap0           # growth happened
        assert set(small) == set(full) == {0, 1, 2}
        for rid in small:
            np.testing.assert_array_equal(small[rid], full[rid])


class TestWarmup:
    def test_warmup_pristine_and_results_unchanged(self, setup):
        """warmup() walks the full growth schedule, then leaves the server
        pristine: same results as a never-warmed server, state reset to the
        initial small capacity, nothing queued or retained."""
        hp, params, cond = setup

        def reqs():
            return [_req(cond, rid=i, seed=700 + i, n_text=14, max_new=24)
                    for i in range(4)]

        plain_srv = _server(hp, params)
        for r in reqs():
            plain_srv.submit(r)
        plain = plain_srv.run_until_idle()

        srv = _server(hp, params)
        srv.warmup(cond)                     # default max_gen=max_new_tokens
        # pristine: initial capacity, no slots occupied, nothing retained
        assert srv._t_cap == min(srv._t_full,
                                 srv._cap_base + max(4 * srv.chunk, 16))
        assert all(r is None for r in srv._slot_req)
        assert not srv.results and not srv.wavs and not srv._pending
        for r in reqs():
            srv.submit(r)
        warm = srv.run_until_idle()
        assert set(warm) == set(plain)
        for rid in plain:
            np.testing.assert_array_equal(warm[rid], plain[rid])

    def test_warmup_with_vocode_grid(self, setup):
        """warmup(cond, ref) also compiles the vocode grid; served audio is
        unchanged vs a never-warmed server (per-request seeds)."""
        from chatterbox_tpu.models.s3gen.model import (S3GenEngine, s3gen_init,
                                                       S3GEN_SR)
        from chatterbox_tpu.models.s3gen.flow import FlowDims
        from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
        hp, params, cond = setup
        tok_cfg = S3TokenizerConfig.tiny_test()
        dims = FlowDims.tiny_test()
        eng = S3GenEngine(s3gen_init(jax.random.key(2), meanflow=True,
                                     tok_cfg=tok_cfg, dims=dims,
                                     hift_base=32),
                          meanflow=True, tok_cfg=tok_cfg, dims=dims,
                          n_timesteps=2)
        rng = np.random.default_rng(11)
        ref = eng.embed_ref(
            (rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32),
            S3GEN_SR)

        def serve(warm: bool):
            srv = _server(hp, params, s3gen=eng)
            if warm:
                srv.warmup(cond, ref, max_gen=6, batch_sizes=(1, 2))
                assert not srv.wavs and srv._voc_pending is None
            for i in range(2):
                r = _req(cond, rid=i, seed=900 + i, max_new=6)
                r.ref = ref
                srv.submit(r)
            srv.run_until_idle()
            return srv.wavs

        cold, warm = serve(False), serve(True)
        assert set(cold) == set(warm) == {0, 1}
        for rid in cold:
            np.testing.assert_array_equal(warm[rid], cold[rid])

    def test_engine_warmup_grid_counts_programs(self, setup):
        """warmup_grid touches one program per (batch, bucket-combo) pair."""
        from chatterbox_tpu.models.s3gen.model import (S3GenEngine, s3gen_init,
                                                       S3GEN_SR)
        from chatterbox_tpu.models.s3gen.flow import FlowDims
        from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
        tok_cfg = S3TokenizerConfig.tiny_test()
        dims = FlowDims.tiny_test()
        eng = S3GenEngine(s3gen_init(jax.random.key(3), meanflow=True,
                                     tok_cfg=tok_cfg, dims=dims,
                                     hift_base=32),
                          meanflow=True, tok_cfg=tok_cfg, dims=dims,
                          n_timesteps=2)
        rng = np.random.default_rng(12)
        ref = eng.embed_ref(
            (rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32),
            S3GEN_SR)
        n = eng.warmup_grid(ref, max_gen=8, batch_sizes=(1,))
        assert n >= 1


class TestSpeculativeDraft:
    """draft_int8=True: the slot machine drafts with the model's own int8
    weights and verifies with the bf16 target (decode_chunk_multi_spec).
    The round-4 VERDICT done-criterion: streams with draft on are
    bit-identical to draft-off."""

    def test_draft_tokens_identical_to_draft_off(self, setup):
        """Staggered requests: token results with draft on == draft off."""
        hp, params, cond = setup
        reqs = lambda: [_req(cond, rid=i, seed=900 + i, n_text=4 + i,
                             max_new=20, temperature=0.7 + 0.1 * i)
                        for i in range(3)]

        def drive(**kw):
            srv = _server(hp, params, **kw)
            rs = reqs()
            srv.submit(rs[0])
            srv.step()
            srv.submit(rs[1])
            srv.submit(rs[2])
            return dict(srv.run_until_idle())

        off = drive()
        for K in (3, 8):
            on = drive(draft_int8=True, n_draft=K)
            assert set(on) == set(off)
            for rid in off:
                np.testing.assert_array_equal(
                    on[rid], off[rid], err_msg=f"rid={rid} K={K}")

    def test_draft_progress_lower_bound(self, setup):
        """Even with every draft rejected, a spec round emits >= 1 token per
        row — the server always terminates within the sequential round
        count. (Token-match acceptance: position 0's sample is free.)"""
        hp, params, cond = setup
        srv = _server(hp, params, draft_int8=True, n_draft=4)
        r = _req(cond, rid=5, seed=55, max_new=9)
        srv.submit(r)
        rounds = 0
        while srv.serve_round():
            rounds += 1
            assert rounds < 40
        assert 5 in srv.results
        assert 1 <= len(srv.results[5]) <= 9

    def test_draft_serve_round_matches_step_path(self, setup):
        """serve_round's lagged-harvest drive with draft on returns the same
        tokens as the synchronous step() drive."""
        hp, params, cond = setup
        mk = lambda: [_req(cond, rid=i, seed=60 + i, max_new=12)
                      for i in range(2)]
        srv_a = _server(hp, params, draft_int8=True, n_draft=6)
        for r in mk():
            srv_a.submit(r)
        a = dict(srv_a.run_until_idle())
        srv_b = _server(hp, params, draft_int8=True, n_draft=6)
        for r in mk():
            srv_b.submit(r)
        while True:
            srv_b.step()
            if all(x is None for x in srv_b._slot_req) and not srv_b._pending:
                break
        for rid in a:
            np.testing.assert_array_equal(a[rid], srv_b.results[rid])

    def test_draft_rejects_cfg_and_kv_int8(self, setup):
        hp, params, cond = setup
        with pytest.raises(AssertionError):
            _server(hp, params, draft_int8=True, cfg=True)
        with pytest.raises(AssertionError):
            _server(hp, params, draft_int8=True, kv_int8=True)

    def test_draft_streams_byte_identical_to_draft_off(self, setup):
        """Streaming through the slot machine with draft on: every (chunk,
        final) byte-stream identical to draft-off."""
        from chatterbox_tpu.models.s3gen.model import (S3GenEngine,
                                                       s3gen_init, S3GEN_SR)
        from chatterbox_tpu.models.s3gen.flow import FlowDims
        from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
        hp, params, cond = setup
        tok_cfg = S3TokenizerConfig.tiny_test()
        dims = FlowDims.tiny_test()
        eng = S3GenEngine(s3gen_init(jax.random.key(2), meanflow=True,
                                     tok_cfg=tok_cfg, dims=dims,
                                     hift_base=32),
                          meanflow=True, tok_cfg=tok_cfg, dims=dims,
                          n_timesteps=2)
        rng = np.random.default_rng(9)
        ref = eng.embed_ref(
            (rng.standard_normal(S3GEN_SR) * 0.1).astype(np.float32),
            S3GEN_SR)

        def drive(**kw):
            srv = ContinuousTTSServer(params, hp, n_slots=3, text_bucket=16,
                                      max_new_tokens=14, chunk=4, top_k=40,
                                      s3gen=eng, stream_chunk=5, **kw)
            chunks = {s: [] for s in (71, 72)}
            for s in chunks:
                r = _req(cond, rid=s, seed=s, max_new=14)
                r.ref = ref
                srv.submit(r,
                           on_chunk=lambda c, f, s=s: chunks[s].append((c, f)))
            srv.run_until_idle()
            return chunks

        off = drive()
        on = drive(draft_int8=True, n_draft=5)
        for s in off:
            assert len(on[s]) == len(off[s]) > 0
            for (c1, f1), (c2, f2) in zip(off[s], on[s]):
                assert f1 == f2
                np.testing.assert_array_equal(c1, c2)
