"""HTTP serving front (serve/http.py): end-to-end over a real socket with
tiny models — POST /tts returns a parseable RIFF/PCM16 wav; concurrent
requests share a batch; error paths return JSON."""
import json
import struct
import threading
import urllib.request
import urllib.error

import numpy as np
import jax
import pytest

from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, RefDict
from chatterbox_tpu.models.s3gen.flow import FlowDims
from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
from chatterbox_tpu.serve.batching import BatchDecoder
from chatterbox_tpu.serve.http import TTSHTTPServer, Voice, wav_bytes


class _Tok:
    def __init__(self):
        self.last_language = "UNSET"

    def text_to_tokens(self, t, language_id=None):
        self.last_language = language_id
        return (np.arange(len(t)) % 60 + 1).astype(np.int32)[:16]


class _Cond:
    def __init__(self, hp):
        self.speaker_emb = np.zeros((1, 256), np.float32)
        self.cond_prompt_speech_tokens = np.zeros(
            (1, hp.speech_cond_prompt_len), np.int32)
        self.emotion_adv = 0.5


@pytest.fixture(scope="module")
def server():
    hp = T3Config.tiny_test("gpt2")
    t3p = t3m.t3_init(jax.random.key(0), hp)
    eng = S3GenEngine(s3gen_init(jax.random.key(1), meanflow=True,
                                 tok_cfg=S3TokenizerConfig.tiny_test(),
                                 dims=FlowDims.tiny_test(), hift_base=32),
                      meanflow=True, tok_cfg=S3TokenizerConfig.tiny_test(),
                      dims=FlowDims.tiny_test())
    rng = np.random.default_rng(0)
    P = 8
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32))
    dec = BatchDecoder(t3p, hp, max_batch=4, max_new_tokens=8, top_k=0)
    srv = TTSHTTPServer(dec, eng, _Tok(),
                        {"default": Voice(_Cond(hp), ref)},
                        sr=24000, port=0, timeout_s=240.0)
    srv.start()
    yield srv
    srv.stop()


def _post(server, payload, timeout=240):
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}/tts",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def _parse_wav(body: bytes):
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    sr = struct.unpack("<I", body[24:28])[0]
    data = body[44:]
    return sr, np.frombuffer(data, np.int16)


class TestWavBytes:
    def test_roundtrip(self):
        wav = np.sin(np.linspace(0, 40, 4800)).astype(np.float32) * 0.5
        sr, pcm = _parse_wav(wav_bytes(wav, 24000))
        assert sr == 24000 and len(pcm) == 4800
        np.testing.assert_allclose(pcm / 32767.0, wav, atol=1.0 / 32767)


class TestHTTP:
    def test_tts_roundtrip(self, server):
        with _post(server, {"text": "hello http", "voice": "default",
                            "seed": 1, "temperature": 0.7}) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "audio/wav"
            sr, pcm = _parse_wav(resp.read())
        assert sr == 24000
        assert len(pcm) > 0 and np.isfinite(pcm).all()

    def test_concurrent_requests_batch(self, server):
        out = {}
        def call(i):
            with _post(server, {"text": f"req {i}", "seed": i}) as resp:
                out[i] = _parse_wav(resp.read())[1]
        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        [t.start() for t in threads]
        [t.join(timeout=240) for t in threads]
        assert sorted(out) == [0, 1, 2]
        assert all(len(v) > 0 for v in out.values())

    def test_same_seed_is_deterministic(self, server):
        with _post(server, {"text": "determinism", "seed": 42}) as r1:
            w1 = _parse_wav(r1.read())[1]
        with _post(server, {"text": "determinism", "seed": 42}) as r2:
            w2 = _parse_wav(r2.read())[1]
        np.testing.assert_array_equal(w1, w2)

    def test_voices_and_health(self, server):
        with urllib.request.urlopen(
                f"http://{server.host}:{server.port}/voices", timeout=30) as r:
            assert json.load(r)["voices"] == ["default"]
        with urllib.request.urlopen(
                f"http://{server.host}:{server.port}/healthz", timeout=30) as r:
            assert json.load(r)["ok"] is True

    def test_unknown_voice_400(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, {"text": "x", "voice": "nope"})
        assert ei.value.code == 400

    def test_timeout_returns_504_and_leaks_nothing(self, server):
        """A timed-out request must 504, and the result that the serving
        loop later produces must be dropped, not retained forever."""
        import time
        old = server.timeout_s
        server.timeout_s = 1e-3
        try:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(server, {"text": "too slow", "seed": 99})
            assert ei.value.code == 504
        finally:
            server.timeout_s = old
        # wait for the loop to finish the abandoned request, then verify
        # the result dict didn't retain it
        deadline = time.time() + 120
        while time.time() < deadline and server.loop._q.qsize():
            time.sleep(0.2)
        time.sleep(2.0)          # let _on_result fire (and drop it)
        assert server._results == {}
        assert server._events == {}

    def test_warmup_then_serve(self, server):
        """warmup() precompiles the decode cells + vocode grid and the
        server still answers correctly afterwards."""
        server.warmup(max_text_len=16, max_gen=8)
        with _post(server, {"text": "hello", "voice": "default",
                            "seed": 77}) as r:
            sr, pcm = _parse_wav(r.read())
        assert sr == 24000 and len(pcm) > 0

    def test_streaming_endpoint(self, server):
        """`"stream": true` returns chunked audio/wav: header with unknown
        sizes, then each yielded chunk as PCM16, reassembling to the full
        waveform."""
        chunks = [np.full(100, 0.1, np.float32),
                  np.full(50, -0.2, np.float32),
                  np.zeros(10, np.float32)]
        calls = {}

        def sfn(text, voice, seed, **kw):
            calls["args"] = (text, seed, kw)
            yield from chunks

        server.stream_fn = sfn
        try:
            with _post(server, {"text": "stream me", "voice": "default",
                                "stream": True, "seed": 9,
                                "temperature": 0.7}) as r:
                body = r.read()
        finally:
            server.stream_fn = None
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        assert struct.unpack("<I", body[4:8])[0] == 0xFFFFFFFF
        pcm = np.frombuffer(body[44:], np.int16)
        exp = np.concatenate(chunks)
        assert len(pcm) == len(exp)
        np.testing.assert_allclose(pcm / 32767.0, exp, atol=1 / 32767.0 + 1e-6)
        text, seed, kw = calls["args"]
        assert text == "stream me" and seed == 9
        assert kw == {"temperature": 0.7}

    def test_stream_without_stream_fn_400(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, {"text": "x", "voice": "default", "stream": True})
        assert ei.value.code == 400

    def test_metrics_endpoints(self, server):
        """Serving metrics are recorded per request and exported both as
        Prometheus text and JSON."""
        with _post(server, {"text": "metric me", "voice": "default",
                            "seed": 123}) as r:
            r.read()
        with urllib.request.urlopen(
                f"http://{server.host}:{server.port}/metrics.json",
                timeout=30) as r:
            rep = json.loads(r.read())
        assert rep["requests_total"] >= 1
        assert rep["audio_seconds_total"] > 0
        assert rep["http_tts"]["count"] >= 1
        assert rep["http_tts"]["mean_s"] > 0
        with urllib.request.urlopen(
                f"http://{server.host}:{server.port}/metrics",
                timeout=30) as r:
            text = r.read().decode()
            assert r.headers["Content-Type"].startswith("text/plain")
        assert "chatterbox_http_tts_count" in text
        assert "chatterbox_requests_total" in text

    def test_register_voice_roundtrip(self, server):
        """POST /voices registers a new voice usable for synthesis."""
        import base64
        calls = {}

        def prep(path):
            calls["path"] = path
            return server.voices["default"]       # reuse the fixture bundle

        server.prepare_fn = prep
        try:
            req = urllib.request.Request(
                f"http://{server.host}:{server.port}/voices",
                data=json.dumps({"name": "newv",
                                 "wav_b64": base64.b64encode(
                                     b"RIFFfakewav").decode()}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as r:
                assert r.status == 201
                assert json.loads(r.read())["voice"] == "newv"
        finally:
            server.prepare_fn = None
        assert calls["path"].endswith(".wav")
        with urllib.request.urlopen(
                f"http://{server.host}:{server.port}/voices",
                timeout=30) as r:
            assert "newv" in json.loads(r.read())["voices"]
        with _post(server, {"text": "new voice", "voice": "newv",
                            "seed": 5}) as r:
            sr, pcm = _parse_wav(r.read())
        assert sr == 24000 and len(pcm) > 0
        server.voices.pop("newv")

    def test_per_request_reference_audio(self, server):
        """POST /tts with wav_b64 synthesizes with an ephemeral voice built
        from the supplied reference audio (not registered)."""
        import base64
        server.prepare_fn = lambda path: server.voices["default"]
        try:
            with _post(server, {"text": "ephemeral", "seed": 3,
                                "wav_b64": base64.b64encode(
                                    b"RIFFfake").decode()}) as r:
                sr, pcm = _parse_wav(r.read())
        finally:
            server.prepare_fn = None
        assert sr == 24000 and len(pcm) > 0
        assert "ephemeral" not in server.voices and \
            len(server.voices) == 1                 # nothing registered
        # without prepare_fn it is a clean 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, {"text": "x", "wav_b64": "aGk="})
        assert ei.value.code == 400

    def test_register_voice_disabled_400(self, server):
        req = urllib.request.Request(
            f"http://{server.host}:{server.port}/voices",
            data=json.dumps({"name": "x", "wav_b64": ""}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

    def test_mid_stream_failure_truncates_cleanly(self, server):
        """A stream_fn that raises mid-stream must truncate the chunked
        response (terminator sent, no second HTTP response written onto the
        socket)."""
        good = np.full(80, 0.25, np.float32)

        def sfn(text, voice, seed, **kw):
            yield good
            raise RuntimeError("device fell over")

        server.stream_fn = sfn
        before = server.metrics.report().get("errors_total", 0)
        try:
            with _post(server, {"text": "x", "voice": "default",
                                "stream": True}) as r:
                body = r.read()        # dechunks; garbage after the
                                       # terminator would corrupt this
        finally:
            server.stream_fn = None
        assert body[:4] == b"RIFF"
        pcm = np.frombuffer(body[44:], np.int16)
        assert len(pcm) == len(good)               # exactly one chunk, then EOS
        assert server.metrics.report()["errors_total"] == before + 1

    def test_warmup_requires_a_voice(self, server):
        saved = server.voices
        server.voices = {}
        try:
            with pytest.raises(ValueError):
                server.warmup(max_text_len=16, max_gen=8)
        finally:
            server.voices = saved

    def test_pow2_sizes(self):
        from chatterbox_tpu.serve.batching import pow2_sizes
        assert pow2_sizes(1) == [1]
        assert pow2_sizes(6) == [1, 2, 4, 8]   # non-pow2 pads up past itself
        assert pow2_sizes(8) == [1, 2, 4, 8]

    def test_openai_compat_speech_endpoint(self, server):
        """POST /v1/audio/speech speaks the OpenAI field names; unknown
        OpenAI voices fall back to 'default'; pcm returns headerless
        samples."""
        def post(payload):
            req = urllib.request.Request(
                f"http://{server.host}:{server.port}/v1/audio/speech",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            return urllib.request.urlopen(req, timeout=240)

        with post({"model": "tts-1", "input": "hello there",
                   "voice": "alloy", "seed": 11}) as r:
            wav_body = r.read()
            assert r.headers["Content-Type"] == "audio/wav"
        sr, pcm = _parse_wav(wav_body)
        assert sr == 24000 and len(pcm) > 0

        with post({"input": "hello there", "voice": "alloy", "seed": 11,
                   "response_format": "pcm"}) as r:
            raw = r.read()
            assert r.headers["Content-Type"] == "audio/pcm"
        np.testing.assert_array_equal(np.frombuffer(raw, np.int16), pcm)

        with pytest.raises(urllib.error.HTTPError) as ei:
            post({"input": "x", "response_format": "mp3"})
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            post({"voice": "default"})           # missing "input"
        assert ei.value.code == 400

    def test_vc_roundtrip(self, server):
        """POST /vc: source wav in → converted wav out against the
        registered voice's ref bundle (ref capability: vc.py:83-104)."""
        import base64
        rng = np.random.default_rng(3)
        src = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        req = urllib.request.Request(
            f"http://{server.host}:{server.port}/vc",
            data=json.dumps({
                "wav_b64": base64.b64encode(
                    wav_bytes(src, 16000)).decode(),
                "voice": "default", "seed": 5}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=240) as resp:
            assert resp.status == 200
            sr, pcm = _parse_wav(resp.read())
        assert sr == 24000 and len(pcm) > 0 and np.isfinite(pcm).all()

    def test_vc_per_request_target(self, server):
        """Per-request target voice: target_wav_b64 builds an ephemeral
        ref bundle (embed_ref), no registered voice needed."""
        import base64
        rng = np.random.default_rng(4)
        b64 = lambda w, sr: base64.b64encode(wav_bytes(w, sr)).decode()
        src = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        tgt = (0.1 * rng.standard_normal(24000)).astype(np.float32)
        req = urllib.request.Request(
            f"http://{server.host}:{server.port}/vc",
            data=json.dumps({"wav_b64": b64(src, 16000),
                             "target_wav_b64": b64(tgt, 24000),
                             "seed": 6}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=240) as resp:
            sr, pcm = _parse_wav(resp.read())
        assert sr == 24000 and len(pcm) > 0

    def test_vc_unknown_voice_400(self, server):
        req = urllib.request.Request(
            f"http://{server.host}:{server.port}/vc",
            data=json.dumps({"wav_b64": "", "voice": "nope"}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400

    def test_bad_path_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://{server.host}:{server.port}/other", timeout=30)
        assert ei.value.code == 404

    def test_language_field_reaches_tokenizer(self, server):
        """"language" is forwarded to the tokenizer as language_id (the
        multilingual family, ref: mtl_tts.py:280); absent → None."""
        with _post(server, {"text": "bonjour", "seed": 6,
                            "language": "fr"}) as r:
            assert len(_parse_wav(r.read())[1]) > 0
        assert server.tokenizer.last_language == "fr"
        with _post(server, {"text": "hello", "seed": 6}) as r:
            r.read()
        assert server.tokenizer.last_language is None

    def test_exaggeration_override_copies_not_mutates(self, server):
        """Per-request "exaggeration" overrides emotion_adv on a COPY of the
        voice conditioning; the registered voice must not be mutated."""
        before = server.voices["default"].cond.emotion_adv
        assert before != 0.9
        with _post(server, {"text": "excited!", "seed": 8,
                            "exaggeration": 0.9}) as r:
            assert len(_parse_wav(r.read())[1]) > 0
        assert server.voices["default"].cond.emotion_adv == before


@pytest.fixture(scope="module")
def cont_server():
    """The same HTTP front running on token-level continuous batching
    (continuous= a ContinuousTTSServer slot machine) instead of the
    whole-batch ServingLoop."""
    from chatterbox_tpu.api.pipelines import T3CondHost
    from chatterbox_tpu.sampling.continuous import ContinuousTTSServer
    hp = T3Config.tiny_test("gpt2")
    t3p = t3m.t3_init(jax.random.key(0), hp)
    eng = S3GenEngine(s3gen_init(jax.random.key(1), meanflow=True,
                                 tok_cfg=S3TokenizerConfig.tiny_test(),
                                 dims=FlowDims.tiny_test(), hift_base=32),
                      meanflow=True, tok_cfg=S3TokenizerConfig.tiny_test(),
                      dims=FlowDims.tiny_test())
    rng = np.random.default_rng(0)
    P = 8
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32))
    cond = T3CondHost(np.zeros((1, 256), np.float32),
                      np.zeros((1, hp.speech_cond_prompt_len), np.int32))
    slots = ContinuousTTSServer(t3p, hp, n_slots=3, text_bucket=16,
                                max_new_tokens=8, chunk=4, top_k=40,
                                s3gen=eng, stream_chunk=4)
    srv = TTSHTTPServer(None, eng, _Tok(), {"default": Voice(cond, ref)},
                        sr=24000, port=0, timeout_s=240.0, continuous=slots)
    srv.start()
    yield srv
    srv.stop()


def _post_to(server, payload, timeout=240):
    return _post(server, payload, timeout)


class TestContinuousHTTP:
    """POST /tts served by the slot machine: requests join mid-decode and
    the HTTP surface behaves identically to the whole-batch backend."""

    def test_tts_roundtrip(self, cont_server):
        with _post_to(cont_server, {"text": "hello continuous",
                                    "voice": "default", "seed": 1,
                                    "temperature": 0.7}) as resp:
            assert resp.status == 200
            sr, pcm = _parse_wav(resp.read())
        assert sr == 24000
        assert len(pcm) > 0 and np.isfinite(pcm).all()

    def test_concurrent_mixed_requests_complete(self, cont_server):
        out = {}

        def call(i):
            with _post_to(cont_server,
                          {"text": "x" * (3 + 4 * i), "seed": i}) as resp:
                out[i] = _parse_wav(resp.read())[1]

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(4)]           # 4 callers > 3 slots
        [t.start() for t in threads]
        [t.join(timeout=240) for t in threads]
        assert sorted(out) == [0, 1, 2, 3]
        assert all(len(v) > 0 for v in out.values())

    def test_same_seed_is_deterministic(self, cont_server):
        with _post_to(cont_server, {"text": "determinism",
                                    "seed": 42}) as r1:
            w1 = _parse_wav(r1.read())[1]
        with _post_to(cont_server, {"text": "determinism",
                                    "seed": 42}) as r2:
            w2 = _parse_wav(r2.read())[1]
        np.testing.assert_array_equal(w1, w2)

    def test_warmup_then_serve(self, cont_server):
        cont_server.warmup(max_gen=8)
        with _post_to(cont_server, {"text": "after warmup",
                                    "seed": 77}) as r:
            sr, pcm = _parse_wav(r.read())
        assert sr == 24000 and len(pcm) > 0

    def test_health_reports_queue(self, cont_server):
        with urllib.request.urlopen(
                f"http://{cont_server.host}:{cont_server.port}/healthz",
                timeout=30) as r:
            assert json.load(r)["ok"] is True

    def test_stream_roundtrip_continuous(self, cont_server):
        """`"stream": true` on the continuous backend needs no stream_fn:
        chunks ride the slot machine (cont_server has stream_fn=None)."""
        assert cont_server.stream_fn is None
        with _post_to(cont_server, {"text": "stream me", "seed": 5,
                                    "stream": True}) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "audio/wav"
            body = resp.read()
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        pcm = np.frombuffer(body[44:], np.int16)
        assert len(pcm) > 0

    def test_concurrent_streams_one_identical_to_solo(self, cont_server):
        """THREE simultaneous streaming clients complete concurrently (no
        per-stream device lock), and a seeded stream's bytes match the same
        request run solo — the round-4 VERDICT done-criterion at the HTTP
        surface."""
        with _post_to(cont_server, {"text": "stream me", "seed": 21,
                                    "stream": True}) as r:
            solo = r.read()
        out = {}

        def call(i):
            with _post_to(cont_server, {"text": "stream me", "seed": 21 + i,
                                        "stream": True}) as resp:
                out[i] = resp.read()

        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        [t.start() for t in threads]
        [t.join(timeout=240) for t in threads]
        assert sorted(out) == [0, 1, 2]
        assert all(len(b) > 44 for b in out.values())
        assert out[0] == solo                       # byte-identical
        assert out[1] != out[2]                     # different seeds differ

    def test_stream_and_batch_interleave(self, cont_server):
        """A streaming client and plain /tts clients run at the same time;
        everyone completes (the stream holds no lock the others need)."""
        out = {}

        def stream():
            with _post_to(cont_server, {"text": "long stream", "seed": 31,
                                        "stream": True}) as r:
                out["s"] = r.read()

        def plain(i):
            with _post_to(cont_server, {"text": "plain", "seed": 40 + i}) as r:
                out[i] = _parse_wav(r.read())[1]

        threads = ([threading.Thread(target=stream)]
                   + [threading.Thread(target=plain, args=(i,))
                      for i in range(2)])
        [t.start() for t in threads]
        [t.join(timeout=240) for t in threads]
        assert set(out) == {"s", 0, 1}
        assert len(out["s"]) > 44 and all(len(out[i]) for i in (0, 1))


@pytest.fixture(scope="module")
def cfg_cont_server():
    """A cfg=True slot machine behind the HTTP front (the 520M/MTL family's
    serving shape): each request occupies a cond/uncond row pair and text
    arrives SOT/EOT-framed via frame_text."""
    from chatterbox_tpu.api.pipelines import T3CondHost
    from chatterbox_tpu.sampling.continuous import ContinuousTTSServer
    hp = T3Config.tiny_test("llama")
    t3p = t3m.t3_init(jax.random.key(0), hp)
    eng = S3GenEngine(s3gen_init(jax.random.key(1), meanflow=True,
                                 tok_cfg=S3TokenizerConfig.tiny_test(),
                                 dims=FlowDims.tiny_test(), hift_base=32),
                      meanflow=True, tok_cfg=S3TokenizerConfig.tiny_test(),
                      dims=FlowDims.tiny_test())
    rng = np.random.default_rng(0)
    P = 8
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32))
    cond = T3CondHost(np.zeros((1, 256), np.float32),
                      np.zeros((1, hp.speech_cond_prompt_len), np.int32))

    def frame(ids):
        return np.concatenate([[hp.start_text_token],
                               np.asarray(ids).reshape(-1),
                               [hp.stop_text_token]]).astype(np.int32)

    slots = ContinuousTTSServer(t3p, hp, n_slots=2, text_bucket=16,
                                max_new_tokens=8, chunk=4, top_k=40,
                                s3gen=eng, stream_chunk=4, cfg=True)
    srv = TTSHTTPServer(None, eng, _Tok(), {"default": Voice(cond, ref)},
                        sr=24000, port=0, timeout_s=240.0, continuous=slots,
                        frame_text=frame)
    srv.start()
    yield srv
    srv.stop()


class TestContinuousCFGStreamingHTTP:
    """Round-5 VERDICT item 2 at the HTTP surface: `"stream": true` accepted
    on CFG servers, streamed bytes deterministic per seed."""

    def test_cfg_stream_roundtrip(self, cfg_cont_server):
        assert cfg_cont_server._continuous_stream    # gate lifted for cfg
        with _post_to(cfg_cont_server, {"text": "stream me", "seed": 7,
                                        "stream": True}) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "audio/wav"
            body = resp.read()
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        assert len(np.frombuffer(body[44:], np.int16)) > 0

    def test_cfg_concurrent_stream_matches_solo(self, cfg_cont_server):
        with _post_to(cfg_cont_server, {"text": "stream me", "seed": 61,
                                        "stream": True}) as r:
            solo = r.read()
        out = {}

        def call(i):
            with _post_to(cfg_cont_server,
                          {"text": "stream me", "seed": 61 + i,
                           "stream": True}) as resp:
                out[i] = resp.read()

        threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        [t.start() for t in threads]
        [t.join(timeout=240) for t in threads]
        assert sorted(out) == [0, 1]
        assert out[0] == solo
