"""Batched serving engine: request queue → padded batch decode → per-request
vocoding.

The reference serves one request at a time (gradio queue concurrency 1,
ref: gradio_tts_app.py:90-93). Here requests are grouped into fixed-size
batches over a shared text bucket; the batched T3 loop (sampling/batched.py)
decodes them together and the S3Gen stages run per request (different
reference voices → different prompt shapes). Batches can also be sharded
over a "data" mesh axis for multi-chip serving (parallel/mesh.py).
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.t3.config import T3Config
from ..models.t3 import model as t3m
from ..models.s3tok.model import SPEECH_VOCAB_SIZE
from ..sampling.batched import t3_generate_batched
from ..sampling.decode import text_bucket
from ..ops.sampling import SamplerParams


def pow2_sizes(n: int) -> list:
    """Powers of two up to AND INCLUDING next_pow2(n) — the batch buckets a
    pow2-padding dispatch can actually produce for batches of 1..n (a non-
    pow2 n pads up past itself, so stopping at n would leave the top bucket
    uncompiled)."""
    sizes, b = [], 1
    while b < n:
        sizes.append(b)
        b *= 2
    sizes.append(b)
    return sizes


# serving threads whose stop() join timed out (still finishing a compile);
# test harnesses drain these before the next test starts compiling
LINGERING_THREADS: list = []


def register_lingering(thread) -> None:
    """Record a thread whose stop() join timed out. Dead entries are pruned
    on every append so a long-lived serving process with repeated stop()
    timeouts (e.g. HTTP server restarts) can't accumulate Thread objects
    (and their referents) without bound."""
    LINGERING_THREADS[:] = [t for t in LINGERING_THREADS if t.is_alive()]
    LINGERING_THREADS.append(thread)


@dataclasses.dataclass
class TTSRequest:
    text_tokens: np.ndarray            # (Lt,) token ids — raw BPE (turbo) or
                                       # SOT/EOT-framed (CFG family)
    cond: "object"                     # T3CondHost
    sampler: Optional[SamplerParams] = None
    request_id: int = 0
    seed: Optional[int] = None         # per-request RNG seed (reproducible rows)
    max_new: Optional[int] = None      # per-request token cap (continuous serving)
    ref: "object" = None               # optional S3Gen RefDict → vocode the result


@dataclasses.dataclass
class TTSResult:
    request_id: int
    speech_tokens: np.ndarray          # filtered (<6561), no EOS
    wav: Optional[np.ndarray] = None   # synthesized audio (when the loop vocodes)


class BatchDecoder:
    """Groups requests and runs the batched T3 decode.

    `cfg=True` serves the 520M CFG family (ChatterboxTTS / Multilingual):
    the decode runs 2B physical rows (cond+uncond, ref: t3.py:338-386) with
    the rep→temp→min_p→top_p chain. Per-request SamplerParams are honored
    row-by-row; per-request seeds make a row's output independent of its
    batchmates."""

    def __init__(self, t3_params, hp: T3Config, max_batch: int = 8,
                 max_new_tokens: int = 1000, top_k: int = 1000, seed: int = 0,
                 cfg: bool = False, kv_int8: bool = False):
        self.t3_params = t3_params
        self.hp = hp
        self.max_batch = max_batch
        self.max_new_tokens = max_new_tokens
        self.top_k = top_k
        self.cfg = cfg
        # opt-in int8 KV cache (pallas streamed-int8 attention with the
        # per-row left-pad bound) — half the attention HBM bytes; same
        # quality caveat as the single-stream kv_int8 (tools/ab_int8.py)
        self.kv_int8 = kv_int8
        self._key = jax.random.key(seed)

    def _stack_samplers(self, requests: list[TTSRequest]) -> SamplerParams:
        default = SamplerParams.make(cfg_weight=0.5 if self.cfg else 0.0)
        rows = [r.sampler if r.sampler is not None else default
                for r in requests]
        return SamplerParams(*[
            jnp.asarray([float(getattr(r, f)) for r in rows], jnp.float32)
            for f in SamplerParams._fields])

    def _row_keys(self, requests: list[TTSRequest]):
        self._key, k = jax.random.split(self._key)
        base = jax.random.split(k, len(requests))
        return jnp.stack([
            jax.random.key(r.seed) if r.seed is not None else base[i]
            for i, r in enumerate(requests)])

    def decode_batch(self, requests: list[TTSRequest]) -> list[TTSResult]:
        return self.decode_batch_fetch(self.decode_batch_dispatch(requests))

    def decode_batch_dispatch(self, requests: list[TTSRequest]):
        """Async half: enqueues the batched decode, returns a handle without
        syncing (the pipelined ServingLoop fetches later).

        The batch axis is padded to the next power of two (last request
        replicated) so variable-size batches reuse one compiled program per
        pow2 bucket instead of compiling per composition — same policy as the
        vocode path (models/s3gen/model.py inference_batch_dispatch). Decode
        is weight-bound at these batch sizes, so pad rows are ~free; pad rows
        also REUSE the last real row's RNG key (not a fresh draw), so they
        sample the identical trajectory and finish at the same step — an
        unseeded pad row with its own key could decode past every real row
        and stall the batch. The handle keeps the real request list; fetch
        ignores pad rows. Note a non-pow2 max_batch rounds up on device
        (warmup() warms through next_pow2(max_batch))."""
        B = len(requests)
        assert B >= 1
        keys = self._row_keys(requests)
        Bp = 1
        while Bp < B:
            Bp *= 2
        real = requests
        if Bp > B:
            requests = list(requests) + [requests[-1]] * (Bp - B)
            keys = jnp.concatenate([keys, jnp.repeat(keys[-1:], Bp - B,
                                                     axis=0)])
            B = Bp
        lens = [len(r.text_tokens) for r in requests]
        bucket = text_bucket(max(lens))
        text = np.zeros((B, bucket), np.int32)
        for i, r in enumerate(requests):
            text[i, : lens[i]] = r.text_tokens

        # batch the conditioning (same static prompt length per model)
        spk = np.concatenate([r.cond.speaker_emb for r in requests], axis=0)
        prompts = np.concatenate(
            [r.cond.cond_prompt_speech_tokens for r in requests], axis=0)
        cond = t3m.T3CondArrays(
            speaker_emb=jnp.asarray(spk),
            cond_prompt_speech_tokens=jnp.asarray(prompts),
            emotion_adv=(jnp.asarray(
                np.stack([[[r.cond.emotion_adv]] for r in requests]))
                if self.hp.emotion_adv else None),
        )
        sp = self._stack_samplers(requests)
        from ..sampling.chunked import BUCKETED_DECODE_THRESHOLD
        if self.max_new_tokens >= BUCKETED_DECODE_THRESHOLD:
            # serving default budgets: bucketed cache growth (attention
            # reads O(actual length)); token-identical to the one-shot loop
            from ..sampling.batched import t3_generate_batched_bucketed
            res = t3_generate_batched_bucketed(
                self.t3_params, self.hp, cond, jnp.asarray(text),
                jnp.asarray(lens, jnp.int32), sp, keys,
                max_new_tokens=self.max_new_tokens, top_k=self.top_k,
                cfg_mode=self.cfg, kv_int8=self.kv_int8)
        else:
            res = t3_generate_batched(
                self.t3_params, self.hp, cond, jnp.asarray(text),
                jnp.asarray(lens, jnp.int32), sp, keys,
                max_new_tokens=self.max_new_tokens, top_k=self.top_k,
                cfg_mode=self.cfg, kv_int8=self.kv_int8)
        return (res, real)

    def warmup(self, cond, *, max_text_len: int, batch_sizes=None) -> int:
        """Compile the decode-program grid traffic can hit: pow2 batch
        buckets × text buckets up to bucket(max_text_len). The bucketed
        decode dispatches every cache-growth segment unconditionally, so one
        call per cell compiles every capacity; EOS early-exit inside the
        chunk while_loops keeps the warm compute cheap. Synthetic text
        (token 1), results discarded. Returns the number of cells touched.
        With the persistent compile cache this is one-time per image."""
        from ..sampling.decode import TEXT_BUCKETS
        cap = text_bucket(max_text_len)
        buckets = [b for b in TEXT_BUCKETS if b <= cap]
        if batch_sizes is None:
            batch_sizes = pow2_sizes(self.max_batch)
        n = 0
        for B in batch_sizes:
            for tb in buckets:
                self.decode_batch([
                    TTSRequest(text_tokens=np.ones((tb,), np.int32),
                               cond=cond, request_id=-1 - i, seed=0)
                    for i in range(B)])
                n += 1
        return n

    def decode_batch_fetch(self, handle) -> list[TTSResult]:
        """Sync half: fetches tokens and builds per-request results."""
        res, requests = handle
        tokens, counts = jax.device_get((res.tokens, res.n_tokens))
        out = []
        for i, r in enumerate(requests):
            t = tokens[i, : counts[i]]
            if self.cfg:   # CFG family slices between SOS/EOS (ref: tts.py:260)
                from ..api.pipelines import drop_invalid_tokens_sliced
                t = drop_invalid_tokens_sliced(t)
            t = t[t < SPEECH_VOCAB_SIZE]
            out.append(TTSResult(request_id=r.request_id, speech_tokens=t))
        return out


class TTSServer:
    """End-to-end batched TTS serving: batched T3 decode + one batched
    S3Gen flow/vocoder call per batch (models/s3gen/model.py
    inference_batch). Requests may carry different voices (RefDicts)."""

    def __init__(self, decoder: BatchDecoder, s3gen, seed: int = 0):
        self.decoder = decoder
        self.s3gen = s3gen
        self._key = jax.random.key(seed + 1)

    def synthesize_batch(self, requests: list[TTSRequest],
                         refs: list) -> list[np.ndarray]:
        """refs[i] is the S3Gen RefDict for requests[i]. Returns wavs ordered
        like `requests`."""
        results = self.decoder.decode_batch(requests)
        by_id = {r.request_id: r for r in results}
        ordered = [by_id[req.request_id] for req in requests]
        token_rows = [r.speech_tokens for r in ordered]
        self._key, k = jax.random.split(self._key)
        return self.s3gen.inference_batch(token_rows, refs, k)


class ServingLoop:
    """A whole-batch continuous-serving loop: collects requests from a queue
    into batches (up to max_batch or a wait timeout), decodes them together,
    vocodes (one batched S3Gen call) when requests carry a RefDict, and
    invokes the result callback with finished audio. New requests join at
    batch boundaries; for token-level admission use
    sampling.continuous.ContinuousTTSServer."""

    def __init__(self, decoder: BatchDecoder, on_result: Callable[[TTSResult], None],
                 batch_wait_s: float = 0.02, s3gen=None, seed: int = 0):
        self.decoder = decoder
        self.on_result = on_result
        self.batch_wait_s = batch_wait_s
        self.s3gen = s3gen
        self._key = jax.random.key(seed + 7)
        self._q: "queue.Queue[TTSRequest]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def submit(self, req: TTSRequest):
        self._q.put(req)

    def start(self):
        # the "chatterbox-" prefix lets test harnesses find and drain these
        # loops between tests (a loop mid-compile can outlive stop()'s
        # bounded join and race XLA from the background)
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="chatterbox-serving-loop")
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=30)
            if self._thread.is_alive():
                # a loop stuck in a long XLA compile outlives the bounded
                # join; register it so harnesses can wait it out before
                # compiling elsewhere (concurrent compile + serialize in
                # XLA:CPU has been observed to SIGSEGV)
                register_lingering(self._thread)

    def _vocode_keys(self, batch: list[TTSRequest]):
        """(B,) stacked keys: seeded requests get a seed-derived key (audio
        reproducible regardless of batch composition); unseeded rows draw
        from the loop key."""
        self._key, k = jax.random.split(self._key)
        base = jax.random.split(k, len(batch))
        return jnp.stack([
            jax.random.fold_in(jax.random.key(r.seed), 1)
            if r.seed is not None else base[i]
            for i, r in enumerate(batch)])

    def _finalize(self, pending):
        """Fetch a dispatched batch's waveforms and fire callbacks."""
        ordered, handle = pending
        if handle is not None:
            wavs = self.s3gen.inference_batch_fetch(handle)
            for r, w in zip(ordered, wavs):
                r.wav = w
        for result in ordered:
            self.on_result(result)

    def _run(self):
        # Two-deep pipeline: batch N's vocode stays enqueued on the device
        # while the host collects batch N+1 and dispatches its decode; N's
        # waveform fetch (the big relay transfer) then overlaps N+1's
        # on-device decode compute.
        pending = None
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                if pending is not None:
                    self._finalize(pending)
                    pending = None
                continue
            batch = [first]
            deadline = self.batch_wait_s
            while len(batch) < self.decoder.max_batch:
                try:
                    batch.append(self._q.get(timeout=deadline))
                except queue.Empty:
                    break
            dec_handle = self.decoder.decode_batch_dispatch(batch)
            if pending is not None:
                self._finalize(pending)
                pending = None
            results = self.decoder.decode_batch_fetch(dec_handle)
            if self.s3gen is not None and all(r.ref is not None for r in batch):
                by_id = {r.request_id: r for r in results}
                ordered = [by_id[req.request_id] for req in batch]
                voc_handle = self.s3gen.inference_batch_dispatch(
                    [r.speech_tokens for r in ordered],
                    [req.ref for req in batch], self._vocode_keys(batch))
                pending = (ordered, voc_handle)
            else:
                pending = (results, None)
        if pending is not None:
            self._finalize(pending)


class ContinuousServingLoop:
    """Token-level continuous serving behind the same surface as ServingLoop
    (submit / start / stop / on_result): requests join the slot machine at
    the next CHUNK boundary — not the next batch boundary — and each result
    fires the moment its row finishes, while its former batchmates keep
    decoding. Under mixed-length traffic a short request is never queued
    behind a long one's tail.

    Serves the Turbo/Nano family (one physical row per request) or — when
    the slot machine was built with cfg=True — the 520M/MTL CFG family
    (cond/uncond row pairs; requests must carry SOT/EOT-framed text, e.g.
    via TTSHTTPServer's frame_text)."""

    def __init__(self, server, on_result: Callable[[TTSResult], None],
                 idle_wait_s: float = 0.05):
        self.server = server      # sampling.continuous.ContinuousTTSServer
        self.on_result = on_result
        self.s3gen = server.s3gen
        self.idle_wait_s = idle_wait_s
        self._q: "queue.Queue[tuple]" = queue.Queue()   # (req, on_chunk|None)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def submit(self, req: TTSRequest):
        self._q.put((req, None))

    def submit_stream(self, req: TTSRequest, on_chunk) -> None:
        """Submit a STREAMING request: on_chunk(chunk, final) fires from the
        serving thread as the request's audio is synthesized, while its
        slot-mates keep decoding — N streaming clients share one batched
        decode (sampling/continuous.py submit docstring for constraints)."""
        self._q.put((req, on_chunk))

    def start(self):
        # the "chatterbox-" prefix lets test harnesses find and drain these
        # loops between tests (a loop mid-compile can outlive stop()'s
        # bounded join and race XLA from the background)
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="chatterbox-serving-loop")
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=30)
            if self._thread.is_alive():
                # a loop stuck in a long XLA compile outlives the bounded
                # join; register it so harnesses can wait it out before
                # compiling elsewhere (concurrent compile + serialize in
                # XLA:CPU has been observed to SIGSEGV)
                register_lingering(self._thread)

    def _drain(self, block: bool) -> None:
        """Move queued requests into the slot machine's pending list. Blocks
        briefly only when the device is idle — a busy loop polls for free."""
        try:
            req, cb = (self._q.get(timeout=self.idle_wait_s) if block
                       else self._q.get_nowait())
            self.server.submit(req, on_chunk=cb)
        except queue.Empty:
            return
        while True:
            try:
                req, cb = self._q.get_nowait()
                self.server.submit(req, on_chunk=cb)
            except queue.Empty:
                return

    def _fire_ready(self) -> None:
        for rid, tokens, wav in self.server.pop_ready():
            self.on_result(TTSResult(request_id=rid, speech_tokens=tokens,
                                     wav=wav))

    def _run(self):
        busy = False
        while not self._stop.is_set():
            self._drain(block=not busy)
            busy = self.server.serve_round()
            self._fire_ready()
        # graceful shutdown: finish what's already in the slots/queue so
        # callers blocked on events aren't abandoned mid-synthesis
        self._drain(block=False)
        while self.server.serve_round():
            self._fire_ready()
        self._fire_ready()
