"""Phase-level timeline of concurrent-stream TTFA (bench.py stream_b4).

Wraps the hot calls of the continuous slot machine with host timers and
replays the bench's 4-concurrent-stream measurement, printing a per-event
timeline (dispatch vs fetch vs feed) relative to submit. No new programs:
identical shapes/knobs to bench_stream_b4, so everything loads from
.jax_cache_tpu.

Usage: python tools/perf_stream_ttfa.py [first_chunk] [n_req]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_tpu.utils.jaxcache import atomic_cache_writes
atomic_cache_writes()
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init
from chatterbox_tpu.sampling import continuous as cont
from chatterbox_tpu.serve import streaming as strm
from chatterbox_tpu.serve.batching import TTSRequest

EVENTS = []
T0 = [0.0]


def _stamp(name):
    EVENTS.append((time.perf_counter() - T0[0], name))


def _wrap(mod, attr, label=None):
    fn = getattr(mod, attr)
    lab = label or attr

    def wrapped(*a, **k):
        t0 = time.perf_counter() - T0[0]
        out = fn(*a, **k)
        t1 = time.perf_counter() - T0[0]
        EVENTS.append((t0, f"{lab} start"))
        EVENTS.append((t1, f"{lab} end (+{(t1 - t0) * 1e3:.1f}ms)"))
        return out

    setattr(mod, attr, wrapped)


def main():
    first_chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    hp = T3Config.turbo()
    k1, k2 = jax.random.split(jax.random.key(0))
    print("building Turbo T3 (int8) ...", flush=True)
    t3_params = t3m.t3_init(k1, hp)
    from chatterbox_tpu.utils.quantize import (best_serving_mode,
                                               quantize_t3_backbone)
    t3_params = quantize_t3_backbone(t3_params,
                                     mode=best_serving_mode(hp.backbone))
    print("building S3Gen (meanflow) ...", flush=True)
    engine = S3GenEngine(s3gen_init(k2, meanflow=True), meanflow=True)

    # host-built RefDict (identical to bench._make_ref): embed_ref would
    # pull in the CAMPPlus/mel compile chain this probe doesn't measure
    from chatterbox_tpu.models.s3gen.model import RefDict
    rng = np.random.default_rng(0)
    P = 125
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32),
    )

    cond = t3m.T3CondArrays(
        speaker_emb=jnp.zeros((1, 256)),
        cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len),
                                            jnp.int32),
        emotion_adv=None,
    )

    _wrap(cont, "admit")
    _wrap(cont, "decode_chunk_multi", "decode_chunk")
    _wrap(cont, "pack_status", "pack_dispatch")
    _wrap(strm.StreamingVocoder, "feed_dispatch")
    _wrap(strm.StreamingVocoder, "feed_fetch")

    N, B = 250, 4
    srv = cont.ContinuousTTSServer(t3_params, hp, n_slots=B, text_bucket=32,
                                   max_new_tokens=N, chunk=25, top_k=1000,
                                   s3gen=engine, stream_chunk=25,
                                   first_chunk=first_chunk)

    def run(n, seed0, record):
        t_first = {}

        def make_cb(rid):
            def cb(chunk, final):
                if rid not in t_first and len(chunk):
                    t_first[rid] = time.perf_counter() - T0[0]
                    if record:
                        EVENTS.append((t_first[rid], f"FIRST AUDIO rid={rid}"))
            return cb

        EVENTS.clear()
        T0[0] = time.perf_counter()
        for i in range(n):
            rid = seed0 + i
            req = TTSRequest(text_tokens=np.ones((30,), np.int32),
                             cond=cond, request_id=rid, seed=rid, ref=ref)
            srv.submit(req, on_chunk=make_cb(rid))
            _stamp(f"submitted rid={rid}")
        rounds = 0
        while True:
            t0 = time.perf_counter() - T0[0]
            alive = srv.serve_round()
            t1 = time.perf_counter() - T0[0]
            if record and rounds < 8:
                EVENTS.append((t0, f"-- serve_round {rounds} start"))
                EVENTS.append((t1, f"-- serve_round {rounds} end"))
            rounds += 1
            if not alive:
                break
        return sorted((t_first[r] - 0.0) * 1e3 for r in t_first)

    print("compile/warm pass (1 stream) ...", flush=True)
    run(1, 100, record=False)
    print("warm pass (4 streams) ...", flush=True)
    run(n_req, 200, record=False)
    print("measured pass:", flush=True)
    ttfas = run(n_req, 300, record=True)
    print(f"\nTTFA ms: {[round(t) for t in ttfas]} "
          f"(p50 {np.median(ttfas):.0f})  first_chunk={first_chunk}\n")
    cut = max(ttfas) / 1e3 + 0.05
    for t, name in sorted(EVENTS):
        if t <= cut:
            print(f"  {t * 1e3:8.1f}ms  {name}")


if __name__ == "__main__":
    main()
