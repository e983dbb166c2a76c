"""Phase-level trace of concurrent-stream TTFA on the real chip.

Replicates bench.py's stream_b4 workload (4 concurrent streaming requests
through the continuous slot machine, first_chunk=8) but timestamps every
host-side phase of the first rounds: per-admit dispatch, decode dispatch,
status fetch, feed dispatch, audio fetch, callback. Prints a timeline so
the TTFA budget (<200 ms p50) can be attacked where the milliseconds
actually are instead of where they plausibly might be.

Usage: python tools/perf_ttfa_trace.py [--streams 4] [--first-chunk 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, S3GEN_SR
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.sampling import continuous as C
from chatterbox_tpu.serve.batching import TTSRequest
from chatterbox_tpu.utils.dtypes import cast_params
from chatterbox_tpu.utils.quantize import best_serving_mode, quantize_t3_backbone


def log(m):
    print(m, file=sys.stderr)
    sys.stderr.flush()


T0 = [None]


def ms():
    return (time.perf_counter() - T0[0]) * 1e3


class TracingServer(C.ContinuousTTSServer):
    """Timestamps around the hot host-side calls of the serving loop."""

    def _admit_pending(self):
        n = sum(1 for r in self._slot_req if r is None)
        had = len(self._pending)
        t = ms()
        super()._admit_pending()
        if had:
            log(f"  [{t:7.1f} → {ms():7.1f} ms] admit×{min(had, n)}")

    def _dispatch_round(self):
        t = ms()
        out = super()._dispatch_round()
        if out:
            log(f"  [{t:7.1f} → {ms():7.1f} ms] dispatch_round (incl admits)")
        return out

    def _harvest(self, status=None, skip=()):
        t = ms()
        out = super()._harvest(status, skip=skip)
        log(f"  [{t:7.1f} → {ms():7.1f} ms] harvest+feeds")
        return out

    def serve_round(self):
        t = ms()
        dispatched = self._dispatch_round()
        status = C.pack_status(self.state) if dispatched else None
        t2 = ms()
        if self._lagged is not None:
            lag = np.asarray(self._lagged)
            log(f"  [{t2:7.1f} → {ms():7.1f} ms] status fetch (lagged)")
            self._harvest(lag, skip=self._fresh)
        self._lagged = status
        self._fresh = set()
        idle = (status is None and not self._pending
                and all(r is None for r in self._slot_req))
        if idle:
            self.flush_vocode()
        log(f"  round done at {ms():7.1f} ms")
        return not idle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--first-chunk", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=120)
    args = ap.parse_args()
    B = args.streams

    hp = T3Config.turbo()
    log("building Turbo T3 (int8) ...")
    params = quantize_t3_backbone(
        cast_params(t3m.t3_init(jax.random.key(0), hp), jnp.bfloat16),
        mode=best_serving_mode(hp.backbone))
    log("building S3Gen (meanflow) ...")
    eng = S3GenEngine(s3gen_init(jax.random.key(1), meanflow=True),
                      meanflow=True, n_timesteps=2)
    rng = np.random.default_rng(0)
    ref = eng.embed_ref(
        (rng.standard_normal(6 * S3GEN_SR) * 0.1).astype(np.float32),
        S3GEN_SR)
    from chatterbox_tpu.api.pipelines import T3CondHost
    cond = T3CondHost(
        rng.standard_normal((1, 256)).astype(np.float32),
        rng.integers(0, 6561, (1, hp.speech_cond_prompt_len)).astype(np.int32))

    def mk_srv():
        return TracingServer(
            params, hp, n_slots=B, text_bucket=32,
            max_new_tokens=args.tokens, chunk=25, top_k=1000, s3gen=eng,
            stream_chunk=25, first_chunk=args.first_chunk)

    def run(srv, n_req, seed0, quiet=False):
        t_first = {}
        T0[0] = time.perf_counter()
        for i in range(n_req):
            r = TTSRequest(
                text_tokens=rng.integers(1, 500, 24).astype(np.int32),
                cond=cond, request_id=i, seed=seed0 + i, max_new=args.tokens,
                sampler=SamplerParams.make(cfg_weight=0.0))
            r.ref = ref

            def cb(chunk, final, i=i):
                if len(chunk) and i not in t_first:
                    t_first[i] = ms()
                    log(f"  >>> stream {i} FIRST AUDIO at {t_first[i]:.1f} ms")

            srv.submit(r, on_chunk=cb)
        rounds = 0
        while srv.serve_round():
            rounds += 1
            if rounds > 500:
                break
        srv.pop_ready()
        return t_first

    srv = mk_srv()
    log("warmup (compiles ride .jax_cache_tpu from bench runs) ...")
    srv.warmup(cond, ref=ref, max_gen=args.tokens,
               batch_sizes=(1, 2, B))
    log("throwaway run (stream feed program warm) ...")
    run(srv, B, 7000)
    log(f"--- traced run: {B} concurrent streams ---")
    t_first = run(mk_srv(), B, 9000)
    ts = sorted(t_first.values())
    log(f"TTFAs: {[round(t) for t in ts]} ms; p50 "
        f"{ts[len(ts) // 2 - (len(ts) % 2 == 0)]:.0f}")


if __name__ == "__main__":
    main()
