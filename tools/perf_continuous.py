"""Continuous-batching serving throughput on the real chip.

Measures the token-level slot server (sampling/continuous.py) against
whole-batch serving (serve/batching.TTSServer) on the SAME staggered
workload — N requests with mixed generation lengths, arriving in waves.
Whole-batch must drain a batch before admitting the next wave; the slot
server back-fills finished rows at chunk boundaries. Reports aggregate
×realtime for both (audio seconds produced / wall).

Usage: python tools/perf_continuous.py [--requests 24] [--slots 8]
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
from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, RefDict
from chatterbox_tpu.serve.batching import (TTSRequest, BatchDecoder, TTSServer)
from chatterbox_tpu.sampling.continuous import ContinuousTTSServer
from chatterbox_tpu.utils.dtypes import cast_params
from chatterbox_tpu.utils.quantize import best_serving_mode, quantize_t3_backbone


def log(m):
    print(m, file=sys.stderr)
    sys.stderr.flush()


def _make_cond(hp, rng):
    from chatterbox_tpu.api.pipelines import T3CondHost
    return T3CondHost(
        rng.standard_normal((1, 256)).astype(np.float32),
        rng.integers(0, 6561, (1, hp.speech_cond_prompt_len)).astype(np.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--decode-only", action="store_true",
                    help="skip vocoding (isolates the scheduling loop)")
    args = ap.parse_args()

    hp = T3Config.turbo()
    rng = np.random.default_rng(0)
    log("building Turbo T3 (int8) ...")
    t3p = quantize_t3_backbone(
        cast_params(t3m.t3_init(jax.random.key(0), hp), jnp.bfloat16),
        mode=best_serving_mode(hp.backbone))
    log("building S3Gen (meanflow) ...")
    engine = S3GenEngine(s3gen_init(jax.random.key(1), meanflow=True),
                         meanflow=True)
    P = 125
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32))
    cond = _make_cond(hp, rng)

    # mixed-length workload: 100–250 generated tokens per request (ignoring
    # EOS — random weights; per-request caps emulate different utterances)
    caps = rng.integers(100, 251, args.requests)

    def make_requests():
        return [TTSRequest(
            text_tokens=rng.integers(1, 50_000, 24).astype(np.int32),
            cond=cond, request_id=i, seed=i, max_new=int(caps[i]), ref=ref)
            for i in range(args.requests)]

    voc = None if args.decode_only else engine
    # ---- continuous slot server ------------------------------------------
    log("continuous: warmup (decode growth schedule + vocode grid) ...")
    srv = ContinuousTTSServer(t3p, hp, n_slots=args.slots, text_bucket=32,
                              max_new_tokens=256, chunk=args.chunk,
                              s3gen=voc)
    # compiles admit/chunk/status at every cache capacity on the growth
    # schedule plus the pow2-batch × bucket-combo vocode grid — exactly what
    # production serving pre-warms (persistent cache: one-time per image)
    # min_gen stays 1: a harvested row's vocode length is len(t[t<6561]),
    # which EOS / special-token filtering can drop below caps.min() — a
    # skipped combo would compile INSIDE the timed loop
    srv.warmup(cond, ref if voc is not None else None,
               max_gen=int(caps.max()))
    for r in make_requests():
        srv.submit(r)
    t0 = time.perf_counter()
    srv.run_until_idle()
    wall_c = time.perf_counter() - t0
    toks_c = sum(len(v) for v in srv.results.values())
    # requested audio is the comparable work unit: whole-batch decodes every
    # row to the global cap (the straggler cost being measured), so both
    # servers are scored on the audio the requests ASKED for
    audio_req = float(caps.sum()) / 25.0
    log(f"continuous: {wall_c:.2f}s wall, {toks_c} tokens "
        f"→ {audio_req / wall_c:.1f}x agg (requested audio)")

    # ---- whole-batch server ----------------------------------------------
    log("whole-batch: compiling ...")
    dec = BatchDecoder(t3p, hp, max_batch=args.slots, max_new_tokens=256)
    server = TTSServer(dec, engine)
    server.synthesize_batch(make_requests()[: args.slots],
                            [ref] * args.slots)       # warm compile
    reqs = make_requests()
    t0 = time.perf_counter()
    wavs = []
    for i in range(0, len(reqs), args.slots):
        batch = reqs[i: i + args.slots]
        wavs += server.synthesize_batch(batch, [ref] * len(batch))
    wall_b = time.perf_counter() - t0
    log(f"whole-batch: {wall_b:.2f}s wall "
        f"→ {audio_req / wall_b:.1f}x agg (requested audio)")
    print(f"continuous_agg_xrt={audio_req / wall_c:.2f} "
          f"wholebatch_agg_xrt={audio_req / wall_b:.2f}")


if __name__ == "__main__":
    main()
