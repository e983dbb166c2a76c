"""Speculative continuous serving on the real chip: per-stream decode
speed at LOW occupancy, draft off vs on.

The slot machine's decode rounds are weight-bound at occupancy 1-2 (the
batch doesn't amortize the weight reads), which is exactly where the
int8-self-draft pays: K drafted tokens verified in one bf16 slab forward
emit ~K+1 tokens for ~0.5 + 1/(K+1) of the sequential weight traffic
(decode_chunk_multi_spec). Token streams are byte-identical to draft-off
(token-match acceptance over the row's own key chain —
tests/test_continuous.py::TestSpeculativeDraft), so the speedup is free.

Measures tokens/s per stream at occupancy 1 and 2 with draft off / on and
reports the acceptance-driven speedup. Token-only (no vocode): isolates
the decode rounds the draft accelerates.

Usage: python tools/perf_spec_continuous.py [--tokens 500] [--n-draft 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.sampling.continuous import ContinuousTTSServer
from chatterbox_tpu.serve.batching import TTSRequest
from chatterbox_tpu.utils.dtypes import cast_params


def log(m):
    print(m, file=sys.stderr)
    sys.stderr.flush()


def _make_cond(hp, rng):
    from chatterbox_tpu.api.pipelines import T3CondHost
    return T3CondHost(
        rng.standard_normal((1, 256)).astype(np.float32),
        rng.integers(0, 6561, (1, hp.speech_cond_prompt_len)).astype(np.int32))


def drive(params, hp, cond, *, occupancy, tokens, chunk, draft, n_draft,
          seed0=100):
    srv = ContinuousTTSServer(
        params, hp, n_slots=occupancy, text_bucket=32, max_new_tokens=tokens,
        chunk=chunk, top_k=1000, draft_int8=draft, n_draft=n_draft)
    rng = np.random.default_rng(7)
    reqs = [TTSRequest(
        text_tokens=rng.integers(1, 500, 24).astype(np.int32), cond=cond,
        request_id=i, seed=seed0 + i, max_new=tokens,
        sampler=SamplerParams.make(cfg_weight=0.0)) for i in range(occupancy)]
    # warm the exact programs (admit + round at every walked capacity)
    srv.warmup(cond)
    for r in reqs:
        srv.submit(r)
    t0 = time.perf_counter()
    srv.run_until_idle()
    wall = time.perf_counter() - t0
    n_tok = sum(len(v) for v in srv.results.values())
    return n_tok, wall, {k: np.asarray(v) for k, v in srv.results.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--n-draft", type=int, default=8)
    ap.add_argument("--occupancies", default="1,2")
    args = ap.parse_args()

    hp = T3Config.turbo()
    rng = np.random.default_rng(0)
    log("building Turbo T3 (bf16 target) ...")
    params = cast_params(t3m.t3_init(jax.random.key(0), hp),
                         jax.numpy.bfloat16)
    cond = _make_cond(hp, rng)

    for occ in [int(x) for x in args.occupancies.split(",")]:
        base = {}
        for draft in (False, True):
            tag = f"occ={occ} draft={'on' if draft else 'off'}"
            log(f"[{tag}] compiling + running ...")
            n_tok, wall, toks = drive(
                params, hp, cond, occupancy=occ, tokens=args.tokens,
                chunk=args.chunk, draft=draft, n_draft=args.n_draft)
            # time a second pass fully warm
            n_tok, wall, toks = drive(
                params, hp, cond, occupancy=occ, tokens=args.tokens,
                chunk=args.chunk, draft=draft, n_draft=args.n_draft)
            per_stream = n_tok / wall / occ
            log(f"[{tag}] {n_tok} tok in {wall:.3f}s → "
                f"{n_tok / wall:.0f} tok/s agg, {per_stream:.0f}/stream")
            if not draft:
                base[occ] = (n_tok / wall, toks)
            else:
                speedup = (n_tok / wall) / base[occ][0]
                same = all(np.array_equal(toks[k], base[occ][1][k])
                           for k in toks)
                log(f"[{tag}] speedup ×{speedup:.2f} vs sequential; "
                    f"tokens byte-identical: {same}")
                print(f"occ{occ}: ×{speedup:.2f} "
                      f"({base[occ][0]:.0f} → {n_tok / wall:.0f} tok/s), "
                      f"identical={same}")


if __name__ == "__main__":
    main()
