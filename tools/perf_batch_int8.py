"""Batched int8-KV decode A/B on the TPU: bucketed bf16-KV (the shipping
serving path) vs bucketed int8-KV (pallas streamed-int8 kernel with the
per-row left-pad lower bound) at the serving operating point (B=8,
1000-token budget).

Rationale: at B=8 the per-step attention reads are B× the KV bytes while
the weights amortize, so the cache is the dominant HBM read of the batched
step (DESIGN.md r2 trace; bucketing alone bought +25 %). int8 tiles halve
those bytes. Single-stream the same kernel measured +20 % at the 900-token
budget (tools/ab_int8.py).

Usage: python tools/perf_batch_int8.py [--batch 8] [--tokens 1000] [--reps 3]
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
from chatterbox_tpu.sampling.batched import (t3_generate_batched,
                                             t3_generate_batched_bucketed)
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.utils.dtypes import cast_params


def log(msg):
    print(msg, file=sys.stderr)
    sys.stderr.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--model", default="turbo", choices=["turbo", "cfg520"])
    ap.add_argument("--variants", default="all",
                    help="comma list of: bf16,int8,oneshot (split across "
                         "processes to stay inside a time budget — the "
                         "persistent compile cache carries the XLA work)")
    args = ap.parse_args()
    want = (None if args.variants == "all"
            else set(args.variants.split(",")))
    sel = lambda name: want is None or name in want
    B, N = args.batch, args.tokens

    hp = T3Config.turbo() if args.model == "turbo" else T3Config.english_only()
    cfg_mode = args.model == "cfg520"
    log(f"building {args.model} T3 (int8 fused weights) ...")
    base = cast_params(t3m.t3_init(jax.random.key(0), hp), jnp.bfloat16)
    from chatterbox_tpu.utils.quantize import (best_serving_mode,
                                               quantize_t3_backbone)
    params = quantize_t3_backbone(base, mode=best_serving_mode(hp.backbone))

    cond = t3m.T3CondArrays(
        speaker_emb=jnp.zeros((B, 256)),
        cond_prompt_speech_tokens=jnp.zeros((B, hp.speech_cond_prompt_len),
                                            jnp.int32),
        emotion_adv=(0.5 * jnp.ones((B, 1, 1)) if cfg_mode else None),
    )
    text = jnp.zeros((B, 32), jnp.int32)
    lens = jnp.full((B,), 30, jnp.int32)
    sp = (SamplerParams.make(temperature=0.8, top_p=1.0, min_p=0.05,
                             repetition_penalty=1.2, cfg_weight=0.5)
          if cfg_mode else
          SamplerParams.make(temperature=0.8, top_p=0.95,
                             repetition_penalty=1.2, cfg_weight=0.0))
    keys = jax.random.split(jax.random.key(11), B)

    def run(fn, kv_int8):
        res = fn(params, hp, cond, text, lens, sp, keys,
                 max_new_tokens=N, top_k=1000, cfg_mode=cfg_mode,
                 ignore_eos=True, kv_int8=kv_int8)
        np.asarray(res.tokens)       # fetch = sync (relay: block_until_ready
        return res                   # is a no-op)

    def timed(name, fn, kv_int8):
        run(fn, kv_int8)             # compile + warm
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run(fn, kv_int8)
            best = min(best, time.perf_counter() - t0)
        agg = B * N / best
        print(f"{name:24s} {best:7.3f} s   {agg:8.0f} agg tok/s")
        return agg

    ref = new = None
    if sel("bf16"):
        log("bucketed bf16-KV (shipping serving path) ...")
        ref = timed("bucketed-bf16", t3_generate_batched_bucketed, False)
    if sel("int8"):
        log("bucketed int8-KV (pallas lower-bound kernel) ...")
        new = timed("bucketed-int8kv", t3_generate_batched_bucketed, True)
    if sel("oneshot"):
        log("one-shot int8-KV (no cache growth) ...")
        timed("oneshot-int8kv", t3_generate_batched, True)
    if ref and new:
        print(f"int8-KV vs bf16 bucketed: {new / ref - 1:+.1%}")


if __name__ == "__main__":
    main()
