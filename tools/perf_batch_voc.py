"""Batched-vocode dtype A/B: fp32 vs bf16 CFM/encoder at serving batch sizes.

The r2/r3 single-stream dtype A/Bs were null (DESIGN.md): the relay wall
(~80 ms) hides the ~21 ms of vocode compute, so halving weight/activation
width showed nothing. At B=16/32 the compute scales with B while the relay
dispatch+fetch cost stays fixed — if the fp32 UNet/encoder are the batched
bottleneck (batch16/32_xrt are vocoder-dominated, README), bf16 should now
show. Measures the fused batched program (S3GenEngine.inference_batch) wall
per batch size and dtype, plus the max waveform deviation bf16 introduces.

Usage: python tools/perf_batch_voc.py [--tokens 250] [--batches 4,8,16,32]
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

from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, RefDict


def log(m):
    print(m, file=sys.stderr)
    sys.stderr.flush()


def timed(fn, reps=3):
    fn()                                   # compile / warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--batches", default="4,8,16,32")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    rng = np.random.default_rng(0)
    P = 125
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32))
    log("building S3Gen (meanflow) ...")
    params = s3gen_init(jax.random.key(2), meanflow=True)
    engines = {
        "fp32": S3GenEngine(params, meanflow=True),
        "bf16": S3GenEngine(params, meanflow=True,
                            cfm_dtype=jnp.bfloat16, enc_dtype=jnp.bfloat16),
    }
    g = args.tokens
    audio_s = g / 25.0

    base_wavs = {}
    for B in batches:
        rows = [rng.integers(0, 6561, (g,)).astype(np.int32)] * B
        keys = jnp.stack([jax.random.key(i) for i in range(B)])
        for name, eng in engines.items():
            # fetch included: the serving loop pays it too (int16 PCM)
            t = timed(lambda e=eng: e.inference_batch(rows, [ref] * B, keys))
            agg = B * audio_s / t
            print(f"B={B:3d} {name}: {t * 1e3:7.1f} ms "
                  f"→ {agg:7.1f}x agg ({B * audio_s:.0f} s audio)",
                  flush=True)
            if name == "fp32":
                base_wavs[B] = engines["fp32"].inference_batch(
                    rows, [ref] * B, keys)
            else:
                w16 = eng.inference_batch(rows, [ref] * B, keys)
                d = max(float(np.max(np.abs(a - b)))
                        for a, b in zip(base_wavs[B], w16))
                rms = float(np.sqrt(np.mean(
                    np.concatenate(base_wavs[B]) ** 2)))
                print(f"        bf16 max|Δwav| {d:.4f} (fp32 rms {rms:.4f})",
                      flush=True)


if __name__ == "__main__":
    main()
