"""A/B: r2 host-tail vocode path vs r3 fused decode→vocode handoff.

Runs both back-to-back in one process on the real chip (immune to
cross-process contention skew), several reps each, interleaved.
Usage: python tools/ab_handoff.py
"""
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


def main():
    rng = np.random.default_rng(0)
    P = 125
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32),
    )
    print("building S3Gen (meanflow)...", file=sys.stderr)
    engine = S3GenEngine(s3gen_init(jax.random.key(0), meanflow=True),
                         meanflow=True)
    N = 250
    toks = rng.integers(0, 6561, (N,)).astype(np.int32)
    toks_dev = jnp.asarray(np.pad(toks, (0, 0)))

    def host_path(seed):
        t0 = time.perf_counter()
        wav = engine.inference(toks[None], ref, jax.random.key(seed))
        assert np.isfinite(wav).all()
        return time.perf_counter() - t0

    def handoff_path(seed):
        t0 = time.perf_counter()
        wav, n_gen = engine.inference_from_decode(
            toks_dev, N, ref, jax.random.key(seed),
            cfg_slice=False, append_sil=0, vocab=6561)
        assert np.isfinite(wav).all()
        return time.perf_counter() - t0

    print("compiling both paths...", file=sys.stderr)
    host_path(0); handoff_path(0)
    a, b = [], []
    for i in range(8):
        a.append(host_path(i + 1))
        b.append(handoff_path(i + 1))
    print(f"host-tail  : min {min(a)*1e3:.1f} ms  med {np.median(a)*1e3:.1f} ms  {a}")
    print(f"handoff    : min {min(b)*1e3:.1f} ms  med {np.median(b)*1e3:.1f} ms  {b}")


def ab_enc_dtype():
    """A/B: fp32 vs bf16 flow-encoder weights on the fused vocode path."""
    rng = np.random.default_rng(0)
    P = 125
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32),
    )
    print("building S3Gen (meanflow) once, two engines share params...",
          file=sys.stderr)
    params = s3gen_init(jax.random.key(0), meanflow=True)
    e32 = S3GenEngine(params, meanflow=True)
    e16 = S3GenEngine(params, meanflow=True, enc_dtype=jnp.bfloat16)
    N = 250
    toks = rng.integers(0, 6561, (N,)).astype(np.int32)
    toks_dev = jnp.asarray(toks)

    def run(engine, seed):
        t0 = time.perf_counter()
        wav, _ = engine.inference_from_decode(
            toks_dev, N, ref, jax.random.key(seed),
            cfg_slice=False, append_sil=0, vocab=6561)
        assert np.isfinite(wav).all()
        return time.perf_counter() - t0, wav

    print("compiling...", file=sys.stderr)
    run(e32, 0); run(e16, 0)
    a, b = [], []
    for i in range(6):
        a.append(run(e32, i + 1)[0])
        b.append(run(e16, i + 1)[0])
    _, w32 = run(e32, 99)
    _, w16 = run(e16, 99)
    d = np.abs(w32.astype(np.float64) - w16.astype(np.float64))
    print(f"enc fp32 : min {min(a)*1e3:.1f} ms  med {np.median(a)*1e3:.1f} ms")
    print(f"enc bf16 : min {min(b)*1e3:.1f} ms  med {np.median(b)*1e3:.1f} ms")
    print(f"waveform |d| max {d.max():.4f} rms {np.sqrt((d**2).mean()):.5f} "
          f"(signal rms {np.sqrt((w32.astype(np.float64)**2).mean()):.4f})")

if __name__ == "__main__":
    if "--enc-dtype" in sys.argv:
        ab_enc_dtype()
    else:
        main()
