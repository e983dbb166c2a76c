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


if __name__ == "__main__":
    main()
