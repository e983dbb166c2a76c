"""A/B: synced decode→vocode handoff (host n_tokens fetch for bucket
choice) vs the sync-free budget-bucket handoff (buckets pinned to the
token budget; n_tokens rides through as a device scalar).

Full turbo-bench pipeline (GPT2-medium int8 decode, 250 tokens, fused
vocode), both variants interleaved in one process on the real chip.
Usage: python tools/ab_sync.py [N_REPS]
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

from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, RefDict
from chatterbox_tpu.sampling.decode import t3_generate
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.utils.dtypes import cast_params
from chatterbox_tpu.utils.quantize import best_serving_mode, quantize_t3_backbone


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hp = T3Config.turbo()
    k1, k2 = jax.random.split(jax.random.key(0))
    print("building Turbo T3 (int8) ...", file=sys.stderr)
    t3_params = quantize_t3_backbone(
        cast_params(t3m.t3_init(k1, hp), jnp.bfloat16),
        mode=best_serving_mode(hp.backbone))
    print("building S3Gen (meanflow) ...", file=sys.stderr)
    engine = S3GenEngine(s3gen_init(k2, meanflow=True), meanflow=True)

    cond = t3m.T3CondArrays(
        speaker_emb=jnp.zeros((1, 256)),
        cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len),
                                            jnp.int32),
        emotion_adv=None,
    )
    rng = np.random.default_rng(0)
    P = 125
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32),
    )
    N = 250
    text = jnp.zeros((1, 32), jnp.int32)
    sp = SamplerParams.make(temperature=0.8, top_p=0.95,
                            repetition_penalty=1.2, cfg_weight=0.0)

    def run(seed, budget_mode):
        t0 = time.perf_counter()
        res = t3_generate(t3_params, hp, cond, text, jnp.asarray(30), sp,
                          jax.random.key(seed), max_new_tokens=N,
                          top_k=1000, cfg_mode=False, ignore_eos=True)
        n = res.n_tokens if budget_mode else int(res.n_tokens)
        wav, n_gen = engine.inference_from_decode(
            res.tokens, n, ref, jax.random.key(seed + 1000),
            cfg_slice=False, append_sil=0, vocab=hp.speech_tokens_dict_size,
            budget=N if budget_mode else None)
        assert np.isfinite(wav).all() and n_gen == N
        return time.perf_counter() - t0

    print("compiling both variants ...", file=sys.stderr)
    run(0, False)
    run(0, True)
    a, b = [], []
    for i in range(reps):
        a.append(run(2 * i + 1, False))
        b.append(run(2 * i + 2, True))
    fmt = lambda xs: f"min {min(xs)*1e3:7.1f} ms  med {np.median(xs)*1e3:7.1f} ms"
    print(f"synced  handoff: {fmt(a)}   runs {[round(t*1e3) for t in a]}")
    print(f"budget  handoff: {fmt(b)}   runs {[round(t*1e3) for t in b]}")
    print(f"delta (med): {(np.median(a) - np.median(b))*1e3:+.1f} ms  "
          f"xrt {10.0/min(a):.1f} -> {10.0/min(b):.1f}")


if __name__ == "__main__":
    main()
