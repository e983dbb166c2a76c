"""Benchmark: Chatterbox-Turbo realtime factor on one TPU chip.

Measures the full TTS hot path at real model sizes (random-init weights —
identical FLOPs/shapes to the published Turbo 350M checkpoint):
    T3 GPT2-medium decode (prefill 376-token cond + text, then N
    autoregressive steps in one on-device while_loop)
  + S3Gen meanflow flow (2-step CFM over the conformer-encoded tokens)
  + HiFT vocoder (mel → 24 kHz waveform)

Serving configuration: weight-only int8 backbone (utils/quantize.py; <0.5%
weight rounding error, validated in tests/test_quantize.py) with in-place KV
cache updates. Set CHATTERBOX_BENCH_BF16=1 for the plain bf16 path.

xRT = seconds of audio generated per wall-clock second (≥20× is the
BASELINE.md north-star target for Turbo on v5e).

Prints ONE JSON line:
    {"metric": "turbo_xrt", "value": ..., "unit": "x_realtime",
     "vs_baseline": value / 20.0}
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from chatterbox_tpu.models.t3.config import T3Config
    from chatterbox_tpu.models.t3 import model as t3m
    from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, RefDict
    from chatterbox_tpu.sampling.decode import t3_generate
    from chatterbox_tpu.ops.sampling import SamplerParams
    from chatterbox_tpu.utils.dtypes import cast_params

    hp = T3Config.turbo()
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)

    import os
    use_int8 = os.environ.get("CHATTERBOX_BENCH_BF16") != "1"
    print(f"building Turbo T3 (GPT2-medium, int8={use_int8}) ...", file=sys.stderr)
    t3_params = cast_params(t3m.t3_init(k1, hp), jnp.bfloat16)
    if use_int8:
        from chatterbox_tpu.utils.quantize import quantize_t3_backbone
        t3_params = quantize_t3_backbone(t3_params)

    print("building S3Gen (meanflow) ...", file=sys.stderr)
    s3_params = s3gen_init(k2, meanflow=True)
    engine = S3GenEngine(s3_params, meanflow=True)

    # conditioning: 375-token speech prompt (Turbo setting) + 5 s ref mels
    cond = t3m.T3CondArrays(
        speaker_emb=jnp.zeros((1, 256)),
        cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len), jnp.int32),
        emotion_adv=None,
    )
    rng = np.random.default_rng(0)
    P = 125  # 5 s voice prompt for the flow
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32),
    )

    N_TOKENS = 250           # 10 s of speech at 25 tok/s
    text = jnp.zeros((1, 32), jnp.int32)
    sp = SamplerParams.make(temperature=0.8, top_p=0.95, repetition_penalty=1.2,
                            cfg_weight=0.0)

    def t3_step(seed):
        res = t3_generate(t3_params, hp, cond, text, jnp.asarray(30), sp,
                          jax.random.key(seed), max_new_tokens=N_TOKENS,
                          top_k=1000, cfg_mode=False, ignore_eos=True)
        return jax.block_until_ready(res.tokens)

    print("compiling T3 decode ...", file=sys.stderr)
    toks = np.asarray(t3_step(0)) % 6561
    print("compiling S3Gen ...", file=sys.stderr)
    wav = engine.inference(toks[None] if toks.ndim == 1 else toks, ref,
                           jax.random.key(1))

    # ---- timed runs -------------------------------------------------------
    n_runs = 3
    t3_times, s3_times = [], []
    for i in range(n_runs):
        t0 = time.perf_counter()
        toks = np.asarray(t3_step(i + 1)) % 6561
        t1 = time.perf_counter()
        wav = engine.inference(toks[None], ref, jax.random.key(i + 2))
        t2 = time.perf_counter()
        t3_times.append(t1 - t0)
        s3_times.append(t2 - t1)

    t3_t = min(t3_times)
    s3_t = min(s3_times)
    audio_sec = N_TOKENS / 25.0
    xrt = audio_sec / (t3_t + s3_t)
    tok_per_s = N_TOKENS / t3_t

    print(f"T3 decode: {t3_t:.3f}s ({tok_per_s:.1f} tok/s), "
          f"S3Gen: {s3_t:.3f}s, audio {audio_sec:.1f}s → {xrt:.2f}x realtime",
          file=sys.stderr)

    print(json.dumps({
        "metric": "turbo_xrt",
        "value": round(float(xrt), 3),
        "unit": "x_realtime",
        "vs_baseline": round(float(xrt) / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
