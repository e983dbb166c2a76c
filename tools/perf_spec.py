"""Speculative decode perf: measure the round cost at real Turbo/Nano sizes
and project the acceptance curve.

With random-init weights the draft/target ACCEPTANCE is meaningless (two
disagreeing random models ⇒ α≈0), but the ROUND COST is exactly the real
one: K+1 Nano draft steps + one Turbo (K+1)-token verify + the accept math.
So this harness measures:

  * sequential Turbo decode tok/s (the shipping engine, int8-fused), and
  * speculative round time per K,

then reports projected tok/s over α ∈ {0.5..0.95} using
E[tokens/round] = (1 - α^(K+1)) / (1 - α) and the break-even α. When real
checkpoints are available, `--self-draft` sanity (α≈1) and the real pair's
observed acceptance (SpecResult.n_accepted/n_drafted) turn the projection
into a measurement with one run.

`--quant-draft int8|int4` makes the draft the TARGET'S OWN quantized
weights (target stays bf16): the draft/target disagreement is then exactly
the quantization perturbation — the same kind real checkpoints see — so the
OBSERVED acceptance is meaningful on random weights, unlike the independent
Nano draft. The draft step costs a full-size (quantized) forward, so this
also directly measures the "bf16 quality at int8-ish speed" deployment:
worthwhile iff tok/s beats BOTH the sequential bf16 target and the plain
int8 engine.

Usage: python tools/perf_spec.py [--tokens 250] [--k 2 4 8]
       [--self-draft | --quant-draft int8]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.sampling.decode import t3_generate
from chatterbox_tpu.sampling.speculative import t3_generate_speculative
from chatterbox_tpu.utils.dtypes import cast_params
from chatterbox_tpu.utils.quantize import best_serving_mode, quantize_t3_backbone


def build(hp, key, int8=True):
    p = cast_params(t3m.t3_init(key, hp), jnp.bfloat16)
    if int8:
        p = quantize_t3_backbone(p, mode=best_serving_mode(hp.backbone))
    return p


def cond_for(hp):
    return t3m.T3CondArrays(
        speaker_emb=jnp.zeros((1, 256)),
        cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len),
                                            jnp.int32),
        emotion_adv=None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--k", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--self-draft", action="store_true",
                    help="draft := target params (α≈1 sanity; doubles draft cost)")
    ap.add_argument("--quant-draft", choices=["int8", "int4"],
                    help="draft := the target's own weights quantized to this "
                         "mode, target stays bf16 — a CORRELATED draft whose "
                         "acceptance is measurable on random weights (the "
                         "quantization error is the same perturbation real "
                         "checkpoints would see), at the cost of a full-size "
                         "draft step")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    hp_t, hp_d = T3Config.turbo(), T3Config.nano()
    if args.quant_draft:
        print(f"building Turbo bf16 target + {args.quant_draft}-quantized "
              "self-draft ...", file=sys.stderr)
        params_t = build(hp_t, jax.random.key(0), int8=False)
        params_d = quantize_t3_backbone(
            params_t, mode=("int8_fused" if args.quant_draft == "int8"
                            else "int4_fused"))
        hp_d = hp_t
    else:
        print(f"building Turbo target + Nano draft (int8={not args.bf16}) ...",
              file=sys.stderr)
        params_t = build(hp_t, jax.random.key(0), int8=not args.bf16)
        params_d = (params_t if args.self_draft
                    else build(hp_d, jax.random.key(1), int8=not args.bf16))
        hp_d = hp_t if args.self_draft else hp_d
    cond_t, cond_d = cond_for(hp_t), cond_for(hp_d)
    text = jnp.zeros((1, 32), jnp.int32)
    tlen = jnp.asarray(30)
    sp = SamplerParams.make(temperature=0.8, top_p=0.95,
                            repetition_penalty=1.2, cfg_weight=0.0)
    N = args.tokens

    def seq_run(seed):
        t0 = time.perf_counter()
        r = t3_generate(params_t, hp_t, cond_t, text, tlen, sp,
                        jax.random.key(seed), max_new_tokens=N, top_k=1000,
                        cfg_mode=False, ignore_eos=True)
        n = int(r.n_tokens)              # fetch forces completion (axon)
        return n / (time.perf_counter() - t0)

    print("compiling sequential ...", file=sys.stderr)
    seq_run(0)
    seq_tok_s = max(seq_run(i + 1) for i in range(3))
    print(f"sequential Turbo: {seq_tok_s:.0f} tok/s", file=sys.stderr)

    for K in args.k:
        def spec_run(seed):
            t0 = time.perf_counter()
            r = t3_generate_speculative(
                params_t, params_d, hp_t, hp_d, cond_t, cond_d, text, tlen,
                sp, jax.random.key(seed), max_new_tokens=N, n_draft=K,
                top_k=1000, ignore_eos=True)
            n = int(r.n_tokens)
            dt = time.perf_counter() - t0
            return n / dt, int(r.n_rounds), int(r.n_accepted), int(r.n_drafted), dt

        print(f"compiling speculative K={K} ...", file=sys.stderr)
        spec_run(0)
        best = max((spec_run(i + 1) for i in range(3)), key=lambda x: x[0])
        tok_s, rounds, acc, drafted, dt = best
        round_ms = dt / max(rounds, 1) * 1e3
        alpha_obs = acc / max(drafted, 1)
        e_emit = lambda a: (1 - a ** (K + 1)) / (1 - a) if a < 1 else K + 1
        proj = {a: e_emit(a) / (round_ms / 1e3) for a in
                (0.5, 0.7, 0.8, 0.9, 0.95)}
        # break-even: E[emit](α) / round_time == seq_tok_s
        need = seq_tok_s * round_ms / 1e3
        lo, hi = 0.0, 1.0
        for _ in range(40):
            mid = (lo + hi) / 2
            lo, hi = (mid, hi) if e_emit(mid) < need else (lo, mid)
        print(f"K={K}: measured {tok_s:.0f} tok/s at α_obs={alpha_obs:.2f} "
              f"({rounds} rounds, {round_ms:.2f} ms/round)")
        print(f"      projected tok/s: " + "  ".join(
            f"α={a}: {v:.0f}" for a, v in proj.items()))
        print(f"      break-even α = {min(hi, 1.0):.2f} "
              f"(E[emit] needed {need:.2f} of {K + 1})")


if __name__ == "__main__":
    main()
