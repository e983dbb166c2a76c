"""Int8 quality A/B harness: weight-only int8 and int8-KV-cache decode vs
the bf16 reference path, at real model sizes.

Reports, per variant:
  * teacher-forced logit error (max/mean |Δ| over a forced token sequence —
    the pure numeric effect, no sampling feedback), and
  * free-running token divergence (first-divergence step + Hamming fraction
    against the bf16 run with the same RNG key), plus
  * decode throughput (tok/s).

When real checkpoints are available, run this once per variant to make the
quality call measured instead of argued (VERDICT r2: the headline perf
rides on int8 — de-risk it). Random-init weights measure the NUMERIC
divergence of the kernels themselves; real weights add the perceptual call.

Usage: python tools/ab_int8.py [--model turbo|cfg520] [--tokens N]
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
from chatterbox_tpu.models.t3 import backbone as bb
from chatterbox_tpu.sampling.decode import t3_generate
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.utils.dtypes import cast_params


def log(msg):
    print(msg, file=sys.stderr)
    sys.stderr.flush()


def teacher_forced_logits(params, hp, cond, text, n_text, forced, kv_int8):
    """Feed a FORCED token sequence; collect the logits at every step."""
    cfg = hp.backbone
    Lc = t3m.cond_len(hp)
    Ltp = text.shape[1]
    P_pad = Lc + Ltp + 1
    n_steps = forced.shape[0]
    t_max = P_pad + n_steps

    @jax.jit
    def run(params, cond, text, n_text, forced):
        ce = t3m.cond_embeds(params, hp, cond)
        te = jnp.take(params["text_emb"]["w"], text, axis=0)
        bos = t3m.speech_embed_token(
            params, hp, jnp.full((1,), hp.start_speech_token, jnp.int32),
            jnp.zeros((), jnp.int32))
        dt = params["speech_emb"]["w"].dtype
        x = jnp.concatenate([ce.astype(dt), te.astype(dt),
                             jnp.zeros_like(bos, dt)], axis=1)
        x = jax.lax.dynamic_update_slice(x, bos.astype(dt), (0, Lc + n_text, 0))
        prefill_len = Lc + n_text + 1
        cache_cls = bb.KVCacheInt8 if kv_int8 else bb.KVCache
        cache = cache_cls.zeros(cfg, 1, t_max, dtype=jnp.bfloat16)
        mask = bb.prefill_mask(P_pad, t_max, jnp.full((1,), prefill_len))
        pos = jnp.arange(P_pad)[None]
        hidden, cache = bb.backbone_apply_unrolled(
            params["backbone"], cfg, x, pos, cache,
            jnp.zeros((), jnp.int32), mask)
        last_h = jnp.take_along_axis(
            hidden, jnp.full((1, 1, 1), prefill_len - 1), axis=1)[:, 0]
        logits0 = t3m.speech_logits(params, last_h).astype(jnp.float32)

        def body(i, carry):
            cache, logits_acc = carry
            tok = forced[i]
            emb = t3m.speech_embed_token(params, hp, tok[None], i + 1)
            pos_now = prefill_len + i
            cur = jnp.full((1,), pos_now, jnp.int32)
            m = bb.decode_mask(t_max, cur)
            h, cache = bb.backbone_apply_unrolled(
                params["backbone"], cfg, emb, cur[:, None], cache, pos_now, m)
            lg = t3m.speech_logits(params, h[:, 0]).astype(jnp.float32)
            return cache, logits_acc.at[i + 1].set(lg[0])

        # acc[0] = prefill logits (predicting forced[0]); acc[i+1] = logits
        # after feeding forced[i] (predicting forced[i+1])
        acc = jnp.zeros((n_steps, hp.speech_tokens_dict_size), jnp.float32)
        acc = acc.at[0].set(logits0[0])
        _, logits = jax.lax.fori_loop(0, n_steps - 1, body, (cache, acc))
        return logits

    return np.asarray(run(params, cond, text, n_text, forced))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="turbo", choices=["turbo", "cfg520"])
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--variants", default="all",
                    help="comma list of: kv,kv-pallas,w,w+kv,w+kv-pallas "
                         "(bf16 reference always runs)")
    ap.add_argument("--skip-quality", action="store_true",
                    help="skip the teacher-forced logit-error passes "
                         "(throughput only — saves several compiles)")
    args = ap.parse_args()
    want = (None if args.variants == "all"
            else set(args.variants.split(",")))
    sel = lambda name: want is None or name in want

    hp = T3Config.turbo() if args.model == "turbo" else T3Config.english_only()
    cfg_mode = args.model == "cfg520"
    log(f"building {args.model} T3 (bf16 base) ...")
    base = cast_params(t3m.t3_init(jax.random.key(0), hp), jnp.bfloat16)

    cond = t3m.T3CondArrays(
        speaker_emb=jnp.zeros((1, 256)),
        cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len),
                                            jnp.int32),
        emotion_adv=(0.5 * jnp.ones((1, 1, 1)) if cfg_mode else None),
    )
    text = jnp.zeros((1, 32), jnp.int32)
    n_text = jnp.asarray(30)
    sp = (SamplerParams.make(temperature=0.8, top_p=1.0, min_p=0.05,
                             repetition_penalty=1.2, cfg_weight=0.5)
          if cfg_mode else
          SamplerParams.make(temperature=0.8, top_p=0.95,
                             repetition_penalty=1.2, cfg_weight=0.0))

    def gen(params, kv_int8, seed=7, fused_attn=None):
        res = t3_generate(params, hp, cond, text, n_text, sp,
                          jax.random.key(seed), max_new_tokens=args.tokens,
                          top_k=1000, cfg_mode=cfg_mode, ignore_eos=True,
                          kv_int8=kv_int8, fused_attn=fused_attn)
        return np.asarray(res.tokens)

    def timed(params, kv_int8, fused_attn=None):
        t0 = time.perf_counter()
        toks = gen(params, kv_int8, fused_attn=fused_attn)
        return toks, args.tokens / (time.perf_counter() - t0)

    # ---- bf16 reference ---------------------------------------------------
    log("bf16 reference decode (compile + run) ...")
    gen(base, False)
    ref_toks, ref_tps = timed(base, False)

    # teacher-forced logit error needs a single forced stream
    forced = jnp.asarray(ref_toks[: min(args.tokens, 128)])
    ref_logits = None
    if not args.skip_quality:
        log("teacher-forced logits (bf16 cache) ...")
        ref_logits = teacher_forced_logits(base, hp, cond, text, n_text,
                                           forced, kv_int8=False)

    def report(name, toks, tps, logits=None):
        div = np.nonzero(toks != ref_toks)[0]
        first = int(div[0]) if len(div) else -1
        frac = len(div) / len(ref_toks)
        line = (f"{name:16s} {tps:7.1f} tok/s   first-divergence "
                f"{first:5d}   hamming {frac:6.3f}")
        if logits is not None and ref_logits is not None:
            d = np.abs(logits - ref_logits)
            line += (f"   logit |Δ| max {d.max():.4f} mean {d.mean():.6f} "
                     f"(ref |logit| mean {np.abs(ref_logits).mean():.3f})")
        print(line)

    report("bf16", ref_toks, ref_tps)

    # ---- int8 KV cache (bf16 weights) ------------------------------------
    if sel("kv"):
        log("int8-KV decode (compile + run) ...")
        gen(base, True)
        toks, tps = timed(base, True)
        lg = (None if args.skip_quality else teacher_forced_logits(
            base, hp, cond, text, n_text, forced, kv_int8=True))
        report("int8-kv", toks, tps, lg)

    # ---- int8 KV + pallas in-tile-dequant kernel --------------------------
    # (ops/pallas_attention.decode_attention_streamed_int8: int8 tiles
    # streamed at half the bf16 bytes, scales folded into scores/weights —
    # the fusion XLA refuses when the dequant is written as a multiply)
    if sel("kv-pallas"):
        log("int8-KV pallas-kernel decode (compile + run) ...")
        gen(base, True, fused_attn=True)
        toks, tps = timed(base, True, fused_attn=True)
        report("int8-kv-pallas", toks, tps)

    # ---- weight-only int8 (the shipping bench config) ---------------------
    from chatterbox_tpu.utils.quantize import (best_serving_mode,
                                               quantize_t3_backbone)
    qp = quantize_t3_backbone(base, mode=best_serving_mode(hp.backbone))
    if sel("w"):
        log("weight-only int8 decode (compile + run) ...")
        gen(qp, False)
        toks, tps = timed(qp, False)
        lg = (None if args.skip_quality else teacher_forced_logits(
            qp, hp, cond, text, n_text, forced, kv_int8=False))
        report("int8-weights", toks, tps, lg)

    # ---- both -------------------------------------------------------------
    if sel("w+kv"):
        log("int8 weights + int8 KV decode (compile + run) ...")
        gen(qp, True)
        toks, tps = timed(qp, True)
        lg = (None if args.skip_quality else teacher_forced_logits(
            qp, hp, cond, text, n_text, forced, kv_int8=True))
        report("int8-w+kv", toks, tps, lg)

    # ---- both, with the pallas int8-KV kernel -----------------------------
    if sel("w+kv-pallas"):
        log("int8 weights + int8-KV pallas-kernel decode (compile + run) ...")
        gen(qp, True, fused_attn=True)
        toks, tps = timed(qp, True, fused_attn=True)
        report("int8-w+kv-pallas", toks, tps)


if __name__ == "__main__":
    main()
