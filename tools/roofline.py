"""Roofline/MFU accounting per pipeline stage on the real TPU.

Answers VERDICT r3 item 4: each stage's achieved throughput vs the bound
that limits it — HBM bandwidth for the weight/KV-bound decode steps, MXU
FLOP/s for the dense prefill/flow/UNet/HiFT programs — plus a measured
decomposition of the batched-vocode knee (B=16 -> 32) into flow vs HiFT
shares.

Method:
  * decode: marginal ms/step from two warm runs at different budgets
    (prefill and relay overhead cancel); bytes/step is analytic (quantized
    weight bytes from the actual param pytree + bf16 KV read at the mean
    decoded position). achieved GB/s vs HBM peak.
  * dense stages (prefill / flow+UNet / HiFT): FLOPs from XLA's own
    cost_analysis() of the exact compiled program; wall time measured with
    the relay sync cost reported separately (a null program round-trip).
    achieved TFLOP/s vs the bf16 MXU peak (fp32 stages are flagged: v5e has
    no fp32 MXU path, XLA decomposes, so their practical peak is ~1/3).
  * knee: B in {16, 32} — batched flow-only and HiFT-only walls next to the
    fused program's wall; the B-scaling share of each.

Peaks (TPU v5e / "v5 lite"): 197 bf16 TFLOP/s, 394 int8 TOP/s, 819 GB/s HBM.

Usage: python tools/roofline.py [--tokens 250] [--knee 16,32]
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
from chatterbox_tpu.models.s3gen.model import (S3GenEngine, s3gen_init,
                                               RefDict, TOKEN_MEL_RATIO)
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.sampling.decode import t3_generate
from chatterbox_tpu.sampling.chunked import t3_prefill
from chatterbox_tpu.utils.dtypes import cast_params
from chatterbox_tpu.utils.quantize import best_serving_mode, quantize_t3_backbone

HBM_GBS = 819.0          # v5e HBM peak
MXU_BF16 = 197e12        # v5e bf16 FLOP/s peak


def log(m):
    print(m, file=sys.stderr)
    sys.stderr.flush()


def tree_bytes(tree):
    """Unique-buffer bytes: the int8_fused layer dicts hold the SAME packed
    arrays twice (raw + precomputed 'fused' operands, shared by reference —
    utils/quantize.py), so dedup by object identity or the weight traffic
    double-counts ~2x."""
    seen, total = set(), 0
    for x in jax.tree.leaves(tree):
        if hasattr(x, "nbytes") and id(x) not in seen:
            seen.add(id(x))
            total += x.nbytes
    return total


def timed(fn, reps=5):
    """fn must FETCH something: on the axon relay block_until_ready is a
    no-op (DESIGN.md), so completion is only observable through a value."""
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def fetch(out):
    """Force completion with a scalar fetch (cheapest sync on the relay)."""
    leaf = jax.tree.leaves(out)[0]
    idx = tuple(0 for _ in leaf.shape)
    return np.asarray(leaf[idx] if idx else leaf)


def flops_of(lowered):
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def cond_for(hp):
    return t3m.T3CondArrays(
        speaker_emb=jnp.zeros((1, 256)),
        cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len),
                                            jnp.int32),
        emotion_adv=(jnp.full((1, 1, 1), 0.5)
                     if hp.backbone.family == "llama" else None))


def decode_stage(name, hp, params, cond, sp, N, cfg_mode, rows):
    """Marginal ms/step + analytic bytes/step -> HBM roofline %."""
    text = jnp.zeros((1, 32), jnp.int32)
    tlen = jnp.asarray(30)
    key = jax.random.key(0)

    def run(n):
        r = t3_generate(params, hp, cond, text, tlen, sp, key,
                        max_new_tokens=n, top_k=1000, cfg_mode=cfg_mode,
                        ignore_eos=True)
        return int(r.n_tokens)

    n_small = max(N // 8, 16)
    log(f"  compiling {name} decode (budgets {n_small}/{N}) ...")
    t_small = timed(lambda: run(n_small))
    t_big = timed(lambda: run(N))
    ms_step = (t_big - t_small) / (N - n_small) * 1e3

    # bytes/step: every weight the step touches + the mean KV read
    cfg = hp.backbone
    w_bytes = tree_bytes(params["backbone"]) + tree_bytes(params["speech_head"])
    st = t3_prefill(params, hp, cond, text, tlen, key,
                    max_new_tokens=N, cfg_mode=cfg_mode)
    pfl = int(st.prefill_len)
    # GQA-aware: KV rows are num_kv_heads wide (== num_heads for the
    # current gpt2/520M-llama configs, but don't overstate a GQA backbone)
    kv_heads = getattr(cfg, "num_kv_heads", None) or cfg.num_heads
    kv_width = cfg.num_layers * 2 * (kv_heads * cfg.head_dim) * 2  # bf16
    kv_bytes = rows * kv_width * (pfl + N / 2)
    total = w_bytes + kv_bytes
    floor_ms = total / (HBM_GBS * 1e9) * 1e3
    print(f"{name}: {ms_step:.3f} ms/step ({1e3 / ms_step:.0f} tok/s) | "
          f"weights {w_bytes / 1e6:.0f} MB + KV {kv_bytes / 1e6:.0f} MB "
          f"(rows={rows}, mean pos {pfl + N // 2}) = {total / 1e6:.0f} MB/step | "
          f"HBM floor {floor_ms:.3f} ms -> {floor_ms / ms_step * 100:.0f}% of "
          f"roofline ({total / (ms_step / 1e3) / 1e9:.0f} GB/s of {HBM_GBS:.0f})",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--knee", default="16,32")
    ap.add_argument("--only", choices=["decode", "vocoder"],
                    help="run just the decode or just the vocoder stages")
    args = ap.parse_args()
    N = args.tokens
    knee = [int(b) for b in args.knee.split(",")]

    # relay overhead: a null program round-trip (dispatch + tiny fetch)
    null = jax.jit(lambda x: x + 1)
    sync_ms = timed(lambda: np.asarray(null(jnp.zeros(()))), reps=10) * 1e3
    print(f"relay null round-trip: {sync_ms:.1f} ms "
          f"(subtract from small dense-stage walls)", flush=True)

    # ---- decode stages (HBM-bound) ------------------------------------
    if args.only == "vocoder":
        vocoder_stages(args, N, knee, sync_ms)
        return
    sp = SamplerParams.make(temperature=0.8, top_p=0.95,
                            repetition_penalty=1.2, cfg_weight=0.0)
    hp_t = T3Config.turbo()
    log("building Turbo (int8 fused) ...")
    pt = cast_params(t3m.t3_init(jax.random.key(0), hp_t), jnp.bfloat16)
    pt = quantize_t3_backbone(pt, mode=best_serving_mode(hp_t.backbone))
    decode_stage("turbo decode int8 B=1", hp_t, pt, cond_for(hp_t), sp,
                 N, cfg_mode=False, rows=1)
    del pt

    hp_e = T3Config.english_only()
    log("building 520M (int8 fused — the shipping config, CFG) ...")
    pe = cast_params(t3m.t3_init(jax.random.key(1), hp_e), jnp.bfloat16)
    pe = quantize_t3_backbone(pe, mode=best_serving_mode(hp_e.backbone))
    sp_cfg = SamplerParams.make(temperature=0.8, top_p=1.0,
                                repetition_penalty=1.2, cfg_weight=0.5,
                                min_p=0.05)
    decode_stage("520M CFG decode int8 B=2", hp_e, pe, cond_for(hp_e),
                 sp_cfg, N, cfg_mode=True, rows=2)

    # ---- prefill (MXU-bound) -------------------------------------------
    text = jnp.zeros((1, 32), jnp.int32)
    tlen = jnp.asarray(30)
    key = jax.random.key(0)
    lowered = t3_prefill.lower(pe, hp_e, cond_for(hp_e), text, tlen, key,
                               max_new_tokens=N, cfg_mode=True)
    fl, _ = flops_of(lowered)
    t = timed(lambda: fetch(
        t3_prefill(pe, hp_e, cond_for(hp_e), text, tlen, key,
                   max_new_tokens=N, cfg_mode=True).cache))
    tc = t - sync_ms / 1e3
    if tc < 2e-3:       # inside relay jitter: compute time unresolvable
        print(f"520M CFG prefill: {t * 1e3:.1f} ms wall <= relay RTT — "
              f"compute ({fl / 1e9:.1f} GFLOP) hidden by the relay; "
              f"MXU% unresolvable this run", flush=True)
    else:
        print(f"520M CFG prefill: {t * 1e3:.1f} ms wall ({tc * 1e3:.1f} "
              f"ex-relay) | {fl / 1e9:.1f} GFLOP -> {fl / tc / 1e12:.1f} "
              f"TFLOP/s = {fl / tc / MXU_BF16 * 100:.0f}% MXU (bf16 peak)",
              flush=True)
    del pe
    if args.only == "decode":
        return
    vocoder_stages(args, N, knee, sync_ms)


def vocoder_stages(args, N, knee, sync_ms):
    # ---- vocoder stages --------------------------------------------------
    log("building S3Gen (meanflow) ...")
    params = s3gen_init(jax.random.key(2), meanflow=True)
    eng = S3GenEngine(params, meanflow=True)
    rng = np.random.default_rng(0)
    P = 125
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * .1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32))
    toks = rng.integers(0, 6561, (N,)).astype(np.int32)

    def flow_args(B):
        from chatterbox_tpu.models.s3gen.model import _bucket, TOKEN_BUCKETS
        total = P + N
        bucket = _bucket(total, TOKEN_BUCKETS)
        token = np.zeros((B, bucket), np.int32)
        token[:, :P] = ref.prompt_token[0, :P]
        token[:, P:total] = toks
        noise = jax.random.normal(jax.random.key(9), (B, bucket * 2, 80))
        feats = np.repeat(ref.prompt_feat, B, 0)
        embs = np.repeat(ref.embedding, B, 0)
        return (eng.params, jnp.asarray(token), jnp.asarray([total] * B),
                jnp.asarray([P] * B), jnp.asarray(feats), jnp.asarray(embs),
                jax.random.key(3), noise), dict(n_timesteps=eng.n_timesteps)

    def hift_mel(B):
        from chatterbox_tpu.models.s3gen.model import _bucket, GEN_MEL_BUCKETS
        T = N * TOKEN_MEL_RATIO
        bucket = _bucket(T, GEN_MEL_BUCKETS)
        return jnp.asarray(
            rng.standard_normal((B, bucket, 80)).astype(np.float32))

    for nm, B in [("flow+UNet(2 evals) B=1 fp32", 1)]:
        a, kw = flow_args(B)
        fl, _ = flops_of(eng._flow.lower(*a, **kw))
        t = timed(lambda: fetch(eng._flow(*a, **kw)))
        tc = max(t - sync_ms / 1e3, 1e-9)
        print(f"{nm}: {t * 1e3:.1f} ms ({tc * 1e3:.1f} ex-relay) | "
              f"{fl / 1e9:.1f} GFLOP -> {fl / tc / 1e12:.1f} TFLOP/s = "
              f"{fl / tc / MXU_BF16 * 100:.0f}% of bf16 peak (fp32 stage: "
              f"practical peak ~1/3)", flush=True)

    mel = hift_mel(1)
    fl, _ = flops_of(eng._hift.lower(eng.params, mel, jax.random.key(4)))
    t = timed(lambda: fetch(eng._hift(eng.params, mel, jax.random.key(4))))
    tc = max(t - sync_ms / 1e3, 1e-9)
    print(f"HiFT B=1 fp32 ({N / 25:.0f}s audio): {t * 1e3:.1f} ms "
          f"({tc * 1e3:.1f} ex-relay) | {fl / 1e9:.1f} GFLOP -> "
          f"{fl / tc / 1e12:.1f} TFLOP/s = {fl / tc / MXU_BF16 * 100:.0f}% of "
          f"bf16 peak (fp32)", flush=True)

    # ---- batched knee decomposition --------------------------------------
    keys = {B: jnp.stack([jax.random.key(i) for i in range(B)]) for B in knee}
    for B in knee:
        a, kw = flow_args(B)
        fl_f, _ = flops_of(eng._flow.lower(*a, **kw))
        t_f = timed(lambda: fetch(eng._flow(*a, **kw)), reps=3)
        mel = hift_mel(B)
        fl_h, _ = flops_of(eng._hift.lower(eng.params, mel, jax.random.key(4)))
        t_h = timed(lambda: fetch(
            eng._hift(eng.params, mel, jax.random.key(4))), reps=3)
        t_all = timed(lambda: eng.inference_batch(
            [toks] * B, [ref] * B, keys[B]), reps=3)
        agg = B * (N / 25.0) / t_all
        print(f"B={B}: fused {t_all * 1e3:7.1f} ms ({agg:6.1f}x agg) | "
              f"flow-only {t_f * 1e3:7.1f} ms "
              f"({fl_f / max(t_f - sync_ms / 1e3, 1e-9) / 1e12:.1f} TF/s, "
              f"{fl_f / max(t_f - sync_ms / 1e3, 1e-9) / MXU_BF16 * 100:.0f}%) | "
              f"hift-only {t_h * 1e3:7.1f} ms "
              f"({fl_h / max(t_h - sync_ms / 1e3, 1e-9) / 1e12:.1f} TF/s, "
              f"{fl_h / max(t_h - sync_ms / 1e3, 1e-9) / MXU_BF16 * 100:.0f}%)",
              flush=True)


if __name__ == "__main__":
    main()
