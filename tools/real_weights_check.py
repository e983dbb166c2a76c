"""P0 runbook: validate the framework against the REAL published checkpoints.

This image has no network, so the standing P0 (convert the actual
`ResembleAI/chatterbox*` weights and check quality) cannot run here. This
script makes it ONE COMMAND the moment checkpoints are reachable — each
stage runs independently and reports PASS / FAIL / SKIP(reason):

  1. convert      — load every family through convert/weights.py
  2. t3-parity    — teacher-forced logits: converted JAX T3 vs the
                    reference's own torch T3 running the SAME real weights
                    (reference imported module-by-module, tests/ref_loader.py
                    style, so its heavy optional deps aren't needed)
  3. int8-ab      — tools/ab_int8.py-style logit error of the int8 serving
                    configs on the real weights
  4. spec-accept  — the real Turbo/Nano pair's speculative acceptance α
                    (needs --nano-dir); v5e break-even is α=0.86, so this
                    one number decides whether the Nano draft ships as the
                    default serving config (DESIGN.md round-4 verdict)
  5. synth        — one wav per pipeline into --out (listen + watermark
                    detect check)

Usage:
  python tools/real_weights_check.py --ckpt-dir /path/to/ckpts [--out /tmp/wavs]
  python tools/real_weights_check.py --download   # needs network + HF access
"""
import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np


def stage(name):
    def deco(fn):
        def run(*a, **kw):
            try:
                out = fn(*a, **kw)
                print(f"[PASS] {name}" + (f" — {out}" if out else ""))
                return True
            except SkipStage as e:
                print(f"[SKIP] {name} — {e}")
                return None
            except Exception:
                print(f"[FAIL] {name}")
                traceback.print_exc()
                return False
        return run
    return deco


class SkipStage(Exception):
    pass


def _ckpt_dir(args):
    if args.ckpt_dir:
        return args.ckpt_dir
    if args.download:
        from chatterbox_tpu.convert.weights import download_repo
        return download_repo("ResembleAI/chatterbox", None)
    raise SkipStage("no --ckpt-dir and no --download")


@stage("s3tok dry-map: name-map coverage on the real s3gen.safetensors")
def check_s3tok_drymap(args):
    """Run BEFORE any conversion: given only the checkpoint's key
    inventory, report how the S3TokenizerV2 name map lands — the encoder
    here is reconstructed from the pip package's architecture (named P0
    risk, DESIGN.md), and this stage turns a layout mismatch into an
    actionable diff instead of a KeyError mid-convert."""
    from pathlib import Path
    from safetensors import safe_open
    from chatterbox_tpu.convert.weights import dry_map_s3tokenizer
    d = Path(_ckpt_dir(args))
    f = next((d / n for n in ("s3gen.safetensors", "s3gen.pt")
              if (d / n).exists()), None)
    if f is None:
        raise SkipStage("no s3gen checkpoint file in ckpt dir")
    if f.suffix == ".safetensors":
        with safe_open(str(f), framework="numpy") as sf:
            keys = list(sf.keys())
    else:
        from chatterbox_tpu.convert.weights import load_torch_pt
        keys = list(load_torch_pt(f).keys())
    rep = dry_map_s3tokenizer(keys)
    msg = (f"{rep['n_layers']} layers, {len(rep['mapped'])} mapped, "
           f"{len(rep['unmapped'])} unmapped, {len(rep['missing'])} missing")
    if rep["unmapped"] or rep["missing"]:
        raise RuntimeError(
            f"{msg}; unmapped={rep['unmapped'][:12]} "
            f"missing={rep['missing'][:12]} — extend "
            f"convert_s3tokenizer's name map from this diff")
    return msg


@stage("convert: english 520M")
def check_convert_english(args):
    from chatterbox_tpu.api.pipelines import ChatterboxTTS
    args._english = ChatterboxTTS.from_local(_ckpt_dir(args))
    return "loaded"


@stage("convert: turbo")
def check_convert_turbo(args):
    from chatterbox_tpu.api.pipelines import ChatterboxTurboTTS
    d = args.turbo_dir or _ckpt_dir(args)
    args._turbo = ChatterboxTurboTTS.from_local(d)
    return "loaded"


@stage("convert: nano")
def check_convert_nano(args):
    from chatterbox_tpu.api.pipelines import ChatterboxTurboTTS
    if not args.nano_dir:
        raise SkipStage("pass --nano-dir to run the spec-accept stage")
    args._nano = ChatterboxTurboTTS.from_local(args.nano_dir, nano=True)
    return "loaded"


@stage("t3-parity: teacher-forced logits vs torch reference")
def check_t3_parity(args):
    """Runs the reference's own torch T3 with the real weights and compares
    teacher-forced logits step-by-step with the converted JAX params."""
    if not hasattr(args, "_english") or args._english is None:
        raise SkipStage("english pipeline did not load")
    import torch
    import jax.numpy as jnp
    from ref_loader import load_ref_module
    from chatterbox_tpu.models.t3 import model as t3m
    import jax

    # same mechanism as tests/test_convert.py::test_teacher_forced_parity,
    # pointed at the REAL checkpoint instead of random init
    t3_mod = load_ref_module("chatterbox.models.t3.t3")
    ref_t3 = t3_mod.T3()                       # default = english 520M config
    from safetensors.torch import load_file
    sd = load_file(os.path.join(_ckpt_dir(args), "t3_cfg.safetensors"))
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    ref_t3.load_state_dict(sd)
    ref_t3.eval()

    pipe = args._english
    hp = pipe.hp
    rng = np.random.default_rng(0)
    text = np.concatenate([[hp.start_text_token],
                           rng.integers(10, 200, 12),
                           [hp.stop_text_token]]).astype(np.int64)
    speech = np.concatenate([[hp.start_speech_token],
                             rng.integers(0, 6561, 24)]).astype(np.int64)
    spk = rng.standard_normal((1, 256)).astype(np.float32)
    prompt = rng.integers(0, 6561,
                          (1, hp.speech_cond_prompt_len)).astype(np.int64)

    T3Cond = load_ref_module("chatterbox.models.t3.modules.cond_enc").T3Cond
    cond_t = T3Cond(speaker_emb=torch.tensor(spk),
                    cond_prompt_speech_tokens=torch.tensor(prompt),
                    emotion_adv=0.5 * torch.ones(1, 1, 1))
    with torch.inference_mode():
        out = ref_t3.forward(
            t3_cond=cond_t, text_tokens=torch.tensor(text[None]),
            text_token_lens=torch.tensor([len(text)]),
            speech_tokens=torch.tensor(speech[None]),
            speech_token_lens=torch.tensor([len(speech)]), training=True)

    cond_j = t3m.T3CondArrays(
        speaker_emb=jnp.asarray(spk),
        cond_prompt_speech_tokens=jnp.asarray(prompt.astype(np.int32)),
        emotion_adv=0.5 * jnp.ones((1, 1, 1)))
    tl, sl = t3m.t3_forward(pipe.t3_params, hp, cond_j,
                            jnp.asarray(text[None].astype(np.int32)),
                            jnp.asarray(speech[None].astype(np.int32)))
    ds = float(np.max(np.abs(np.asarray(sl) - out.speech_logits.numpy())))
    dt = float(np.max(np.abs(np.asarray(tl) - out.text_logits.numpy())))
    assert max(ds, dt) < 5e-2, f"logit mismatch: speech {ds:.4f} text {dt:.4f}"
    return f"teacher-forced logits max |Δ|: speech {ds:.5f}, text {dt:.5f}"


@stage("int8-ab: quantized logit error on real weights")
def check_int8(args):
    if not hasattr(args, "_turbo") or args._turbo is None:
        raise SkipStage("turbo pipeline did not load")
    import jax
    import jax.numpy as jnp
    from chatterbox_tpu.utils.quantize import (best_serving_mode,
                                               quantize_t3_backbone)
    from chatterbox_tpu.sampling.decode import t3_generate
    from chatterbox_tpu.ops.sampling import SamplerParams
    pipe = args._turbo
    qp = quantize_t3_backbone(pipe.t3_params,
                              mode=best_serving_mode(pipe.hp.backbone))
    cond = pipe.conds.t3.as_arrays() if pipe.conds else None
    if cond is None:
        raise SkipStage("no built-in conds.pt voice to condition on")
    text = jnp.zeros((1, 32), jnp.int32)
    sp = SamplerParams.make(temperature=1e-4, top_p=1.0,
                            repetition_penalty=1.0, cfg_weight=0.0)
    a = t3_generate(pipe.t3_params, pipe.hp, cond, text, jnp.asarray(30), sp,
                    jax.random.key(0), max_new_tokens=64, top_k=0,
                    cfg_mode=False, ignore_eos=True)
    b = t3_generate(qp, pipe.hp, cond, text, jnp.asarray(30), sp,
                    jax.random.key(0), max_new_tokens=64, top_k=0,
                    cfg_mode=False, ignore_eos=True)
    same = float(np.mean(np.asarray(a.tokens) == np.asarray(b.tokens)))
    return f"near-greedy token agreement bf16-vs-int8: {same:.3f} (want ≥0.95)"


@stage("spec-accept: real Turbo/Nano draft acceptance (ship-or-kill input)")
def check_spec_acceptance(args):
    """Measures the ONE number the r4 speculative verdict is pending on:
    the real checkpoint pair's acceptance rate α. Break-even on v5e is
    α=0.86 at K=4/8 (DESIGN.md round-4 table) — at or above that the Nano
    draft becomes the default Turbo serving config; below it stays off."""
    if getattr(args, "_turbo", None) is None:
        raise SkipStage("turbo pipeline did not load")
    if getattr(args, "_nano", None) is None:
        raise SkipStage("nano pipeline did not load (--nano-dir/--download)")
    import jax
    import jax.numpy as jnp
    from chatterbox_tpu.ops.sampling import SamplerParams
    from chatterbox_tpu.sampling.speculative import t3_generate_speculative
    t, d = args._turbo, args._nano
    if t.conds is None or d.conds is None:
        raise SkipStage("no built-in conds.pt voice to condition on")
    sp = SamplerParams.make(temperature=0.8, top_p=0.95,
                            repetition_penalty=1.2, cfg_weight=0.0)
    # Real prompts, multiple seeds: a single degenerate prompt (e.g. token-0
    # repeats) can drive both models into correlated degenerate continuations
    # and distort the ship-or-kill α (ADVICE r4). Average over sentences and
    # seeds before acting on the 0.86 break-even.
    import numpy as _np
    from chatterbox_tpu.sampling.decode import text_bucket
    sentences = [
        "The quick brown fox jumps over the lazy dog.",
        "Speech synthesis quality depends on both the model and the voice.",
        "It was a bright cold day in April, and the clocks were striking.",
    ]
    n_acc = n_drafted = 0
    for sent in sentences:
        ids = _np.asarray(t.tokenizer.text_to_tokens(sent)).reshape(-1)
        bucket = text_bucket(len(ids))
        text = _np.zeros((1, bucket), _np.int32)
        text[0, : len(ids)] = ids
        for seed in (0, 1):
            res = t3_generate_speculative(
                t.t3_params, d.t3_params, t.hp, d.hp,
                t.conds.t3.as_arrays(), d.conds.t3.as_arrays(),
                jnp.asarray(text), jnp.asarray(len(ids)), sp,
                jax.random.key(seed), max_new_tokens=250, n_draft=4,
                top_k=1000)
            n_acc += int(res.n_accepted)
            n_drafted += int(res.n_drafted)
    alpha = n_acc / max(n_drafted, 1)
    verdict = ("SHIP as default (>= 0.86 break-even)" if alpha >= 0.86
               else "keep opt-in (< 0.86 break-even)")
    return (f"α_obs={alpha:.3f} over {n_drafted} drafts "
            f"({len(sentences)} sentences x 2 seeds) → {verdict}")


@stage("synth: one wav per pipeline + watermark detect")
def check_synth(args):
    from chatterbox_tpu.utils.audio_io import save_wav
    from chatterbox_tpu.utils.watermark import SpreadSpectrumWatermarker
    os.makedirs(args.out, exist_ok=True)
    made = []
    for name in ["_english", "_turbo"]:
        pipe = getattr(args, name, None)
        if pipe is None or pipe.conds is None:
            continue
        wav = pipe.generate("The quick brown fox jumps over the lazy dog.")
        path = os.path.join(args.out, f"{name[1:]}.wav")
        save_wav(path, np.asarray(wav)[0], 24000)
        z = SpreadSpectrumWatermarker().get_watermark(
            np.asarray(wav)[0], sample_rate=24000)
        made.append(f"{path} (wm={z})")
    if not made:
        raise SkipStage("no pipeline with a built-in voice loaded")
    return "; ".join(made)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default=None,
                    help="directory with the English-family checkpoint files")
    ap.add_argument("--turbo-dir", default=None,
                    help="directory with the Turbo checkpoint files")
    ap.add_argument("--nano-dir", default=None,
                    help="directory with the Nano checkpoint files "
                         "(enables the spec-accept stage)")
    ap.add_argument("--download", action="store_true",
                    help="fetch from HF (needs network)")
    ap.add_argument("--out", default="/tmp/real_weights_wavs")
    args = ap.parse_args()
    args._english = args._turbo = args._nano = None

    check_s3tok_drymap(args)
    check_convert_english(args)
    check_convert_turbo(args)
    check_convert_nano(args)
    check_t3_parity(args)
    check_int8(args)
    check_spec_acceptance(args)
    check_synth(args)


if __name__ == "__main__":
    main()
