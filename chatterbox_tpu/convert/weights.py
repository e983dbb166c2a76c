"""Checkpoint conversion: reference torch safetensors → chatterbox_tpu pytrees.

Converts the exact checkpoint files the reference publishes
(ref loading code: tts.py:128-165, tts_turbo.py:136-189, mtl_tts.py:182-225,
vc.py:38-59):
    ve.safetensors / ve.pt        → VoiceEncoder params
    t3_cfg.safetensors (+variants)→ T3 params (llama or gpt2 family)
    s3gen{,_meanflow}.safetensors → S3Gen params (tokenizer / CAMPPlus /
                                    flow / HiFT)
    conds.pt                      → built-in voice Conditionals

Transform conventions (matching nn/core.py layouts):
    torch Linear (out,in)           → w (in,out) [transpose]
    GPT-2 Conv1D (in,out)           → w as-is
    torch Conv1d (out,in,k)         → w (k,in,out) [permute]
    torch ConvTranspose1d (in,out,k)→ w (k,in,out) flipped on k
    torch Conv2d (out,in,kh,kw)     → w (kh,kw,in,out)
    weight-norm (g,v) pairs         → folded: w = g * v/||v||  (per out-chan)
    LSTM weight_ih/hh (4H,in)       → (in,4H) [transpose]
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _get(sd, key):
    if key not in sd:
        raise KeyError(f"missing checkpoint key: {key}")
    return np.asarray(sd[key])


def lin(sd, p, bias=True):
    out = {"w": _get(sd, f"{p}.weight").T}
    if bias and f"{p}.bias" in sd:
        out["b"] = _get(sd, f"{p}.bias")
    return out


def lin_conv1d_gpt2(sd, p):
    # HF GPT-2 Conv1D keeps (in, out) orientation already
    return {"w": _get(sd, f"{p}.weight"), "b": _get(sd, f"{p}.bias")}


def ln(sd, p):
    return {"g": _get(sd, f"{p}.weight"), "b": _get(sd, f"{p}.bias")}


def rms(sd, p):
    return {"g": _get(sd, f"{p}.weight")}


def emb(sd, p):
    return {"w": _get(sd, f"{p}.weight")}


def bn(sd, p):
    out = {"mean": _get(sd, f"{p}.running_mean"), "var": _get(sd, f"{p}.running_var")}
    if f"{p}.weight" in sd:
        out["g"] = _get(sd, f"{p}.weight")
        out["b"] = _get(sd, f"{p}.bias")
    else:  # affine=False
        out["g"] = np.ones_like(out["mean"])
        out["b"] = np.zeros_like(out["mean"])
    return out


def _raw_conv_weight(sd, p):
    """Plain or weight-normed conv weight (both parametrization styles)."""
    if f"{p}.weight" in sd:
        return _get(sd, f"{p}.weight")
    if f"{p}.parametrizations.weight.original0" in sd:
        g = _get(sd, f"{p}.parametrizations.weight.original0")
        v = _get(sd, f"{p}.parametrizations.weight.original1")
    elif f"{p}.weight_g" in sd:
        g = _get(sd, f"{p}.weight_g")
        v = _get(sd, f"{p}.weight_v")
    else:
        raise KeyError(f"no conv weight found under {p}")
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def conv1d(sd, p, bias=True):
    out = {"w": _raw_conv_weight(sd, p).transpose(2, 1, 0)}
    if bias and f"{p}.bias" in sd:
        out["b"] = _get(sd, f"{p}.bias")
    return out


def conv_t1d(sd, p):
    w = _raw_conv_weight(sd, p)          # (in, out, k)
    return {"w": w[:, :, ::-1].transpose(2, 0, 1).copy(),
            "b": _get(sd, f"{p}.bias")}


def conv2d(sd, p, bias=True):
    out = {"w": _get(sd, f"{p}.weight").transpose(2, 3, 1, 0)}
    if bias and f"{p}.bias" in sd:
        out["b"] = _get(sd, f"{p}.bias")
    return out


def lstm(sd, p, num_layers):
    layers = []
    for i in range(num_layers):
        layers.append({
            "w_ih": _get(sd, f"{p}.weight_ih_l{i}").T,
            "w_hh": _get(sd, f"{p}.weight_hh_l{i}").T,
            "b_ih": _get(sd, f"{p}.bias_ih_l{i}"),
            "b_hh": _get(sd, f"{p}.bias_hh_l{i}"),
        })
    return {"layers": layers}


def _count(sd, pattern_fn):
    n = 0
    while any(k.startswith(pattern_fn(n)) for k in sd):
        n += 1
    return n


# ---------------------------------------------------------------------------
# VoiceEncoder (ref: voice_encoder.py:119-133)
# ---------------------------------------------------------------------------

def convert_voice_encoder(sd) -> dict:
    return {
        "lstm": lstm(sd, "lstm", 3),
        "proj": lin(sd, "proj"),
        "similarity_weight": _get(sd, "similarity_weight"),
        "similarity_bias": _get(sd, "similarity_bias"),
    }


# ---------------------------------------------------------------------------
# T3 (ref: t3.py:49-86 + modules)
# ---------------------------------------------------------------------------

def convert_perceiver(sd, pv: str) -> dict:
    """Perceiver resampler (ref: models/t3/modules/perceiver.py:173-213):
    learned 32-query bank + one shared AttentionBlock2."""
    return {
        "query": _get(sd, f"{pv}.pre_attention_query"),
        "norm": ln(sd, f"{pv}.attn.norm"),
        "to_q": lin(sd, f"{pv}.attn.to_q"),
        "to_k": lin(sd, f"{pv}.attn.to_k"),
        "to_v": lin(sd, f"{pv}.attn.to_v"),
        "proj_out": lin(sd, f"{pv}.attn.proj_out"),
    }


def convert_t3(sd, hp) -> dict:
    cfg = hp.backbone
    layers = []
    if cfg.is_gpt:
        for i in range(cfg.num_layers):
            b = f"tfmr.h.{i}"
            layers.append({
                "ln1": ln(sd, f"{b}.ln_1"),
                "qkv": lin_conv1d_gpt2(sd, f"{b}.attn.c_attn"),
                "attn_out": lin_conv1d_gpt2(sd, f"{b}.attn.c_proj"),
                "ln2": ln(sd, f"{b}.ln_2"),
                "fc_in": lin_conv1d_gpt2(sd, f"{b}.mlp.c_fc"),
                "fc_out": lin_conv1d_gpt2(sd, f"{b}.mlp.c_proj"),
            })
        backbone = {"layers": layers, "wpe": emb(sd, "tfmr.wpe"),
                    "ln_f": ln(sd, "tfmr.ln_f")}
    else:
        for i in range(cfg.num_layers):
            b = f"tfmr.layers.{i}"
            layers.append({
                "input_ln": rms(sd, f"{b}.input_layernorm"),
                "q": lin(sd, f"{b}.self_attn.q_proj"),
                "k": lin(sd, f"{b}.self_attn.k_proj"),
                "v": lin(sd, f"{b}.self_attn.v_proj"),
                "o": lin(sd, f"{b}.self_attn.o_proj"),
                "post_ln": rms(sd, f"{b}.post_attention_layernorm"),
                "gate": lin(sd, f"{b}.mlp.gate_proj"),
                "up": lin(sd, f"{b}.mlp.up_proj"),
                "down": lin(sd, f"{b}.mlp.down_proj"),
            })
        backbone = {"layers": layers, "norm": rms(sd, "tfmr.norm")}

    params = {
        "backbone": backbone,
        "text_emb": emb(sd, "text_emb"),
        "speech_emb": emb(sd, "speech_emb"),
        "text_head": lin(sd, "text_head"),
        "speech_head": lin(sd, "speech_head"),
        "cond_enc": {"spkr_enc": lin(sd, "cond_enc.spkr_enc")},
    }
    if hp.emotion_adv:
        params["cond_enc"]["emotion_adv_fc"] = lin(sd, "cond_enc.emotion_adv_fc")
    if hp.use_perceiver_resampler:
        params["cond_enc"]["perceiver"] = convert_perceiver(sd, "cond_enc.perceiver")
    if hp.input_pos_emb == "learned":
        params["text_pos_emb"] = emb(sd, "text_pos_emb.emb")
        params["speech_pos_emb"] = emb(sd, "speech_pos_emb.emb")
    return params


# ---------------------------------------------------------------------------
# S3Gen flow encoder (ref: transformer/upsample_encoder.py)
# ---------------------------------------------------------------------------

def _conformer_block(sd, b):
    return {
        "norm_mha": ln(sd, f"{b}.norm_mha"),
        "attn": {
            "q": lin(sd, f"{b}.self_attn.linear_q"),
            "k": lin(sd, f"{b}.self_attn.linear_k"),
            "v": lin(sd, f"{b}.self_attn.linear_v"),
            "out": lin(sd, f"{b}.self_attn.linear_out"),
            "pos": lin(sd, f"{b}.self_attn.linear_pos"),
            "pos_bias_u": _get(sd, f"{b}.self_attn.pos_bias_u"),
            "pos_bias_v": _get(sd, f"{b}.self_attn.pos_bias_v"),
        },
        "norm_ff": ln(sd, f"{b}.norm_ff"),
        "ff_in": lin(sd, f"{b}.feed_forward.w_1"),
        "ff_out": lin(sd, f"{b}.feed_forward.w_2"),
    }


def convert_upsample_encoder(sd, p="flow.encoder") -> dict:
    n_blocks = _count(sd, lambda i: f"{p}.encoders.{i}.")
    n_up = _count(sd, lambda i: f"{p}.up_encoders.{i}.")
    return {
        "embed": {"linear": lin(sd, f"{p}.embed.out.0"), "norm": ln(sd, f"{p}.embed.out.1")},
        "pre_lookahead": {"conv1": conv1d(sd, f"{p}.pre_lookahead_layer.conv1"),
                          "conv2": conv1d(sd, f"{p}.pre_lookahead_layer.conv2")},
        "blocks": [_conformer_block(sd, f"{p}.encoders.{i}") for i in range(n_blocks)],
        "up_conv": conv1d(sd, f"{p}.up_layer.conv"),
        "up_embed": {"linear": lin(sd, f"{p}.up_embed.out.0"), "norm": ln(sd, f"{p}.up_embed.out.1")},
        "up_blocks": [_conformer_block(sd, f"{p}.up_encoders.{i}") for i in range(n_up)],
        "after_norm": ln(sd, f"{p}.after_norm"),
    }


# ---------------------------------------------------------------------------
# S3Gen CFM UNet (ref: decoder.py:99-242)
# ---------------------------------------------------------------------------

def _causal_block(sd, p):
    return {"conv": conv1d(sd, f"{p}.block.0"), "norm": ln(sd, f"{p}.block.2")}


def _resnet(sd, p):
    return {
        "mlp": lin(sd, f"{p}.mlp.1"),
        "block1": _causal_block(sd, f"{p}.block1"),
        "block2": _causal_block(sd, f"{p}.block2"),
        "res_conv": conv1d(sd, f"{p}.res_conv"),
    }


def _basic_tfmr(sd, p):
    return {
        "norm1": ln(sd, f"{p}.norm1"),
        "to_q": lin(sd, f"{p}.attn1.to_q"),
        "to_k": lin(sd, f"{p}.attn1.to_k"),
        "to_v": lin(sd, f"{p}.attn1.to_v"),
        "to_out": lin(sd, f"{p}.attn1.to_out.0"),
        "norm3": ln(sd, f"{p}.norm3"),
        "ff_in": lin(sd, f"{p}.ff.net.0.proj"),
        "ff_out": lin(sd, f"{p}.ff.net.2"),
    }


def convert_unet(sd, p="flow.decoder.estimator") -> dict:
    def stage(b, with_updown):
        n_tf = _count(sd, lambda j: f"{b}.1.{j}.")
        d = {"resnet": _resnet(sd, f"{b}.0"),
             "tfmr": [_basic_tfmr(sd, f"{b}.1.{j}") for j in range(n_tf)]}
        if with_updown:
            d["updown"] = conv1d(sd, f"{b}.2")
        return d

    n_mid = _count(sd, lambda i: f"{p}.mid_blocks.{i}.")
    out = {
        "time_mlp": {"lin1": lin(sd, f"{p}.time_mlp.linear_1"),
                     "lin2": lin(sd, f"{p}.time_mlp.linear_2")},
        "down": [stage(f"{p}.down_blocks.0", True)],
        "mid": [stage(f"{p}.mid_blocks.{i}", False) for i in range(n_mid)],
        "up": [stage(f"{p}.up_blocks.0", True)],
        "final_block": _causal_block(sd, f"{p}.final_block"),
        "final_proj": conv1d(sd, f"{p}.final_proj"),
    }
    if f"{p}.time_embed_mixer.weight" in sd:
        out["time_mixer"] = lin(sd, f"{p}.time_embed_mixer")
    return out


def convert_flow(sd) -> dict:
    return {
        "input_embedding": emb(sd, "flow.input_embedding"),
        "spk_embed_affine": lin(sd, "flow.spk_embed_affine_layer"),
        "encoder": convert_upsample_encoder(sd),
        "encoder_proj": lin(sd, "flow.encoder_proj"),
        "decoder": convert_unet(sd),
    }


# ---------------------------------------------------------------------------
# HiFT (ref: hifigan.py:286-474)
# ---------------------------------------------------------------------------

def _hift_resblock(sd, p):
    n = _count(sd, lambda i: f"{p}.convs1.{i}.")
    return {
        "convs1": [conv1d(sd, f"{p}.convs1.{i}") for i in range(n)],
        "convs2": [conv1d(sd, f"{p}.convs2.{i}") for i in range(n)],
        "alpha1": [_get(sd, f"{p}.activations1.{i}.alpha") for i in range(n)],
        "alpha2": [_get(sd, f"{p}.activations2.{i}.alpha") for i in range(n)],
    }


def convert_hift(sd, p="mel2wav") -> dict:
    f0p = f"{p}.f0_predictor"
    n_ups = _count(sd, lambda i: f"{p}.ups.{i}.")
    n_res = _count(sd, lambda i: f"{p}.resblocks.{i}.")
    n_src = _count(sd, lambda i: f"{p}.source_downs.{i}.")
    return {
        "f0_predictor": {
            "convs": [conv1d(sd, f"{f0p}.condnet.{i}") for i in (0, 2, 4, 6, 8)],
            "classifier": lin(sd, f"{f0p}.classifier"),
        },
        "m_source_linear": lin(sd, f"{p}.m_source.l_linear"),
        "conv_pre": conv1d(sd, f"{p}.conv_pre"),
        "ups": [conv_t1d(sd, f"{p}.ups.{i}") for i in range(n_ups)],
        "source_downs": [conv1d(sd, f"{p}.source_downs.{i}") for i in range(n_src)],
        "source_resblocks": [_hift_resblock(sd, f"{p}.source_resblocks.{i}")
                             for i in range(n_src)],
        "resblocks": [_hift_resblock(sd, f"{p}.resblocks.{i}") for i in range(n_res)],
        "conv_post": conv1d(sd, f"{p}.conv_post"),
    }


# ---------------------------------------------------------------------------
# CAMPPlus (ref: xvector.py:340-428)
# ---------------------------------------------------------------------------

def _res2d(sd, p):
    out = {
        "conv1": conv2d(sd, f"{p}.conv1"),
        "bn1": bn(sd, f"{p}.bn1"),
        "conv2": conv2d(sd, f"{p}.conv2"),
        "bn2": bn(sd, f"{p}.bn2"),
    }
    if f"{p}.shortcut.0.weight" in sd:
        out["shortcut_conv"] = conv2d(sd, f"{p}.shortcut.0")
        out["shortcut_bn"] = bn(sd, f"{p}.shortcut.1")
    return out


def convert_campplus(sd, p="speaker_encoder") -> dict:
    from ..models.s3gen.campplus import BLOCK_SPECS
    out = {
        "fcm": {
            "conv1": conv2d(sd, f"{p}.head.conv1"),
            "bn1": bn(sd, f"{p}.head.bn1"),
            "layer1": [_res2d(sd, f"{p}.head.layer1.{i}") for i in range(2)],
            "layer2": [_res2d(sd, f"{p}.head.layer2.{i}") for i in range(2)],
            "conv2": conv2d(sd, f"{p}.head.conv2"),
            "bn2": bn(sd, f"{p}.head.bn2"),
        },
        "tdnn": {"conv": conv1d(sd, f"{p}.xvector.tdnn.linear"),
                 "bn": bn(sd, f"{p}.xvector.tdnn.nonlinear.batchnorm")},
        "blocks": [], "transits": [],
    }
    for bi, (num_layers, k, dil) in enumerate(BLOCK_SPECS):
        layers = []
        for i in range(num_layers):
            lp = f"{p}.xvector.block{bi + 1}.tdnnd{i + 1}"
            layers.append({
                "bn1": bn(sd, f"{lp}.nonlinear1.batchnorm"),
                "lin1": conv1d(sd, f"{lp}.linear1"),
                "bn2": bn(sd, f"{lp}.nonlinear2.batchnorm"),
                "cam": {
                    "local": conv1d(sd, f"{lp}.cam_layer.linear_local"),
                    "lin1": conv1d(sd, f"{lp}.cam_layer.linear1"),
                    "lin2": conv1d(sd, f"{lp}.cam_layer.linear2"),
                },
            })
        out["blocks"].append(layers)
        tp = f"{p}.xvector.transit{bi + 1}"
        out["transits"].append({"bn": bn(sd, f"{tp}.nonlinear.batchnorm"),
                                "conv": conv1d(sd, f"{tp}.linear")})
    out["out_bn"] = bn(sd, f"{p}.xvector.out_nonlinear.batchnorm")
    out["dense"] = {"conv": conv1d(sd, f"{p}.xvector.dense.linear"),
                    "bn": bn(sd, f"{p}.xvector.dense.nonlinear.batchnorm")}
    return out


# ---------------------------------------------------------------------------
# S3 tokenizer (pip s3tokenizer S3TokenizerV2 internals — whisper-style
# encoder + FSQ; key names per the public xingchensong/S3Tokenizer package.
# Weights ship inside s3gen.safetensors under `tokenizer.*`
# (ref: s3gen.py:55,239). A missing key is a HARD error: a silently
# random-init tokenizer produces garbage tokens with an otherwise-converted
# S3Gen, which is far worse than failing loudly.)
# ---------------------------------------------------------------------------

class S3TokenizerConversionError(RuntimeError):
    pass


def _lin_any(sd, prefixes, bias=True):
    """Linear whose checkpoint name has known spelling variants."""
    for q in prefixes:
        if f"{q}.weight" in sd:
            return lin(sd, q, bias=bias and f"{q}.bias" in sd)
    raise KeyError(f"none of {prefixes} present")


def dry_map_s3tokenizer(keys, p="tokenizer") -> dict:
    """Report — WITHOUT converting — how convert_s3tokenizer's name map
    lands on a checkpoint's key inventory.

    The S3TokenizerV2 encoder here is reconstructed from the public pip
    package's architecture (whisper-style MHA + tanh-FSQ); a real
    `s3gen.safetensors` may disagree (named P0 risk, DESIGN.md). This
    dry-map turns that failure mode into an actionable diff instead of a
    bare KeyError: given just the state-dict key names it returns

      {"n_layers": L,
       "mapped":   checkpoint keys the converter would consume,
       "unmapped": checkpoint keys under `p.` the map does not know
                   (architecture drift — extend the map from these),
       "missing":  keys the map expects but the checkpoint lacks}

    Buffer keys the reference wrapper registers as ignore-missing
    (`_mel_filters`, `window` — ref s3tokenizer.py:29) are treated as known.
    """
    keys = set(keys)
    present = {k for k in keys if k.startswith(p + ".")}
    n_layers = 0
    while any(k.startswith(f"{p}.encoder.blocks.{n_layers}.")
              for k in present):
        n_layers += 1

    def wb(prefix, bias=True):
        return [f"{prefix}.weight"] + ([f"{prefix}.bias"] if bias else [])

    expected = []
    expected += wb(f"{p}.encoder.conv1") + wb(f"{p}.encoder.conv2")
    for i in range(n_layers):
        b = f"{p}.encoder.blocks.{i}"
        expected += (wb(f"{b}.attn_ln") + wb(f"{b}.attn.query")
                     + wb(f"{b}.attn.key", bias=False)
                     + wb(f"{b}.attn.value") + wb(f"{b}.attn.out")
                     + wb(f"{b}.mlp_ln") + wb(f"{b}.mlp.0")
                     + wb(f"{b}.mlp.2"))
    expected += wb(f"{p}.encoder.ln_post")
    fsq_variants = (f"{p}.quantizer._codebook.project_down",
                    f"{p}.quantizer.codebook.project_down",
                    f"{p}.quantizer.project_down")
    fsq = next((v for v in fsq_variants
                if f"{v}.weight" in present), fsq_variants[0])
    expected += wb(fsq)
    expected = set(expected)
    ignorable = {k for k in present
                 if k.endswith("_mel_filters") or k.endswith(".window")}
    return {
        "n_layers": n_layers,
        "mapped": sorted(present & expected),
        "unmapped": sorted(present - expected - ignorable),
        "missing": sorted(expected - present),
    }


def convert_s3tokenizer(sd, p="tokenizer") -> dict:
    try:
        n_layers = _count(sd, lambda i: f"{p}.encoder.blocks.{i}.")
        if n_layers == 0:
            raise KeyError(f"no '{p}.encoder.blocks.*' keys found")
        blocks = []
        for i in range(n_layers):
            b = f"{p}.encoder.blocks.{i}"
            blocks.append({
                "ln1": ln(sd, f"{b}.attn_ln"),
                "q": lin(sd, f"{b}.attn.query"),
                "k": lin(sd, f"{b}.attn.key", bias=False),
                "v": lin(sd, f"{b}.attn.value"),
                "out": lin(sd, f"{b}.attn.out"),
                "ln2": ln(sd, f"{b}.mlp_ln"),
                "fc1": lin(sd, f"{b}.mlp.0"),
                "fc2": lin(sd, f"{b}.mlp.2"),
            })
        out = {
            "conv1": conv1d(sd, f"{p}.encoder.conv1"),
            "conv2": conv1d(sd, f"{p}.encoder.conv2"),
            "blocks": blocks,
            "ln_post": ln(sd, f"{p}.encoder.ln_post"),
            "fsq_proj": _lin_any(sd, (
                f"{p}.quantizer._codebook.project_down",
                f"{p}.quantizer.codebook.project_down",
                f"{p}.quantizer.project_down",
            )),
        }
    except KeyError as e:
        known = sorted(k for k in sd if k.startswith(f"{p}."))[:20]
        report = dry_map_s3tokenizer(sd.keys(), p)
        raise S3TokenizerConversionError(
            f"S3 tokenizer weight conversion failed on key {e}. The checkpoint "
            f"has {len([k for k in sd if k.startswith(p + '.')])} '{p}.*' "
            f"tensors; first keys: {known}. Refusing to fall back to random "
            f"init (it would produce noise audio). Dry-map diff "
            f"(extend the name map from these): "
            f"{len(report['mapped'])} mapped, "
            f"unmapped={report['unmapped'][:12]}, "
            f"missing={report['missing'][:12]}.") from e
    return out


# ---------------------------------------------------------------------------
# top-level loaders
# ---------------------------------------------------------------------------

def load_safetensors(path) -> dict:
    from safetensors.numpy import load_file
    try:
        return load_file(str(path))
    except Exception:
        # some checkpoints store bf16 — fall back through torch
        import torch
        from safetensors.torch import load_file as tl
        return {k: v.float().numpy() for k, v in tl(str(path)).items()}


def load_torch_pt(path) -> dict:
    import torch
    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    return {k: v.float().numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def convert_s3gen(sd, meanflow: bool = False):
    """Full s3gen.safetensors state dict → params + list of skipped parts."""
    from ..models.s3gen.model import s3gen_init
    import jax
    params = s3gen_init(jax.random.key(0), meanflow=meanflow)
    params = jax.tree.map(np.asarray, params)
    params["tokenizer"] = convert_s3tokenizer(sd)
    params["speaker_encoder"] = convert_campplus(sd)
    params["flow"] = convert_flow(sd)
    params["mel2wav"] = convert_hift(sd)
    return params


def load_conds_pt(path):
    """Load the reference's built-in voice (`conds.pt`, torch-saved dict,
    ref: tts.py:91-103)."""
    import torch
    from ..api.pipelines import Conditionals, T3CondHost
    from ..models.s3gen.model import RefDict
    data = torch.load(str(path), map_location="cpu", weights_only=True)
    t3 = data["t3"]
    gen = data["gen"]

    def n(x):
        return x.float().numpy() if hasattr(x, "numpy") else np.asarray(x)

    emo = t3.get("emotion_adv")
    emo_val = float(n(emo).reshape(-1)[0]) if emo is not None else 0.5
    tok = t3.get("cond_prompt_speech_tokens")
    return Conditionals(
        T3CondHost(
            speaker_emb=n(t3["speaker_emb"]).reshape(1, -1),
            cond_prompt_speech_tokens=(None if tok is None
                                       else n(tok).astype(np.int32).reshape(1, -1)),
            emotion_adv=emo_val,
        ),
        RefDict(
            prompt_token=n(gen["prompt_token"]).astype(np.int32),
            prompt_token_len=n(gen["prompt_token_len"]).astype(np.int32).reshape(-1),
            prompt_feat=n(gen["prompt_feat"]).astype(np.float32),
            embedding=n(gen["embedding"]).astype(np.float32).reshape(1, -1),
        ),
    )


def download_repo(repo_id: str, files):
    """hf_hub download (network required), with the reference's Xet-failure
    fallback (ref: tts_turbo.py:207-224)."""
    from huggingface_hub import hf_hub_download, snapshot_download
    import os

    def _snapshot():
        return snapshot_download(
            repo_id=repo_id, token=os.getenv("HF_TOKEN") or None,
            allow_patterns=["*.safetensors", "*.json", "*.txt", "*.pt", "*.model"])

    if files is None:
        try:
            return _snapshot()
        except Exception as e:
            if "xet" in str(e).lower() or "hex hash" in str(e).lower():
                logger.warning(f"Xet download failed ({e}); retrying with Xet disabled.")
                import huggingface_hub.constants as hf_constants
                hf_constants.HF_HUB_DISABLE_XET = True
                return _snapshot()
            raise
    local = None
    for f in files:
        local = hf_hub_download(repo_id=repo_id, filename=f)
    return Path(local).parent


def _unwrap_model(sd):
    # some checkpoints wrap the state dict as {"model": [sd]} (ref: tts.py:146-147)
    if "model" in sd and not any(k.startswith(("tfmr", "flow", "mel2wav")) for k in sd):
        inner = sd["model"]
        return inner[0] if isinstance(inner, (list, tuple)) else inner
    return sd


def load_english_tts(cls, ckpt_dir: Path):
    from ..models.t3.config import T3Config
    from ..models.s3gen.model import S3GenEngine
    from ..text.tokenizer import EnTokenizer
    from ..api.pipelines import Conditionals
    hp = T3Config.english_only()
    t3_params = convert_t3(_unwrap_model(load_safetensors(ckpt_dir / "t3_cfg.safetensors")), hp)
    ve_params = convert_voice_encoder(load_safetensors(ckpt_dir / "ve.safetensors"))
    s3_params = convert_s3gen(load_safetensors(ckpt_dir / "s3gen.safetensors"))
    engine = S3GenEngine(s3_params)
    tok = EnTokenizer(str(ckpt_dir / "tokenizer.json"))
    conds = None
    if (ckpt_dir / "conds.pt").exists():
        conds = load_conds_pt(ckpt_dir / "conds.pt")
    return cls(t3_params, hp, engine, ve_params, tok, conds)


def load_turbo_tts(cls, ckpt_dir: Path, nano: bool = False):
    from ..models.t3.config import T3Config
    from ..models.s3gen.model import S3GenEngine
    hp = T3Config.nano() if nano else T3Config.turbo()
    ckpt = "t3_nano_v1.safetensors" if nano else "t3_turbo_v1.safetensors"
    t3_params = convert_t3(_unwrap_model(load_safetensors(ckpt_dir / ckpt)), hp)
    ve_params = convert_voice_encoder(load_safetensors(ckpt_dir / "ve.safetensors"))
    s3_params = convert_s3gen(load_safetensors(ckpt_dir / "s3gen_meanflow.safetensors"),
                              meanflow=True)
    engine = S3GenEngine(s3_params, meanflow=True)

    class _HFTok:
        def __init__(self, d):
            from transformers import AutoTokenizer
            self.tok = AutoTokenizer.from_pretrained(str(d))
            if self.tok.pad_token is None:
                self.tok.pad_token = self.tok.eos_token

        def text_to_tokens(self, text):
            return np.asarray(self.tok(text).input_ids, np.int32)[None]

    from ..api.pipelines import Conditionals
    conds = None
    if (ckpt_dir / "conds.pt").exists():
        conds = load_conds_pt(ckpt_dir / "conds.pt")
    return cls(t3_params, hp, engine, ve_params, _HFTok(ckpt_dir), conds,
               model_label="Nano" if nano else "Turbo")


def load_mtl_tts(cls, ckpt_dir: Path, t3_model: str | None = None):
    from ..models.t3.config import T3Config
    from ..models.s3gen.model import S3GenEngine
    from ..text.tokenizer import MTLTokenizer
    name = t3_model or "t3_mtl23ls_v2.safetensors"
    from ..api.pipelines import MULTILINGUAL_T3_MODELS
    name = MULTILINGUAL_T3_MODELS.get(name, name)
    hp = T3Config.multilingual()
    t3_params = convert_t3(_unwrap_model(load_safetensors(ckpt_dir / name)), hp)
    ve_path = ckpt_dir / "ve.pt"
    ve_sd = load_torch_pt(ve_path) if ve_path.exists() else \
        load_safetensors(ckpt_dir / "ve.safetensors")
    ve_params = convert_voice_encoder(ve_sd)
    s3_path = ckpt_dir / "s3gen.pt"
    s3_sd = load_torch_pt(s3_path) if s3_path.exists() else \
        load_safetensors(ckpt_dir / "s3gen.safetensors")
    s3_params = convert_s3gen(s3_sd)
    engine = S3GenEngine(s3_params)
    tok = MTLTokenizer(str(ckpt_dir / "grapheme_mtl_merged_expanded_v1.json"))
    conds = None
    if (ckpt_dir / "conds.pt").exists():
        conds = load_conds_pt(ckpt_dir / "conds.pt")
    return cls(t3_params, hp, engine, ve_params, tok, conds)


def load_vc(cls, ckpt_dir: Path):
    from ..models.s3gen.model import S3GenEngine
    s3_params = convert_s3gen(load_safetensors(ckpt_dir / "s3gen.safetensors"))
    engine = S3GenEngine(s3_params)
    ref_dict = None
    if (ckpt_dir / "conds.pt").exists():
        ref_dict = load_conds_pt(ckpt_dir / "conds.pt").gen
    return cls(engine, ref_dict=ref_dict)
