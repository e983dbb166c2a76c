"""Command-line interface.

The reference ships only example scripts and Gradio apps; the framework adds
a proper CLI:

    python -m chatterbox_tpu.cli synth --model turbo --text "Hello." \
        --audio-prompt ref.wav --out out.wav
    python -m chatterbox_tpu.cli vc --audio in.wav --target-voice voice.wav \
        --out out.wav
    python -m chatterbox_tpu.cli info
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _build_synth(sub):
    p = sub.add_parser("synth", help="text → speech")
    p.add_argument("--model", choices=["english", "turbo", "nano", "multilingual"],
                   default="turbo")
    p.add_argument("--text", required=True)
    p.add_argument("--out", default="out.wav")
    p.add_argument("--audio-prompt", default=None)
    p.add_argument("--language-id", default=None, help="multilingual only")
    p.add_argument("--ckpt-dir", default=None,
                   help="local checkpoint dir (else downloads from HF)")
    p.add_argument("--exaggeration", type=float, default=0.5)
    p.add_argument("--cfg-weight", type=float, default=0.5)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--top-k", type=int, default=1000)
    p.add_argument("--repetition-penalty", type=float, default=1.2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--stream", action="store_true",
                   help="turbo/nano: stream chunks (prints TTFA)")
    p.add_argument("--draft", choices=["int8"], default=None,
                   help="turbo/nano, non-stream: lossless speculative "
                        "decode — the model's own int8-quantized weights "
                        "draft, the float model verifies; measured +23%% "
                        "tok/s over sequential bf16 with the bf16 sampling "
                        "distribution preserved exactly (DESIGN.md r4)")


def _cmd_synth(args):
    import numpy as np
    from chatterbox_tpu.utils.audio_io import save_wav

    if args.model in ("turbo", "nano"):
        from chatterbox_tpu import ChatterboxTurboTTS
        nano = args.model == "nano"
        if args.ckpt_dir:
            model = ChatterboxTurboTTS.from_local(args.ckpt_dir, nano=nano)
        else:
            model = ChatterboxTurboTTS.from_pretrained("tpu", nano=nano)
        if args.seed:
            model.set_seed(args.seed)
        kw = dict(temperature=args.temperature, top_k=args.top_k,
                  top_p=args.top_p if args.top_p is not None else 0.95,
                  repetition_penalty=args.repetition_penalty,
                  audio_prompt_path=args.audio_prompt)
        if args.stream:
            t0 = time.perf_counter()
            chunks, ttfa = [], None
            for c in model.generate_stream(args.text, **kw):
                if ttfa is None:
                    ttfa = time.perf_counter() - t0
                    print(f"TTFA: {ttfa*1000:.0f} ms", file=sys.stderr)
                chunks.append(c)
            wav = np.concatenate(chunks)[None]
        else:
            if args.draft:
                kw["draft"] = args.draft
            wav = model.generate(args.text, **kw)
    elif args.model == "english":
        from chatterbox_tpu import ChatterboxTTS
        model = (ChatterboxTTS.from_local(args.ckpt_dir) if args.ckpt_dir
                 else ChatterboxTTS.from_pretrained("tpu"))
        if args.seed:
            model.set_seed(args.seed)
        wav = model.generate(args.text, audio_prompt_path=args.audio_prompt,
                             exaggeration=args.exaggeration,
                             cfg_weight=args.cfg_weight,
                             temperature=args.temperature,
                             top_p=args.top_p if args.top_p is not None else 1.0,
                             repetition_penalty=args.repetition_penalty)
    else:
        from chatterbox_tpu import ChatterboxMultilingualTTS
        model = (ChatterboxMultilingualTTS.from_local(args.ckpt_dir)
                 if args.ckpt_dir
                 else ChatterboxMultilingualTTS.from_pretrained("tpu"))
        if args.seed:
            model.set_seed(args.seed)
        wav = model.generate(args.text, language_id=args.language_id or "en",
                             audio_prompt_path=args.audio_prompt,
                             exaggeration=args.exaggeration,
                             cfg_weight=args.cfg_weight,
                             temperature=args.temperature)
    import numpy as np
    save_wav(args.out, np.asarray(wav)[0], model.sr)
    print(f"wrote {args.out} ({np.asarray(wav).shape[-1] / model.sr:.2f} s)")


def _cmd_vc(args):
    import numpy as np
    from chatterbox_tpu import ChatterboxVC
    from chatterbox_tpu.utils.audio_io import save_wav
    model = (ChatterboxVC.from_local(args.ckpt_dir) if args.ckpt_dir
             else ChatterboxVC.from_pretrained("tpu"))
    wav = model.generate(args.audio, target_voice_path=args.target_voice)
    save_wav(args.out, np.asarray(wav)[0], model.sr)
    print(f"wrote {args.out}")


def _cmd_info(_args):
    import jax
    import chatterbox_tpu
    print(json.dumps({
        "version": chatterbox_tpu.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "sample_rate": chatterbox_tpu.S3GEN_SR,
        "models": ["english (500M CFG)", "turbo (350M)", "nano (110M)",
                   "multilingual (500M, 23 languages)", "vc"],
    }, indent=2))


def _parse_voice_specs(specs):
    """--voice specs → [(name, path)]. 'name=path' registers a named voice;
    a bare path (even one containing '=' — existing files win) → 'default'."""
    import os
    out, seen = [], set()
    for spec in specs:
        if "=" in spec and not os.path.exists(spec):
            name, _, path = spec.partition("=")
        else:
            name, path = "default", spec
        if name in seen:
            raise SystemExit(f"duplicate voice name {name!r} "
                             f"(use name=path to register extra voices)")
        seen.add(name)
        out.append((name, path))
    return out


def _cmd_mcp(args):
    import numpy as np
    from chatterbox_tpu import ChatterboxTurboTTS
    from chatterbox_tpu.api.pipelines import Conditionals
    from chatterbox_tpu.serve.mcp import MCPTTSServer

    nano = args.model == "nano"
    if args.ckpt_dir:
        model = ChatterboxTurboTTS.from_local(args.ckpt_dir, nano=nano)
    else:
        model = ChatterboxTurboTTS.from_pretrained("tpu", nano=nano)
    conds = {}
    for name, path in _parse_voice_specs(args.voice):
        model.prepare_conditionals(path)
        conds[name] = Conditionals(model.conds.t3, model.conds.gen)

    def synth_fn(text, voice, seed, **kw):
        if seed is not None:
            model.set_seed(int(seed))
        model.conds = conds[voice]
        return np.asarray(model.generate(text, **kw))[0]

    print(f"MCP TTS server ({args.model}) on stdio — voices: "
          f"{sorted(conds)}", file=sys.stderr)
    MCPTTSServer(synth_fn, conds, sr=model.sr).serve_stdio()


def _cmd_watermark(args):
    from chatterbox_tpu.utils.audio_io import load_audio
    from chatterbox_tpu.utils.watermark import (SpreadSpectrumWatermarker,
                                                DETECT_Z)
    sr = 24000
    wav = load_audio(args.wav, sr)
    wm = SpreadSpectrumWatermarker(key=args.key)
    z, payload = wm.detect(wav, sr)
    detected = bool(z >= DETECT_Z)
    print(json.dumps({"file": args.wav,
                      "detected": detected,
                      "score_z": round(float(z), 2),
                      "threshold_z": DETECT_Z,
                      # 16-bit generator id (meaningful only when detected)
                      "payload": f"{payload:#06x}" if detected else None}))


class _NormTok:
    """Serving-side tokenizer adapter: applies the family's punc_norm before
    tokenizing (the pipelines' generate() does this inline — the batched
    serving path tokenizes directly, so the normalization rides here)."""

    def __init__(self, tok, variant):
        self.tok = tok
        self.variant = variant

    def text_to_tokens(self, text, language_id=None):
        from chatterbox_tpu.text.tokenizer import punc_norm
        text = punc_norm(text, variant=self.variant)
        if language_id is not None:
            return self.tok.text_to_tokens(text, language_id=language_id)
        return self.tok.text_to_tokens(text)


def _cmd_serve(args):
    from chatterbox_tpu import (ChatterboxMultilingualTTS, ChatterboxTTS,
                                ChatterboxTurboTTS)
    from chatterbox_tpu.serve.batching import BatchDecoder
    from chatterbox_tpu.serve.http import TTSHTTPServer, Voice

    cfg_family = args.model in ("english", "multilingual")
    if cfg_family:
        cls = (ChatterboxTTS if args.model == "english"
               else ChatterboxMultilingualTTS)
        model = (cls.from_local(args.ckpt_dir) if args.ckpt_dir
                 else cls.from_pretrained())
        variant = "mtl" if args.model == "multilingual" else "en"
        hp = model.hp
        # SOT/EOT framing, normally done inside generate (ref: tts.py:240)
        def frame_text(ids):
            import numpy as np
            return np.concatenate([[hp.start_text_token], ids.reshape(-1),
                                   [hp.stop_text_token]]).astype(np.int32)
        stream_fn = None        # streaming pipeline is turbo-family
    else:
        nano = args.model == "nano"
        if args.ckpt_dir:
            model = ChatterboxTurboTTS.from_local(args.ckpt_dir, nano=nano)
        else:
            model = ChatterboxTurboTTS.from_pretrained("tpu", nano=nano)
        variant, frame_text = "turbo", None

        def stream_fn(text, voice, seed, **kw):
            # streaming rides the single-stream pipeline (chunked decode +
            # streaming vocoder); only its sampler knobs apply. Long texts
            # are split at sentence boundaries (long-form narration) and
            # each piece streams at TTFA latency.
            from chatterbox_tpu.api.pipelines import Conditionals
            from chatterbox_tpu.serve.streaming import chunk_text
            kw = {k: v for k, v in kw.items()
                  if k in ("temperature", "top_p", "repetition_penalty")}
            if seed is not None:
                model.set_seed(int(seed))
            model.conds = Conditionals(voice.cond, voice.ref)
            for piece in chunk_text(text, max_chars=300):
                yield from model.generate_stream(piece, **kw)

    voices = {}
    for name, path in _parse_voice_specs(args.voice):
        model.prepare_conditionals(path)
        voices[name] = Voice(model.conds.t3, model.conds.gen)
    decoder = BatchDecoder(model.t3_params, model.hp,
                           max_batch=args.max_batch, cfg=cfg_family,
                           kv_int8=args.kv_int8)

    def _prepare_fn(path):
        model.prepare_conditionals(path)
        return Voice(model.conds.t3, model.conds.gen)

    slots = None
    if args.continuous:
        from chatterbox_tpu.sampling.continuous import ContinuousTTSServer
        slots = ContinuousTTSServer(
            model.t3_params, model.hp, n_slots=args.max_batch,
            text_bucket=args.text_bucket, s3gen=model.s3gen, cfg=cfg_family,
            kv_int8=args.kv_int8, draft_int8=args.draft_int8)
    server = TTSHTTPServer(
        decoder, model.s3gen, _NormTok(model.tokenizer, variant), voices,
        sr=model.sr, host=args.host, port=args.port, stream_fn=stream_fn,
        prepare_fn=_prepare_fn, continuous=slots, frame_text=frame_text)
    if args.warmup:
        print("warming the serving program grid ...")
        server.warmup()
    server.start()
    print(f"serving on http://{server.host}:{server.port}  "
          f"(POST /tts [+stream] /vc /voices, GET /voices /healthz /metrics)")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="chatterbox_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _build_synth(sub)
    pv = sub.add_parser("vc", help="voice conversion")
    pv.add_argument("--audio", required=True)
    pv.add_argument("--target-voice", default=None)
    pv.add_argument("--out", default="out.wav")
    pv.add_argument("--ckpt-dir", default=None)
    sub.add_parser("info", help="environment/model info")
    pw = sub.add_parser("watermark",
                        help="detect the watermark in a wav (the reference "
                             "documents the same extraction flow via perth, "
                             "ref: README.md:178-198)")
    pw.add_argument("wav", help="audio file to check")
    pw.add_argument("--key", default="chatterbox-tpu",
                    help="watermark key used at synthesis time")
    ps = sub.add_parser("serve", help="batched HTTP TTS server")
    ps.add_argument("--voice", required=True, action="append",
                    help=">5 s reference wav; repeatable, 'name=path' "
                         "registers a named voice (bare path → 'default')")
    ps.add_argument("--model",
                    choices=["turbo", "nano", "english", "multilingual"],
                    default="turbo",
                    help="english/multilingual serve the 520M CFG family "
                         "(per-request min_p/cfg_weight/exaggeration; "
                         "multilingual honors a \"language\" field)")
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8321)
    ps.add_argument("--max-batch", type=int, default=8)
    ps.add_argument("--continuous", action="store_true",
                    help="token-level continuous batching: requests join "
                         "the decode at chunk boundaries and finish "
                         "independently (no whole-batch drain); max-batch "
                         "becomes the slot count. Turbo/Nano: streaming "
                         "requests then run CONCURRENTLY through the slot "
                         "machine (no per-stream device lock)")
    ps.add_argument("--kv-int8", action="store_true",
                    help="int8 KV cache in the batched decode (pallas "
                         "streamed-int8 attention): half the attention HBM "
                         "bytes, but MEASURED neutral at B=2 and ~19%% "
                         "slower at B=8 vs the bf16 default at this serving "
                         "point (tools/perf_batch_int8.py) — an HBM-"
                         "capacity knob, not a speedup; quality A/B: "
                         "tools/ab_int8.py")
    ps.add_argument("--text-bucket", type=int, default=128,
                    help="continuous mode's fixed text-token capacity "
                         "(longer requests are truncated)")
    ps.add_argument("--draft-int8", action="store_true",
                    help="continuous mode only (Turbo/Nano family): "
                         "speculative decode rounds — the model's own int8-"
                         "quantized weights draft 8 tokens per slot, one "
                         "bf16 verify forward emits them. Token streams are "
                         "byte-identical to draft-off; pays at low "
                         "occupancy (per-stream latency), a full batch "
                         "already amortizes the weight reads")
    ps.add_argument("--ckpt-dir", default=None)
    ps.add_argument("--warmup", action="store_true",
                    help="pre-compile the full serving program grid before "
                         "accepting traffic (one-time with the persistent "
                         "compile cache)")
    pm = sub.add_parser("mcp", help="MCP (Model Context Protocol) TTS "
                                    "server over stdio — the reference "
                                    "exposes the same via gradio's "
                                    "mcp_server flag")
    pm.add_argument("--voice", required=True, action="append",
                    help=">5 s reference wav; repeatable, 'name=path' "
                         "registers a named voice (bare path → 'default')")
    pm.add_argument("--model", choices=["turbo", "nano"], default="turbo")
    pm.add_argument("--ckpt-dir", default=None)
    args = ap.parse_args(argv)
    if args.cmd == "synth":
        _cmd_synth(args)
    elif args.cmd == "vc":
        _cmd_vc(args)
    elif args.cmd == "info":
        _cmd_info(args)
    elif args.cmd == "watermark":
        _cmd_watermark(args)
    elif args.cmd == "serve":
        _cmd_serve(args)
    elif args.cmd == "mcp":
        _cmd_mcp(args)


if __name__ == "__main__":
    main()
