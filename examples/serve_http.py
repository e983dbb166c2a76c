"""HTTP TTS serving: the pipelined batched loop behind a JSON/WAV endpoint.

Concurrent POSTs are grouped into device batches (one batched T3 decode +
one batched fused S3Gen call per group). Seeded requests are reproducible
regardless of batch composition (per-row RNG in decode AND vocode).

  python examples/serve_http.py --port 8321 --voice reference.wav
  curl -X POST localhost:8321/tts -d '{"text": "Hello!", "seed": 3}' -o out.wav

Streaming (chunked audio/wav flowing at time-to-first-audio latency):

  curl -N -X POST localhost:8321/tts \
      -d '{"text": "Hello!", "stream": true}' -o out.wav

Register a new voice at runtime, then synthesize with it:

  python - <<'PY'
  import base64, json, urllib.request
  body = {"name": "alice", "wav_b64": base64.b64encode(
      open("alice_ref.wav", "rb").read()).decode()}
  urllib.request.urlopen(urllib.request.Request(
      "http://localhost:8321/voices", json.dumps(body).encode(),
      {"Content-Type": "application/json"}))
  PY
  curl -X POST localhost:8321/tts -d '{"text": "Hi", "voice": "alice"}' -o o.wav

Observability: GET /metrics (Prometheus text) or /metrics.json.
Pass --warmup to pre-compile the full serving program grid before traffic.
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--voice", required=True, help=">5 s reference wav")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8321)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--nano", action="store_true")
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8 KV cache in the batched decode "
                         "(quality A/B: tools/ab_int8.py)")
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile the serving program grid")
    args = ap.parse_args()

    from chatterbox_tpu import ChatterboxTurboTTS
    from chatterbox_tpu.api.pipelines import Conditionals
    from chatterbox_tpu.serve.batching import BatchDecoder
    from chatterbox_tpu.serve.http import TTSHTTPServer, Voice

    model = ChatterboxTurboTTS.from_pretrained(device="tpu", nano=args.nano)
    model.prepare_conditionals(args.voice)

    def stream_fn(text, voice, seed, **kw):
        from chatterbox_tpu.serve.streaming import chunk_text
        kw = {k: v for k, v in kw.items()
              if k in ("temperature", "top_p", "repetition_penalty")}
        if seed is not None:
            model.set_seed(int(seed))
        model.conds = Conditionals(voice.cond, voice.ref)
        for piece in chunk_text(text, max_chars=300):   # long-form narration
            yield from model.generate_stream(piece, **kw)

    def prepare_fn(path):
        model.prepare_conditionals(path)
        return Voice(model.conds.t3, model.conds.gen)

    decoder = BatchDecoder(model.t3_params, model.hp,
                           max_batch=args.max_batch, kv_int8=args.kv_int8)
    server = TTSHTTPServer(
        decoder, model.s3gen, model.tokenizer,
        {"default": Voice(model.conds.t3, model.conds.gen)},
        sr=model.sr, host=args.host, port=args.port,
        stream_fn=stream_fn, prepare_fn=prepare_fn)
    if args.warmup:
        print("warming the serving program grid ...")
        server.warmup()
    server.start()
    print(f"serving on http://{server.host}:{server.port}  "
          f"(POST /tts [+stream], POST /voices, GET /voices /healthz /metrics)")
    try:
        import time
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
