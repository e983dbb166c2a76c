"""HTTP TTS serving: the pipelined batched loop behind a JSON/WAV endpoint.

Concurrent POSTs are grouped into device batches (one batched T3 decode +
one batched fused S3Gen call per group). Seeded requests are reproducible
regardless of batch composition (per-row RNG in decode AND vocode).

  python examples/serve_http.py --port 8321 --voice reference.wav
  curl -X POST localhost:8321/tts -d '{"text": "Hello!", "seed": 3}' -o out.wav
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
    args = ap.parse_args()

    from chatterbox_tpu import ChatterboxTurboTTS
    from chatterbox_tpu.serve.batching import BatchDecoder
    from chatterbox_tpu.serve.http import TTSHTTPServer, Voice

    model = ChatterboxTurboTTS.from_pretrained(device="tpu", nano=args.nano)
    model.prepare_conditionals(args.voice)

    decoder = BatchDecoder(model.t3_params, model.hp,
                           max_batch=args.max_batch)
    server = TTSHTTPServer(
        decoder, model.s3gen, model.tokenizer,
        {"default": Voice(model.conds.t3, model.conds.gen)},
        sr=model.sr, host=args.host, port=args.port)
    server.start()
    print(f"serving on http://{server.host}:{server.port}  "
          f"(POST /tts, GET /voices, GET /healthz)")
    try:
        import time
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
