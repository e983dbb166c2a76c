"""Batched serving example: N requests through one TPU chip.

Demonstrates the config-5 serving path (BASELINE.md): requests are grouped,
decoded in one batched T3 while_loop, then vocoded in one batched S3Gen
flow+HiFT call. Measured ~58-60x realtime per v5e chip at batch 8-16.
"""
import numpy as np
import jax

from chatterbox_tpu import ChatterboxTurboTTS
from chatterbox_tpu.serve.batching import BatchDecoder, TTSServer, TTSRequest
from chatterbox_tpu.utils.audio_io import save_wav

AUDIO_PROMPT_PATH = "reference.wav"   # >5 s voice prompt

model = ChatterboxTurboTTS.from_pretrained(device="tpu")
model.prepare_conditionals(AUDIO_PROMPT_PATH)

texts = [
    "First request in the batch.",
    "Second request, different text length.",
    "Third request: batching makes the decode loop nearly free per stream.",
]

decoder = BatchDecoder(model.t3_params, model.hp, max_batch=8)
server = TTSServer(decoder, model.s3gen)

requests = [
    TTSRequest(text_tokens=np.asarray(model.tokenizer.text_to_tokens(t)).reshape(-1),
               cond=model.conds.t3, request_id=i)
    for i, t in enumerate(texts)
]
refs = [model.conds.gen] * len(requests)   # same voice here; can differ per request

wavs = server.synthesize_batch(requests, refs)
for i, w in enumerate(wavs):
    save_wav(f"served-{i}.wav", w, model.sr)
    print(f"wrote served-{i}.wav ({len(w) / model.sr:.2f} s)")
