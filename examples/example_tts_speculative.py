"""Speculative Turbo TTS: Nano drafts, Turbo verifies (no reference analog).

The output distribution is exactly Turbo's (sampling/speculative.py) — the
draft only changes HOW tokens are produced: the Nano model proposes
`n_draft` tokens per round and Turbo scores them all in one forward, so a
round emits up to n_draft+1 tokens for roughly one Turbo step + n_draft+1
(much cheaper) Nano steps. The win depends on the models' agreement rate;
tools/perf_spec.py measures it.
"""
import numpy as np

from chatterbox_tpu import ChatterboxTurboTTS
from chatterbox_tpu.utils.audio_io import save_wav

AUDIO_PROMPT_PATH = "reference.wav"  # Turbo requires a >5 s voice prompt

target = ChatterboxTurboTTS.from_pretrained(device="tpu")
draft = ChatterboxTurboTTS.from_pretrained(device="tpu", nano=True)

text = "Hi there [chuckle], this is Chatterbox Turbo with a Nano draft."
wav = target.generate(text, audio_prompt_path=AUDIO_PROMPT_PATH,
                      draft=draft, n_draft=4)
save_wav("test-turbo-speculative.wav", np.asarray(wav)[0], target.sr)
print("wrote test-turbo-speculative.wav")
