"""Nano TTS example (equivalent of example_tts_nano.py in the reference)."""
import numpy as np

from chatterbox_tpu import ChatterboxTurboTTS
from chatterbox_tpu.utils.audio_io import save_wav

AUDIO_PROMPT_PATH = "reference.wav"

model = ChatterboxTurboTTS.from_pretrained(device="tpu", nano=True)
wav = model.generate("Chatterbox Nano: small, fast, still sounds like you.",
                     audio_prompt_path=AUDIO_PROMPT_PATH)
save_wav("test-nano.wav", np.asarray(wav)[0], model.sr)
print("wrote test-nano.wav")
