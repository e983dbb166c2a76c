"""Turbo TTS example with paralinguistic tags (equivalent of
example_tts_turbo.py in the reference)."""
import numpy as np

from chatterbox_tpu import ChatterboxTurboTTS
from chatterbox_tpu.utils.audio_io import save_wav

AUDIO_PROMPT_PATH = "reference.wav"  # Turbo requires a >5 s voice prompt

model = ChatterboxTurboTTS.from_pretrained(device="tpu")
text = "Hi there [chuckle], this is Chatterbox Turbo running on TPU."
wav = model.generate(text, audio_prompt_path=AUDIO_PROMPT_PATH)
save_wav("test-turbo.wav", np.asarray(wav)[0], model.sr)
print("wrote test-turbo.wav")
