"""Multilingual TTS example (equivalent of the reference's multilingual
usage in multilingual_app.py)."""
import numpy as np

from chatterbox_tpu import ChatterboxMultilingualTTS
from chatterbox_tpu.utils.audio_io import save_wav

model = ChatterboxMultilingualTTS.from_pretrained(device="tpu")

for lang, text in [
    ("fr", "Bonjour, comment ça va aujourd'hui?"),
    ("de", "Guten Tag, wie geht es Ihnen heute?"),
    ("zh", "你好，今天过得怎么样？"),
]:
    wav = model.generate(text, language_id=lang)
    save_wav(f"test-mtl-{lang}.wav", np.asarray(wav)[0], model.sr)
    print(f"wrote test-mtl-{lang}.wav")
