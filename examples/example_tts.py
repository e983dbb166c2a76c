"""English TTS example (equivalent of the reference's example_tts.py)."""
import numpy as np

from chatterbox_tpu import ChatterboxTTS
from chatterbox_tpu.utils.audio_io import save_wav

AUDIO_PROMPT_PATH = None  # set to a .wav file to clone a voice

model = ChatterboxTTS.from_pretrained(device="tpu")

text = ("Ezreal and Jinx teamed up with Ahri, Yasuo, and Teemo to take down "
        "the enemy's Nexus in an epic late-game pentakill.")
if AUDIO_PROMPT_PATH:
    wav = model.generate(text, audio_prompt_path=AUDIO_PROMPT_PATH,
                         exaggeration=2.0, cfg_weight=0.5)
else:
    wav = model.generate(text)
save_wav("test-1.wav", np.asarray(wav)[0], model.sr)
print("wrote test-1.wav")
