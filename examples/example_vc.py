"""Voice conversion example (equivalent of example_vc.py in the reference)."""
import numpy as np

from chatterbox_tpu import ChatterboxVC
from chatterbox_tpu.utils.audio_io import save_wav

AUDIO_PATH = "input.wav"
TARGET_VOICE_PATH = "target_voice.wav"

model = ChatterboxVC.from_pretrained(device="tpu")
wav = model.generate(AUDIO_PATH, target_voice_path=TARGET_VOICE_PATH)
save_wav("test-vc.wav", np.asarray(wav)[0], model.sr)
print("wrote test-vc.wav")
