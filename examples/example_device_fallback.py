"""Device-fallback TTS example (equivalent of the reference's
example_for_mac.py, which picks MPS when available and otherwise CPU).

Here the accelerator is a TPU: if no TPU backend is reachable, jax is
redirected to the host CPU before any device query — everything else
(pipelines, checkpoints, sampling) is identical on both backends.
"""
import numpy as np
import jax

# Detect device (TPU chip vs CPU fallback) — must run before first backend use
try:
    device = jax.devices()[0].platform        # initializes the backend
except RuntimeError:
    jax.config.update("jax_platforms", "cpu")
    device = "cpu"
print(f"running on: {device}")

from chatterbox_tpu import ChatterboxTTS
from chatterbox_tpu.utils.audio_io import save_wav

model = ChatterboxTTS.from_pretrained(device=device)
text = ("Today is the day. I want to move like a titan at dawn, sweat like a "
        "god forging lightning. No more excuses. From now on, my mornings "
        "will be temples of discipline.")

# If you want to synthesize with a different voice, specify the audio prompt
AUDIO_PROMPT_PATH = None  # e.g. "YOUR_FILE.wav"
if AUDIO_PROMPT_PATH:
    wav = model.generate(text, audio_prompt_path=AUDIO_PROMPT_PATH,
                         exaggeration=2.0, cfg_weight=0.5)
else:
    wav = model.generate(text)
save_wav("test-2.wav", np.asarray(wav)[0], model.sr)
print("wrote test-2.wav")
