"""Gradio voice-conversion demo (equivalent of the reference's
gradio_vc_app.py). Requires `gradio`."""
import numpy as np

try:
    import gradio as gr
except ImportError as e:
    raise SystemExit("gradio is not installed in this image") from e

from chatterbox_tpu import ChatterboxVC

MODEL = None


def get_model():
    global MODEL
    if MODEL is None:
        MODEL = ChatterboxVC.from_pretrained(device="tpu")
    return MODEL


def generate(audio, target_voice_path):
    model = get_model()
    wav = model.generate(audio, target_voice_path=target_voice_path or None)
    return (model.sr, np.asarray(wav)[0])


demo = gr.Interface(
    generate,
    [gr.Audio(sources=["upload", "microphone"], type="filepath",
              label="Input audio file"),
     gr.Audio(sources=["upload", "microphone"], type="filepath",
              label="Target voice audio file (if none, the default voice is used)",
              value=None)],
    "audio",
)

if __name__ == "__main__":
    demo.launch()
