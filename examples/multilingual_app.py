"""Gradio multilingual demo (equivalent of the reference's multilingual_app.py,
including the MCP-server launch flag). Requires `gradio`."""
import os

import numpy as np

try:
    import gradio as gr
except ImportError as e:
    raise SystemExit("gradio is not installed in this image") from e

from chatterbox_tpu import ChatterboxMultilingualTTS, SUPPORTED_LANGUAGES

T3_MODEL = os.environ.get("CHATTERBOX_MULTILINGUAL_T3_MODEL")
MODEL = None


def get_model():
    global MODEL
    if MODEL is None:
        MODEL = ChatterboxMultilingualTTS.from_pretrained(device="tpu",
                                                          t3_model=T3_MODEL)
    return MODEL


def generate(text, language_id, audio_prompt_path, exaggeration, temperature,
             seed_num, cfg_weight):
    model = get_model()
    if seed_num != 0:
        model.set_seed(int(seed_num))
    wav = model.generate(text, language_id=language_id,
                         audio_prompt_path=audio_prompt_path or None,
                         exaggeration=exaggeration, temperature=temperature,
                         cfg_weight=cfg_weight)
    return (model.sr, np.asarray(wav)[0])


with gr.Blocks() as demo:
    text = gr.Textbox(label="Text to synthesize")
    lang = gr.Dropdown(choices=sorted(SUPPORTED_LANGUAGES), value="en",
                       label="Language")
    ref = gr.Audio(sources=["upload", "microphone"], type="filepath",
                   label="Reference Audio", value=None)
    exaggeration = gr.Slider(0.25, 2, step=0.05, label="Exaggeration", value=0.5)
    cfg_weight = gr.Slider(0.2, 1, step=0.05, label="CFG/Pace", value=0.5)
    seed_num = gr.Number(value=0, label="Random seed (0 for random)")
    temp = gr.Slider(0.05, 5, step=0.05, label="temperature", value=0.8)
    btn = gr.Button("Generate", variant="primary")
    out = gr.Audio(label="Output Audio")
    btn.click(fn=generate,
              inputs=[text, lang, ref, exaggeration, temp, seed_num, cfg_weight],
              outputs=[out])

if __name__ == "__main__":
    # expose generate() as an MCP tool like the reference (mtl app :320)
    demo.launch(mcp_server=True)
