"""Gradio English TTS demo (equivalent of the reference's gradio_tts_app.py).
Requires `gradio` (not baked into this image)."""
import numpy as np

try:
    import gradio as gr
except ImportError as e:
    raise SystemExit("gradio is not installed in this image") from e

from chatterbox_tpu import ChatterboxTTS

MODEL = None


def get_model():
    global MODEL
    if MODEL is None:
        MODEL = ChatterboxTTS.from_pretrained(device="tpu")
    return MODEL


def generate(text, audio_prompt_path, exaggeration, temperature, seed_num,
             cfg_weight, min_p, top_p, repetition_penalty):
    model = get_model()
    if seed_num != 0:
        model.set_seed(int(seed_num))
    wav = model.generate(
        text, audio_prompt_path=audio_prompt_path or None,
        exaggeration=exaggeration, temperature=temperature,
        cfg_weight=cfg_weight, min_p=min_p, top_p=top_p,
        repetition_penalty=repetition_penalty)
    return (model.sr, np.asarray(wav)[0])


with gr.Blocks() as demo:
    with gr.Row():
        with gr.Column():
            text = gr.Textbox(value="Now let's make my mum's favourite.",
                              label="Text to synthesize (max chars 300)",
                              max_lines=5)
            ref_wav = gr.Audio(sources=["upload", "microphone"], type="filepath",
                               label="Reference Audio File", value=None)
            exaggeration = gr.Slider(0.25, 2, step=0.05,
                                     label="Exaggeration", value=0.5)
            cfg_weight = gr.Slider(0.2, 1, step=0.05, label="CFG/Pace", value=0.5)
            with gr.Accordion("More options", open=False):
                seed_num = gr.Number(value=0, label="Random seed (0 for random)")
                temp = gr.Slider(0.05, 5, step=0.05, label="temperature", value=0.8)
                min_p = gr.Slider(0.00, 1.00, step=0.01, label="min_p", value=0.05)
                top_p = gr.Slider(0.00, 1.00, step=0.01, label="top_p", value=1.00)
                repetition_penalty = gr.Slider(1.00, 2.00, step=0.1,
                                               label="repetition_penalty", value=1.2)
            run_btn = gr.Button("Generate", variant="primary")
        with gr.Column():
            audio_output = gr.Audio(label="Output Audio")
    run_btn.click(fn=generate,
                  inputs=[text, ref_wav, exaggeration, temp, seed_num,
                          cfg_weight, min_p, top_p, repetition_penalty],
                  outputs=[audio_output])

if __name__ == "__main__":
    demo.queue(max_size=50, default_concurrency_limit=1).launch(share=True)
