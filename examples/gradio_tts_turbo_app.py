"""Gradio Turbo TTS demo with paralinguistic tags (equivalent of the
reference's gradio_tts_turbo_app.py). Requires `gradio`."""
import numpy as np

try:
    import gradio as gr
except ImportError as e:
    raise SystemExit("gradio is not installed in this image") from e

from chatterbox_tpu import ChatterboxTurboTTS

# paralinguistic event tags supported by the Turbo checkpoint
# (ref: gradio_tts_turbo_app.py:9-12)
EVENT_TAGS = ["[clear throat]", "[sigh]", "[shush]", "[cough]", "[groan]",
              "[sniff]", "[gasp]", "[chuckle]", "[laugh]"]

MODEL = None


def get_model():
    global MODEL
    if MODEL is None:
        MODEL = ChatterboxTurboTTS.from_pretrained(device="tpu")
    return MODEL


def generate(text, audio_prompt_path, temperature, seed_num, top_k, top_p,
             repetition_penalty, norm_loudness):
    model = get_model()
    if seed_num != 0:
        model.set_seed(int(seed_num))
    wav = model.generate(text, audio_prompt_path=audio_prompt_path or None,
                         temperature=temperature, top_k=int(top_k), top_p=top_p,
                         repetition_penalty=repetition_penalty,
                         norm_loudness=norm_loudness)
    return (model.sr, np.asarray(wav)[0])


with gr.Blocks() as demo:
    gr.Markdown("Tags: " + " ".join(EVENT_TAGS))
    text = gr.Textbox(value="Hi there [chuckle], welcome to Chatterbox Turbo.",
                      label="Text to synthesize")
    ref_wav = gr.Audio(sources=["upload", "microphone"], type="filepath",
                       label="Reference Audio File (>5 s)")
    with gr.Accordion("More options", open=False):
        seed_num = gr.Number(value=0, label="Random seed (0 for random)")
        temp = gr.Slider(0.05, 5, step=0.05, label="temperature", value=0.8)
        top_k = gr.Slider(10, 2000, step=10, label="top_k", value=1000)
        top_p = gr.Slider(0.0, 1.0, step=0.01, label="top_p", value=0.95)
        repetition_penalty = gr.Slider(1.0, 2.0, step=0.1,
                                       label="repetition_penalty", value=1.2)
        norm_loudness = gr.Checkbox(value=True, label="Normalize loudness")
    run_btn = gr.Button("Generate", variant="primary")
    audio_output = gr.Audio(label="Output Audio")
    run_btn.click(fn=generate,
                  inputs=[text, ref_wav, temp, seed_num, top_k, top_p,
                          repetition_penalty, norm_loudness],
                  outputs=[audio_output])

if __name__ == "__main__":
    demo.queue(max_size=50, default_concurrency_limit=1).launch(share=True)
