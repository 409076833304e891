"""Gradio web demo — parity with the reference ``app.py`` text2audio UI.

Wraps :func:`audioldm2_tpu.pipeline.text_to_audio` with a lazily-built
global model (reference app.py:16-54). Requires ``gradio`` (not bundled in
this image); exits with a clear message when absent.
"""

from __future__ import annotations

import sys

import numpy as np

_MODEL = None


def _get_model(model_name: str):
    global _MODEL
    if _MODEL is None or _MODEL.cfg.name != model_name:
        from audioldm2_tpu.pipeline import build_model

        _MODEL = build_model(model_name=model_name)
    return _MODEL


def text2audio(
    text: str,
    duration: float = 10.0,
    guidance_scale: float = 3.5,
    seed: int = 45,
    n_candidates: int = 3,
    model_name: str = "audioldm2-full",
):
    from audioldm2_tpu.pipeline import text_to_audio

    model = _get_model(model_name)
    waveform = text_to_audio(
        model,
        text,
        seed=int(seed),
        duration=duration,
        guidance_scale=guidance_scale,
        ddim_steps=200,
        n_candidate_gen_per_text=int(n_candidates),
    )
    sr = model.cfg.preprocessing.sampling_rate
    return [(sr, (w[0] * 32767).astype(np.int16)) for w in waveform]


def main():
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed; `pip install gradio` to run the web demo")
        return 1

    with gr.Blocks() as demo:
        gr.Markdown("# AudioLDM2 (TPU-native) — text-to-audio")
        text = gr.Textbox(label="Prompt")
        duration = gr.Slider(2.5, 10, value=10, step=2.5, label="Duration (s)")
        scale = gr.Slider(0, 7, value=3.5, step=0.5, label="Guidance scale")
        seed = gr.Number(value=45, label="Seed")
        n_cand = gr.Slider(1, 5, value=3, step=1, label="Candidates")
        out = gr.Audio(label="Output")
        btn = gr.Button("Generate")
        btn.click(
            lambda t, d, s, sd, n: text2audio(t, d, s, sd, n)[0],
            inputs=[text, duration, scale, seed, n_cand],
            outputs=out,
        )
    demo.launch()
    return 0


if __name__ == "__main__":
    sys.exit(main())
