"""Gradio app surface — the pure-python pieces, no gradio required.

Covers reference app.py:16-54 parity: model-name -> (latent rate, sample
rate) switching, the waveform->video render ladder's deterministic pieces
(background image, per-frame bar render, progress sweep), and the bs==1
collapse of render_outputs.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import app  # noqa: E402


def test_family_rates_matches_reference_switch():
    # reference app.py:32-37
    assert app.family_rates("audioldm_48k") == (12.8, 48000)
    assert app.family_rates("audioldm_crossattn_flant5") == (25.6, 16000)
    assert app.family_rates("audioldm2-full") == (25.6, 16000)


def test_model_choices_resolve_to_config_presets():
    from audioldm2_tpu.config import default_audioldm_config

    for name in app.MODEL_CHOICES:
        cfg = default_audioldm_config(name)
        assert cfg.name == name
    # the reference dropdown's t5 alias must hit the t5 preset
    cfg = default_audioldm_config("audioldm_crossattn_flant5")
    assert cfg.unet.context_dims == (1024,)


def test_bg_image_roundtrip(tmp_path):
    path = app.make_bg_image(str(tmp_path / "bg.png"), width=64, height=32)
    from PIL import Image

    img = np.asarray(Image.open(path))
    assert img.shape == (32, 64, 3)
    # gradient: bottom row differs from top row
    assert not np.array_equal(img[0], img[-1])


def test_waveform_frame_progress_sweep():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(16000).astype(np.float32)
    f_none = app.waveform_frame(wav, width=200, height=80, bars=20, progress=0.0)
    f_half = app.waveform_frame(wav, width=200, height=80, bars=20, progress=0.5)
    f_full = app.waveform_frame(wav, width=200, height=80, bars=20, progress=1.0)
    assert f_none.shape == (80, 200, 3)
    # progress lights bars up to the cursor: more white pixels as it sweeps
    white = lambda f: int((f == 255).all(axis=-1).sum())  # noqa: E731
    assert white(f_none) < white(f_half) < white(f_full)
    # left half identical between half and full renders is NOT expected
    # (colors differ right of the cursor only)
    assert np.array_equal(f_half[:, :100], f_full[:, :100])


def test_render_outputs_audio_fallback_collapses_single():
    # no gradio + no ffmpeg in this image -> audio tuples
    wav = np.zeros((1, 1, 1600), np.float32)
    out = app.render_outputs(16000, wav)
    assert isinstance(out, tuple) and out[0] == 16000
    assert out[1].dtype == np.int16

    wav2 = np.zeros((2, 1, 1600), np.float32)
    out2 = app.render_outputs(16000, wav2)
    assert isinstance(out2, list) and len(out2) == 2


def test_make_waveform_video_requires_ffmpeg():
    import shutil

    if shutil.which("ffmpeg") is not None:
        pytest.skip("ffmpeg present: covered by render path")
    assert app.make_waveform_video(16000, np.zeros(1600, np.float32)) is None
