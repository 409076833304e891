"""End-to-end pipeline tests on a tiny structurally-complete model."""

import numpy as np
import pytest
from scipy.io import wavfile

from audioldm2_tpu import pipeline
from tiny import tiny_t5_model_config


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_t5_model_config()
    import jax
    import jax.numpy as jnp

    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)

    # The reference zero-initializes every residual-out projection
    # (zero_module), which makes conditioning a no-op under *random* weights.
    # Real checkpoints have trained values there; emulate that by jittering
    # all-zero leaves so information flows end to end.
    leaves, treedef = jax.tree.flatten(params)
    key = jax.random.PRNGKey(123)
    out = []
    for leaf in leaves:
        if hasattr(leaf, "shape") and leaf.size and not jnp.any(leaf):
            key, k = jax.random.split(key)
            leaf = 0.02 * jax.random.normal(k, leaf.shape, jnp.float32)
        out.append(leaf)
    params = jax.tree.unflatten(treedef, out)
    return pipeline.AudioLDM2(cfg, params)


def test_text_to_audio(tiny_model):
    wav = pipeline.text_to_audio(
        tiny_model,
        "a dog barking",
        seed=1,
        ddim_steps=5,
        duration=0.64,
        batchsize=1,
        guidance_scale=3.5,
        n_candidate_gen_per_text=2,
        duration_bucket=None,
    )
    assert wav.shape == (1, 1, 1024)  # 0.5 s @ 1600 Hz
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0


def test_text_to_audio_deterministic_per_seed(tiny_model):
    kw = dict(ddim_steps=4, duration=0.64, n_candidate_gen_per_text=1, duration_bucket=None)
    a = pipeline.text_to_audio(tiny_model, "rain", seed=7, **kw)
    b = pipeline.text_to_audio(tiny_model, "rain", seed=7, **kw)
    c = pipeline.text_to_audio(tiny_model, "rain", seed=8, **kw)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


def test_prompt_changes_output(tiny_model):
    kw = dict(seed=7, ddim_steps=4, duration=0.64, n_candidate_gen_per_text=1, duration_bucket=None)
    a = pipeline.text_to_audio(tiny_model, "rain falling", **kw)
    b = pipeline.text_to_audio(tiny_model, "a trumpet solo", **kw)
    assert np.abs(a - b).max() > 1e-6


def test_sr_inpainting(tiny_model, tmp_path):
    sr = 1600
    t = np.arange(sr) / sr
    tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "in.wav")
    wavfile.write(path, sr, (tone * 32767).astype(np.int16))

    wav = pipeline.super_resolution_and_inpainting(
        tiny_model,
        "a pure tone",
        original_audio_file_path=path,
        seed=3,
        ddim_steps=4,
        duration=0.64,
        n_candidate_gen_per_text=1,
    )
    assert wav.shape == (1, 1, 1024)
    assert np.isfinite(wav).all()


def test_batchsize_two(tiny_model):
    wav = pipeline.text_to_audio(
        tiny_model, "wind", seed=2, ddim_steps=4, duration=0.64,
        batchsize=2, n_candidate_gen_per_text=2, duration_bucket=None,
    )
    assert wav.shape == (2, 1, 1024)


def test_sr_inpainting_plms(tiny_model, tmp_path):
    """--mode sr_inpainting --sampler plms: the reference PLMS has the same
    mask blend as DDIM (plms.py:222-227); round 2 wrongly refused it."""
    sr = 1600
    t = np.arange(sr) / sr
    tone = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    path = str(tmp_path / "in_plms.wav")
    wavfile.write(path, sr, (tone * 32767).astype(np.int16))

    wav = pipeline.super_resolution_and_inpainting(
        tiny_model,
        "a pure tone",
        original_audio_file_path=path,
        seed=3,
        ddim_steps=4,
        duration=0.64,
        n_candidate_gen_per_text=1,
        sampler="plms",
    )
    assert wav.shape == (1, 1, 1024)
    assert np.isfinite(wav).all()
