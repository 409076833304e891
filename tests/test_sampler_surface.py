"""Sampler selection + duration bucketing through the public pipeline."""

import numpy as np
import pytest

from audioldm2_tpu import pipeline
from tiny import tiny_t5_model_config


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    cfg = tiny_t5_model_config()
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    return pipeline.AudioLDM2(cfg, params)


def test_round_up_duration_grid():
    assert pipeline.round_up_duration(10.0) == 10.0
    assert pipeline.round_up_duration(9.2) == 10.0
    assert pipeline.round_up_duration(10.1) == 12.5
    assert pipeline.round_up_duration(2.5) == 2.5
    assert pipeline.round_up_duration(0.64) == 2.5
    assert pipeline.round_up_duration(0.64, bucket=0.32) == 0.64


def test_bucketing_trims_to_requested_duration(tiny_model):
    # 0.4 s request on a 0.32 s bucket -> generates 0.64 s, trims to 0.4 s
    wav = pipeline.text_to_audio(
        tiny_model, "rain", seed=3, ddim_steps=4, duration=0.40,
        n_candidate_gen_per_text=1, duration_bucket=0.32,
    )
    assert wav.shape == (1, 1, int(0.40 * 1600))
    assert np.isfinite(wav).all()


def test_sampler_selection_changes_trajectory(tiny_model):
    kw = dict(seed=9, ddim_steps=4, duration=0.64, n_candidate_gen_per_text=1,
              duration_bucket=None)
    a = pipeline.text_to_audio(tiny_model, "rain", sampler="ddim", **kw)
    b = pipeline.text_to_audio(tiny_model, "rain", sampler="plms", **kw)
    assert a.shape == b.shape
    assert np.abs(a - b).max() > 1e-6  # different samplers, different audio


def test_ancestral_sampler_reachable_from_pipeline(tiny_model):
    """sampler="ddpm" runs the full num_timesteps ancestral loop — use a
    short schedule model config to keep it fast."""
    import dataclasses

    import jax

    from audioldm2_tpu.config import DiffusionConfig

    cfg = dataclasses.replace(
        tiny_t5_model_config(), diffusion=DiffusionConfig(timesteps=20)
    )
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)
    wav = pipeline.text_to_audio(
        model, "wind", seed=2, ddim_steps=4, duration=0.64,
        n_candidate_gen_per_text=1, sampler="ddpm", duration_bucket=None,
    )
    assert wav.shape == (1, 1, 1024)
    assert np.isfinite(wav).all()


def test_last_timings_observability(tiny_model, capsys, monkeypatch):
    """Every text_to_audio call records host-visible stage timings
    (tokenize / generate / rerank) on model.last_timings; AUDIOLDM2_TIMINGS
    prints a one-line summary."""
    monkeypatch.setenv("AUDIOLDM2_TIMINGS", "1")
    pipeline.text_to_audio(
        tiny_model, "rain", seed=3, ddim_steps=2, duration=0.64,
        n_candidate_gen_per_text=1, duration_bucket=None,
    )
    t = tiny_model.last_timings
    for k in ("tokenize_s", "generate_s", "rerank_s", "total_s", "x_realtime"):
        assert k in t and np.isfinite(t[k])
    assert t["generate_s"] > 0
    assert t["total_s"] >= t["generate_s"]
    assert "[audioldm2_tpu]" in capsys.readouterr().out


def test_cli_sampler_flag():
    from audioldm2_tpu.cli import build_parser

    args = build_parser().parse_args(["-t", "x", "--sampler", "plms"])
    assert args.sampler == "plms"
    with pytest.raises(SystemExit):
        build_parser().parse_args(["-t", "x", "--sampler", "euler"])
