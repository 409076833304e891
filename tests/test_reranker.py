"""CLAP candidate reranking (reference ddpm.py:114-120,1554-1568).

Proves the default ``n_candidate_gen_per_text > 1`` path actually selects
the argmax-cosine-similarity candidate (not silently candidate #1), and that
the missing-weights fallback warns loudly.
"""

import dataclasses

import numpy as np
import pytest

from audioldm2_tpu import pipeline
from audioldm2_tpu.config import CLAPConfig
from audioldm2_tpu.models import clap as clap_model
from audioldm2_tpu.models import roberta as roberta_m
from audioldm2_tpu.models.pann import PANNConfig
from tiny import tiny_t5_model_config

# Tiny towers registered into the CLAP variant registry (the same mechanism
# that selects HTSAT/PANN x roberta/bert/bart/transformer at full size).
clap_model.register_audio_tower(
    "PANN-test",
    lambda: PANNConfig(
        sample_rate=1600,
        window_size=64,
        hop_size=16,
        mel_bins=16,
        fmin=10.0,
        fmax=790.0,
        embed_dim=24,
        variant="cnn10",
        channels_override=(8, 16),
    ),
    24,
)
clap_model.register_text_tower(
    "roberta-test",
    lambda: roberta_m.RobertaConfig(
        hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32
    ),
    16,
)

TINY_RERANKER = CLAPConfig(
    amodel="PANN-test",
    tmodel="roberta-test",
    sampling_rate=1600,
    embed_dim=24,
    clip_samples=1024,
    text_max_length=16,
)


@pytest.fixture(scope="module")
def reranked_model():
    import jax

    cfg = dataclasses.replace(tiny_t5_model_config(), reranker_clap=TINY_RERANKER)
    params = pipeline.init_params(jax.random.PRNGKey(3), cfg)
    assert "reranker_clap" in params
    return pipeline.AudioLDM2(cfg, params)


def test_rerank_selects_argmax_candidate(reranked_model):
    model = reranked_model
    n_gen, steps, duration = 3, 4, 0.64

    out = pipeline.text_to_audio(
        model, "a dog barking", seed=11, ddim_steps=steps, duration=duration, duration_bucket=None,
        batchsize=1, n_candidate_gen_per_text=n_gen,
    )

    # reproduce the pre-rerank candidates with the same seed
    key = pipeline.seed_everything(11)
    batch = model.make_batch("a dog barking", batchsize=1)
    wav_all, _ = model.ldm.generate(
        batch, key,
        latent_t_size=int(duration * model.cfg.latent_t_per_second),
        n_gen=n_gen, guidance=3.5, ddim_steps=steps,
    )
    sim = clap_model.cos_similarity_waveform_text(
        model.ldm.params["reranker_clap"], model.cfg.reranker_clap,
        wav_all, "a dog barking", model.reranker_tok,
        model.cfg.preprocessing.sampling_rate,
    )
    assert sim.shape == (n_gen,)
    # candidates must genuinely differ in similarity, else argmax is vacuous
    assert np.ptp(sim) > 1e-6

    n_samples = int(duration * model.cfg.preprocessing.sampling_rate)
    best = int(np.argmax(sim))
    np.testing.assert_array_equal(out[0, 0], wav_all[best, :n_samples])


def test_rerank_batched_indexing(reranked_model):
    """Candidate k of prompt-row i lives at i + k*B (reference ddpm.py:1560-1566)."""
    model = reranked_model
    wav = np.asarray(
        np.random.default_rng(0).standard_normal((6, 1024)), np.float32
    )  # B=2, n_gen=3
    out = pipeline.rerank_and_select(model, wav, "water drops", batchsize=2, n_gen=3)
    sim = clap_model.cos_similarity_waveform_text(
        model.ldm.params["reranker_clap"], model.cfg.reranker_clap,
        wav, "water drops", model.reranker_tok,
        model.cfg.preprocessing.sampling_rate,
    )
    for i in range(2):
        best = i + int(np.argmax(sim[i::2])) * 2
        np.testing.assert_array_equal(out[i], wav[best])


def test_missing_reranker_warns():
    import jax

    cfg = tiny_t5_model_config()  # reranker_clap=None
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)
    wav = np.zeros((3, 64), np.float32)
    with pytest.warns(UserWarning, match="no CLAP reranker weights"):
        out = pipeline.rerank_and_select(model, wav, "x", batchsize=1, n_gen=3)
    assert out.shape == (1, 64)


def test_device_resample_matches_host_polyphase():
    """resample_poly_jnp (one XLA dilated conv inside the jitted scorer)
    == the host polyphase path (scipy resample_poly semantics) bit-near."""
    import jax.numpy as jnp
    from scipy.signal import resample_poly

    from audioldm2_tpu.models.clap import resample_poly_jnp

    rng = np.random.default_rng(3)
    for n, up, down in [(16000, 3, 1), (1600, 3, 1), (48000, 1, 3)]:
        x = rng.standard_normal((2, n)).astype(np.float32)
        ours = np.asarray(resample_poly_jnp(jnp.asarray(x), up, down))
        want = resample_poly(x, up, down, axis=-1).astype(np.float32)
        assert ours.shape == want.shape
        np.testing.assert_allclose(ours, want, atol=2e-6)
