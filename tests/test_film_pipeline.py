"""True 48k-family e2e: FiLM conditioning via a real (tiny) CLAP through
``text_to_audio`` — covers encode_conditioning's film path (squeeze / tile /
CFG-stack, latent_diffusion.py) that the reference wires through
DiffusionWrapper's ``concat -> y`` contract (reference openaimodel.py:550-557,
869-870; ddpm.py:1821-1879).

Also covers CLAP ``embed_mode="audio"`` as a conditioner (reference
modules.py:689-716): audio-conditioned generation from a waveform batch key.
"""

import dataclasses

import numpy as np
import pytest

from audioldm2_tpu import pipeline
from audioldm2_tpu.config import (
    ConditionerSpec,
    ModelConfig,
    PreprocessingConfig,
    UNetConfig,
    VAEConfig,
    VocoderConfig,
)
from tiny import tiny_clap_config


def _film_model_config(embed_mode: str) -> ModelConfig:
    clap = tiny_clap_config(embed_mode)
    return ModelConfig(
        name="tiny-48k-film",
        compute_dtype="float32",
        preprocessing=PreprocessingConfig(
            sampling_rate=1600, filter_length=64, hop_length=16, win_length=64,
            n_mel_channels=16, mel_fmin=0.0, mel_fmax=800.0,
        ),
        vae=VAEConfig(embed_dim=4, z_channels=4, ch=32, ch_mult=(1, 2),
                      num_res_blocks=1, mel_bins=16),
        vocoder=VocoderConfig(
            num_mels=16, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=32, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),), sampling_rate=1600,
        ),
        unet=UNetConfig(
            in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
            attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=16,
            context_dims=(None,), extra_film_condition_dim=clap.embed_dim,
        ),
        conditioners=(
            ConditionerSpec(name="film_clap_cond1", kind="clap", clap=clap),
        ),
        latent_t_size=32, latent_f_size=8, latent_channels=4,
        latent_t_per_second=50.0, reranker_clap=None,
    )


@pytest.fixture(scope="module")
def film_model():
    import jax

    cfg = _film_model_config("text")
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    return pipeline.AudioLDM2(cfg, params)


def test_48k_family_text_to_audio_e2e(film_model):
    """The film conditioner path end-to-end: prompt -> CLAP text film vector
    -> FiLM'd UNet -> VAE -> vocoder, with CFG (uncond film = ""-embedding)."""
    duration = 0.4  # 32 latent frames / 50 lat-fps... 0.64s bucket trimmed
    wav = pipeline.text_to_audio(
        film_model, "a duck quacking", seed=7, ddim_steps=4,
        duration=duration, batchsize=2, guidance_scale=3.5,
        n_candidate_gen_per_text=1, duration_bucket=None,
    )
    sr = film_model.cfg.preprocessing.sampling_rate
    assert wav.shape == (2, 1, int(duration * sr))
    assert np.isfinite(wav).all()
    assert np.ptp(wav) > 0  # non-degenerate output


def test_film_cfg_differs_from_uncond():
    """Guidance must actually change the output (the film CFG stack is live,
    not silently feeding cond==uncond). Fresh-init UNets have zero-init out
    convs (reference zero_module) so eps==0 regardless of conditioning —
    perturb every zero leaf to make the score depend on the film vector."""
    import jax
    import jax.numpy as jnp

    cfg = _film_model_config("text")
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)

    leaves, treedef = jax.tree.flatten(params["unet"])
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    leaves = [
        a + 0.02 * jax.random.normal(k, a.shape, a.dtype)
        if (hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) and not bool(jnp.any(a)))
        else a
        for a, k in zip(leaves, keys)
    ]
    params["unet"] = jax.tree.unflatten(treedef, leaves)
    model = pipeline.AudioLDM2(cfg, params)

    kw = dict(seed=7, ddim_steps=4, duration=0.4, batchsize=1,
              n_candidate_gen_per_text=1, duration_bucket=None)
    w1 = pipeline.text_to_audio(model, "a duck quacking",
                                guidance_scale=1.0, **kw)
    w2 = pipeline.text_to_audio(model, "a duck quacking",
                                guidance_scale=5.0, **kw)
    assert np.abs(w1 - w2).max() > 1e-6


# ---------------------------------------------------------------------------
# embed_mode="audio"
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def audio_film_model():
    import jax

    cfg = _film_model_config("audio")
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    return pipeline.AudioLDM2(cfg, params)


def test_audio_embed_mode_batch_and_encode(audio_film_model):
    """make_batch prepares clap_waveform_48k and the conditioner embeds it
    through the audio tower (reference modules.py:689-716)."""
    import jax.numpy as jnp

    from audioldm2_tpu.models import clap as clap_model
    from audioldm2_tpu.models import conditioners

    model = audio_film_model
    rng = np.random.default_rng(0)
    waveform = np.asarray(rng.standard_normal((1, 800)), np.float32)

    batch = model.make_batch("", batchsize=2, waveform=waveform)
    clap_cfg = model.cfg.conditioners[0].clap
    assert batch["clap_waveform_48k"].shape == (2, clap_cfg.clip_samples)
    # repeatpad data_filling: 800 samples tiled to fill 1024
    np.testing.assert_allclose(
        batch["clap_waveform_48k"][0, :224], waveform[0, :224], rtol=1e-6
    )

    spec = model.cfg.conditioners[0]
    kind, emb = conditioners.encode(
        model.ldm.params["cond"][spec.name], spec, batch
    )
    assert kind == "film"
    direct = clap_model.audio_embedding(
        model.ldm.params["cond"][spec.name]["clap"], clap_cfg,
        jnp.asarray(batch["clap_waveform_48k"]),
    )
    np.testing.assert_allclose(np.asarray(emb), np.asarray(direct), rtol=1e-5)
    # normalized 512-d (here 24-d) joint embedding
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-4
    )


def test_audio_embed_mode_generate_e2e(audio_film_model):
    """Audio-conditioned generation end-to-end (waveform -> film -> UNet)."""
    import jax

    model = audio_film_model
    rng = np.random.default_rng(1)
    waveform = np.asarray(rng.standard_normal((1, 1024)), np.float32)
    batch = model.make_batch("", batchsize=1, waveform=waveform)
    wav, mel = model.ldm.generate(
        batch, jax.random.PRNGKey(0), latent_t_size=32, n_gen=1,
        guidance=2.0, ddim_steps=4,
    )
    assert np.isfinite(wav).all() and np.ptp(wav) > 0


def test_audio_embed_mode_zero_waveform_default(audio_film_model):
    """Without a waveform the batch carries a zero clip (shape-stable jit)."""
    batch = audio_film_model.make_batch("x", batchsize=3)
    clap_cfg = audio_film_model.cfg.conditioners[0].clap
    assert batch["clap_waveform_48k"].shape == (3, clap_cfg.clip_samples)
    assert not batch["clap_waveform_48k"].any()
