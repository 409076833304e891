"""End-to-end pipeline tests for the 48k (FiLM) and speech (TTS) families,
on tiny structurally-faithful configs."""

import numpy as np
import pytest

from audioldm2_tpu import pipeline
from audioldm2_tpu.config import (
    CLAPConfig,
    ConditionerSpec,
    GPT2Config,
    ModelConfig,
    PhonemeEncoderConfig,
    PreprocessingConfig,
    SequenceGenConfig,
    UNetConfig,
    VAEConfig,
    VocoderConfig,
)
from tiny import TINY_T5


def _tiny_common(**kw):
    return dict(
        compute_dtype="float32",
        preprocessing=PreprocessingConfig(
            sampling_rate=1600, filter_length=64, hop_length=16, win_length=64,
            n_mel_channels=16, mel_fmin=0.0, mel_fmax=800.0,
        ),
        vae=VAEConfig(embed_dim=4, z_channels=4, ch=32, ch_mult=(1, 2), num_res_blocks=1, mel_bins=16),
        vocoder=VocoderConfig(
            num_mels=16, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=32, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),), sampling_rate=1600,
        ),
        latent_t_size=32, latent_f_size=8, latent_channels=4,
        latent_t_per_second=50.0, reranker_clap=None,
        **kw,
    )


TINY_PHONEME = PhonemeEncoderConfig(
    vocab_size=183, pad_token_id=0, pad_length=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=1, kernel_size=3, window_size=4,
)


@pytest.mark.slow
def test_48k_family_film_conditioning(monkeypatch):
    """FiLM-only conditioning like audioldm_48k — but CLAP is huge, so a
    film conditioner is emulated by a tiny CLAP-free spec via phoneme?
    Instead: run a UNet with extra_film_condition_dim fed by a zero film
    vector through the orchestrator directly."""
    import jax
    import jax.numpy as jnp

    from audioldm2_tpu.diffusion.latent_diffusion import LatentDiffusionModel

    cfg = ModelConfig(
        name="tiny-48k",
        unet=UNetConfig(
            in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
            attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=16,
            context_dims=(None,), extra_film_condition_dim=8,
        ),
        conditioners=(),
        **_tiny_common(),
    )
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)

    # drive the UNet directly with film y (the conditioner-free analogue)
    from audioldm2_tpu.models import unet as unet_m

    x = np.zeros((1, 32, 8, 4), np.float32)
    y = np.ones((1, 8), np.float32)
    out = unet_m.apply_unet(params["unet"], cfg.unet, x, np.zeros((1,), np.float32), [], [], y=y)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def tts_model():
    import jax

    seqgen = ConditionerSpec(
        name="crossattn_audiomae_generated",
        kind="sequence_gen",
        cond_stage_key="all",
        sequence_gen=SequenceGenConfig(
            sequence_gen_length=4,
            sequence_input_keys=("crossattn_vits_phoneme",),
            sequence_input_embed_dims=(TINY_PHONEME.hidden_channels,),
            gpt2=GPT2Config(n_embd=768, n_layer=1, n_head=4),
        ),
        nested=(
            ConditionerSpec(
                name="crossattn_vits_phoneme", kind="phoneme",
                cond_stage_key="phoneme_idx", phoneme=TINY_PHONEME,
            ),
        ),
    )
    cfg = ModelConfig(
        name="tiny-speech",
        unet=UNetConfig(
            in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
            attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=16,
            context_dims=(768,),
        ),
        conditioners=(seqgen,),
        **_tiny_common(),
    )
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)
    return model


def test_tts_family_e2e(tts_model, monkeypatch):
    # tiny phoneme pad_length differs from the production 310; patch the
    # host tokenizer pad length for this model
    from audioldm2_tpu.utils import text as T

    monkeypatch.setattr(
        pipeline.AudioLDM2, "make_batch", _make_batch_tiny_phonemes, raising=True
    )
    wav = pipeline.text_to_audio(
        tts_model,
        "A female reporter is speaking",
        transcription="hello world",
        seed=1,
        ddim_steps=4,
        duration=0.64,
        n_candidate_gen_per_text=1,
        duration_bucket=None,
    )
    assert wav.shape == (1, 1, 1024)
    assert np.isfinite(wav).all()


def _make_batch_tiny_phonemes(self, text, transcription="", batchsize=1, waveform=None, fbank=None):
    from audioldm2_tpu.utils import text as T

    batch = {}
    phonemes = T.text_to_phonemes(transcription) if transcription else ""
    batch["phoneme_idx"] = T.phoneme_ids([phonemes] * batchsize, pad_length=32)
    batch["ta_kaldi_fbank"] = np.zeros((batchsize, 1024, 128), np.float32)
    return batch
