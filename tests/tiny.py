"""Tiny but structurally complete ModelConfig for fast CPU e2e tests."""

from audioldm2_tpu.config import (
    CLAPConfig,
    ConditionerSpec,
    DiffusionConfig,
    FlanT5Config,
    ModelConfig,
    PreprocessingConfig,
    UNetConfig,
    VAEConfig,
    VocoderConfig,
)


def tiny_clap_config(embed_mode: str = "text") -> CLAPConfig:
    """Tiny CLAP (PANN-CNN10 audio tower + 1-layer RoBERTa text tower)
    registered into the variant registry — shared by the reranker and
    film-pipeline tests."""
    from audioldm2_tpu.models import clap as clap_model
    from audioldm2_tpu.models import roberta as roberta_m
    from audioldm2_tpu.models.pann import PANNConfig

    clap_model.register_audio_tower(
        "PANN-tiny",
        lambda: PANNConfig(
            sample_rate=1600, window_size=64, hop_size=16, mel_bins=16,
            fmin=10.0, fmax=790.0, embed_dim=24, variant="cnn10",
            channels_override=(8, 16),
        ),
        24,
    )
    clap_model.register_text_tower(
        "roberta-tiny",
        lambda: roberta_m.RobertaConfig(
            hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32
        ),
        16,
    )
    return CLAPConfig(
        embed_mode=embed_mode,
        amodel="PANN-tiny",
        tmodel="roberta-tiny",
        sampling_rate=1600,
        embed_dim=24,
        clip_samples=1024,
        text_max_length=16,
    )

TINY_T5 = FlanT5Config(
    d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4, vocab_size=32128,
    max_length=16,
)


def tiny_t5_model_config() -> ModelConfig:
    """Miniature analogue of audioldm_16k_crossattn_t5."""
    return ModelConfig(
        name="tiny-t5",
        compute_dtype="float32",
        preprocessing=PreprocessingConfig(
            sampling_rate=1600,
            filter_length=64,
            hop_length=16,
            win_length=64,
            n_mel_channels=16,
            mel_fmin=0.0,
            mel_fmax=800.0,
        ),
        vae=VAEConfig(embed_dim=4, z_channels=4, ch=32, ch_mult=(1, 2), num_res_blocks=1, mel_bins=16),
        vocoder=VocoderConfig(
            num_mels=16,
            upsample_rates=(4, 4),
            upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=32,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),),
            sampling_rate=1600,
        ),
        unet=UNetConfig(
            in_channels=4,
            out_channels=4,
            model_channels=32,
            num_res_blocks=1,
            attention_resolutions=(2,),
            channel_mult=(1, 2),
            num_head_channels=16,
            context_dims=(32,),
        ),
        diffusion=DiffusionConfig(),
        conditioners=(
            ConditionerSpec(name="crossattn_flan_t5", kind="flan_t5", flan_t5=TINY_T5),
        ),
        latent_t_size=50,
        latent_f_size=8,
        latent_channels=4,
        latent_t_per_second=50.0,
        reranker_clap=None,
    )
