"""Tiny but structurally complete ModelConfig for fast CPU e2e tests."""

from audioldm2_tpu.config import (
    ConditionerSpec,
    DiffusionConfig,
    FlanT5Config,
    ModelConfig,
    PreprocessingConfig,
    UNetConfig,
    VAEConfig,
    VocoderConfig,
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
