"""Production-geometry parity spot-checks vs the PyTorch reference.

The tiny-config parity suite can hide broadcasting/indexing bugs that only
appear at real channel counts (channel_mult=(1,2,3,5), ds=8, 1024-wide T5
context). These slow tests run ONE forward of each compute-heavy module at
the shipped 16 kHz-family geometry (reference utils.py:247-270) with random
weights converted through the real converter:

- UNet denoising step, B=1, latent [1, 256, 16, 8], T5 context [1, 128, 1024]
  (reference openaimodel.py:476-885)
- VAE decode, z [1, 256, 16, 8] -> mel [1, 1024, 64, 1]
  (reference modules/diffusionmodules/model.py:419-686)
- HiFi-GAN 16k vocoder, mel [1, 1024, 64] -> wav [1, 163840]
  (reference hifigan/models.py:112-174)
"""

import numpy as np
import pytest

import _reference
from audioldm2_tpu import convert
from audioldm2_tpu.config import UNetConfig, VAEConfig, VocoderConfig
from audioldm2_tpu.models import unet as junet
from audioldm2_tpu.models import vae as jvae
from audioldm2_tpu.models import vocoder as jvoc

pytestmark = pytest.mark.slow


def test_unet_production_step_parity(rng):
    torch = pytest.importorskip("torch")
    om = _reference.load(
        "audioldm2.latent_diffusion.modules.diffusionmodules.openaimodel"
    )
    cfg = UNetConfig(context_dims=(1024,))  # audioldm_16k_crossattn_t5
    torch.manual_seed(0)
    ref = om.UNetModel(
        image_size=64,
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        model_channels=cfg.model_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        channel_mult=list(cfg.channel_mult),
        num_head_channels=cfg.num_head_channels,
        use_spatial_transformer=True,
        transformer_depth=cfg.transformer_depth,
        context_dim=list(cfg.context_dims),
    ).eval()
    params = convert.convert_unet(
        convert.state_dict_to_numpy(ref.state_dict()), cfg, prefix=""
    )

    x = rng.standard_normal((1, 256, 16, cfg.in_channels)).astype(np.float32)
    ts = np.array([421.0], np.float32)
    ctx = rng.standard_normal((1, 128, 1024)).astype(np.float32) * 0.3
    mask = np.ones((1, 128), np.float32)
    mask[:, 100:] = 0.0

    with torch.no_grad():
        out_t = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            timesteps=torch.from_numpy(ts),
            context_list=[torch.from_numpy(ctx)],
            context_attn_mask_list=[torch.from_numpy(mask)],
        ).numpy().transpose(0, 2, 3, 1)

    out_j = np.asarray(
        junet.apply_unet(params, cfg, x, ts, context_list=[ctx],
                         context_mask_list=[mask])
    )
    assert out_j.shape == out_t.shape == x.shape
    # f32 everywhere; production depth accumulates a little more error than
    # the tiny configs (2e-4) but must stay in the same decade
    np.testing.assert_allclose(out_j, out_t, atol=1e-3, rtol=1e-3)
    # spectrogram-scale agreement: MAE well under the 1e-3 north-star budget
    assert np.abs(out_j - out_t).mean() < 1e-4


def test_vae_decode_production_parity(rng):
    torch = pytest.importorskip("torch")
    model_mod = _reference.load(
        "audioldm2.latent_diffusion.modules.diffusionmodules.model"
    )
    cfg = VAEConfig()  # 16k family: ch=128, mult (1,2,4), 64 mel bins
    torch.manual_seed(0)
    ddconfig = dict(
        double_z=True, mel_bins=cfg.mel_bins, z_channels=cfg.z_channels,
        resolution=256, in_channels=1, out_ch=1, ch=cfg.ch,
        ch_mult=list(cfg.ch_mult), num_res_blocks=cfg.num_res_blocks,
        attn_resolutions=[], dropout=0.0,
    )
    dec = model_mod.Decoder(**ddconfig).eval()
    post = torch.nn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
    sd = {f"decoder.{k}": v for k, v in dec.state_dict().items()}
    sd.update({f"post_quant_conv.{k}": v for k, v in post.state_dict().items()})
    # encoder/quant keys must exist for convert_vae; reuse decoder-shaped enc
    enc = model_mod.Encoder(**ddconfig).eval()
    quant = torch.nn.Conv2d(2 * cfg.z_channels, 2 * cfg.embed_dim, 1)
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    params = convert.convert_vae(convert.state_dict_to_numpy(sd), cfg)

    z = (rng.standard_normal((1, 256, 16, cfg.embed_dim)) * 0.5).astype(np.float32)
    with torch.no_grad():
        mel_t = dec(post(torch.from_numpy(z.transpose(0, 3, 1, 2)))).numpy()
    mel_j = np.asarray(jvae.decode(params, cfg, z))
    assert mel_j.shape == (1, 1024, 64, 1)
    np.testing.assert_allclose(
        mel_j, mel_t.transpose(0, 2, 3, 1), atol=2e-3, rtol=1e-3
    )
    assert np.abs(mel_j - mel_t.transpose(0, 2, 3, 1)).mean() < 1e-4


def test_vocoder_production_parity(rng):
    torch = pytest.importorskip("torch")
    models = _reference.load("audioldm2.hifigan.models")
    cfg = VocoderConfig()  # 16k: 1024 initial channels, 160x upsampling

    class _H(dict):
        __getattr__ = dict.__getitem__

    torch.manual_seed(0)
    gen = models.Generator(
        _H(
            resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
            resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
            upsample_rates=list(cfg.upsample_rates),
            upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
            upsample_initial_channel=cfg.upsample_initial_channel,
            num_mels=cfg.num_mels,
            resblock=cfg.resblock,
        )
    ).eval()
    params = convert.convert_vocoder(
        convert.state_dict_to_numpy(gen.state_dict()), cfg, prefix=""
    )
    gen.remove_weight_norm()

    mel = (rng.standard_normal((1, 1024, cfg.num_mels)) * 0.5).astype(np.float32)
    with torch.no_grad():
        wav_t = gen(torch.from_numpy(mel.transpose(0, 2, 1))).squeeze(1).numpy()
    wav_j = np.asarray(jvoc.apply_vocoder(params, cfg, mel))
    # ConvTranspose1d with padding=(k-u)//2 overshoots 160x by a few samples
    # at this kernel/rate ladder ((16,5) stage alone adds +1 pre-upsampling);
    # the reference trims to duration*sr downstream (pipeline.py:124-125),
    # as does our text_to_audio. Parity requires identical UNTRIMMED shapes.
    assert wav_j.shape == wav_t.shape == (1, 163872)
    np.testing.assert_allclose(wav_j, wav_t, atol=5e-4, rtol=1e-3)
    assert np.abs(wav_j - wav_t).mean() < 1e-4


def test_unet_48k_film_production_parity(rng):
    """48k-family UNet: film-only conditioning (context-free ST slot +
    FiLM 512) at latent [1, 128, 32, 16] (reference utils.py:415-447)."""
    torch = pytest.importorskip("torch")
    om = _reference.load(
        "audioldm2.latent_diffusion.modules.diffusionmodules.openaimodel"
    )
    cfg = UNetConfig(
        in_channels=16, out_channels=16, context_dims=(None,),
        extra_film_condition_dim=512,
    )
    torch.manual_seed(0)
    ref = om.UNetModel(
        image_size=64,
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        model_channels=cfg.model_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        channel_mult=list(cfg.channel_mult),
        num_head_channels=cfg.num_head_channels,
        use_spatial_transformer=True,
        transformer_depth=cfg.transformer_depth,
        context_dim=list(cfg.context_dims),
        extra_film_condition_dim=cfg.extra_film_condition_dim,
    ).eval()
    params = convert.convert_unet(
        convert.state_dict_to_numpy(ref.state_dict()), cfg, prefix=""
    )

    x = rng.standard_normal((1, 128, 32, cfg.in_channels)).astype(np.float32)
    ts = np.array([177.0], np.float32)
    y = rng.standard_normal((1, 512)).astype(np.float32) * 0.2

    with torch.no_grad():
        out_t = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            timesteps=torch.from_numpy(ts),
            context_list=[],
            context_attn_mask_list=[],
            y=torch.from_numpy(y),
        ).numpy().transpose(0, 2, 3, 1)
    out_j = np.asarray(junet.apply_unet(params, cfg, x, ts, y=y))
    assert out_j.shape == out_t.shape == x.shape
    np.testing.assert_allclose(out_j, out_t, atol=1e-3, rtol=1e-3)
    assert np.abs(out_j - out_t).mean() < 1e-4


def test_unet_large_production_step_parity(rng):
    """large-1150k UNet: 3 context slots (768, 1024, None) at transformer
    depth 2, latent [1, 256, 16, 8] (reference utils.py large config)."""
    torch = pytest.importorskip("torch")
    om = _reference.load(
        "audioldm2.latent_diffusion.modules.diffusionmodules.openaimodel"
    )
    cfg = UNetConfig(context_dims=(768, 1024, None), transformer_depth=2)
    torch.manual_seed(0)
    ref = om.UNetModel(
        image_size=64,
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        model_channels=cfg.model_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        channel_mult=list(cfg.channel_mult),
        num_head_channels=cfg.num_head_channels,
        use_spatial_transformer=True,
        transformer_depth=cfg.transformer_depth,
        context_dim=list(cfg.context_dims),
    ).eval()
    params = convert.convert_unet(
        convert.state_dict_to_numpy(ref.state_dict()), cfg, prefix=""
    )

    x = rng.standard_normal((1, 256, 16, cfg.in_channels)).astype(np.float32)
    ts = np.array([512.0], np.float32)
    ctx0 = rng.standard_normal((1, 8, 768)).astype(np.float32) * 0.3
    ctx1 = rng.standard_normal((1, 128, 1024)).astype(np.float32) * 0.3
    m0 = np.ones((1, 8), np.float32)
    m1 = np.ones((1, 128), np.float32)
    m1[:, 100:] = 0.0

    with torch.no_grad():
        out_t = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            timesteps=torch.from_numpy(ts),
            context_list=[torch.from_numpy(ctx0), torch.from_numpy(ctx1)],
            context_attn_mask_list=[torch.from_numpy(m0), torch.from_numpy(m1)],
        ).numpy().transpose(0, 2, 3, 1)
    out_j = np.asarray(
        junet.apply_unet(params, cfg, x, ts, context_list=[ctx0, ctx1],
                         context_mask_list=[m0, m1])
    )
    assert out_j.shape == out_t.shape == x.shape
    np.testing.assert_allclose(out_j, out_t, atol=1e-3, rtol=1e-3)
    assert np.abs(out_j - out_t).mean() < 1e-4


def test_vae_48k_decode_production_parity(rng):
    """48k VAE decode: ch_mult (1,2,4,8), 256 mel bins, z=16 at
    [1, 128, 32, 16] -> [1, 1024, 256, 1]."""
    torch = pytest.importorskip("torch")
    model_mod = _reference.load(
        "audioldm2.latent_diffusion.modules.diffusionmodules.model"
    )
    cfg = VAEConfig(embed_dim=16, z_channels=16, ch_mult=(1, 2, 4, 8), mel_bins=256)
    torch.manual_seed(0)
    ddconfig = dict(
        double_z=True, mel_bins=cfg.mel_bins, z_channels=cfg.z_channels,
        resolution=256, in_channels=1, out_ch=1, ch=cfg.ch,
        ch_mult=list(cfg.ch_mult), num_res_blocks=cfg.num_res_blocks,
        attn_resolutions=[], dropout=0.0,
    )
    dec = model_mod.Decoder(**ddconfig).eval()
    post = torch.nn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
    sd = {f"decoder.{k}": v for k, v in dec.state_dict().items()}
    sd.update({f"post_quant_conv.{k}": v for k, v in post.state_dict().items()})
    enc = model_mod.Encoder(**ddconfig).eval()
    quant = torch.nn.Conv2d(2 * cfg.z_channels, 2 * cfg.embed_dim, 1)
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    params = convert.convert_vae(convert.state_dict_to_numpy(sd), cfg)

    z = (rng.standard_normal((1, 128, 32, cfg.embed_dim)) * 0.5).astype(np.float32)
    with torch.no_grad():
        mel_t = dec(post(torch.from_numpy(z.transpose(0, 3, 1, 2)))).numpy()
    mel_j = np.asarray(jvae.decode(params, cfg, z))
    assert mel_j.shape == (1, 1024, 256, 1)
    np.testing.assert_allclose(
        mel_j, mel_t.transpose(0, 2, 3, 1), atol=2e-3, rtol=1e-3
    )
    assert np.abs(mel_j - mel_t.transpose(0, 2, 3, 1)).mean() < 1e-4
