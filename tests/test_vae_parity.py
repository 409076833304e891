"""VAE golden parity vs the PyTorch reference (random weights)."""

import numpy as np
import pytest

import _reference
from audioldm2_tpu.config import VAEConfig
from audioldm2_tpu import convert
from audioldm2_tpu.models import vae as jvae


SMALL = VAEConfig(embed_dim=4, z_channels=4, ch=32, ch_mult=(1, 2), num_res_blocks=2, mel_bins=16)


@pytest.fixture(scope="module")
def ref_autoencoder():
    torch = pytest.importorskip("torch")
    model_mod = _reference.load(
        "audioldm2.latent_diffusion.modules.diffusionmodules.model"
    )
    torch.manual_seed(0)
    ddconfig = dict(
        double_z=True,
        mel_bins=SMALL.mel_bins,
        z_channels=SMALL.z_channels,
        resolution=256,
        in_channels=1,
        out_ch=1,
        ch=SMALL.ch,
        ch_mult=list(SMALL.ch_mult),
        num_res_blocks=SMALL.num_res_blocks,
        attn_resolutions=[],
        dropout=0.0,
    )
    enc = model_mod.Encoder(**ddconfig).eval()
    dec = model_mod.Decoder(**ddconfig).eval()
    quant = torch.nn.Conv2d(2 * SMALL.z_channels, 2 * SMALL.embed_dim, 1)
    post = torch.nn.Conv2d(SMALL.embed_dim, SMALL.z_channels, 1)
    return enc, dec, quant, post


def _params_from_ref(enc, dec, quant, post):
    sd = {}
    for mod, name in [(enc, "encoder"), (dec, "decoder"), (quant, "quant_conv"), (post, "post_quant_conv")]:
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    return convert.convert_vae(convert.state_dict_to_numpy(sd), SMALL)


def test_encode_parity(ref_autoencoder, rng):
    torch = pytest.importorskip("torch")
    enc, dec, quant, post = ref_autoencoder
    params = _params_from_ref(enc, dec, quant, post)

    x = rng.standard_normal((2, 32, 16, 1)).astype(np.float32)
    with torch.no_grad():
        # torch layout [B, 1, T, M]
        ht = enc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        moments = quant(ht)
        mean_t, logvar_t = torch.chunk(moments, 2, dim=1)
    mean_j, logvar_j = jvae.encode_moments(params, SMALL, x)
    np.testing.assert_allclose(
        np.asarray(mean_j), mean_t.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(logvar_j), logvar_t.clamp(-30, 20).numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )


def test_decode_parity(ref_autoencoder, rng):
    torch = pytest.importorskip("torch")
    enc, dec, quant, post = ref_autoencoder
    params = _params_from_ref(enc, dec, quant, post)

    # ch_mult (1,2) -> one downsample: latent is [T/2, M/2]
    z = rng.standard_normal((2, 16, 8, SMALL.embed_dim)).astype(np.float32)
    with torch.no_grad():
        zt = torch.from_numpy(z.transpose(0, 3, 1, 2))
        mel_t = dec(post(zt)).numpy().transpose(0, 2, 3, 1)
    mel_j = np.asarray(jvae.decode(params, SMALL, z))
    assert mel_j.shape == mel_t.shape == (2, 32, 16, 1)
    np.testing.assert_allclose(mel_j, mel_t, atol=5e-4, rtol=1e-3)


def test_roundtrip_shapes():
    import jax

    cfg = VAEConfig()  # 16k default: mult (1,2,4)
    params = jvae.init_vae(jax.random.PRNGKey(0), cfg)
    x = np.zeros((1, 64, 64, 1), np.float32)
    mean, logvar = jvae.encode_moments(params, cfg, x)
    assert mean.shape == (1, 16, 16, 8)
    mel = jvae.decode(params, cfg, mean)
    assert mel.shape == (1, 64, 64, 1)


def test_vae_timestride4_parity(rng):
    """Anisotropic (4x time, 2x freq) striding levels
    (reference model.py:60-115)."""
    torch = pytest.importorskip("torch")
    model_mod = _reference.load(
        "audioldm2.latent_diffusion.modules.diffusionmodules.model"
    )
    torch.manual_seed(2)
    cfg = VAEConfig(
        embed_dim=4, z_channels=4, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        mel_bins=16, downsample_time_stride4_levels=(0,),
    )
    ddconfig = dict(
        double_z=True, mel_bins=16, z_channels=4, resolution=256, in_channels=1,
        out_ch=1, ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
        dropout=0.0, downsample_time_stride4_levels=[0],
    )
    enc = model_mod.Encoder(**ddconfig).eval()
    dec = model_mod.Decoder(**ddconfig).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)
    sd = {}
    for mod, name in [(enc, "encoder"), (dec, "decoder"), (quant, "quant_conv"), (post, "post_quant_conv")]:
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    params = convert.convert_vae(convert.state_dict_to_numpy(sd), cfg)

    x = rng.standard_normal((1, 32, 16, 1)).astype(np.float32)
    with torch.no_grad():
        ht = enc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        mean_t, _ = torch.chunk(quant(ht), 2, dim=1)
    mean_j, _ = jvae.encode_moments(params, cfg, x)
    # time downsampled 4x, freq 2x
    assert mean_j.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(
        np.asarray(mean_j), mean_t.numpy().transpose(0, 2, 3, 1), atol=3e-4, rtol=1e-3
    )

    z = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    with torch.no_grad():
        mel_t = dec(post(torch.from_numpy(z.transpose(0, 3, 1, 2)))).numpy().transpose(0, 2, 3, 1)
    mel_j = np.asarray(jvae.decode(params, cfg, z))
    assert mel_j.shape == mel_t.shape
    np.testing.assert_allclose(mel_j, mel_t, atol=5e-4, rtol=1e-3)
