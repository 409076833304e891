"""HiFi-GAN vocoder golden parity vs the PyTorch reference (random weights,
weight norm folded by the converter)."""

import numpy as np
import pytest

import _reference
from audioldm2_tpu.config import VocoderConfig
from audioldm2_tpu import convert
from audioldm2_tpu.models import vocoder as jvoc


SMALL = VocoderConfig(
    num_mels=8,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
)


class _H(dict):
    __getattr__ = dict.__getitem__


def test_vocoder_parity(rng):
    torch = pytest.importorskip("torch")
    models = _reference.load("audioldm2.hifigan.models")
    torch.manual_seed(0)
    h = _H(
        resblock_kernel_sizes=list(SMALL.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in SMALL.resblock_dilation_sizes],
        upsample_rates=list(SMALL.upsample_rates),
        upsample_kernel_sizes=list(SMALL.upsample_kernel_sizes),
        upsample_initial_channel=SMALL.upsample_initial_channel,
        num_mels=SMALL.num_mels,
    )
    gen = models.Generator(h).eval()
    # keep weight-norm parametrization in the state_dict: the converter must
    # fold weight_g/weight_v itself
    sd = convert.state_dict_to_numpy(gen.state_dict())
    assert any(k.endswith("weight_g") for k in sd), "expected weight-norm keys"
    params = convert.convert_vocoder(sd, SMALL, prefix="")
    gen.remove_weight_norm()

    mel = rng.standard_normal((2, 20, SMALL.num_mels)).astype(np.float32)
    with torch.no_grad():
        wav_t = gen(torch.from_numpy(mel.transpose(0, 2, 1))).squeeze(1).numpy()
    wav_j = np.asarray(jvoc.apply_vocoder(params, SMALL, mel))
    assert wav_j.shape == wav_t.shape == (2, 20 * 8)
    np.testing.assert_allclose(wav_j, wav_t, atol=2e-5, rtol=1e-4)


def test_vocoder_16k_shapes():
    import jax

    cfg = VocoderConfig()
    params = jvoc.init_vocoder(jax.random.PRNGKey(0), cfg)
    mel = np.zeros((1, 64, 64), np.float32)
    wav = jvoc.apply_vocoder(params, cfg, mel)
    # prod(rates) = 160 samples per mel frame; the first stage (rate 5,
    # kernel 16) emits 5L+1 frames so the exact length is 160L + 32
    assert wav.shape == (1, 64 * 160 + 32)


def test_vocoder_v2_resblock2_parity(rng):
    """v2 Generator with ResBlock2 (reference hifigan/models_v2.py)."""
    torch = pytest.importorskip("torch")
    models_v2 = _reference.load("audioldm2.hifigan.models_v2")
    torch.manual_seed(1)
    cfg = VocoderConfig(
        num_mels=256,  # v2 Generator hardcodes conv_pre in_channels=256
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        resblock="2",
    )
    h = _H(
        resblock="2",
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        upsample_initial_channel=cfg.upsample_initial_channel,
        num_mels=cfg.num_mels,
    )
    gen = models_v2.Generator(h).eval()
    sd = convert.state_dict_to_numpy(gen.state_dict())
    params = convert.convert_vocoder(sd, cfg, prefix="")
    gen.remove_weight_norm()

    mel = rng.standard_normal((1, 12, cfg.num_mels)).astype(np.float32)
    with torch.no_grad():
        want = gen(torch.from_numpy(mel.transpose(0, 2, 1))).squeeze(1).numpy()
    got = np.asarray(jvoc.apply_vocoder(params, cfg, mel))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_folded_mrf_matches_unfolded(rng):
    """Time-folded MRF (C<128 stages run at f*C channels) is an exact
    reassociation of the same convolutions."""
    import jax

    cfg = SMALL  # stage channels 16 / 8 -> folds f=8 and f=16
    params = jvoc.init_vocoder(jax.random.PRNGKey(5), cfg)
    mel = (rng.standard_normal((2, 16, cfg.num_mels)) * 0.5).astype(np.float32)

    old = jvoc.USE_FOLDED_MRF
    try:
        jvoc.USE_FOLDED_MRF = False
        base = np.asarray(jvoc.apply_vocoder(params, cfg, mel))
        jvoc.USE_FOLDED_MRF = True
        folded = np.asarray(jvoc.apply_vocoder(params, cfg, mel))
    finally:
        jvoc.USE_FOLDED_MRF = old
    assert folded.shape == base.shape
    np.testing.assert_allclose(folded, base, atol=1e-5, rtol=1e-5)

    # the production path: weights pre-folded once outside the program
    pre = jax.jit(lambda p: jvoc.fold_vocoder_params(p, cfg))(params)
    out = np.asarray(
        jax.jit(lambda p, m, fd: jvoc.apply_vocoder(p, cfg, m, folded=fd))(
            params, mel, pre
        )
    )
    np.testing.assert_allclose(out, base, atol=1e-5, rtol=1e-5)
