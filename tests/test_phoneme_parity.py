"""Phoneme (VITS TextEncoder) parity vs the PyTorch reference."""

import math

import numpy as np
import pytest

import _reference
from audioldm2_tpu.config import PhonemeEncoderConfig
from audioldm2_tpu import convert_cond
from audioldm2_tpu.models import phoneme as jph


SMALL = PhonemeEncoderConfig(
    vocab_size=40,
    pad_token_id=0,
    pad_length=24,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    window_size=4,
)


def test_phoneme_encoder_parity(rng):
    torch = pytest.importorskip("torch")
    enc_mod = _reference.load(
        "audioldm2.latent_diffusion.modules.phoneme_encoder.encoder"
    )
    torch.manual_seed(0)
    ref = enc_mod.TextEncoder(
        n_vocab=SMALL.vocab_size,
        out_channels=SMALL.hidden_channels,
        hidden_channels=SMALL.hidden_channels,
        filter_channels=SMALL.filter_channels,
        n_heads=SMALL.n_heads,
        n_layers=SMALL.n_layers,
        kernel_size=SMALL.kernel_size,
        p_dropout=0.0,
    ).eval()
    pos_emb = 0.1 * torch.randn(1, SMALL.hidden_channels, SMALL.pad_length)

    sd = {"text_encoder." + k: v for k, v in ref.state_dict().items()}
    sd["learnable_positional_embedding"] = pos_emb
    import audioldm2_tpu.config as cfg_mod

    spec = cfg_mod.ConditionerSpec(name="p", kind="phoneme", phoneme=SMALL)
    params = convert_cond.convert_phoneme(
        {k: np.asarray(v) for k, v in sd.items()}, spec, ""
    )

    ids = rng.integers(1, SMALL.vocab_size, (2, SMALL.pad_length)).astype(np.int64)
    ids[0, 15:] = 0  # trailing pads
    ids[1, 20:] = 0
    lengths = (ids != 0).sum(axis=1)

    with torch.no_grad():
        x_t, m, logs, x_mask = ref(
            torch.from_numpy(ids), torch.from_numpy(lengths)
        )
        # reference wrapper adds the learnable positional embedding then
        # permutes to [B, L, h] (encoders/modules.py:102-110)
        want = (x_t + pos_emb).permute(0, 2, 1).numpy()
        want_mask = x_mask.squeeze(1).numpy()

    got, got_mask = jph.apply_phoneme_encoder(params, SMALL, ids.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask)
    # compare valid positions (reference zeroes masked cols before +pos_emb
    # too, so all positions should actually match)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_phoneme_uncond_all_pad():
    import jax

    params = jph.init_phoneme_encoder(jax.random.PRNGKey(0), SMALL)
    ids = np.zeros((1, SMALL.pad_length), np.int32)
    emb, mask = jph.apply_phoneme_encoder(params, SMALL, ids)
    assert np.asarray(mask).sum() == 0
    assert np.isfinite(np.asarray(emb)).all()
