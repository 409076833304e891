"""The reference-matching windowed-sinc resampler (torchaudio
sinc_interp_hann semantics, reference tools.py:31 / modules.py:700-703):
numpy fallback == native C++ == device XLA conv, plus signal-quality
invariants (tone preservation, DC gain, length formula)."""

import numpy as np
import pytest

from audioldm2_tpu.utils.audio_io import (
    _resample_sinc_np,
    resample,
    sinc_interp_hann_kernel,
)

RATES = [(16000, 48000), (48000, 16000), (16000, 8000), (44100, 48000)]


@pytest.mark.parametrize("a,b", RATES)
def test_three_engines_agree(rng, a, b):
    x = rng.standard_normal((2, 9601)).astype(np.float32)
    kernel, orig, new, width = sinc_interp_hann_kernel(a, b)
    want = _resample_sinc_np(x, kernel, orig, new, width)
    assert want.shape == (2, -(-9601 * b // a))

    got = resample(x, a, b)  # native when built, numpy otherwise
    np.testing.assert_allclose(got, want, atol=1e-6)

    from audioldm2_tpu.utils import native

    if native.available():
        nat = native.resample_sinc(x, kernel, orig, new, width)
        np.testing.assert_allclose(nat, want, atol=1e-6)

    import jax.numpy as jnp

    from audioldm2_tpu.models.clap import resample_sinc_jnp

    dev = np.asarray(resample_sinc_jnp(jnp.asarray(x), a, b))
    np.testing.assert_allclose(dev, want, atol=2e-5)


def test_tone_and_dc_preserved():
    sr, tgt = 16000, 48000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    y = resample(tone[None], sr, tgt)[0]
    f = np.fft.rfftfreq(len(y), 1 / tgt)[np.argmax(np.abs(np.fft.rfft(y)))]
    assert abs(f - 440) < 2
    # mid-section amplitude preserved (edges have filter transients)
    mid = y[tgt // 4 : -tgt // 4]
    assert abs(np.abs(mid).max() - 0.5) < 5e-3

    dc = resample(np.ones((1, 4000), np.float32), sr, tgt)[0]
    assert abs(dc[2000:-2000].mean() - 1.0) < 1e-3


def test_kernel_formula_invariants():
    # 16k -> 48k reduces to orig=1, new=3: 15-tap phase bank, phase 0 is the
    # unit impulse (integer-aligned samples pass through exactly)
    kernel, orig, new, width = sinc_interp_hann_kernel(16000, 48000)
    assert (orig, new, width) == (1, 3, 7)
    assert kernel.shape == (3, 2 * width + orig)
    # phase 0 is symmetric around the center tap, whose value is the
    # scale = base_freq/orig = rolloff (sinc(0)*hann(0)*scale)
    np.testing.assert_allclose(kernel[0], kernel[0][::-1], atol=1e-7)
    assert abs(kernel[0][width] - 0.99) < 1e-6
    # each phase bank sums to ~1 (unit DC gain across the interpolator)
    np.testing.assert_allclose(kernel.sum(axis=1), 1.0, atol=1e-3)
