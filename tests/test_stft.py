"""Audio frontend golden tests.

The JAX STFT/mel pipeline is validated against independent float64 numpy
computations of the same definitions the reference uses (conv-basis STFT with
reflect padding and periodic hann window, slaney mel filterbank, log dynamic
range compression — reference utilities/audio/stft.py, audio_processing.py).
"""

import numpy as np
import pytest

from audioldm2_tpu.ops import stft as stft_ops


def naive_stft_magnitude(wav, n_fft, hop, win_length):
    """float64 reference: reflect pad + windowed DFT per frame."""
    pad = n_fft // 2
    x = np.pad(wav, ((0, 0), (pad, pad)), mode="reflect").astype(np.float64)
    win = stft_ops.hann_window_periodic(win_length)
    wpad = (n_fft - win_length) // 2
    window = np.zeros(n_fft)
    window[wpad : wpad + win_length] = win
    num_frames = 1 + (x.shape[1] - n_fft) // hop
    out = np.empty((x.shape[0], n_fft // 2 + 1, num_frames))
    for b in range(x.shape[0]):
        for t in range(num_frames):
            frame = x[b, t * hop : t * hop + n_fft] * window
            out[b, :, t] = np.abs(np.fft.rfft(frame))
    return out


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 160, 1024), (512, 128, 400)])
def test_stft_magnitude_matches_naive(rng, n_fft, hop, win):
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.3
    basis = stft_ops.stft_basis(n_fft, win)
    got = np.asarray(
        stft_ops.stft_magnitude(wav, basis, n_fft, hop)
    )
    want = naive_stft_magnitude(wav, n_fft, hop, win)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mel_filters_properties():
    fb = stft_ops.librosa_mel_filters(16000, 1024, 64, 0.0, 8000.0)
    assert fb.shape == (64, 513)
    # every filter is non-negative and non-empty
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()
    # triangles tile the band: every fft bin between the first and last
    # filter centers gets some weight
    coverage = fb.sum(axis=0)
    assert (coverage[5:500] > 0).all()
    # slaney normalization: peak of each filter ~ 2/bandwidth, decreasing
    # with increasing center frequency in the log region
    peaks = fb.max(axis=1)
    assert peaks[-1] < peaks[0]


def test_mel_spectrogram_shapes_and_range(rng):
    mel = stft_ops.MelSpectrogram()
    wav = rng.standard_normal((1, 163840)).astype(np.float32) * 0.3
    out = np.asarray(mel.mel(wav))
    # 163840 samples @ hop 160 with center padding -> 1025 frames
    assert out.shape == (1, 64, 1025)
    # log-compression floor
    assert out.min() >= np.log(1e-5) - 1e-5
    fb = np.asarray(mel.fbank(wav, target_length=1024))
    assert fb.shape == (1, 1024, 64)


def test_kaldi_fbank_shapes(rng):
    kf = stft_ops.KaldiFbank()
    wav = rng.standard_normal((1, 160000)).astype(np.float32) * 0.1
    fb = np.asarray(kf(wav))
    # snip_edges framing: 1 + (160000 - 400) // 160 = 998 frames
    assert fb.shape == (1, 998, 128)
    norm = np.asarray(kf.normalized(wav, target_length=1024))
    assert norm.shape == (1, 1024, 128)
    # padded tail exists
    assert np.allclose(
        norm[0, 1000:],
        (0.0 - kf.NORM_MEAN) / (kf.NORM_STD * 2.0),
        atol=1e-5,
    )


def test_kaldi_fbank_matches_naive(rng):
    """Cross-check preemphasis/window/power path against a float64 loop."""
    kf = stft_ops.KaldiFbank()
    wav = (rng.standard_normal((1, 4000)) * 0.1).astype(np.float32)
    got = np.asarray(kf(wav))[0]

    x = wav[0].astype(np.float64)
    frame_len, shift, nfft = 400, 160, 512
    n_frames = 1 + (len(x) - frame_len) // shift
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame_len) / (frame_len - 1))
    mel_banks = stft_ops._kaldi_mel_banks(128, nfft, 16000.0)
    want = np.empty((n_frames, 128))
    for t in range(n_frames):
        fr = x[t * shift : t * shift + frame_len].copy()
        fr -= fr.mean()
        fr = fr - 0.97 * np.concatenate([[fr[0]], fr[:-1]])
        fr = fr * win
        spec = np.abs(np.fft.rfft(fr, nfft)) ** 2
        want[t] = np.log(np.maximum(spec[:256] @ mel_banks.T, np.finfo(np.float32).eps))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
