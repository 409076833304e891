"""Audio frontend: STFT, mel filterbank, log-mel and kaldi fbank — pure JAX.

TPU-first design: framing is done with a strided gather and the Fourier
transform is a single framed-signal × windowed-DFT-basis matmul (MXU-friendly,
static shapes, no FFT primitive needed at these sizes). This reproduces the
reference's conv-against-Fourier-basis STFT (reference
``audioldm2/utilities/audio/stft.py:26-81``, including librosa-style reflect
padding and the scipy periodic hann window) without its host `.cpu()`
round-trip (stft.py:72).

Filterbank construction happens once on host in numpy (float64), then lives as
device constants inside the jitted program.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side basis construction (numpy, float64 -> float32)
# ---------------------------------------------------------------------------


def hann_window_periodic(win_length: int) -> np.ndarray:
    """scipy.signal.get_window("hann", n, fftbins=True) equivalent."""
    n = np.arange(win_length, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def stft_basis(filter_length: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT analysis basis, shape [filter_length, 2*(nfreq)].

    Matches the reference basis: rows 0..nfreq-1 of an FFT identity are the
    real parts, rows nfreq..2*nfreq-1 the imaginary parts, each windowed by a
    center-padded periodic hann window (reference stft.py:26-47).
    """
    cutoff = filter_length // 2 + 1
    # fourier_basis[k, n] = exp(-2i pi k n / N); conv weights are [2*cutoff, N]
    n = np.arange(filter_length, dtype=np.float64)
    k = np.arange(cutoff, dtype=np.float64)[:, None]
    angle = -2.0 * np.pi * k * n / filter_length
    basis = np.concatenate([np.cos(angle), np.sin(angle)], axis=0)  # [2c, N]

    window = hann_window_periodic(win_length)
    # center-pad window to filter_length (librosa pad_center)
    pad = (filter_length - win_length) // 2
    window_full = np.zeros(filter_length, dtype=np.float64)
    window_full[pad : pad + win_length] = window
    basis = basis * window_full[None, :]
    return basis.T.astype(np.float32)  # [N, 2c] so frames @ basis works


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore", invalid="ignore"):
        log_branch = min_log_mel + np.log(f / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def librosa_mel_filters(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) — htk=False,
    norm='slaney'. Returns [n_mels, 1 + n_fft//2] float32.

    Re-derivation of the standard Slaney-style triangular filterbank the
    reference obtains from librosa (reference stft.py:145-149).
    """
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_min = _hz_to_mel_slaney(fmin)
    mel_max = _hz_to_mel_slaney(fmax)
    mels = np.linspace(mel_min, mel_max, n_mels + 2)
    mel_f = _mel_to_hz_slaney(mels)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # slaney normalization: scale to be approx constant energy per channel
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# JAX ops
# ---------------------------------------------------------------------------


def frame_signal(wav: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[B, N] -> [B, T, frame_length] frames at stride ``hop`` (no padding)."""
    b, n = wav.shape
    num_frames = 1 + (n - frame_length) // hop
    # conv_general_dilated_patches extracts strided patches in one XLA op.
    patches = jax.lax.conv_general_dilated_patches(
        wav[:, None, :],  # [B, C=1, N]
        filter_shape=(frame_length,),
        window_strides=(hop,),
        padding="VALID",
    )  # [B, frame_length, T]
    assert patches.shape == (b, frame_length, num_frames)
    return jnp.transpose(patches, (0, 2, 1))


def stft_magnitude(
    wav: jnp.ndarray, basis: jnp.ndarray, filter_length: int, hop: int
) -> jnp.ndarray:
    """Reference-equivalent STFT magnitude.

    wav: [B, N]; basis: [filter_length, 2*nfreq] from :func:`stft_basis`.
    Returns [B, nfreq, T] with reflect padding of filter_length//2 on each
    side (reference stft.py:58-72).
    """
    pad = filter_length // 2
    wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(wav, filter_length, hop)  # [B, T, N]
    spec = jnp.einsum(
        "btn,nf->btf", frames, basis, preferred_element_type=jnp.float32
    )  # [B, T, 2c]
    nfreq = basis.shape[1] // 2
    real, imag = spec[..., :nfreq], spec[..., nfreq:]
    mag = jnp.sqrt(jnp.maximum(real * real + imag * imag, 1e-12))
    return jnp.transpose(mag, (0, 2, 1))  # [B, nfreq, T]


def dynamic_range_compression(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """log(clamp(x, min=clip_val)) (reference audio_processing.py:85-91)."""
    return jnp.log(jnp.maximum(x, clip_val))


class MelSpectrogram:
    """TacotronSTFT-equivalent log-mel pipeline with precomputed bases.

    Produces mel in the reference's [B, n_mels, T] layout via
    :meth:`mel`, or the model-facing [B, T, n_mels] fbank via
    :meth:`fbank` (reference stft.py:159-178, tools.py:86-103).
    """

    def __init__(
        self,
        filter_length: int = 1024,
        hop_length: int = 160,
        win_length: int = 1024,
        n_mel_channels: int = 64,
        sampling_rate: int = 16000,
        mel_fmin: float = 0.0,
        mel_fmax: float = 8000.0,
    ):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.basis = jnp.asarray(stft_basis(filter_length, win_length))
        self.mel_basis = jnp.asarray(
            librosa_mel_filters(
                sampling_rate, filter_length, n_mel_channels, mel_fmin, mel_fmax
            )
        )

    @functools.partial(jax.jit, static_argnums=0)
    def mel(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, N] waveform in [-1, 1] -> [B, n_mels, T] log-mel."""
        mag = stft_magnitude(wav, self.basis, self.filter_length, self.hop_length)
        melspec = jnp.einsum(
            "mf,bft->bmt", self.mel_basis, mag, preferred_element_type=jnp.float32
        )
        return dynamic_range_compression(melspec)

    def fbank(self, wav: jnp.ndarray, target_length: int = 1024) -> jnp.ndarray:
        """[B, N] -> [B, target_length, n_mels] (pad/cut on time axis)."""
        m = jnp.transpose(self.mel(wav), (0, 2, 1))  # [B, T, n_mels]
        t = m.shape[1]
        if t < target_length:
            m = jnp.pad(m, ((0, 0), (0, target_length - t), (0, 0)))
        else:
            m = m[:, :target_length]
        return m


# ---------------------------------------------------------------------------
# Kaldi-compatible fbank (AudioMAE frontend)
# ---------------------------------------------------------------------------


def _kaldi_mel_banks(num_bins: int, window_length_padded: int, sample_freq: float,
                     low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi-style mel filterbank matrix [num_bins, num_fft_bins].

    HTK mel scale (1127 ln(1 + f/700)); num_fft_bins excludes the nyquist bin.
    Matches torchaudio.compliance.kaldi.get_mel_banks semantics used by the
    reference AudioMAE frontend (reference pipeline.py:56-65).
    """
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq

    fft_bin_width = sample_freq / window_length_padded
    mel = lambda f: 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)
    mel_low = mel(low_freq)
    mel_high = mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.arange(num_bins, dtype=np.float64)[:, None]
    left_mel = mel_low + bins * mel_delta
    center_mel = mel_low + (bins + 1.0) * mel_delta
    right_mel = mel_low + (bins + 2.0) * mel_delta

    freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)[None, :]
    mels = mel(freqs)

    up_slope = (mels - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mels) / (right_mel - center_mel)
    weights = np.maximum(0.0, np.minimum(up_slope, down_slope))
    return weights.astype(np.float32)


class KaldiFbank:
    """torchaudio.compliance.kaldi.fbank-compatible log-mel fbank.

    Parameters fixed to the AudioMAE configuration used at inference
    (reference pipeline.py:44-80): htk_compat=True, 16 kHz, hanning window,
    128 mel bins, dither=0, frame_shift=10 ms, frame_length=25 ms,
    use_energy=False, snip_edges=True, remove_dc_offset=True,
    preemphasis 0.97.
    """

    NORM_MEAN = -4.2677393  # reference pipeline.py:45
    NORM_STD = 4.5689974

    def __init__(self, sample_rate: int = 16000, num_mel_bins: int = 128):
        self.sample_rate = sample_rate
        self.frame_length = int(sample_rate * 0.025)  # 400
        self.frame_shift = int(sample_rate * 0.010)  # 160
        self.padded_length = 1 << (self.frame_length - 1).bit_length()  # 512
        # symmetric hann window (torch.hann_window(periodic=False))
        n = np.arange(self.frame_length, dtype=np.float64)
        self.window = jnp.asarray(
            (0.5 - 0.5 * np.cos(2.0 * np.pi * n / (self.frame_length - 1))).astype(
                np.float32
            )
        )
        self.mel_banks = jnp.asarray(
            _kaldi_mel_banks(num_mel_bins, self.padded_length, float(sample_rate))
        )
        # real-DFT basis for the padded frame length
        self.basis = jnp.asarray(stft_basis_nowin(self.padded_length))

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, N] 16 kHz waveform -> [B, T, 128] kaldi log-fbank."""
        frames = frame_signal(wav, self.frame_length, self.frame_shift)  # [B,T,400]
        # remove per-frame DC offset
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        # preemphasis with replicated first sample (kaldi semantics)
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - 0.97 * prev
        frames = frames * self.window
        # zero-pad to 512 and real-DFT via matmul
        pad = self.padded_length - self.frame_length
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
        spec = jnp.einsum(
            "btn,nf->btf", frames, self.basis, preferred_element_type=jnp.float32
        )
        nfreq = self.basis.shape[1] // 2
        real, imag = spec[..., :nfreq], spec[..., nfreq:]
        power = real * real + imag * imag  # [B, T, 257]
        # kaldi mel banks exclude the nyquist bin
        mel_energies = jnp.einsum(
            "btf,mf->btm",
            power[..., : self.padded_length // 2],
            self.mel_banks,
            preferred_element_type=jnp.float32,
        )
        eps = jnp.finfo(jnp.float32).eps
        return jnp.log(jnp.maximum(mel_energies, eps))

    def normalized(self, wav: jnp.ndarray, target_length: int = 1024) -> jnp.ndarray:
        """AudioMAE-normalized fbank, padded/cut to ``target_length`` frames
        (reference pipeline.py:44-80)."""
        wav = wav - jnp.mean(wav, axis=-1, keepdims=True)
        fb = self(wav)
        t = fb.shape[1]
        if t < target_length:
            fb = jnp.pad(fb, ((0, 0), (0, target_length - t), (0, 0)))
        else:
            fb = fb[:, :target_length]
        return (fb - self.NORM_MEAN) / (self.NORM_STD * 2.0)


def stft_basis_nowin(filter_length: int) -> np.ndarray:
    """Unwindowed real-DFT basis [filter_length, 2*(filter_length//2+1)]."""
    cutoff = filter_length // 2 + 1
    n = np.arange(filter_length, dtype=np.float64)
    k = np.arange(cutoff, dtype=np.float64)[:, None]
    angle = -2.0 * np.pi * k * n / filter_length
    basis = np.concatenate([np.cos(angle), np.sin(angle)], axis=0)
    return basis.T.astype(np.float32)


# ---------------------------------------------------------------------------
# Inverse STFT + Griffin-Lim (reference stft.py:83-122,
# audio_processing.py:35-82)
# ---------------------------------------------------------------------------


def inverse_stft_basis(filter_length: int, win_length: int) -> np.ndarray:
    """Windowed pseudo-inverse synthesis basis [filter_length, 2*nfreq]."""
    cutoff = filter_length // 2 + 1
    n = np.arange(filter_length, dtype=np.float64)
    k = np.arange(cutoff, dtype=np.float64)[:, None]
    angle = -2.0 * np.pi * k * n / filter_length
    fourier = np.concatenate([np.cos(angle), np.sin(angle)], axis=0)  # [2c, N]
    # The reference builds pinv(scale * basis) and multiplies the synthesis
    # output by filter_length/hop (stft.py:34-35,116-117); the two scale
    # factors cancel, so the raw pseudo-inverse is used directly here.
    inv = np.linalg.pinv(fourier).astype(np.float64)  # [N, 2c]
    window = hann_window_periodic(win_length)
    pad = (filter_length - win_length) // 2
    window_full = np.zeros(filter_length, dtype=np.float64)
    window_full[pad : pad + win_length] = window
    return (inv * window_full[:, None]).astype(np.float32)


def window_sumsquare(
    win_length: int, filter_length: int, hop: int, n_frames: int
) -> np.ndarray:
    """Squared-window overlap-add envelope (reference
    audio_processing.py:35-63)."""
    n = filter_length + hop * (n_frames - 1)
    x = np.zeros(n, dtype=np.float64)
    win = hann_window_periodic(win_length) ** 2
    pad = (filter_length - win_length) // 2
    win_full = np.zeros(filter_length)
    win_full[pad : pad + win_length] = win
    for i in range(n_frames):
        s = i * hop
        x[s : min(n, s + filter_length)] += win_full[: max(0, min(filter_length, n - s))]
    return x.astype(np.float32)


def istft(
    magnitude: jnp.ndarray,
    phase: jnp.ndarray,
    filter_length: int,
    hop: int,
    win_length: int,
) -> jnp.ndarray:
    """magnitude/phase: [B, nfreq, T] -> waveform [B, N] (center-trimmed)."""
    rec = jnp.concatenate(
        [magnitude * jnp.cos(phase), magnitude * jnp.sin(phase)], axis=1
    )  # [B, 2c, T]
    rec = jnp.transpose(rec, (0, 2, 1))  # [B, T, 2c]
    inv = jnp.asarray(inverse_stft_basis(filter_length, win_length))  # [N, 2c]
    # overlap-add as a stride-`hop` transposed conv with kernel [N, 1, 2c]
    w = inv[:, None, :]  # [k=N, O=1, I=2c]
    n_frames = rec.shape[1]
    y = jax.lax.conv_general_dilated(
        rec,
        jnp.flip(w, 0),
        window_strides=(1,),
        padding=[(filter_length - 1, filter_length - 1)],
        lhs_dilation=(hop,),
        dimension_numbers=("NHC", "HOI", "NHC"),
        preferred_element_type=jnp.float32,
    )[..., 0]
    env = jnp.asarray(window_sumsquare(win_length, filter_length, hop, n_frames))
    y = y / jnp.maximum(env, 1e-8)
    half = filter_length // 2
    return y[:, half:-half]


def stft_full(wav, basis, filter_length, hop):
    """(magnitude, phase) like the reference STFT.transform."""
    pad = filter_length // 2
    wavp = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(wavp, filter_length, hop)
    spec = jnp.einsum("btn,nf->btf", frames, basis, preferred_element_type=jnp.float32)
    nfreq = basis.shape[1] // 2
    real, imag = spec[..., :nfreq], spec[..., nfreq:]
    mag = jnp.sqrt(jnp.maximum(real * real + imag * imag, 1e-12))
    phase = jnp.arctan2(imag, real)
    return jnp.transpose(mag, (0, 2, 1)), jnp.transpose(phase, (0, 2, 1))


def griffin_lim(
    magnitude: jnp.ndarray,
    filter_length: int,
    hop: int,
    win_length: int,
    n_iters: int = 30,
    key=None,
) -> jnp.ndarray:
    """Phase recovery by alternating projections (reference
    audio_processing.py:66-82). magnitude: [B, nfreq, T]."""
    if key is None:
        key = jax.random.PRNGKey(0)
    basis = jnp.asarray(stft_basis(filter_length, win_length))
    phase = jax.random.uniform(
        key, magnitude.shape, jnp.float32, -np.pi, np.pi
    )

    def body(phase, _):
        signal = istft(magnitude, phase, filter_length, hop, win_length)
        _, new_phase = stft_full(signal, basis, filter_length, hop)
        t = min(new_phase.shape[-1], phase.shape[-1])
        new_phase = jnp.pad(
            new_phase[..., :t], ((0, 0), (0, 0), (0, phase.shape[-1] - t))
        )
        return new_phase, None

    phase, _ = jax.lax.scan(body, phase, None, length=n_iters)
    return istft(magnitude, phase, filter_length, hop, win_length)
