"""Host-side wav IO and resampling (scipy-based; no torchaudio/librosa/soundfile).

Reproduces the reference's wav loading semantics (reference
``utilities/audio/tools.py:9-40``): load, mono, resample to the target rate,
mean-subtract, peak-normalize to 0.5, pad/cut to the segment length.
"""

from __future__ import annotations

import os
from fractions import Fraction
from typing import List, Optional, Sequence, Union

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def _to_float(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.int16:
        return data.astype(np.float32) / 32768.0
    if data.dtype == np.int32:
        return data.astype(np.float32) / 2147483648.0
    if data.dtype == np.uint8:
        return (data.astype(np.float32) - 128.0) / 128.0
    return data.astype(np.float32)


def resample(waveform: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return waveform
    try:
        from audioldm2_tpu.utils import native

        if native.available():
            return native.resample(waveform, orig_sr, target_sr)
    except Exception:
        pass
    frac = Fraction(target_sr, orig_sr)
    return resample_poly(waveform, frac.numerator, frac.denominator, axis=-1).astype(
        np.float32
    )


def normalize_wav(waveform: np.ndarray) -> np.ndarray:
    """Mean-subtract then scale to 0.5 peak (reference tools.py:22-25)."""
    waveform = waveform - np.mean(waveform)
    waveform = waveform / (np.max(np.abs(waveform)) + 1e-8)
    return (waveform * 0.5).astype(np.float32)


def pad_wav(waveform: np.ndarray, segment_length: Optional[int]) -> np.ndarray:
    """Cut or zero-pad [N] waveform to segment_length (reference tools.py:9-19)."""
    n = waveform.shape[-1]
    if segment_length is None or n == segment_length:
        return waveform
    if n > segment_length:
        return waveform[..., :segment_length]
    out = np.zeros(waveform.shape[:-1] + (segment_length,), dtype=waveform.dtype)
    out[..., :n] = waveform
    return out


def read_wav_file(
    filename: str, segment_length: Optional[int], target_sr: int = 16000
) -> np.ndarray:
    """Load a wav as [1, N] float32, resampled + double-normalized to 0.5 peak
    (the reference normalizes twice, tools.py:28-40)."""
    sr, data = wavfile.read(filename)
    data = _to_float(np.asarray(data))
    if data.ndim > 1:
        data = data.mean(axis=-1)
    data = resample(data, sr, target_sr)
    data = normalize_wav(data)
    data = pad_wav(data[None, :], segment_length)
    peak = np.max(np.abs(data))
    if peak > 0:
        data = data / peak
    return (0.5 * data).astype(np.float32)


def save_wave(
    waveform: np.ndarray,
    savepath: str,
    name: Union[str, Sequence[str]] = "outwav",
    samplerate: int = 16000,
) -> List[str]:
    """Write [B, 1, N] (or [B, N]) float waveforms with the reference's file
    naming rules (reference utils.py:53-75). Returns written paths."""
    waveform = np.asarray(waveform)
    if waveform.ndim == 2:
        waveform = waveform[:, None, :]
    if not isinstance(name, (list, tuple)):
        name = [name] * waveform.shape[0]

    os.makedirs(savepath, exist_ok=True)
    paths = []
    for i in range(waveform.shape[0]):
        base = os.path.basename(name[i])
        stem = base.split(".")[0] if ".wav" in base else base
        if waveform.shape[0] > 1:
            fname = "%s_%s.wav" % (stem, i)
        else:
            fname = "%s.wav" % stem
            if len(fname) > 255:
                fname = f"{hex(hash(fname))}.wav"
        path = os.path.join(savepath, fname)
        data = np.clip(waveform[i, 0], -1.0, 1.0)
        wavfile.write(path, samplerate, (data * 32767.0).astype(np.int16))
        paths.append(path)
    return paths


def text_to_filename(text: str) -> str:
    return text.replace(" ", "_").replace("'", "_").replace('"', "_")


def get_duration(fname: str) -> float:
    """Clip duration in seconds (reference utils.py:21-25)."""
    sr, data = wavfile.read(fname)
    return data.shape[0] / float(sr)


def get_bit_depth(fname: str) -> int:
    """Sample bit depth (reference utils.py:28-31)."""
    _, data = wavfile.read(fname)
    return data.dtype.itemsize * 8
