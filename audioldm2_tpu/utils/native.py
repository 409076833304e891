"""ctypes bindings to the native host-audio kernels (native/audio_kernels.cpp).

Builds the shared object on first use when a compiler is present; falls back
to numpy/scipy (audio_io.py) otherwise. The API is drop-in for the hot
host-side paths: polyphase resampling and the reference's wav normalization.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from fractions import Fraction
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    # Always run make: a no-op when the .so is newer than the source, and a
    # rebuild when audio_kernels.cpp gained entry points since it was built
    # (a stale .so otherwise raises AttributeError at the symbol lookup).
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass  # no compiler / read-only checkout: try whatever .so exists
    so = os.path.join(_NATIVE_DIR, "libaudio_kernels.so")
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.resample_poly_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.normalize_wav_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64
        ]
        lib.resample_sinc_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        _LIB = lib
    except (OSError, AttributeError):
        # AttributeError: stale .so predating a newer entry point and make
        # was unavailable to rebuild it — treat as not-available.
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _fir_lowpass(num_taps: int, cutoff: float) -> np.ndarray:
    """Kaiser-windowed sinc lowpass (scipy resample_poly's default design)."""
    from scipy.signal import firwin

    return firwin(num_taps, cutoff, window=("kaiser", 5.0)).astype(np.float32)


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Rational polyphase resampling, native when possible."""
    if orig_sr == target_sr:
        return np.asarray(x, np.float32)
    lib = _load()
    frac = Fraction(target_sr, orig_sr)
    up, down = frac.numerator, frac.denominator
    if lib is None:
        from scipy.signal import resample_poly

        return resample_poly(x, up, down, axis=-1).astype(np.float32)

    x = np.ascontiguousarray(x, np.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    max_rate = max(up, down)
    filt = _fir_lowpass(2 * 10 * max_rate + 1, 1.0 / max_rate)
    n_out = int(np.ceil(x.shape[-1] * up / down))
    out = np.empty(x.shape[:-1] + (n_out,), np.float32)
    fp = filt.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    for row_in, row_out in zip(x.reshape(-1, x.shape[-1]), out.reshape(-1, n_out)):
        lib.resample_poly_f32(
            row_in.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            row_in.shape[0], up, down, fp, filt.shape[0],
            row_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
        )
    return out[0] if squeeze else out


def resample_sinc(x: np.ndarray, kernel: np.ndarray, orig: int, n_phase: int,
                  width: int) -> Optional[np.ndarray]:
    """Phase-bank windowed-sinc resample (torchaudio semantics; taps from
    audio_io.sinc_interp_hann_kernel). Returns None when the lib is absent."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    kernel = np.ascontiguousarray(kernel, np.float32)
    K = kernel.shape[1]
    n_out = -(-x.shape[-1] * n_phase // orig)
    out = np.empty(x.shape[:-1] + (n_out,), np.float32)
    kp = kernel.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    for row_in, row_out in zip(x.reshape(-1, x.shape[-1]), out.reshape(-1, n_out)):
        lib.resample_sinc_f32(
            row_in.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            row_in.shape[0], orig, n_phase, kp, K, width,
            row_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
        )
    return out[0] if squeeze else out


def normalize_wav(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32).copy()
    if lib is None:
        x = x - x.mean()
        return (0.5 * x / (np.max(np.abs(x)) + 1e-8)).astype(np.float32)
    lib.normalize_wav_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size
    )
    return x
