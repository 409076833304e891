"""audioldm2_tpu — a TPU-native text-to-audio generation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of AudioLDM2
(reference: /root/reference, haoheliu/AudioLDM2). The compute path is pure
functional JAX (explicit parameter pytrees, `jax.jit`-compiled programs,
`lax.scan` sampling loops, Pallas kernels for hot ops); the surrounding
runtime (config, checkpoint conversion, CLI, audio IO) is plain Python.

Public surface (mirrors reference `audioldm2/__init__.py` + `pipeline.py`):
    build_model, text_to_audio, super_resolution_and_inpainting,
    seed_everything, save_wave, default_audioldm_config
"""

__version__ = "0.1.0"

from audioldm2_tpu.config import default_audioldm_config, CHECKPOINT_NAMES

_PIPELINE_EXPORTS = {
    "build_model",
    "text_to_audio",
    "super_resolution_and_inpainting",
    "seed_everything",
}
_IO_EXPORTS = {"save_wave", "read_wav_file"}


def __getattr__(name):
    # Lazy so importing the package does not pull jax/model code for
    # config-only use (and keeps CLI startup fast).
    if name in _PIPELINE_EXPORTS:
        from audioldm2_tpu import pipeline as _p

        return getattr(_p, name)
    if name in _IO_EXPORTS:
        from audioldm2_tpu.utils import audio_io as _io

        return getattr(_io, name)
    raise AttributeError(f"module 'audioldm2_tpu' has no attribute {name!r}")

__all__ = [
    "build_model",
    "text_to_audio",
    "super_resolution_and_inpainting",
    "seed_everything",
    "save_wave",
    "read_wav_file",
    "default_audioldm_config",
    "CHECKPOINT_NAMES",
]
