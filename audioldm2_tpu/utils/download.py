"""Checkpoint acquisition (reference utils.py:209-219).

Downloads the reference ``.pth`` checkpoints from HuggingFace Hub when
network + huggingface_hub are available, then converts them once to the
native orbax format. Zero-egress environments get a clear error with the
manual instructions instead.
"""

from __future__ import annotations

import os
from typing import Optional

CACHE_DIR = os.getenv(
    "AUDIOLDM_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache/audioldm2_tpu"),
)


def checkpoint_repo(checkpoint_name: str) -> str:
    """Same repo-id mapping as the reference (utils.py:209-214)."""
    if "audioldm2-speech" in checkpoint_name:
        return "haoheliu/audioldm2-speech"
    return "haoheliu/%s" % checkpoint_name


def _network_available(timeout: float = 3.0) -> bool:
    import socket

    try:
        socket.getaddrinfo("huggingface.co", 443)
        return True
    except OSError:
        return False


def download_checkpoint(checkpoint_name: str = "audioldm2-full") -> str:
    """Returns a local path to the reference .pth (downloading if needed)."""
    try:
        if os.environ.get("HF_HUB_OFFLINE") == "1" or not _network_available():
            raise OSError("offline (no route to huggingface.co)")
        from huggingface_hub import hf_hub_download

        return hf_hub_download(
            repo_id=checkpoint_repo(checkpoint_name),
            filename=checkpoint_name + ".pth",
        )
    except Exception as e:
        raise RuntimeError(
            f"Could not download checkpoint {checkpoint_name!r} "
            f"(offline or huggingface_hub unavailable: {e}). Either place the "
            f".pth at a path and pass ckpt_path=..., or pre-convert it with "
            f"audioldm2_tpu.utils.checkpoint.convert_reference_checkpoint()."
        ) from e


def native_checkpoint_path(checkpoint_name: str) -> str:
    return os.path.join(CACHE_DIR, checkpoint_name + ".ckpt")


def get_or_convert(checkpoint_name: str = "audioldm2-full") -> Optional[str]:
    """Native checkpoint path, converting from the HF .pth on first use.
    Returns None when neither a cached conversion nor network is available
    (callers fall back to random init for benchmarking)."""
    native = native_checkpoint_path(checkpoint_name)
    if os.path.exists(native):
        return native
    try:
        pth = download_checkpoint(checkpoint_name)
    except RuntimeError:
        return None
    os.makedirs(CACHE_DIR, exist_ok=True)
    from audioldm2_tpu.utils.checkpoint import convert_reference_checkpoint

    convert_reference_checkpoint(pth, checkpoint_name, native)
    return native
