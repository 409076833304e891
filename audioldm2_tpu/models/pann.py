"""PANN CNN14 / CNN10 audio encoders — functional JAX.

Alternative CLAP audio towers (config-selectable, not used by the shipped
checkpoints; reference ``clap/open_clip/pann_model.py:167-440`` Cnn14 and
``:550-672`` Cnn10): VGG-style conv stacks (6 stages 64->2048 for CNN14,
5 stages 64->1024 for CNN10; 2x2 avg-pool per stage, CNN14's last stage
unpooled) over the same torchlibrosa-style log-mel frontend, then
(max+mean over time) -> fc1 -> embedding. BatchNorms run with stored
running stats (eval mode).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from audioldm2_tpu.ops import nn
from audioldm2_tpu.ops import stft as stft_ops


@dataclass(frozen=True)
class PANNConfig:
    sample_rate: int = 48000
    window_size: int = 1024
    hop_size: int = 480
    mel_bins: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    embed_dim: int = 2048
    num_classes: int = 527
    variant: str = "cnn14"  # "cnn14" | "cnn10"
    # explicit stage widths (tests use tiny stacks); None = per-variant default
    channels_override: tuple = None

    @property
    def channels(self):
        if self.channels_override is not None:
            return self.channels_override
        return (64, 128, 256, 512, 1024) if self.variant == "cnn10" else CHANNELS

    @property
    def pools(self):
        # Cnn14 leaves its last stage unpooled (pann_model.py forward);
        # Cnn10 pools every stage (pann_model.py:594-604).
        n = len(self.channels)
        return tuple(2 if (self.variant == "cnn10" or i < n - 1) else 1 for i in range(n))


CHANNELS = (64, 128, 256, 512, 1024, 2048)


def _bn_init(c):
    return {
        "scale": np.ones((c,), np.float32),
        "bias": np.zeros((c,), np.float32),
        "mean": np.zeros((c,), np.float32),
        "var": np.ones((c,), np.float32),
    }


def _bn(p, x, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"]


def init_pann(key, cfg: PANNConfig = PANNConfig()):
    keys = iter(nn.split_keys(key, 32))
    blocks = []
    cin = 1
    for cout in cfg.channels:
        conv1 = nn.conv_init(next(keys), 3, 3, cin, cout)
        conv2 = nn.conv_init(next(keys), 3, 3, cout, cout)
        del conv1["b"], conv2["b"]  # torch convs are bias-free here
        blocks.append(
            {"conv1": conv1, "bn1": _bn_init(cout), "conv2": conv2, "bn2": _bn_init(cout)}
        )
        cin = cout
    return {
        "bn0": _bn_init(cfg.mel_bins),
        "blocks": blocks,
        "fc1": nn.linear_init(next(keys), cfg.channels[-1], cfg.embed_dim),
        "fc_audioset": nn.linear_init(next(keys), cfg.embed_dim, cfg.num_classes),
    }


def _conv_nobias(p, x):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _conv_block(p, x, pool):
    x = jax.nn.relu(_bn(p["bn1"], _conv_nobias(p["conv1"], x)))
    x = jax.nn.relu(_bn(p["bn2"], _conv_nobias(p["conv2"], x)))
    if pool > 1:
        x = nn.avg_pool_2d(x, (pool, pool), (pool, pool))
    return x


def encode(params, wav, cfg: PANNConfig = PANNConfig()):
    """waveform [B, N] -> dict(embedding [B, 2048], clipwise_output)."""
    basis = jnp.asarray(stft_ops.stft_basis(cfg.window_size, cfg.window_size))
    mag = stft_ops.stft_magnitude(wav, basis, cfg.window_size, cfg.hop_size)
    power = jnp.square(mag)
    mel_fb = jnp.asarray(
        stft_ops.librosa_mel_filters(
            cfg.sample_rate, cfg.window_size, cfg.mel_bins, cfg.fmin, cfg.fmax
        )
    )
    mel = jnp.einsum("mf,bft->btm", mel_fb, power, preferred_element_type=jnp.float32)
    x = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    x = _bn(params["bn0"], x)  # per-mel-bin batchnorm (pann_model.py:289-291)
    x = x[..., None]  # [B, T, M, 1]

    for blk, pool in zip(params["blocks"], cfg.pools):
        x = _conv_block(blk, x, pool=pool)

    x = jnp.mean(x, axis=2)  # mean over mel axis -> [B, T', C]
    x1 = jnp.max(x, axis=1)
    x2 = jnp.mean(x, axis=1)
    x = x1 + x2
    emb = jax.nn.relu(nn.linear(params["fc1"], x))
    clip = jax.nn.sigmoid(nn.linear(params["fc_audioset"], emb))
    return {"embedding": emb, "clipwise_output": clip}
