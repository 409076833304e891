"""HiFi-GAN vocoder generator — functional JAX, channels-last.

Re-design of the reference Generator (reference ``hifigan/models.py:112-174``):
conv_pre -> [leaky_relu -> ConvTranspose1d upsample -> multi-receptive-field
ResBlock fusion] per stage -> leaky_relu -> conv_post -> tanh. Weight norm is
folded into plain kernels at conversion time (the reference calls
``remove_weight_norm()`` at load, utilities/model.py:140-152).

Activations are [B, T, C]; the mel input is [B, T_mel, num_mels] (the
model-facing fbank layout — the reference permutes to [B, num_mels, T] for
its NCL convs, ddpm.py:928-939).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audioldm2_tpu.config import VocoderConfig
from audioldm2_tpu.ops import nn

LRELU_SLOPE = 0.1


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def init_vocoder(key, cfg: VocoderConfig):
    keys = iter(jax.random.split(key, 512))
    ch0 = cfg.upsample_initial_channel
    p = {"conv_pre": nn.conv1d_init(next(keys), 7, cfg.num_mels, ch0)}
    ups, resblocks = [], []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = ch0 // (2**i)
        cout = ch0 // (2 ** (i + 1))
        # ConvTranspose1d weights stored [k, O, I]
        import numpy as np

        ups.append(
            {
                "w": nn.randn(next(keys), (k, cout, cin), std=0.01),
                "b": np.zeros((cout,), np.float32),
            }
        )
        for ks, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            if cfg.resblock == "1":
                rb = {
                    "convs1": [
                        nn.conv1d_init(next(keys), ks, cout, cout) for _ in dils
                    ],
                    "convs2": [
                        nn.conv1d_init(next(keys), ks, cout, cout) for _ in dils
                    ],
                }
            else:
                rb = {
                    "convs": [
                        nn.conv1d_init(next(keys), ks, cout, cout) for _ in dils
                    ]
                }
            resblocks.append(rb)
    p["ups"] = ups
    p["resblocks"] = resblocks
    p["conv_post"] = nn.conv1d_init(next(keys), 7, ch0 // (2 ** len(ups)), 1)
    return p


def _resblock(p, x, kernel_size: int, dilations):
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = nn.leaky_relu(x, LRELU_SLOPE)
        xt = nn.conv1d(c1, xt, padding=_get_padding(kernel_size, d), dilation=d)
        xt = nn.leaky_relu(xt, LRELU_SLOPE)
        xt = nn.conv1d(c2, xt, padding=_get_padding(kernel_size, 1))
        x = xt + x
    return x


def _resblock2(p, x, kernel_size: int, dilations):
    """v2 single-conv MRF block (reference models_v2.py:112-152)."""
    for c, d in zip(p["convs"], dilations):
        xt = nn.leaky_relu(x, LRELU_SLOPE)
        xt = nn.conv1d(c, xt, padding=_get_padding(kernel_size, d), dilation=d)
        x = xt + x
    return x


def apply_vocoder(p, cfg: VocoderConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel: [B, T_mel, num_mels] -> waveform [B, T_mel * prod(rates)]."""
    x = nn.conv1d(p["conv_pre"], mel, padding=3)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = nn.leaky_relu(x, LRELU_SLOPE)
        x = nn.conv_transpose1d(p["ups"][i], x, stride=u, padding=(k - u) // 2)
        acc = None
        rb_fn = _resblock if cfg.resblock == "1" else _resblock2
        for j, (ks, dils) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            y = rb_fn(p["resblocks"][i * nk + j], x, ks, dils)
            acc = y if acc is None else acc + y
        x = acc / nk
    x = nn.leaky_relu(x, 0.01)  # torch F.leaky_relu default slope
    x = nn.conv1d(p["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0]
