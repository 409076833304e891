"""Attentional feature fusion (AFF / iAFF / DAF) — functional JAX.

CLAP's variable-length fusion gates (reference
``clap/open_clip/feature_fusion.py:11-192``; Dai et al., WACV 2021). The
shipped AudioLDM2 checkpoints run CLAP with ``enable_fusion=False`` and the
vendored ``get_audio_features`` never builds the multi-crop stack, so these
are provided for config parity (``aff_2d`` etc.) rather than the inference
hot path. Channels-last ([..., C]); BatchNorms use stored running stats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audioldm2_tpu.ops import nn


def _bn(p, x, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"]


def _att_init(key, channels: int, inter: int):
    k1, k2 = nn.split_keys(key)
    def bn_init(c):
        return {
            "scale": np.ones((c,), np.float32), "bias": np.zeros((c,), np.float32),
            "mean": np.zeros((c,), np.float32), "var": np.ones((c,), np.float32),
        }
    return {
        "conv1": nn.linear_init(k1, channels, inter),  # 1x1 conv == linear
        "bn1": bn_init(inter),
        "conv2": nn.linear_init(k2, inter, channels),
        "bn2": bn_init(channels),
    }


def _att(p, x):
    h = _bn(p["bn1"], nn.linear(p["conv1"], x))
    h = jax.nn.relu(h)
    return _bn(p["bn2"], nn.linear(p["conv2"], h))


def init_aff(key, channels: int = 64, r: int = 4, iterative: bool = False):
    inter = channels // r
    ks = nn.split_keys(key, 4)
    p = {"local": _att_init(ks[0], channels, inter), "global": _att_init(ks[1], channels, inter)}
    if iterative:
        p["local2"] = _att_init(ks[2], channels, inter)
        p["global2"] = _att_init(ks[3], channels, inter)
    return p


def _gate(p_local, p_global, xa):
    """sigmoid(local_att(xa) + global_att(avgpool(xa)))."""
    xl = _att(p_local, xa)
    spatial_axes = tuple(range(1, xa.ndim - 1))
    xg = _att(p_global, jnp.mean(xa, axis=spatial_axes, keepdims=True))
    return jax.nn.sigmoid(xl + xg)


def daf(x, residual):
    """DirectAddFuse (reference feature_fusion.py:11-19)."""
    return x + residual


def aff(p, x, residual):
    """AFF: xo = 2 x w + 2 residual (1 - w) (feature_fusion.py:133-192)."""
    wei = _gate(p["local"], p["global"], x + residual)
    return 2.0 * x * wei + 2.0 * residual * (1.0 - wei)


def iaff(p, x, residual):
    """iAFF: two gating rounds; NOTE the reference reuses global_att (not
    global_att2) in the second round (feature_fusion.py:122-125) — mirrored
    here for checkpoint parity."""
    wei = _gate(p["local"], p["global"], x + residual)
    xi = x * wei + residual * (1.0 - wei)
    wei2 = _gate(p["local2"], p["global"], xi)
    return x * wei2 + residual * (1.0 - wei2)
