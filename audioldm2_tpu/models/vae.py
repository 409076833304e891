"""KL-VAE over mel spectrograms — functional JAX, channels-last.

Re-design of the reference first stage (reference
``latent_encoder/autoencoder.py:18-128`` and LDM conv stacks in
``latent_diffusion/modules/diffusionmodules/model.py:419-686``):
GroupNorm(32, eps=1e-6) + SiLU ResNet blocks, single-head mid attention,
asymmetric-padded stride-2 downsampling, nearest-2x upsampling.

Activations are [B, T, M, C] (time = H, mel = W, channels last); the latent
is [B, T/4, M/4, z] for the 16 kHz family and [B, T/8, M/8, z] for 48 kHz.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audioldm2_tpu.config import VAEConfig
from audioldm2_tpu.ops import nn


GN_EPS = 1e-6  # reference model.py:38-41


def _resblock_init(key, cin, cout):
    ks = nn.split_keys(key, 3)
    p = {
        "norm1": nn.norm_init(cin),
        "conv1": nn.conv_init(ks[0], 3, 3, cin, cout),
        "norm2": nn.norm_init(cout),
        "conv2": nn.conv_init(ks[1], 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = nn.conv_init(ks[2], 1, 1, cin, cout)
    return p


def _resblock(p, x):
    h = nn.gn_silu_conv(p["norm1"], p["conv1"], x, eps=GN_EPS)
    h = nn.gn_silu_conv(p["norm2"], p["conv2"], h, eps=GN_EPS)
    if "nin_shortcut" in p:
        x = nn.conv2d(p["nin_shortcut"], x)
    return x + h


def _attnblock_init(key, c):
    ks = nn.split_keys(key, 4)
    return {
        "norm": nn.norm_init(c),
        "q": nn.conv_init(ks[0], 1, 1, c, c),
        "k": nn.conv_init(ks[1], 1, 1, c, c),
        "v": nn.conv_init(ks[2], 1, 1, c, c),
        "proj_out": nn.conv_init(ks[3], 1, 1, c, c),
    }


def _attnblock(p, x):
    """Single-head full attention over all T*M positions
    (reference model.py:185-230)."""
    b, h, w, c = x.shape
    hn = nn.group_norm(p["norm"], x, eps=GN_EPS)
    q = nn.conv2d(p["q"], hn).reshape(b, h * w, 1, c)
    k = nn.conv2d(p["k"], hn).reshape(b, h * w, 1, c)
    v = nn.conv2d(p["v"], hn).reshape(b, h * w, 1, c)
    out = nn.attention(q, k, v).reshape(b, h, w, c)
    return x + nn.conv2d(p["proj_out"], out)


def _downsample(p, x):
    # torch pads (left=0, right=1, top=0, bottom=1) then 3x3 stride-2 VALID
    # (reference model.py:76-94)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return nn.conv2d(p, x, stride=(2, 2), padding="VALID")


def _downsample_ts4(p, x):
    # DownsampleTimeStride4 (reference model.py:97-115): pad (0,1,0,1),
    # 5x5 conv, stride (4, 2), torch padding=1
    x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    return nn.conv2d(p, x, stride=(4, 2), padding="VALID")


def _upsample(p, x):
    x = nn.nearest_upsample_2d(x)
    return nn.conv2d(p, x)


def _upsample_ts4(p, x):
    # UpsampleTimeStride4 (reference model.py:60-73): nearest (4, 2), 5x5 conv
    x = nn.nearest_upsample_2d(x, 4, 2)
    return nn.conv2d(p, x, padding=2)


def init_encoder(key, cfg: VAEConfig):
    ch, mults = cfg.ch, cfg.ch_mult
    keys = iter(nn.split_keys(key, 256))
    p = {"conv_in": nn.conv_init(next(keys), 3, 3, cfg.in_channels, ch)}
    in_mults = (1,) + tuple(mults)
    down = []
    block_in = ch
    for i, mult in enumerate(mults):
        block_in = ch * in_mults[i]
        block_out = ch * mult
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_resblock_init(next(keys), block_in, block_out))
            block_in = block_out
        level = {"block": blocks}
        if i != len(mults) - 1:
            if i in cfg.downsample_time_stride4_levels:
                level["downsample_ts4"] = nn.conv_init(next(keys), 5, 5, block_in, block_in)
            else:
                level["downsample"] = nn.conv_init(next(keys), 3, 3, block_in, block_in)
        down.append(level)
    p["down"] = down
    p["mid"] = {
        "block_1": _resblock_init(next(keys), block_in, block_in),
        "attn_1": _attnblock_init(next(keys), block_in),
        "block_2": _resblock_init(next(keys), block_in, block_in),
    }
    z_out = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    p["norm_out"] = nn.norm_init(block_in)
    p["conv_out"] = nn.conv_init(next(keys), 3, 3, block_in, z_out)
    return p


def apply_encoder(p, cfg: VAEConfig, x):
    h = nn.conv2d(p["conv_in"], x)
    for i, level in enumerate(p["down"]):
        for rb in level["block"]:
            h = _resblock(rb, h)
        if "downsample" in level:
            h = _downsample(level["downsample"], h)
        elif "downsample_ts4" in level:
            h = _downsample_ts4(level["downsample_ts4"], h)
    h = _resblock(p["mid"]["block_1"], h)
    h = _attnblock(p["mid"]["attn_1"], h)
    h = _resblock(p["mid"]["block_2"], h)
    h = nn.group_norm_silu(p["norm_out"], h, eps=GN_EPS)
    return nn.conv2d(p["conv_out"], h)


def init_decoder(key, cfg: VAEConfig):
    ch, mults = cfg.ch, cfg.ch_mult
    keys = iter(nn.split_keys(key, 256))
    block_in = ch * mults[-1]
    p = {"conv_in": nn.conv_init(next(keys), 3, 3, cfg.z_channels, block_in)}
    p["mid"] = {
        "block_1": _resblock_init(next(keys), block_in, block_in),
        "attn_1": _attnblock_init(next(keys), block_in),
        "block_2": _resblock_init(next(keys), block_in, block_in),
    }
    up = [None] * len(mults)
    for i in reversed(range(len(mults))):
        block_out = ch * mults[i]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_resblock_init(next(keys), block_in, block_out))
            block_in = block_out
        level = {"block": blocks}
        if i != 0:
            if (i - 1) in cfg.downsample_time_stride4_levels:
                level["upsample_ts4"] = nn.conv_init(next(keys), 5, 5, block_in, block_in)
            else:
                level["upsample"] = nn.conv_init(next(keys), 3, 3, block_in, block_in)
        up[i] = level
    p["up"] = up
    p["norm_out"] = nn.norm_init(block_in)
    p["conv_out"] = nn.conv_init(next(keys), 3, 3, block_in, cfg.out_ch)
    return p


def apply_decoder(p, cfg: VAEConfig, z):
    h = nn.conv2d(p["conv_in"], z)
    h = _resblock(p["mid"]["block_1"], h)
    h = _attnblock(p["mid"]["attn_1"], h)
    h = _resblock(p["mid"]["block_2"], h)
    for i in reversed(range(len(p["up"]))):
        level = p["up"][i]
        for rb in level["block"]:
            h = _resblock(rb, h)
        if "upsample" in level:
            h = _upsample(level["upsample"], h)
        elif "upsample_ts4" in level:
            h = _upsample_ts4(level["upsample_ts4"], h)
    h = nn.group_norm_silu(p["norm_out"], h, eps=GN_EPS)
    return nn.conv2d(p["conv_out"], h)


# ---------------------------------------------------------------------------
# AutoencoderKL
# ---------------------------------------------------------------------------


def init_vae(key, cfg: VAEConfig):
    k1, k2, k3, k4 = nn.split_keys(key, 4)
    z2 = 2 * cfg.z_channels
    return {
        "encoder": init_encoder(k1, cfg),
        "decoder": init_decoder(k2, cfg),
        "quant_conv": nn.conv_init(k3, 1, 1, z2, 2 * cfg.embed_dim),
        "post_quant_conv": nn.conv_init(k4, 1, 1, cfg.embed_dim, cfg.z_channels),
    }


def encode_moments(p, cfg: VAEConfig, x):
    """x: [B, T, M, 1] mel -> (mean, logvar) each [B, T/f, M/f, embed_dim].

    logvar clamped to [-30, 20] (reference distributions.py:24-34)."""
    h = apply_encoder(p["encoder"], cfg, x)
    moments = nn.conv2d(p["quant_conv"], h)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def sample_posterior(key, mean, logvar):
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def decode(p, cfg: VAEConfig, z):
    """z: [B, t, f, embed_dim] -> mel [B, T, M, 1]."""
    z = nn.conv2d(p["post_quant_conv"], z)
    return apply_decoder(p["decoder"], cfg, z)


def kl_divergence(mean, logvar, other_mean=None, other_logvar=None):
    """KL of the posterior vs N(0,1) or another diagonal Gaussian
    (reference distributions.py:36-55)."""
    var = jnp.exp(logvar)
    if other_mean is None:
        return 0.5 * jnp.sum(
            jnp.square(mean) + var - 1.0 - logvar, axis=tuple(range(1, mean.ndim))
        )
    other_var = jnp.exp(other_logvar)
    return 0.5 * jnp.sum(
        jnp.square(mean - other_mean) / other_var
        + var / other_var
        - 1.0
        - logvar
        + other_logvar,
        axis=tuple(range(1, mean.ndim)),
    )


def nll(mean, logvar, sample):
    """Negative log likelihood of sample under the posterior
    (reference distributions.py:57-66)."""
    import math

    logtwopi = math.log(2.0 * math.pi)
    return 0.5 * jnp.sum(
        logtwopi + logvar + jnp.square(sample - mean) / jnp.exp(logvar),
        axis=tuple(range(1, mean.ndim)),
    )
