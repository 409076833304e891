"""HTSAT: hierarchical token-semantic audio Swin transformer — functional JAX.

Re-design of the CLAP audio tower (reference ``clap/open_clip/htsat.py``,
HTSAT-base: embed 128, depths [2,2,12,2], heads [4,8,16,32], window 8,
spec_size 256). The torchlibrosa mel frontend (48 kHz, n_fft 1024, hop 480,
64 mels, 50-14000 Hz, power spectrogram -> power_to_db, htsat.py:872-892)
is a framed-matmul here; the bicubic `reshape_wav2img` time folding
(htsat.py:1074-1101) is a precomputed align-corners cubic interpolation
matrix (a plain MXU matmul instead of a gather-heavy resize).

Only the inference surfaces are implemented: `encode` -> 1024-d latent
embedding (used by CLAP audio projection) and clipwise logits via the
TSCAM head.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audioldm2_tpu.ops import nn
from audioldm2_tpu.ops import stft as stft_ops


@dataclass(frozen=True)
class HTSATConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: int = 4
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 12, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    num_classes: int = 527
    mel_bins: int = 64
    sample_rate: int = 48000
    n_fft: int = 1024
    hop_size: int = 480
    fmin: float = 50.0
    fmax: float = 14000.0

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.mel_bins

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    @property
    def grid(self) -> int:
        return self.spec_size // self.patch_stride


BASE = HTSATConfig()


# ---------------------------------------------------------------------------
# Host-side constants
# ---------------------------------------------------------------------------


def bicubic_matrix(t_in: int, t_out: int) -> np.ndarray:
    """torch F.interpolate(mode="bicubic", align_corners=True) as a matrix
    [t_out, t_in] (cubic convolution kernel, a = -0.75)."""
    a = -0.75

    def kernel(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t**3 - (a + 3) * t**2 + 1
        if t < 2:
            return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
        return 0.0

    W = np.zeros((t_out, t_in), np.float64)
    scale = (t_in - 1) / (t_out - 1) if t_out > 1 else 0.0
    for i in range(t_out):
        src = i * scale
        j0 = int(np.floor(src))
        for dj in (-1, 0, 1, 2):
            j = j0 + dj
            w = kernel(src - j)
            W[i, np.clip(j, 0, t_in - 1)] += w
    return W.astype(np.float32)


def _swin_attn_mask(res: int, window: int, shift: int) -> np.ndarray:
    """Additive mask [nW, w*w, w*w] for shifted windows (htsat.py:546-573)."""
    img = np.zeros((res, res), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    nh = res // window
    wins = img.reshape(nh, window, nh, window).transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _rel_pos_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # [w*w, w*w]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_htsat(key, cfg: HTSATConfig = BASE):
    keys = iter(nn.split_keys(key, 8 * sum(cfg.depths) + 16))
    layers = []
    for i_layer, depth in enumerate(cfg.depths):
        dim = cfg.embed_dim * 2**i_layer
        heads = cfg.num_heads[i_layer]
        blocks = []
        for _ in range(depth):
            blocks.append(
                {
                    "norm1": nn.norm_init(dim),
                    "attn": {
                        "qkv": nn.linear_init(next(keys), dim, 3 * dim),
                        "proj": nn.linear_init(next(keys), dim, dim),
                        "rel_bias": nn.randn(
                            next(keys),
                            ((2 * cfg.window_size - 1) ** 2, heads),
                            std=0.02,
                        ),
                    },
                    "norm2": nn.norm_init(dim),
                    "mlp": {
                        "fc1": nn.linear_init(next(keys), dim, int(dim * cfg.mlp_ratio)),
                        "fc2": nn.linear_init(next(keys), int(dim * cfg.mlp_ratio), dim),
                    },
                }
            )
        layer = {"blocks": blocks}
        if i_layer < len(cfg.depths) - 1:
            layer["downsample"] = {
                "norm": nn.norm_init(4 * dim),
                "reduction": nn.linear_init(next(keys), 4 * dim, 2 * dim, bias=False),
            }
        layers.append(layer)

    sf = cfg.spec_size // (2 ** (len(cfg.depths) - 1)) // cfg.patch_stride // cfg.freq_ratio
    return {
        "bn0": {
            "scale": np.ones((cfg.mel_bins,), np.float32),
            "bias": np.zeros((cfg.mel_bins,), np.float32),
            "mean": np.zeros((cfg.mel_bins,), np.float32),
            "var": np.ones((cfg.mel_bins,), np.float32),
        },
        "patch_embed": {
            "proj": nn.conv_init(next(keys), cfg.patch_size, cfg.patch_size, 1, cfg.embed_dim),
            "norm": nn.norm_init(cfg.embed_dim),
        },
        "layers": layers,
        "norm": nn.norm_init(cfg.num_features),
        "tscam_conv": nn.conv_init(next(keys), sf, 3, cfg.num_features, cfg.num_classes),
        "head": nn.linear_init(next(keys), cfg.num_classes, cfg.num_classes),
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _window_partition(x, w):
    b, h, wid, c = x.shape
    x = x.reshape(b, h // w, w, wid // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(wins, w, h, wid):
    b = wins.shape[0] // ((h // w) * (wid // w))
    x = wins.reshape(b, h // w, wid // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wid, -1)


def _swin_block(p, x, res, heads, window, shift, attn_mask, rel_idx):
    b, L, c = x.shape
    shortcut = x
    x = nn.layer_norm(p["norm1"], x)
    x = x.reshape(b, res, res, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(x, window)  # [B*nW, w*w, C]

    qkv = nn.linear(p["attn"]["qkv"], wins)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    d = c // heads
    q = nn.split_heads(q, heads)
    k = nn.split_heads(k, heads)
    v = nn.split_heads(v, heads)
    bias = jnp.asarray(p["attn"]["rel_bias"])[rel_idx]  # [w*w, w*w, H]
    bias = jnp.transpose(bias, (2, 0, 1))[None]  # [1, H, w*w, w*w]
    if attn_mask is not None:
        nW = attn_mask.shape[0]
        bias = bias + jnp.tile(attn_mask[:, None], (b, 1, 1, 1))
        # attn_mask repeats per batch: [B*nW, 1, w*w, w*w]
    out = nn.attention(q, k, v, bias=bias)
    wins = nn.linear(p["attn"]["proj"], nn.merge_heads(out))

    x = _window_reverse(wins, window, res, res)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x.reshape(b, L, c)
    x = shortcut + x
    h = nn.layer_norm(p["norm2"], x)
    h = nn.linear(p["mlp"]["fc2"], jax.nn.gelu(nn.linear(p["mlp"]["fc1"], h), approximate=False))
    return x + h


def _patch_merge(p, x, res):
    b, L, c = x.shape
    x = x.reshape(b, res, res, c)
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
        axis=-1,
    ).reshape(b, -1, 4 * c)
    x = nn.layer_norm(p["norm"], x)
    return nn.linear(p["reduction"], x)


def forward_features(params, cfg: HTSATConfig, img):
    """img: [B, spec_size, spec_size, 1] (the folded mel "image").

    Returns dict with 'embedding' [B, num_features] and 'clipwise_output'
    [B, num_classes] (reference forward_features, htsat.py:1010-1060)."""
    x = nn.conv2d(
        params["patch_embed"]["proj"], img,
        stride=(cfg.patch_stride, cfg.patch_stride), padding="VALID",
    )
    b, gh, gw, c = x.shape
    x = x.reshape(b, gh * gw, c)
    x = nn.layer_norm(params["patch_embed"]["norm"], x)

    res = cfg.grid
    for i_layer, layer in enumerate(params["layers"]):
        heads = cfg.num_heads[i_layer]
        window = min(cfg.window_size, res)
        shift_base = window // 2 if res > cfg.window_size else 0
        rel_idx = jnp.asarray(_rel_pos_index(window))
        mask = (
            jnp.asarray(_swin_attn_mask(res, window, shift_base))
            if shift_base > 0
            else None
        )
        for j, blk in enumerate(layer["blocks"]):
            shift = 0 if j % 2 == 0 else shift_base
            blk_mask = mask if shift > 0 else None
            x = _swin_block(blk, x, res, heads, window, shift, blk_mask, rel_idx)
        if "downsample" in layer:
            x = _patch_merge(layer["downsample"], x, res)
            res //= 2

    x = nn.layer_norm(params["norm"], x)  # [B, 64, 1024]
    C = cfg.num_features
    SF = ST = res  # 8 x 8 final grid
    x = x.reshape(b, SF, ST, C)
    # group 2D: fold freq_ratio out of the freq axis into time
    c_freq_bin = SF // cfg.freq_ratio  # 2
    x = x.reshape(b, cfg.freq_ratio, c_freq_bin, ST, C)
    # torch: [B,C,F,T] -> reshape (F//cfb, cfb) -> permute to [B,C,cfb,F//cfb*T]
    x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(b, c_freq_bin, cfg.freq_ratio * ST, C)

    embedding = jnp.mean(x.reshape(b, -1, C), axis=1)  # avgpool over all positions

    logits = nn.conv2d(
        params["tscam_conv"], x, stride=(1, 1), padding=[(0, 0), (1, 1)]
    )  # [B, 1, T', classes]
    logits = jnp.mean(logits.reshape(b, -1, cfg.num_classes), axis=1)
    return {
        "embedding": embedding,
        "clipwise_output": jax.nn.sigmoid(logits),
        "latent_logits": logits,
    }


def mel_image(params, cfg: HTSATConfig, wav, interp_matrix):
    """waveform [B, N] @ 48 kHz -> folded [B, spec_size, spec_size, 1] image.

    Mirrors spectrogram -> logmel -> bn0 -> reshape_wav2img
    (htsat.py:1131-1146, 1074-1101)."""
    basis = jnp.asarray(stft_ops.stft_basis(cfg.n_fft, cfg.n_fft))
    mag = stft_ops.stft_magnitude(wav, basis, cfg.n_fft, cfg.hop_size)  # [B, F, T]
    power = jnp.square(mag)
    mel_fb = jnp.asarray(
        stft_ops.librosa_mel_filters(
            cfg.sample_rate, cfg.n_fft, cfg.mel_bins, cfg.fmin, cfg.fmax
        )
    )
    mel = jnp.einsum("mf,bft->btm", mel_fb, power, preferred_element_type=jnp.float32)
    logmel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))  # power_to_db, ref=1, no top_db

    bn = params["bn0"]
    logmel = (logmel - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5) * bn["scale"] + bn["bias"]

    # bicubic time interpolation to spec_size * freq_ratio frames
    x = jnp.einsum("ot,btm->bom", jnp.asarray(interp_matrix), logmel)
    b, T, F = x.shape  # T = 1024, F = 64
    # fold: [B, F, T] -> [B, freq_ratio, F, T/freq_ratio] -> [B, fr*F, T/fr]
    xt = jnp.transpose(x, (0, 2, 1))  # [B, F, T]
    xt = xt.reshape(b, F, cfg.freq_ratio, T // cfg.freq_ratio)
    xt = jnp.transpose(xt, (0, 2, 1, 3)).reshape(b, cfg.freq_ratio * F, T // cfg.freq_ratio)
    return xt[..., None]  # [B, 256, 256, 1]


def encode(params, wav, cfg: HTSATConfig = BASE):
    """waveform [B, N] @ 48 kHz -> latent embedding [B, num_features]."""
    t_frames = wav.shape[-1] // cfg.hop_size + 1
    interp = bicubic_matrix(t_frames, cfg.spec_size * cfg.freq_ratio)
    img = mel_image(params, cfg, wav, interp)
    return forward_features(params, cfg, img)["embedding"]
