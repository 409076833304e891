"""VITS-style phoneme TextEncoder — functional JAX.

Re-design of the reference phoneme conditioner (reference
``encoders/modules.py:30-110``, ``phoneme_encoder/encoder.py:9-50``,
``phoneme_encoder/attentions.py:26-372``): embedding scaled by sqrt(h),
6 post-LN transformer blocks with windowed relative-position attention
(window 4, shared across heads) and conv FFNs (kernel 3), then a learnable
positional embedding added to the output.

The relative-attention pad/shift index gymnastics of the reference are
replaced by a direct gather: scores[i,j] += q_i . E_k[j-i+w] for |j-i| <= w,
which is algebraically identical (zero contribution outside the window).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from audioldm2_tpu.config import PhonemeEncoderConfig
from audioldm2_tpu.ops import nn


def init_phoneme_encoder(key, cfg: PhonemeEncoderConfig):
    h = cfg.hidden_channels
    keys = iter(nn.split_keys(key, 8 * cfg.n_layers + 8))
    layers = []
    for _ in range(cfg.n_layers):
        layers.append(
            {
                "attn": {
                    "q": nn.conv1d_init(next(keys), 1, h, h),
                    "k": nn.conv1d_init(next(keys), 1, h, h),
                    "v": nn.conv1d_init(next(keys), 1, h, h),
                    "o": nn.conv1d_init(next(keys), 1, h, h),
                    "emb_rel_k": nn.randn(
                        next(keys), (1, 2 * cfg.window_size + 1, h // cfg.n_heads),
                        std=(h // cfg.n_heads) ** -0.5,
                    ),
                    "emb_rel_v": nn.randn(
                        next(keys), (1, 2 * cfg.window_size + 1, h // cfg.n_heads),
                        std=(h // cfg.n_heads) ** -0.5,
                    ),
                },
                "ln1": nn.norm_init(h),
                "ffn": {
                    "conv1": nn.conv1d_init(next(keys), cfg.kernel_size, h, cfg.filter_channels),
                    "conv2": nn.conv1d_init(next(keys), cfg.kernel_size, cfg.filter_channels, h),
                },
                "ln2": nn.norm_init(h),
            }
        )
    return {
        "emb": nn.randn(next(keys), (cfg.vocab_size, h), std=h**-0.5),
        "layers": layers,
        "proj": nn.conv1d_init(next(keys), 1, h, h * 2),  # m/logs head (unused at inference)
        "pos_emb": np.zeros((1, cfg.pad_length, h), np.float32),
    }


def _rel_tables(p_attn, cfg: PhonemeEncoderConfig, length: int):
    """[L, L, d] gather tables for relative keys/values (zero outside the
    window)."""
    w = cfg.window_size
    rel = np.arange(length)[None, :] - np.arange(length)[:, None]  # j - i
    inside = np.abs(rel) <= w
    idx = np.clip(rel + w, 0, 2 * w)
    return jnp.asarray(idx), jnp.asarray(inside)


def _rel_attention(p, x, attn_keep, cfg: PhonemeEncoderConfig):
    """x: [B, L, h]; attn_keep: [B, 1, L, L] boolean."""
    h = cfg.hidden_channels
    d = h // cfg.n_heads
    L = x.shape[1]
    q = nn.split_heads(nn.conv1d(p["q"], x, padding=0), cfg.n_heads)
    k = nn.split_heads(nn.conv1d(p["k"], x, padding=0), cfg.n_heads)
    v = nn.split_heads(nn.conv1d(p["v"], x, padding=0), cfg.n_heads)

    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32) * scale

    idx, inside = _rel_tables(None, cfg, L)
    ek = p["emb_rel_k"][0]  # [2w+1, d] (heads_share)
    table_k = jnp.where(inside[..., None], ek[idx], 0.0)  # [L, L, d]
    scores = scores + jnp.einsum(
        "bihd,ijd->bhij", q, table_k, preferred_element_type=jnp.float32
    ) * scale

    # reference masks with -1e4, not -inf (attentions.py:263)
    scores = jnp.where(attn_keep, scores, -1e4)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)

    out = jnp.einsum("bhij,bjhd->bihd", weights, v, preferred_element_type=jnp.float32)
    ev = p["emb_rel_v"][0]
    table_v = jnp.where(inside[..., None], ev[idx], 0.0)
    out = out + jnp.einsum(
        "bhij,ijd->bihd", weights, table_v, preferred_element_type=jnp.float32
    )
    out = out.reshape(x.shape[0], L, h).astype(x.dtype)
    return nn.conv1d(p["o"], out, padding=0)


def _ffn(p, x, x_mask, kernel_size: int):
    pad = [((kernel_size - 1) // 2, kernel_size // 2)]
    h = nn.conv1d(p["conv1"], x * x_mask, padding=pad)
    h = jax.nn.relu(h)
    h = nn.conv1d(p["conv2"], h * x_mask, padding=pad)
    return h * x_mask


def apply_phoneme_encoder(params, cfg: PhonemeEncoderConfig, phoneme_idx):
    """phoneme_idx: [B, pad_length] int32 -> (emb [B, pad_length, h],
    mask [B, pad_length]). Mirrors PhonemeEncoder.forward
    (encoders/modules.py:94-110) incl. the learnable positional embedding."""
    h = cfg.hidden_channels
    lengths = jnp.sum((phoneme_idx != cfg.pad_token_id).astype(jnp.int32), axis=-1)
    L = phoneme_idx.shape[1]
    # prefix mask (reference commons.sequence_mask — pads are trailing)
    x_mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)

    x = jnp.asarray(params["emb"])[phoneme_idx] * math.sqrt(h)  # [B, L, h]
    x = x * x_mask[..., None]
    attn_keep = (x_mask[:, None, :, None] * x_mask[:, None, None, :]) > 0  # [B,1,L,L]

    for layer in params["layers"]:
        y = _rel_attention(layer["attn"], x, attn_keep, cfg)
        x = nn.layer_norm(layer["ln1"], x + y)
        y = _ffn(layer["ffn"], x, x_mask[..., None], cfg.kernel_size)
        x = nn.layer_norm(layer["ln2"], x + y)
    x = x * x_mask[..., None]

    x = x + params["pos_emb"]
    return x, x_mask
