"""FLAN-T5 text encoder — functional JAX.

Re-implementation of the (frozen) T5 encoder stack the reference drives
through HuggingFace (reference ``encoders/modules.py:113-198`` with
``google/flan-t5-large``; weights come from the monolithic checkpoint).
Pre-norm RMSNorm blocks, unscaled attention with shared bucketed
relative-position bias (held by layer 0), gated-gelu feed-forward.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from audioldm2_tpu.config import FlanT5Config
from audioldm2_tpu.ops import nn


def relative_position_bucket(
    relative_position: np.ndarray,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> np.ndarray:
    """Bidirectional T5 bucket function (host-side; positions are static)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int32) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int32)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


def position_bias_table_index(q_len: int, k_len: int, cfg: FlanT5Config) -> np.ndarray:
    """[q_len, k_len] bucket indices (static per sequence length)."""
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    return relative_position_bucket(
        mem - ctx,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance,
    )


def init_t5_encoder(key, cfg: FlanT5Config):
    keys = iter(nn.split_keys(key, 8 * cfg.num_layers + 8))
    inner = cfg.num_heads * cfg.d_kv
    blocks = []
    for i in range(cfg.num_layers):
        blk = {
            "ln1": {"scale": np.ones((cfg.d_model,), np.float32)},
            "attn": {
                "q": nn.linear_init(next(keys), cfg.d_model, inner, bias=False),
                "k": nn.linear_init(next(keys), cfg.d_model, inner, bias=False),
                "v": nn.linear_init(next(keys), cfg.d_model, inner, bias=False),
                "o": nn.linear_init(next(keys), inner, cfg.d_model, bias=False),
            },
            "ln2": {"scale": np.ones((cfg.d_model,), np.float32)},
            "ff": {
                "wi_0": nn.linear_init(next(keys), cfg.d_model, cfg.d_ff, bias=False),
                "wi_1": nn.linear_init(next(keys), cfg.d_model, cfg.d_ff, bias=False),
                "wo": nn.linear_init(next(keys), cfg.d_ff, cfg.d_model, bias=False),
            },
        }
        if i == 0:
            blk["rel_bias"] = nn.randn(
                next(keys), (cfg.relative_attention_num_buckets, cfg.num_heads), std=0.1
            )
        blocks.append(blk)
    return {
        "token_embed": nn.randn(next(keys), (cfg.vocab_size, cfg.d_model)),
        "blocks": blocks,
        "final_ln": {"scale": np.ones((cfg.d_model,), np.float32)},
    }


def _t5_attention(p, x, position_bias, mask, cfg: FlanT5Config):
    q = nn.split_heads(nn.linear(p["q"], x), cfg.num_heads)
    k = nn.split_heads(nn.linear(p["k"], x), cfg.num_heads)
    v = nn.split_heads(nn.linear(p["v"], x), cfg.num_heads)
    # T5 does not scale by sqrt(d_kv)
    out = nn.attention(q, k, v, mask=mask, bias=position_bias, scale=1.0)
    return nn.linear(p["o"], nn.merge_heads(out))


def apply_t5_encoder(params, cfg: FlanT5Config, input_ids, attention_mask):
    """input_ids: [B, L] int32; attention_mask: [B, L] (1 = token).

    Returns [B, L, d_model] final hidden states (post final RMSNorm)."""
    x = jnp.asarray(params["token_embed"])[input_ids]

    # shared relative-position bias from block 0, static for fixed L
    L = input_ids.shape[1]
    buckets = jnp.asarray(position_bias_table_index(L, L, cfg))  # [L, L]
    table = jnp.asarray(params["blocks"][0]["rel_bias"])  # [num_buckets, H]
    position_bias = jnp.transpose(table[buckets], (2, 0, 1))[None]  # [1, H, L, L]

    for blk in params["blocks"]:
        h = nn.rms_norm(blk["ln1"], x, cfg.layer_norm_epsilon)
        x = x + _t5_attention(blk["attn"], h, position_bias, attention_mask, cfg)
        h = nn.rms_norm(blk["ln2"], x, cfg.layer_norm_epsilon)
        if cfg.gated_act:
            ff = nn.linear(
                blk["ff"]["wo"],
                jax.nn.gelu(nn.linear(blk["ff"]["wi_0"], h), approximate=True)
                * nn.linear(blk["ff"]["wi_1"], h),
            )
        else:
            ff = nn.linear(
                blk["ff"]["wo"], jax.nn.relu(nn.linear(blk["ff"]["wi_0"], h))
            )
        x = x + ff
    return nn.rms_norm(params["final_ln"], x, cfg.layer_norm_epsilon)
