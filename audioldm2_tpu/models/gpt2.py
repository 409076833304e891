"""GPT-2 backbone over continuous embeddings, with a static KV cache.

The reference's "language of audio" generator feeds GPT-2 continuous
embeddings and regenerates the full prefix every autoregressive step — no KV
cache (reference ``audiomae_gen/sequence_input.py:294-325``). Here the
backbone exposes a prefill + single-token-step API over fixed-size cache
buffers so the whole generation loop compiles into one `lax.scan`
(SURVEY.md §7 guiding decision 1b).

Layout: HF GPT-2 ("gpt2" base config); Conv1D weights are [in, out] and are
kept that way. Position ids are taken from the cumulative attention mask so
padded positions don't consume positions — identical to the reference for
the unpadded batchsize-1 path (HF uses plain arange even over pads).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from audioldm2_tpu.config import GPT2Config
from audioldm2_tpu.ops import nn


def init_gpt2(key, cfg: GPT2Config):
    keys = iter(nn.split_keys(key, 8 * cfg.n_layer + 4))
    d = cfg.n_embd
    blocks = []
    for _ in range(cfg.n_layer):
        blocks.append(
            {
                "ln_1": nn.norm_init(d),
                "attn": {
                    "c_attn": nn.linear_init(next(keys), d, 3 * d),
                    "c_proj": nn.linear_init(next(keys), d, d),
                },
                "ln_2": nn.norm_init(d),
                "mlp": {
                    "c_fc": nn.linear_init(next(keys), d, 4 * d),
                    "c_proj": nn.linear_init(next(keys), 4 * d, d),
                },
            }
        )
    return {
        "wpe": nn.randn(next(keys), (cfg.n_positions, d), std=0.01),
        "blocks": blocks,
        "ln_f": nn.norm_init(d),
    }


class KVCache(NamedTuple):
    k: jnp.ndarray  # [n_layer, B, L_max, H, D]
    v: jnp.ndarray


def _attn(p, q, k_all, v_all, mask_bhqk):
    """q: [B, Tq, H, Dh]; k_all/v_all: [B, Tk, H, Dh]; boolean keep mask
    broadcastable to [B, H, Tq, Tk]."""
    out = nn.attention(q, k_all, v_all, mask=mask_bhqk)
    return nn.linear(p["c_proj"], nn.merge_heads(out))


def _mlp(p, x):
    return nn.linear(p["c_proj"], jax.nn.gelu(nn.linear(p["c_fc"], x), approximate=True))


def _qkv(p, x, cfg: GPT2Config):
    qkv = nn.linear(p["c_attn"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return (
        nn.split_heads(q, cfg.n_head),
        nn.split_heads(k, cfg.n_head),
        nn.split_heads(v, cfg.n_head),
    )


def prefill(params, cfg: GPT2Config, embeds, mask, cache_len: int):
    """Process the prefix in one pass and build the KV cache.

    embeds: [B, L, D]; mask: [B, L] (1 = valid; pads may be mid-sequence).
    cache_len: static total buffer length (prefix + generation steps).
    Returns (hidden [B, L, D], KVCache with first L slots filled).
    """
    b, L, d = embeds.shape
    h_dim = d // cfg.n_head
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0).astype(jnp.int32)
    x = embeds + jnp.asarray(params["wpe"])[positions]

    causal = jnp.tril(jnp.ones((L, L), jnp.bool_))
    keep = causal[None, None] & mask[:, None, None, :].astype(bool)

    ks = jnp.zeros((cfg.n_layer, b, cache_len, cfg.n_head, h_dim), embeds.dtype)
    vs = jnp.zeros_like(ks)
    for i, blk in enumerate(params["blocks"]):
        hn = nn.layer_norm(blk["ln_1"], x, cfg.layer_norm_epsilon)
        q, k, v = _qkv(blk["attn"], hn, cfg)
        ks = ks.at[i, :, :L].set(k)
        vs = vs.at[i, :, :L].set(v)
        x = x + _attn(blk["attn"], q, k, v, keep)
        x = x + _mlp(blk["mlp"], nn.layer_norm(blk["ln_2"], x, cfg.layer_norm_epsilon))
    x = nn.layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    return x, KVCache(ks, vs)


def step(params, cfg: GPT2Config, emb, cache: KVCache, cache_mask, index, position):
    """One decode step.

    emb: [B, D] input embedding; cache_mask: [B, L_max] validity of cache
    slots (prefix mask padded with the already-generated ones); index: static
    or traced scalar slot to write; position: [B] position id.
    Returns (hidden [B, D], updated cache).
    """
    b, d = emb.shape
    x = emb[:, None, :] + jnp.asarray(params["wpe"])[position][:, None, :]

    ks, vs = cache.k, cache.v
    l_max = ks.shape[2]
    slot_mask = (
        jnp.arange(l_max)[None, :] == index
    )  # [1, L_max] one-hot for the new slot
    keep = (cache_mask.astype(bool) | slot_mask)[:, None, None, :]  # [B,1,1,L]

    for i, blk in enumerate(params["blocks"]):
        hn = nn.layer_norm(blk["ln_1"], x, cfg.layer_norm_epsilon)
        q, k, v = _qkv(blk["attn"], hn, cfg)
        ks = jax.lax.dynamic_update_slice(ks, k[None], (i, 0, index, 0, 0))
        vs = jax.lax.dynamic_update_slice(vs, v[None], (i, 0, index, 0, 0))
        x = x + _attn(blk["attn"], q, ks[i], vs[i], keep)
        x = x + _mlp(blk["mlp"], nn.layer_norm(blk["ln_2"], x, cfg.layer_norm_epsilon))
    x = nn.layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    return x[:, 0], KVCache(ks, vs)


def forward_full(params, cfg: GPT2Config, embeds, mask):
    """Reference-style full forward (no cache) — used for parity tests."""
    h, _ = prefill(params, cfg, embeds, mask, cache_len=embeds.shape[1])
    return h
