"""CLIP-style causal text transformer — CLAP's "transformer" text branch.

Alternative text tower (config-selectable; shipped checkpoints use RoBERTa —
see models/roberta.py). Re-design of reference
``clap/open_clip/model.py:256-300,470-496,629-643``: token + positional
embeddings, pre-LN residual attention blocks with a causal mask, final LN,
features taken at the argmax (EOT) token position, then the MLP projection.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from audioldm2_tpu.ops import nn


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    context_length: int = 77


def init_clip_text(key, cfg: CLIPTextConfig = CLIPTextConfig()):
    keys = iter(nn.split_keys(key, 8 * cfg.layers + 8))
    d = cfg.width
    blocks = []
    for _ in range(cfg.layers):
        blocks.append(
            {
                "ln_1": nn.norm_init(d),
                "attn": {
                    # torch MultiheadAttention: in_proj [3D, D], out_proj [D, D]
                    "in_proj": nn.linear_init(next(keys), d, 3 * d),
                    "out_proj": nn.linear_init(next(keys), d, d),
                },
                "ln_2": nn.norm_init(d),
                "mlp": {
                    "c_fc": nn.linear_init(next(keys), d, 4 * d),
                    "c_proj": nn.linear_init(next(keys), 4 * d, d),
                },
            }
        )
    return {
        "token_embedding": nn.randn(next(keys), (cfg.vocab_size, d), std=0.02),
        "positional_embedding": nn.randn(next(keys), (cfg.context_length, d), std=0.01),
        "blocks": blocks,
        "ln_final": nn.norm_init(d),
    }


def apply_clip_text(params, cfg: CLIPTextConfig, token_ids):
    """token_ids: [B, 77] int32 -> pooled features [B, width] at the EOT
    (argmax token id) position, post final LN."""
    x = jnp.asarray(params["token_embedding"])[token_ids]
    x = x + params["positional_embedding"]

    L = token_ids.shape[1]
    causal = jnp.tril(jnp.ones((L, L), jnp.bool_))[None, None]

    for blk in params["blocks"]:
        h = nn.layer_norm(blk["ln_1"], x)
        qkv = nn.linear(blk["attn"]["in_proj"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        att = nn.attention(
            nn.split_heads(q, cfg.heads),
            nn.split_heads(k, cfg.heads),
            nn.split_heads(v, cfg.heads),
            mask=causal,
        )
        x = x + nn.linear(blk["attn"]["out_proj"], nn.merge_heads(att))
        h = nn.layer_norm(blk["ln_2"], x)
        x = x + nn.linear(
            blk["mlp"]["c_proj"], jax.nn.gelu(nn.linear(blk["mlp"]["c_fc"], h), approximate=False)
        )

    x = nn.layer_norm(params["ln_final"], x)
    eot = jnp.argmax(token_ids, axis=-1)
    return jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]


def convert_clip_text(sd, cfg: CLIPTextConfig = CLIPTextConfig(), prefix: str = ""):
    """Map reference keys (token_embedding/positional_embedding/
    text_branch.resblocks.<i>/ln_final)."""
    from audioldm2_tpu import convert

    blocks = []
    for i in range(cfg.layers):
        bp = f"{prefix}text_branch.resblocks.{i}"
        blocks.append(
            {
                "ln_1": convert.norm_p(sd, bp + ".ln_1"),
                "attn": {
                    "in_proj": {
                        "w": sd[bp + ".attn.in_proj_weight"].transpose(1, 0),
                        "b": sd[bp + ".attn.in_proj_bias"],
                    },
                    "out_proj": convert.linear_p(sd, bp + ".attn.out_proj"),
                },
                "ln_2": convert.norm_p(sd, bp + ".ln_2"),
                "mlp": {
                    "c_fc": convert.linear_p(sd, bp + ".mlp.c_fc"),
                    "c_proj": convert.linear_p(sd, bp + ".mlp.c_proj"),
                },
            }
        )
    return {
        "token_embedding": sd[prefix + "token_embedding.weight"],
        "positional_embedding": sd[prefix + "positional_embedding"],
        "blocks": blocks,
        "ln_final": convert.norm_p(sd, prefix + "ln_final"),
    }
