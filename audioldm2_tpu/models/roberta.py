"""RoBERTa-base text encoder — functional JAX.

Backbone of the CLAP text branch (reference
``clap/open_clip/model.py:513-516,655-663`` uses HF RobertaModel and its
pooler output). Post-LN BERT-style blocks; RoBERTa position ids are
``cumsum(mask) * mask + padding_idx`` with padding_idx 1.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from audioldm2_tpu.ops import nn


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5


def init_roberta(key, cfg: RobertaConfig):
    keys = iter(nn.split_keys(key, 16 * cfg.num_layers + 8))
    d = cfg.hidden_size

    def emb(shape):
        return nn.randn(next(keys), shape, std=0.02)

    layers = []
    for _ in range(cfg.num_layers):
        layers.append(
            {
                "attn": {
                    "q": nn.linear_init(next(keys), d, d),
                    "k": nn.linear_init(next(keys), d, d),
                    "v": nn.linear_init(next(keys), d, d),
                    "out": nn.linear_init(next(keys), d, d),
                    "ln": nn.norm_init(d),
                },
                "ff": {
                    "intermediate": nn.linear_init(next(keys), d, cfg.intermediate_size),
                    "output": nn.linear_init(next(keys), cfg.intermediate_size, d),
                    "ln": nn.norm_init(d),
                },
            }
        )
    return {
        "word_embeddings": emb((cfg.vocab_size, d)),
        "position_embeddings": emb((cfg.max_position_embeddings, d)),
        "token_type_embeddings": emb((cfg.type_vocab_size, d)),
        "emb_ln": nn.norm_init(d),
        "layers": layers,
        "pooler": nn.linear_init(next(keys), d, d),
    }


def apply_bart_encoder(params, cfg: RobertaConfig, input_ids, attention_mask):
    """BART encoder (CLAP's "bart" text branch pools its
    encoder_last_hidden_state mean, reference model.py:517-545,664-673):
    learned positions with the BART +2 offset, embedding LayerNorm, post-LN
    blocks shared with the BERT/RoBERTa structure."""
    L = input_ids.shape[1]
    position_ids = jnp.broadcast_to(jnp.arange(L) + 2, input_ids.shape)
    x = (
        jnp.asarray(params["word_embeddings"])[input_ids]
        + jnp.asarray(params["position_embeddings"])[position_ids]
    )
    x = nn.layer_norm(params["emb_ln"], x, cfg.layer_norm_eps)
    x = _encoder_stack(params, cfg, x, attention_mask)
    return x


def _encoder_stack(params, cfg, x, attention_mask):
    for layer in params["layers"]:
        a = layer["attn"]
        q = nn.split_heads(nn.linear(a["q"], x), cfg.num_heads)
        k = nn.split_heads(nn.linear(a["k"], x), cfg.num_heads)
        v = nn.split_heads(nn.linear(a["v"], x), cfg.num_heads)
        att = nn.attention(q, k, v, mask=attention_mask)
        att = nn.linear(a["out"], nn.merge_heads(att))
        x = nn.layer_norm(a["ln"], x + att, cfg.layer_norm_eps)
        f = layer["ff"]
        h = jax.nn.gelu(nn.linear(f["intermediate"], x), approximate=False)
        h = nn.linear(f["output"], h)
        x = nn.layer_norm(f["ln"], x + h, cfg.layer_norm_eps)
    return x


def apply_roberta(params, cfg: RobertaConfig, input_ids, attention_mask,
                  bert_style: bool = False, token_type_ids=None):
    """Returns (sequence_output [B, L, D], pooler_output [B, D]).

    ``bert_style=True`` switches to BERT semantics (plain arange positions,
    token_type ids) — the same block structure serves CLAP's "bert" text
    branch (reference clap/open_clip/model.py:497-512)."""
    mask = attention_mask.astype(jnp.int32)
    if bert_style:
        L = input_ids.shape[1]
        position_ids = jnp.broadcast_to(jnp.arange(L), input_ids.shape)
    else:
        incremental = jnp.cumsum(mask, axis=1) * mask
        position_ids = incremental + cfg.pad_token_id

    type_emb = (
        jnp.asarray(params["token_type_embeddings"])[token_type_ids]
        if token_type_ids is not None
        else params["token_type_embeddings"][0]
    )
    x = (
        jnp.asarray(params["word_embeddings"])[input_ids]
        + jnp.asarray(params["position_embeddings"])[position_ids]
        + type_emb
    )
    x = nn.layer_norm(params["emb_ln"], x, cfg.layer_norm_eps)
    x = _encoder_stack(params, cfg, x, attention_mask)

    pooled = jnp.tanh(nn.linear(params["pooler"], x[:, 0]))
    return x, pooled
