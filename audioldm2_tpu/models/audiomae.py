"""AudioMAE: ViT-B/16 masked-autoencoder audio encoder — functional JAX.

Re-design of the frozen AudioMAE used for conditioning (reference
``modules/audiomae/AudioMAE.py:100-138``, ``models_mae.py:447-470``): a
1024x128 kaldi fbank is patchified (16x16 conv -> 64x8 = 512 patches + CLS),
run through 12 pre-norm ViT blocks (LN eps 1e-6), and the *contextual
embedding* is the mean of the LN'd outputs of blocks 9-11
(``n > contextual_depth`` with contextual_depth=8).

The conditioner pooling ((avg+max)/2 over a [64, 8] token grid, reference
``encoders/modules.py:481-513``) is also here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audioldm2_tpu.config import AudioMAEConfig
from audioldm2_tpu.ops import nn

LN_EPS = 1e-6


def init_audiomae(key, cfg: AudioMAEConfig):
    keys = iter(nn.split_keys(key, 8 * cfg.depth + 8))
    d = cfg.embed_dim
    n_patches = (cfg.img_size[0] // cfg.patch_size) * (cfg.img_size[1] // cfg.patch_size)
    blocks = []
    for _ in range(cfg.depth):
        blocks.append(
            {
                "norm1": nn.norm_init(d),
                "attn": {
                    "qkv": nn.linear_init(next(keys), d, 3 * d),
                    "proj": nn.linear_init(next(keys), d, d),
                },
                "norm2": nn.norm_init(d),
                "mlp": {
                    "fc1": nn.linear_init(next(keys), d, int(d * cfg.mlp_ratio)),
                    "fc2": nn.linear_init(next(keys), int(d * cfg.mlp_ratio), d),
                },
            }
        )
    return {
        "patch_embed": nn.conv_init(next(keys), cfg.patch_size, cfg.patch_size, 1, d),
        "cls_token": np.zeros((1, 1, d), np.float32),
        "pos_embed": nn.randn(next(keys), (1, n_patches + 1, d), std=0.02),
        "blocks": blocks,
        "norm": nn.norm_init(d),
    }


def _vit_block(p, x, num_heads):
    h = nn.layer_norm(p["norm1"], x, LN_EPS)
    qkv = nn.linear(p["attn"]["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    att = nn.attention(
        nn.split_heads(q, num_heads),
        nn.split_heads(k, num_heads),
        nn.split_heads(v, num_heads),
    )
    x = x + nn.linear(p["attn"]["proj"], nn.merge_heads(att))
    h = nn.layer_norm(p["norm2"], x, LN_EPS)
    h = nn.linear(p["mlp"]["fc2"], jax.nn.gelu(nn.linear(p["mlp"]["fc1"], h), approximate=False))
    return x + h


def encode_no_mask(params, cfg: AudioMAEConfig, fbank):
    """fbank: [B, 1024, 128] -> contextual embedding [B, 513, 768]
    (reference forward_encoder_no_mask, models_mae.py:447-470)."""
    x = fbank[..., None]  # [B, T, F, 1]
    # 16x16/stride-16 patch conv; flatten in torch order (row-major over the
    # [T/16, F/16] grid)
    p = nn.conv2d(params["patch_embed"], x, stride=(cfg.patch_size, cfg.patch_size), padding="VALID")
    b, gt, gf, d = p.shape
    tokens = p.reshape(b, gt * gf, d)
    tokens = tokens + params["pos_embed"][:, 1:]
    cls = params["cls_token"] + params["pos_embed"][:, :1]
    x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), tokens], axis=1)

    contextual = []
    for n, blk in enumerate(params["blocks"]):
        x = _vit_block(blk, x, cfg.num_heads)
        if n > cfg.contextual_depth:
            contextual.append(nn.layer_norm(params["norm"], x, LN_EPS))
    return jnp.mean(jnp.stack(contextual, axis=0), axis=0)


def avg_max_pool_factors(representation, time_pool: int, freq_pool: int):
    """(avg+max)/2 pooling of the 512 patch tokens on the [64, 8] grid with
    explicit factors (reference encoders/modules.py:359-396 / :481-513 —
    both CTPoolRand variants share this pool). Returns [B, tokens, 768]."""
    tp = min(int(time_pool), 64)
    fp = min(int(freq_pool), 8)
    b, _, d = representation.shape
    grid = representation[:, 1:, :].reshape(b, 64, 8, d)
    window = (1, tp, fp, 1)
    avg = jax.lax.reduce_window(grid, 0.0, jax.lax.add, window, window, "VALID") / (tp * fp)
    mx = jax.lax.reduce_window(grid, -jnp.inf, jax.lax.max, window, window, "VALID")
    pooled = (avg + mx) / 2.0
    return pooled.reshape(b, -1, d)


def avg_max_pool(representation, cfg: AudioMAEConfig):
    """Eval-time pooling with the config's fixed factors."""
    return avg_max_pool_factors(
        representation, cfg.eval_time_pooling, cfg.eval_freq_pooling
    )


def sample_pooling_factors(rng, cfg: AudioMAEConfig):
    """Training-time random pooling factors, chosen host-side (the factor
    pair changes the token count, i.e. the jitted shape — one compiled
    program per pair, like the reference's dynamic AvgPool2d construction).

    ``cfg.tf_separated`` selects between the two reference conditioners:
    - False: AudioMAEConditionCTPoolRand (modules.py:481-499) — sample
      time_pool, tie freq_pool = min(8, time_pool).
    - True: AudioMAEConditionCTPoolRandTFSeparated (modules.py:359-379) —
      sample time_pool and freq_pool independently.
    """
    tp = int(min(64, rng.choice(list(cfg.time_pooling_factors))))
    if cfg.tf_separated:
        fp = int(min(8, rng.choice(list(cfg.freq_pooling_factors))))
    else:
        fp = min(8, tp)
    return tp, fp


def l2_regularize(pooled):
    """Optional L2 normalization of pooled tokens (reference
    modules.py:397-400, ``regularization=True`` configs)."""
    return pooled / jnp.clip(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
    )
