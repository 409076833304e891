"""Latent-score UNet with per-block transformer ladders — functional JAX.

Re-design of the reference UNetModel (reference
``latent_diffusion/modules/diffusionmodules/openaimodel.py:476-885`` and
``modules/attention.py``): channels-last activations [B, T, F, C], a
context-free self-attention SpatialTransformer first at every attention
level (``extra_sa_layer``), then one cross-attention SpatialTransformer per
context slot (slot order = conditioner order), optional FiLM conditioning
concatenated with the time embedding (doubling embedding width).

The whole forward is a single jitted program; classifier-free guidance is
run by the sampler as one batched call (uncond/cond stacked on batch), not
two sequential calls like the reference DDIM (ddim.py:293-299).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from audioldm2_tpu.config import UNetConfig
from audioldm2_tpu.ops import nn

GN_EPS_RES = 1e-5  # reference GroupNorm32 (torch default eps)
GN_EPS_ST = 1e-6  # reference attention.py Normalize
LN_EPS = 1e-5


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _resblock_init(key, cin, cout, emb_dim):
    ks = nn.split_keys(key, 4)
    p = {
        "in_norm": nn.norm_init(cin),
        "in_conv": nn.conv_init(ks[0], 3, 3, cin, cout),
        "emb": nn.linear_init(ks[1], emb_dim, cout),
        "out_norm": nn.norm_init(cout),
        "out_conv": nn.conv_init(ks[2], 3, 3, cout, cout, zero=True),
    }
    if cin != cout:
        p["skip"] = nn.conv_init(ks[3], 1, 1, cin, cout)
    return p


def _attn_init(key, query_dim, context_dim, inner_dim):
    ks = nn.split_keys(key, 4)
    ctx = context_dim if context_dim is not None else query_dim
    return {
        "to_q": nn.linear_init(ks[0], query_dim, inner_dim, bias=False),
        "to_k": nn.linear_init(ks[1], ctx, inner_dim, bias=False),
        "to_v": nn.linear_init(ks[2], ctx, inner_dim, bias=False),
        "to_out": nn.linear_init(ks[3], inner_dim, query_dim),
    }


def _st_block_init(key, dim, context_dim):
    ks = nn.split_keys(key, 4)
    inner_ff = dim * 4
    return {
        "norm1": nn.norm_init(dim),
        "attn1": _attn_init(ks[0], dim, None, dim),
        "norm2": nn.norm_init(dim),
        "attn2": _attn_init(ks[1], dim, context_dim, dim),
        "norm3": nn.norm_init(dim),
        "ff": {
            "proj_in": nn.linear_init(ks[2], dim, inner_ff * 2),  # GEGLU
            "proj_out": nn.linear_init(ks[3], inner_ff, dim),
        },
    }


def _st_init(key, channels, depth, context_dim):
    ks = nn.split_keys(key, depth + 2)
    return {
        "norm": nn.norm_init(channels),
        "proj_in": nn.conv_init(ks[0], 1, 1, channels, channels),
        "blocks": [
            _st_block_init(ks[1 + d], channels, context_dim) for d in range(depth)
        ],
        "proj_out": nn.conv_init(ks[-1], 1, 1, channels, channels, zero=True),
    }


def _sts_init(key, ch, cfg: UNetConfig):
    ks = nn.split_keys(key, 1 + len(cfg.context_dims))
    out = {"self_st": _st_init(ks[0], ch, cfg.transformer_depth, None)}
    out["cross_sts"] = [
        _st_init(ks[1 + i], ch, cfg.transformer_depth, cd)
        for i, cd in enumerate(cfg.context_dims)
    ]
    return out


def init_unet(key, cfg: UNetConfig):
    keys = iter(nn.split_keys(key, 512))
    mc = cfg.model_channels
    emb_dim = cfg.emb_dim
    p = {
        "time_embed": {
            "lin1": nn.linear_init(next(keys), mc, cfg.time_embed_dim),
            "lin2": nn.linear_init(next(keys), cfg.time_embed_dim, cfg.time_embed_dim),
        }
    }
    if cfg.extra_film_condition_dim is not None:
        p["film_emb"] = nn.linear_init(
            next(keys), cfg.extra_film_condition_dim, cfg.time_embed_dim
        )

    input_blocks = [{"conv": nn.conv_init(next(keys), 3, 3, cfg.in_channels, mc)}]
    ch = mc
    ds = 1
    chans = [mc]
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _resblock_init(next(keys), ch, mult * mc, emb_dim)}
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                blk.update(_sts_init(next(keys), ch, cfg))
            input_blocks.append(blk)
            chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_blocks.append({"downsample": nn.conv_init(next(keys), 3, 3, ch, ch)})
            chans.append(ch)
            ds *= 2
    p["input_blocks"] = input_blocks

    mid = {"res1": _resblock_init(next(keys), ch, ch, emb_dim)}
    mid.update(_sts_init(next(keys), ch, cfg))
    mid["res2"] = _resblock_init(next(keys), ch, ch, emb_dim)
    p["middle_block"] = mid

    output_blocks = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            blk = {"res": _resblock_init(next(keys), ch + ich, mult * mc, emb_dim)}
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                blk.update(_sts_init(next(keys), ch, cfg))
            if level and i == cfg.num_res_blocks:
                blk["upsample"] = nn.conv_init(next(keys), 3, 3, ch, ch)
                ds //= 2
            output_blocks.append(blk)
    p["output_blocks"] = output_blocks

    p["out_norm"] = nn.norm_init(ch)
    p["out_conv"] = nn.conv_init(next(keys), 3, 3, mc, cfg.out_channels, zero=True)
    return p


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _resblock(p, x, emb):
    """x: [B, T, F, C] — or a (h, skip) tuple for the decoder's
    channel-concat input (reference openaimodel.py:818), which dispatches
    to concat-free fused paths so the step's widest activations never
    round-trip HBM just to be re-read."""
    if isinstance(x, tuple):
        x1, x2 = x
        h = nn.gn_silu_conv_cat(p["in_norm"], p["in_conv"], x1, x2,
                                eps=GN_EPS_RES)
        # decoder cin != cout at every shipped geometry (cin includes the
        # skip width), so the 1x1 skip conv is present; split it over the
        # parts. Identity fallback kept for completeness.
        skip = (nn.conv1x1_cat(p["skip"], x1, x2) if "skip" in p
                else jnp.concatenate([x1, x2], axis=-1))
    else:
        h = nn.gn_silu_conv(p["in_norm"], p["in_conv"], x, eps=GN_EPS_RES)
        skip = nn.conv2d(p["skip"], x) if "skip" in p else x
    emb_out = nn.linear(p["emb"], nn.silu(emb))
    h = h + emb_out[:, None, None, :]
    h = nn.gn_silu_conv(p["out_norm"], p["out_conv"], h, eps=GN_EPS_RES)
    return skip + h


def _cross_attention(p, p_norm, x, context, mask, num_heads, kv=None):
    """Pre-norm attention: x is the raw residual-stream input; the
    LayerNorm fuses into the first projection on TPU (nn.ln_linear)."""
    if kv is None and context is None and "to_qkv" in p:
        # self-attention with fused projection (see fuse_self_qkv): one
        # [C, 3C] matmul keeps the MXU 3x wider than three [C, C] calls
        q, k, v = jnp.split(nn.ln_linear(p_norm, p["to_qkv"], x, LN_EPS), 3, axis=-1)
        q = nn.split_heads(q, num_heads)
        k = nn.split_heads(k, num_heads)
        v = nn.split_heads(v, num_heads)
    elif kv is not None or context is not None:
        q = nn.split_heads(nn.ln_linear(p_norm, p["to_q"], x, LN_EPS), num_heads)
        if kv is not None:
            k, v = kv
        else:
            k = nn.split_heads(nn.linear(p["to_k"], context), num_heads)
            v = nn.split_heads(nn.linear(p["to_v"], context), num_heads)
    else:
        xn = nn.layer_norm(p_norm, x, LN_EPS)
        q = nn.split_heads(nn.linear(p["to_q"], xn), num_heads)
        k = nn.split_heads(nn.linear(p["to_k"], xn), num_heads)
        v = nn.split_heads(nn.linear(p["to_v"], xn), num_heads)
    out = nn.attention(q, k, v, mask=mask if (context is not None or kv is not None) else None)
    return nn.linear(p["to_out"], nn.merge_heads(out))


def _st_block(p, x, context, mask, num_heads, kv=None):
    x = x + _cross_attention(p["attn1"], p["norm1"], x, None, None, num_heads)
    x = x + _cross_attention(p["attn2"], p["norm2"], x, context, mask, num_heads, kv=kv)
    h = nn.ln_linear(p["norm3"], p["ff"]["proj_in"], x, LN_EPS)
    return nn.geglu_ff_out(p["ff"]["proj_out"], h, x)


def _spatial_transformer(p, x, context, mask, num_heads, kvs=None):
    b, t, f, c = x.shape
    h = nn.group_norm(p["norm"], x, eps=GN_EPS_ST)
    h = nn.conv2d(p["proj_in"], h)
    h = h.reshape(b, t * f, c)
    for d, blk in enumerate(p["blocks"]):
        kv = kvs[d] if kvs is not None else None
        h = _st_block(blk, h, context, mask, num_heads, kv=kv)
    h = h.reshape(b, t, f, c)
    h = nn.conv2d(p["proj_out"], h)
    return x + h


def _run_sts(blk, h, contexts, masks, cfg: UNetConfig, kv_iter=None):
    num_heads = h.shape[-1] // cfg.num_head_channels
    h = _spatial_transformer(blk["self_st"], h, None, None, num_heads)
    for i, st in enumerate(blk["cross_sts"]):
        ctx = contexts[i] if i < len(contexts) else None
        msk = masks[i] if i < len(masks) else None
        kvs = next(kv_iter) if kv_iter is not None else None
        if kvs is not None and ctx is None:
            kvs = None  # self-attention slot: no precomputed KV applies
        h = _spatial_transformer(st, h, ctx, msk, num_heads, kvs=kvs)
    return h


def _fuse_attn(attn):
    if "to_qkv" in attn:
        return attn
    out = dict(attn)
    out["to_qkv"] = {
        "w": jnp.concatenate(
            [attn["to_q"]["w"], attn["to_k"]["w"], attn["to_v"]["w"]], axis=1
        )
    }
    # keep to_q/to_k/to_v: precompute_cross_kv and the masked path still
    # read them, and XLA dedupes unused inputs at compile time
    return out


def fuse_self_qkv(params):
    """Fuse q/k/v projections of every *self*-attention into one [C, 3C]
    matmul: attn1 of all transformer blocks, plus attn2 of the context-free
    self-ST slot. Done once per generate call, outside the sampling scan —
    the scan body then runs one wide MXU op instead of three narrow ones.

    Cross-attention K/V stay separate (precomputed outside the loop by
    :func:`precompute_cross_kv`)."""

    def fuse_st(st):
        st = dict(st)
        st["blocks"] = [dict(b) for b in st["blocks"]]
        for b in st["blocks"]:
            b["attn1"] = _fuse_attn(b["attn1"])
        return st

    def fuse_sts(blk):
        blk = dict(blk)
        st = fuse_st(blk["self_st"])
        # the self-ST's attn2 also attends over x (context=None slot)
        for b in st["blocks"]:
            b["attn2"] = _fuse_attn(b["attn2"])
        blk["self_st"] = st
        blk["cross_sts"] = [fuse_st(s) for s in blk["cross_sts"]]
        return blk

    p = dict(params)
    p["input_blocks"] = [
        fuse_sts(b) if "self_st" in b else b for b in params["input_blocks"]
    ]
    p["middle_block"] = fuse_sts(params["middle_block"])
    p["output_blocks"] = [
        fuse_sts(b) if "self_st" in b else b for b in params["output_blocks"]
    ]
    return p


_QUANT_KEYS = ("to_qkv", "to_q", "to_out", "proj_in", "proj_out")


def quantize_st_linears(params):
    """int8-quantize the spatial-transformer matmul weights that stream
    from HBM every denoising step (attention projections + GEGLU FF). Skips
    to_k/to_v (cross K/V are precomputed outside the scan by
    precompute_cross_kv, so their weights are read once per call, not per
    step) and all convolutions. Apply AFTER fuse_self_qkv and
    precompute_cross_kv, once per generate call, outside the scan."""
    from audioldm2_tpu.ops import quant

    def pred(path, p):
        if not path or path[-1] not in _QUANT_KEYS:
            return False
        if not any(seg in ("attn1", "attn2", "ff") for seg in path):
            return False
        k, n = p["w"].shape
        return k % 128 == 0 and n % 128 == 0

    return quant.quantize_tree(params, pred)


def quantize_resblock_convs(params):
    """int8-quantize the ResBlock 3x3 conv weights ("in_conv"/"out_conv") —
    the dominant per-step HBM weight stream at small CFG batch (the ST
    matmuls covered by quantize_st_linears are a minor share; see
    docs/PERF.md round-2 int8 A/B). Only convs the Pallas kernel can run
    quantized (Cin/Cout multiples of 128) convert; the rest stay bf16.
    Opt-in serving mode — quantization error is real, parity paths never
    use it."""
    from audioldm2_tpu.ops import quant

    def walk(node, path):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k in ("in_conv", "out_conv")
                    and isinstance(v, dict)
                    and "w" in v
                    and getattr(v["w"], "ndim", 0) == 4
                    and v["w"].shape[0] == 3
                    and v["w"].shape[2] % 128 == 0
                    and v["w"].shape[3] % 128 == 0
                ):
                    out[k] = quant.quantize_conv3x3_dict(v)
                else:
                    out[k] = walk(v, path + (k,))
            return out
        if isinstance(node, (list, tuple)):
            t = [walk(v, path + (i,)) for i, v in enumerate(node)]
            return type(node)(t) if isinstance(node, tuple) else t
        return node

    return walk(params, ())


def precompute_cross_kv(params, cfg: UNetConfig, context_list):
    """Cross-attention K/V projections depend only on the (loop-invariant)
    contexts; computing them once outside the DDIM scan removes ~30 hoisted
    matmuls' worth of per-step relayout copies from the loop body.

    Returns a flat list (one entry per cross-ST instance in walk order) of
    per-depth-block [(k, v)] lists, or None entries for context-free slots.
    """
    out = []

    def add(blk):
        num_heads_local = None
        for i, st in enumerate(blk["cross_sts"]):
            ctx = context_list[i] if i < len(context_list) else None
            if ctx is None:
                out.append(None)
                continue
            per_depth = []
            for sub in st["blocks"]:
                inner = sub["attn2"]["to_k"]["w"].shape[1]
                heads = inner // cfg.num_head_channels
                k = nn.split_heads(nn.linear(sub["attn2"]["to_k"], ctx), heads)
                v = nn.split_heads(nn.linear(sub["attn2"]["to_v"], ctx), heads)
                per_depth.append((k, v))
            out.append(per_depth)

    for blk in params["input_blocks"]:
        if "self_st" in blk:
            add(blk)
    add(params["middle_block"])
    for blk in params["output_blocks"]:
        if "self_st" in blk:
            add(blk)
    return out


def apply_unet(
    params,
    cfg: UNetConfig,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context_list: Sequence[Optional[jnp.ndarray]] = (),
    context_mask_list: Sequence[Optional[jnp.ndarray]] = (),
    y: Optional[jnp.ndarray] = None,
    cross_kv=None,
) -> jnp.ndarray:
    """x: [B, T, F, C]; timesteps: [B]; context_list[i]: [B, L_i, D_i];
    context_mask_list[i]: [B, L_i] (1 = attend); y: [B, film_dim];
    cross_kv: optional output of :func:`precompute_cross_kv` (still pass
    context_list for the slot/mask structure)."""
    t_emb = nn.timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
    emb = nn.linear(params["time_embed"]["lin1"], t_emb)
    emb = nn.linear(params["time_embed"]["lin2"], nn.silu(emb))
    if cfg.extra_film_condition_dim is not None:
        assert y is not None, "film-conditioned UNet requires y"
        emb = jnp.concatenate([emb, nn.linear(params["film_emb"], y)], axis=-1)

    kv_iter = iter(cross_kv) if cross_kv is not None else None

    hs = []
    h = x
    for blk in params["input_blocks"]:
        if "conv" in blk:
            h = nn.conv2d(blk["conv"], h)
        elif "downsample" in blk:
            h = nn.conv2d(blk["downsample"], h, stride=(2, 2), padding=1)
        else:
            h = _resblock(blk["res"], h, emb)
            if "self_st" in blk:
                h = _run_sts(blk, h, context_list, context_mask_list, cfg, kv_iter)
        hs.append(h)

    mid = params["middle_block"]
    h = _resblock(mid["res1"], h, emb)
    h = _run_sts(mid, h, context_list, context_mask_list, cfg, kv_iter)
    h = _resblock(mid["res2"], h, emb)

    for blk in params["output_blocks"]:
        h = _resblock(blk["res"], (h, hs.pop()), emb)
        if "self_st" in blk:
            h = _run_sts(blk, h, context_list, context_mask_list, cfg, kv_iter)
        if "upsample" in blk:
            h = nn.nearest_upsample_2d(h)
            h = nn.conv2d(blk["upsample"], h)

    h = nn.group_norm_silu(params["out_norm"], h, eps=GN_EPS_RES)
    return nn.conv2d(params["out_conv"], h)


# ---------------------------------------------------------------------------
# Legacy QKV attention block (used when use_spatial_transformer=False;
# reference openaimodel.py:303-443). No shipped checkpoint enables it, but it
# completes the reference's attention surface.
# ---------------------------------------------------------------------------


def init_legacy_attention_block(key, channels: int, num_heads: int = 1,
                                num_head_channels: int = -1):
    if num_head_channels != -1:
        num_heads = channels // num_head_channels
    k1, k2 = nn.split_keys(key)
    return {
        "num_heads": num_heads,
        "norm": nn.norm_init(channels),
        "qkv": nn.conv1d_init(k1, 1, channels, channels * 3),
        "proj_out": nn.conv1d_init(k2, 1, channels, channels, zero=True),
    }


def apply_legacy_attention_block(p, x, new_order: bool = False):
    """x: [B, T, F, C] (or [B, S, C]); residual QKV attention over all
    spatial positions. ``new_order`` selects QKVAttention vs
    QKVAttentionLegacy head splitting (openaimodel.py:389-443) — both are
    mathematically identical for conv-produced qkv."""
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    xs = x.reshape(b, -1, c)
    heads = p["num_heads"]
    d = c // heads

    h = nn.group_norm(p["norm"], xs)
    qkv = nn.conv1d(p["qkv"], h, padding=0)  # [B, S, 3C]
    if new_order:
        # QKVAttention: split channel thirds first, then heads
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (nn.split_heads(t, heads) for t in (q, k, v))
    else:
        # QKVAttentionLegacy: split heads first ([B, S, H, 3d]), then thirds
        qkv = qkv.reshape(b, -1, heads, 3 * d)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    out = nn.attention(q, k, v)
    out = nn.conv1d(p["proj_out"], nn.merge_heads(out), padding=0)
    return (xs + out).reshape(orig_shape)


# ---------------------------------------------------------------------------
# EncoderUNetModel: half-UNet classifier (reference openaimodel.py:888-1103).
# A training-era guided-diffusion classifier; never instantiated by any
# shipped config — provided for inventory completeness.
# ---------------------------------------------------------------------------


def init_encoder_unet(key, cfg: UNetConfig, pool: str = "adaptive"):
    keys = iter(nn.split_keys(key, 256))
    mc = cfg.model_channels
    emb_dim = cfg.time_embed_dim
    p = {
        "pool": pool,
        "time_embed": {
            "lin1": nn.linear_init(next(keys), mc, emb_dim),
            "lin2": nn.linear_init(next(keys), emb_dim, emb_dim),
        },
    }
    blocks = [{"conv": nn.conv_init(next(keys), 3, 3, cfg.in_channels, mc)}]
    ch = mc
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _resblock_init(next(keys), ch, mult * mc, emb_dim)}
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                blk["attn"] = init_legacy_attention_block(
                    next(keys), ch, num_head_channels=cfg.num_head_channels
                )
            blocks.append(blk)
        if level != len(cfg.channel_mult) - 1:
            blocks.append({"downsample": nn.conv_init(next(keys), 3, 3, ch, ch)})
            ds *= 2
    p["input_blocks"] = blocks
    p["middle_block"] = {
        "res1": _resblock_init(next(keys), ch, ch, emb_dim),
        "attn": init_legacy_attention_block(
            next(keys), ch, num_head_channels=cfg.num_head_channels
        ),
        "res2": _resblock_init(next(keys), ch, ch, emb_dim),
    }
    assert pool == "adaptive", "only the adaptive pooling head is implemented"
    p["out_norm"] = nn.norm_init(ch)
    p["out_conv"] = nn.conv_init(next(keys), 1, 1, ch, cfg.out_channels, zero=True)
    return p


def apply_encoder_unet(params, cfg: UNetConfig, x, timesteps):
    """x: [B, T, F, C] -> logits [B, out_channels] (adaptive pooling)."""
    t_emb = nn.timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
    emb = nn.linear(params["time_embed"]["lin1"], t_emb)
    emb = nn.linear(params["time_embed"]["lin2"], nn.silu(emb))

    h = x
    for blk in params["input_blocks"]:
        if "conv" in blk:
            h = nn.conv2d(blk["conv"], h)
        elif "downsample" in blk:
            h = nn.conv2d(blk["downsample"], h, stride=(2, 2), padding=1)
        else:
            h = _resblock(blk["res"], h, emb)
            if "attn" in blk:
                h = apply_legacy_attention_block(blk["attn"], h)
    mid = params["middle_block"]
    h = _resblock(mid["res1"], h, emb)
    h = apply_legacy_attention_block(mid["attn"], h)
    h = _resblock(mid["res2"], h, emb)

    h = nn.silu(nn.group_norm(params["out_norm"], h, eps=GN_EPS_RES))
    h = jnp.mean(h, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d((1,1))
    h = nn.conv2d(params["out_conv"], h)
    return h[:, 0, 0, :]
