"""Opt-in int8 weight quantization for serving (per-output-channel,
symmetric).

Motivation: at CFG-batch 2 the UNet denoising step and the GPT-2 AR decode
step are dominated by streaming weights from HBM (the reference has no
analogue — torch streams f32/f16 from framework buffers). Storing matmul
weights as int8 halves the streamed bytes; the dequant NEVER materializes
in HBM because the Pallas matmul kernels (ops/lnmm_pallas.py) cast the
int8 tile to bf16 *in VMEM* and apply the per-column scale to the matmul
OUTPUT (mathematically identical to scaling the weight, since the scale is
per output column) — so XLA cannot hoist a dequantized copy out of the
sampling scan, which is what an inline `wq * s` would do.

Quantized param dicts replace ``{"w": [K, N]}`` with
``{"wq": int8 [K, N], "ws": f32 [N]}``; biases and norms stay f32. All
consumers (``nn.linear``, ``nn.ln_linear``) dispatch on the key set, with
an exact dequant fallback off-TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w):
    """w: [K, N] -> (int8 [K, N], f32 scale [N]); per-output-column absmax."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=0) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    q = jnp.clip(jnp.round(w32 / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def dequantize(p):
    """Exact f32 reconstruction of a quantized linear's weight."""
    return p["wq"].astype(jnp.float32) * p["ws"]


def is_quantized(p) -> bool:
    return isinstance(p, dict) and "wq" in p


def quantize_linear_dict(p):
    """{"w": [K,N], ...} -> {"wq", "ws", ...}; non-2D or non-dict returned
    unchanged."""
    if not isinstance(p, dict) or "w" not in p or p["w"].ndim != 2:
        return p
    q, s = quantize_weight(p["w"])
    out = {k: v for k, v in p.items() if k != "w"}
    out["wq"], out["ws"] = q, s
    return out


def quantize_tree(tree, should_quantize=None):
    """Walk a param tree, converting every eligible linear dict
    ({"w": 2-D}, optional bias). ``should_quantize(path, leaf_dict)`` can
    veto individual linears (default: quantize all whose K and N are
    multiples of 128 — the Pallas kernel support boundary, so nothing falls
    back to a slow dequant path on chip)."""

    def default_pred(path, p):
        k, n = p["w"].shape
        return k % 128 == 0 and n % 128 == 0

    pred = should_quantize or default_pred

    def walk(node, path):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2 and pred(path, node):
                return quantize_linear_dict(node)
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = [walk(v, path + (i,)) for i, v in enumerate(node)]
            return type(node)(t) if isinstance(node, tuple) else t
        return node

    return walk(tree, ())


def quantize_conv3x3_dict(p):
    """{"w": [3,3,Cin,Cout] HWIO, "b"} -> {"wq" int8, "ws" f32 [Cout], "b"};
    per-output-channel absmax over all 9 taps x Cin. Non-3x3 convs returned
    unchanged."""
    if not isinstance(p, dict) or "w" not in p or p["w"].ndim != 4:
        return p
    w32 = p["w"].astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=(0, 1, 2)) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    q = jnp.clip(jnp.round(w32 / s), -127.0, 127.0).astype(jnp.int8)
    out = {k: v for k, v in p.items() if k != "w"}
    out["wq"], out["ws"] = q, s
    return out


def dequantize_conv(p):
    """Exact f32 reconstruction of a quantized conv's weight."""
    return p["wq"].astype(jnp.float32) * p["ws"]
