"""Fused self-attention Pallas kernel for the UNet's spatial transformers.

The UNet's self-attention levels run over 64-2048 tokens with head dim 32.
A naive jnp attention materializes [B, H, T, T] float32 logits in HBM (at
T=1024 that is ~2 GB of traffic per denoising step across the ST ladder);
this kernel keeps the logits tile in VMEM: each program computes logits, a
numerically-stable softmax and the value contraction without ever writing
the [T, T] matrix out.

Design notes (v4 — the shape that actually lowers on TPU; v2/v3 variants
with per-head 4-D blocks die in Mosaic, which requires the last two block
dims to be 8/128-divisible or full and cannot shape-cast minor size-1 dims):
- The kernel works in the natural pre-head-split [B, T, C] layout (C=H*D,
  head-major lanes). q/k/v arrive as [B, T, H, D] views of that buffer, so
  the wrapper's reshape is free — no HBM relayout anywhere (the first
  version transposed q/k/v to [B*H, T, D] in HBM and back, four full
  relayout round-trips per attention site).
- Per-head q/k/v are 32-wide lane slices inside VMEM; per-head outputs are
  lane-concatenated and written back as one [block_q, C] tile.
- Grid (B, T/bq), q fastest: K/V blocks of a batch row stay VMEM-resident
  across its q-blocks. TPU grids execute sequentially on the core, so few
  large programs beat many small ones.
- Shapes here are small enough that a q-block sees the whole K/V (T <=
  4096, block_q chosen so the [block_q, T] f32 logits tile is <= 4 MB);
  no online-softmax streaming over KV blocks is needed — one pass, exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LOG2E = 1.4426950408889634


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, head_dim: int):
    q = q_ref[0]  # [block_q, C]
    k = k_ref[0]  # [T, C]
    v = v_ref[0]  # [T, C]
    d = head_dim
    # Softmax via exp2 with scale*log2(e) folded into the logits multiply
    # (exp lowers to exp2 + a multiply anyway — folding saves one f32 pass
    # over the [block_q, T] tile per head), and the 1/sum normalization
    # deferred to the [block_q, D] output (T/D fewer divides).
    s2 = scale * _LOG2E
    outs = []
    for i in range(q.shape[-1] // d):  # static unroll; lane slices in VMEM
        qh = q[:, i * d : (i + 1) * d]  # [block_q, D]
        kh = k[:, i * d : (i + 1) * d]  # [T, D]
        vh = v[:, i * d : (i + 1) * d]  # [T, D]
        logits = (
            jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * s2
        )  # [block_q, T], base-2 scaled
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp2(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(vh.dtype), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, D]
        outs.append((acc / s).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _block_q(t: int) -> int:
    """Largest multiple-of-128 divisor of t whose [block_q, T] f32 logits
    tile stays <= 4 MB. Must divide t exactly: the grid's q dimension is
    t // block_q, so a non-divisor would silently drop the tail q-rows
    (e.g. t=1536 from a 15 s duration bucket)."""
    cap = max(128, min(t, (1 << 20) // t))
    bq = (cap // 128) * 128
    while t % bq:
        bq -= 128
    return bq


@functools.partial(jax.jit, static_argnames=("scale",))
def fused_self_attention(q, k, v, scale: float):
    """q, k, v: [B, T, H, D] (no mask/bias) -> [B, T, H, D].

    Falls back to the caller's jnp path for shapes the kernel doesn't fit
    (callers check :func:`supported`).
    """
    b, t, h, d = q.shape
    c = h * d
    # free view: [B, T, H, D] is contiguous head-major over the lane dim
    q2, k2, v2 = (x.reshape(b, t, c) for x in (q, k, v))
    bq = _block_q(t)
    # grid iterates q-blocks fastest: K/V blocks of the same batch row
    # stay resident across them (their index map output is unchanged)
    grid = (b, t // bq)

    kv_spec = pl.BlockSpec(
        (1, t, c), lambda i, _: (i, 0, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (1, bq, c), lambda i, qi: (i, qi, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, head_dim=d),
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
    )(q2, k2, v2)
    return out.reshape(b, t, h, d)


def supported(q, k, mask, bias) -> bool:
    """Kernel applicability: unmasked/unbiased self-attention with
    tile-friendly sizes."""
    if mask is not None or bias is not None:
        return False
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if tq != tk:
        return False
    if tq % 128 != 0 or tq > 4096:
        return False
    if (h * d) % 128 != 0:
        return False
    return d in (32, 64, 128)
