"""Fused self-attention Pallas kernel for the UNet's spatial transformers.

The UNet's self-attention levels run over 64-2048 tokens with head dim 32.
A naive jnp attention materializes [B, H, T, T] float32 logits in HBM (at
T=1024 that is ~2 GB of traffic per denoising step across the ST ladder);
this kernel keeps the logits tile in VMEM: each program computes logits, a
numerically-stable softmax and the value contraction without ever writing
the [T, T] matrix out.

Design notes (v5 — lane-blocked grid with a hard VMEM budget):
- v4 worked in the full pre-head-split [B, T, C] layout with an 8-way
  static head unroll per program. That shipped a compile-time VMEM OOM at
  CFG-batch 8 (BENCH_r03: "Scoped allocation with size 32.08M and limit
  16.00M"): Mosaic kept every unrolled head's [block_q, T] f32 softmax
  tile live at once, and `supported()` had no VMEM gate. v5 removes both
  failure modes structurally:
  * the grid gains a lane-block dimension — each program sees a 128-lane
    slice of Q/K/V (= 128/head_dim heads, 1-4), so the worst-case live
    set is bounded by construction, not by compiler liveness analysis;
  * `block_q` is sized against an explicit budget that PESSIMISTICALLY
    assumes all unrolled heads keep logits+probs f32 tiles live
    simultaneously (the observed v4 behavior);
  * `supported()` rejects any shape for which no valid block size exists
    under that budget (mirrors resblock_pallas.supported's 16 MB scoped-
    vmem rule).
- The kernel still works in the natural pre-head-split layout (C = H*D,
  head-major lanes): q/k/v arrive as [B, T, H, D] views of [B, T, C], so
  the wrapper's reshape is free — no HBM relayout anywhere.
- Grid (B, C/128, T/bq), q-blocks fastest: the [T, 128] K/V tiles of a
  (batch, lane-block) pair stay VMEM-resident across its q-blocks (their
  index-map output is unchanged). Total HBM traffic is identical to v4;
  only the per-program VMEM footprint shrank.
- Shapes here are small enough that a q-block sees the whole K/V (T <=
  4096); no online-softmax streaming over KV blocks is needed — one
  pass, exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LOG2E = 1.4426950408889634

_LANE_BLOCK = 128
# Worst-case live-f32 budget per program (bytes). The real scoped-vmem
# limit for TPU custom calls is 16 MB; 8 MB of softmax tiles leaves room
# for the q/k/v/out tiles, double-buffered block fetches and Mosaic
# scratch. resblock_pallas.supported() documents the same limit.
_VMEM_SOFTMAX_BUDGET = 8 * 1024 * 1024


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, head_dim: int):
    q = q_ref[0]  # [block_q, LB]   (LB = 128 lanes = n_h heads)
    k = k_ref[0]  # [T, LB]
    v = v_ref[0]  # [T, LB]
    d = head_dim
    # Softmax via exp2 with scale*log2(e) folded into the logits multiply
    # (exp lowers to exp2 + a multiply anyway — folding saves one f32 pass
    # over the [block_q, T] tile per head), and the 1/sum normalization
    # deferred to the [block_q, D] output (T/D fewer divides).
    s2 = scale * _LOG2E
    outs = []
    for i in range(q.shape[-1] // d):  # static unroll over <= 4 heads
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
    o_ref[0] = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def _block_q(t: int, head_dim: int) -> int:
    """Largest divisor-of-t block size whose worst-case live softmax set
    fits the budget. Pessimistic model: every head in the 128-lane block
    keeps its [block_q, T] f32 logits AND probs tiles live across the
    static unroll (observed Mosaic behavior in v4). Returns 0 when no
    valid block exists (callers must fall back to the XLA path). Must
    divide t exactly: the grid's q dimension is t // block_q, so a
    non-divisor would silently drop the tail q-rows (e.g. t=1536 from a
    15 s duration bucket)."""
    n_heads = _LANE_BLOCK // head_dim
    per_row = n_heads * t * 4 * 2  # logits + probs, f32
    cap = _VMEM_SOFTMAX_BUDGET // per_row
    if cap < 8:
        return 0
    bq = min(t, (cap // 8) * 8)
    while t % bq:
        bq -= 8
    return bq


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_self_attention(q, k, v, scale: float, interpret: bool = False):
    """q, k, v: [B, T, H, D] (no mask/bias) -> [B, T, H, D].

    Falls back to the caller's jnp path for shapes the kernel doesn't fit
    (callers check :func:`supported`). ``interpret=True`` runs the same
    grid/spec construction through the Pallas interpreter (CPU tests).
    """
    b, t, h, d = q.shape
    c = h * d
    # free view: [B, T, H, D] is contiguous head-major over the lane dim
    q2, k2, v2 = (x.reshape(b, t, c) for x in (q, k, v))
    bq = _block_q(t, d)
    lb = _LANE_BLOCK
    # q-blocks iterate fastest: the K/V tiles of a (batch, lane-block)
    # pair stay resident across them (their index map output is unchanged)
    grid = (b, c // lb, t // bq)

    kv_spec = pl.BlockSpec(
        (1, t, lb), lambda i, j, _: (i, 0, j), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (1, bq, lb), lambda i, j, qi: (i, qi, j), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, head_dim=d),
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        interpret=interpret,
    )(q2, k2, v2)
    return out.reshape(b, t, h, d)


def supported(q, k, mask, bias) -> bool:
    """Kernel applicability: unmasked/unbiased self-attention with
    tile-friendly sizes AND a valid block size under the VMEM budget."""
    if mask is not None or bias is not None:
        return False
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if tq != tk:
        return False
    if tq % 128 != 0 or tq > 4096:
        return False
    if (h * d) % _LANE_BLOCK != 0:
        return False
    if d not in (32, 64, 128):
        return False
    return _block_q(tq, d) > 0
