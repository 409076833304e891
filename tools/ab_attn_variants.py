"""A/B candidate self-attention kernel designs vs v5 (production) and XLA.

The v5 kernel measures ~3.5% of bf16 peak at the dominant T=1024/D=32
shape (~10.3 ms/step of the large-1150k CFG-b6 scan). Hypothesis: the
per-head unroll issues 4 small matmuls per lane block whose contraction
depth (32) uses a quarter of the MXU, and whose 32-lane operand slices
force register relayouts.

v6bd ("block-diagonal head packing") computes all heads of a 128-lane
block with ONE matmul pair at full MXU depth:

  K_bd[h*T+t, h*D:(h+1)*D] = K_h[t]   (zero elsewhere)  [nh*T, 128]
  logits_cat = Q_cat @ K_bd^T                            [bq, nh*T]
  (the zero rows kill cross-head terms — column block h is exactly
   Q_h K_h^T)
  P_cat = per-block softmax(logits_cat)
  O_cat = P_cat @ V_bd                                   [bq, 128]

4x the naive FLOPs, but 128-deep contractions, no sub-128-lane slicing
(T is a multiple of 128, so per-head column blocks are lane-tile
aligned), and 2 MXU ops instead of 8. K_bd/V_bd are built once per
(batch, lane-block) pair in VMEM scratch and reused across q-blocks.

Usage:
  python tools/ab_attn_variants.py --check        # CPU interpret numerics
  python tools/ab_attn_variants.py [--steps 100]  # on-chip scan A/B
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634
_LANE = 128


# ---------------------------------------------------------------------------
# v6bd kernel
# ---------------------------------------------------------------------------


def _v6bd_kernel(q_ref, k_ref, v_ref, o_ref, kbd_ref, vbd_ref, *,
                 scale: float, head_dim: int, t: int):
    nh = _LANE // head_dim

    @pl.when(pl.program_id(2) == 0)
    def _build_blockdiag():
        k = k_ref[0]  # [T, 128]
        v = v_ref[0]
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (t, _LANE), 1) // head_dim
        for h in range(nh):
            m = lane_head == h
            kbd_ref[h * t : (h + 1) * t, :] = jnp.where(m, k, 0)
            vbd_ref[h * t : (h + 1) * t, :] = jnp.where(m, v, 0)

    q = q_ref[0]  # [bq, 128]
    s2 = scale * _LOG2E
    logits = (
        jax.lax.dot_general(
            q, kbd_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * s2
    )  # [bq, nh*T]; column block h = scaled Q_h K_h^T
    ps, ss = [], []
    for h in range(nh):
        lh = logits[:, h * t : (h + 1) * t]  # lane-tile aligned slice
        m = jnp.max(lh, axis=-1, keepdims=True)
        p = jnp.exp2(lh - m)
        ss.append(jnp.sum(p, axis=-1, keepdims=True))  # [bq, 1]
        ps.append(p.astype(o_ref.dtype))
    p_cat = jnp.concatenate(ps, axis=-1)  # [bq, nh*T] bf16
    o_cat = jax.lax.dot_general(
        p_cat, vbd_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, 128]
    s_cat = jnp.concatenate(
        [jnp.broadcast_to(s, (s.shape[0], head_dim)) for s in ss], axis=-1
    )
    o_ref[0] = (o_cat / s_cat).astype(o_ref.dtype)


def _v6bd_block_q(t: int, budget: int = 8 * 1024 * 1024) -> int:
    """logits f32 + probs bf16 per row: nh*t*(4+2)... conservatively 4+4."""
    per_row = (_LANE // 32) * t * 8
    cap = budget // per_row
    if cap < 8:
        return 0
    bq = min(t, (cap // 8) * 8)
    while t % bq:
        bq -= 8
    return bq


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def v6bd_attention(q, k, v, scale: float, interpret: bool = False):
    b, t, h, d = q.shape
    c = h * d
    q2, k2, v2 = (x.reshape(b, t, c) for x in (q, k, v))
    bq = _v6bd_block_q(t)
    nh = _LANE // d
    grid = (b, c // _LANE, t // bq)
    kv_spec = pl.BlockSpec((1, t, _LANE), lambda i, j, _: (i, 0, j),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, bq, _LANE), lambda i, j, qi: (i, qi, j),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_v6bd_kernel, scale=scale, head_dim=d, t=t),
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((nh * t, _LANE), q.dtype),
            pltpu.VMEM((nh * t, _LANE), q.dtype),
        ],
        interpret=interpret,
    )(q2, k2, v2)
    return out.reshape(b, t, h, d)


# ---------------------------------------------------------------------------
# v7: VPU-pass-minimized softmax
#
# v6bd proved the kernel is NOT MXU-issue-bound: 4x the matmul work at full
# contraction depth was a wall-clock wash. The remaining per-head cost is
# the THREE full-tile VPU passes over the [bq, T] f32 logits (max-reduce,
# exp, sum-reduce). v7 removes two of them:
#   * no max subtraction — exp2 of the scaled logits directly, clamped to
#     +-100 so the f32 exp2 can neither overflow (2^100) nor flush the
#     whole row to zero (underflow needs logits < -126 AFTER clamping,
#     impossible). For |logits| < 100 this is EXACT softmax (the division
#     normalizes; max-subtraction only guards the exponent range).
#   * the row sum rides the MXU: s = P @ ones[T, 8] column 0, issued as a
#     matmul in the MXU's idle slack instead of a VPU reduce pass.
# ---------------------------------------------------------------------------


def _v7_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, head_dim: int):
    q = q_ref[0]  # [bq, 128]
    k = k_ref[0]  # [T, 128]
    v = v_ref[0]
    d = head_dim
    t = k.shape[0]
    s2 = scale * _LOG2E
    ones = jnp.ones((t, 8), jnp.bfloat16)
    outs = []
    for i in range(q.shape[-1] // d):
        qh = q[:, i * d : (i + 1) * d]
        kh = k[:, i * d : (i + 1) * d]
        vh = v[:, i * d : (i + 1) * d]
        logits = (
            jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * s2
        )
        p = jnp.exp2(jnp.clip(logits, -100.0, 100.0))  # one fused VPU pass
        pb = p.astype(vh.dtype)
        s = jax.lax.dot_general(
            pb, ones,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :1]  # [bq, 1] row sums on the MXU
        acc = jax.lax.dot_general(
            pb, vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((acc / s).astype(o_ref.dtype))
    o_ref[0] = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def v7_attention(q, k, v, scale: float, interpret: bool = False):
    from audioldm2_tpu.ops import attention_pallas as ap

    b, t, h, d = q.shape
    c = h * d
    q2, k2, v2 = (x.reshape(b, t, c) for x in (q, k, v))
    bq = ap._block_q(t, d)
    grid = (b, c // _LANE, t // bq)
    kv_spec = pl.BlockSpec((1, t, _LANE), lambda i, j, _: (i, 0, j),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, bq, _LANE), lambda i, j, qi: (i, qi, j),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_v7_kernel, scale=scale, head_dim=d),
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        interpret=interpret,
    )(q2, k2, v2)
    return out.reshape(b, t, h, d)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

SHAPES = [
    ("n3 ds2", 6, 1024, 8, 32),
    ("b4 ds2", 8, 1024, 8, 32),
    ("b1 ds2", 2, 1024, 8, 32),
    ("b4 20s", 8, 2048, 8, 32),
]


def _scan_time(attn_fn, q, k, v, steps, n_inner, reps=3):
    def body(carry, _):
        h = carry
        for _ in range(n_inner):
            h = attn_fn(q + h.astype(q.dtype) * 1e-3, k, v)
        return h, ()

    @jax.jit
    def run(q0):
        out, _ = jax.lax.scan(body, q0, None, length=steps)
        return out

    out = run(q)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(q)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / steps * 1e3)
    ts.sort()
    return ts[len(ts) // 2], out


def scan_bench(attn_fn, q, k, v, steps):
    t1, out = _scan_time(attn_fn, q, k, v, steps, 1)
    t9, _ = _scan_time(attn_fn, q, k, v, max(steps // 4, 10), 9)
    return (t9 - t1) / 8, out


def check_interpret():
    import numpy as np

    rng = np.random.default_rng(0)
    # small t only: interpret mode on this 1-core host is ~minutes per shape
    for b, t, h, d in [(2, 256, 8, 32), (1, 384, 4, 32)]:
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        scale = d ** -0.5
        from audioldm2_tpu.ops import nn

        want = nn.attention(q, k, v)
        got = v6bd_attention(q, k, v, scale, interpret=True)
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"v6bd ({b},{t},{h},{d}): max|d| = {err:.2e}")
        assert err < 5e-3, err
        got7 = v7_attention(q, k, v, scale, interpret=True)
        err7 = float(jnp.max(jnp.abs(got7 - want)))
        print(f"v7   ({b},{t},{h},{d}): max|d| = {err7:.2e}")
        assert err7 < 5e-3, err7
    print("interpret numerics OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    if args.check:
        check_interpret()
        return

    from audioldm2_tpu.ops import attention_pallas

    print(f"device: {jax.devices()[0].device_kind}")
    print(f"{'shape':>8} {'B':>3} {'T':>5} {'var':>5}  {'xla':>8} {'v5':>8} "
          f"{'vX':>8} {'vX MFU':>9} {'max|d|':>9}")

    for label, b, t, h, d in SHAPES:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (b, t, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, t, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, t, h, d), jnp.bfloat16)
        scale = d ** -0.5

        def xla_attn(q, k, v):
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.einsum(
                "bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(v.dtype)

        t_xla, o_xla = scan_bench(xla_attn, q, k, v, args.steps)

        def v5(q, k, v):
            return attention_pallas.fused_self_attention(q, k, v, scale)

        t_v5, o_v5 = scan_bench(v5, q, k, v, args.steps)

        def v6(q, k, v):
            return v6bd_attention(q, k, v, scale)

        def v7(q, k, v):
            return v7_attention(q, k, v, scale)

        for name, fn in (("v6bd", v6), ("v7", v7)):
            try:
                t_vx, o_vx = scan_bench(fn, q, k, v, args.steps)
                err = float(jnp.max(jnp.abs(
                    o_v5.astype(jnp.float32) - o_vx.astype(jnp.float32))))
                gflop = 4 * b * h * t * t * d / 1e9  # naive accounting
                mfu = gflop / t_vx / 197e3 * 1e3
                print(f"{label:>8} {b:>3} {t:>5} {name:>5}  {t_xla:8.4f} "
                      f"{t_v5:8.4f} {t_vx:8.4f} {mfu:9.1%} {err:9.1e}")
            except Exception as e:
                print(f"{label:>8} {b:>3} {t:>5} {name:>5}  {t_xla:8.4f} "
                      f"{t_v5:8.4f} FAIL: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
