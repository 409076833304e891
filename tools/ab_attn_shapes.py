"""A/B the fused self-attention Pallas kernel vs the XLA einsum path at the
exact production shapes of every family's UNet self-attention sites.

Each variant runs inside a single jitted ``lax.scan`` with a data dependency
between iterations (like the real DDIM scan) — standalone per-call timings
through the axon tunnel carry ~1 ms dispatch overhead and are meaningless.

Shapes (q: [B, T, H, D]) come from the attention ladder geometry: latent
(T, F) halves per level, C = model_channels * mult, H = C / 32. CFG batch
is 2 * batchsize * n_candidates.

Usage: python tools/ab_attn_shapes.py [--steps 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# (label, B, T, H, D): production self-attention shapes.
# 16 kHz families (latent 256x16): ds2 -> T=1024 C=256 H=8; ds4 -> T=256
# C=384 H=12; ds8 -> T=64 C=640 H=20. 48 kHz (latent 128x32): same token
# counts. CFG batch: 2 (batch=1), 6 (n_candidates=3), 8 (batch=4).
SHAPES = [
    ("b1 ds2", 2, 1024, 8, 32),
    ("b1 ds4", 2, 256, 12, 32),
    ("n3 ds2", 6, 1024, 8, 32),
    ("n3 ds4", 6, 256, 12, 32),
    ("n3 ds8", 6, 64, 20, 32),
    ("b4 ds2", 8, 1024, 8, 32),
    ("b4 ds4", 8, 256, 12, 32),
    ("b8 ds2", 16, 1024, 8, 32),
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

    out = run(q)  # compile + warm
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
    """Per-call ms with the scan-iteration floor cancelled: time bodies with
    1 and 9 chained attentions, return (t9 - t1) / 8."""
    t1, out = _scan_time(attn_fn, q, k, v, steps, 1)
    t9, _ = _scan_time(attn_fn, q, k, v, max(steps // 4, 10), 9)
    return (t9 - t1) / 8, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    from audioldm2_tpu.ops import attention_pallas, nn

    print(f"device: {jax.devices()[0].device_kind}")
    print(f"{'shape':>8} {'B':>3} {'T':>5} {'H':>3}  {'xla ms':>8} {'pallas ms':>9} "
          f"{'win':>6} {'max|d|':>9} {'attn GF':>8} {'pallas MFU':>10}")

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
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )
            return out.astype(v.dtype)

        t_xla, o_xla = scan_bench(xla_attn, q, k, v, args.steps)

        if not attention_pallas.supported(q, k, None, None):
            print(f"{label:>8} {b:>3} {t:>5} {h:>3}  {t_xla:8.4f} {'n/a':>9}")
            continue

        def pal_attn(q, k, v):
            return attention_pallas.fused_self_attention(q, k, v, scale)

        t_pal, o_pal = scan_bench(pal_attn, q, k, v, args.steps)

        err = float(jnp.max(jnp.abs(
            o_xla.astype(jnp.float32) - o_pal.astype(jnp.float32))))
        gflop = 4 * b * h * t * t * d / 1e9
        mfu = gflop / t_pal / 197e3 * 1e3 if t_pal else 0.0
        print(f"{label:>8} {b:>3} {t:>5} {h:>3}  {t_xla:8.4f} {t_pal:9.4f} "
              f"{t_xla / t_pal:6.2f} {err:9.1e} {gflop:8.2f} {mfu:10.1%}")


if __name__ == "__main__":
    main()
