"""On-TPU Pallas kernel compile smoke (VERDICT r3 #2).

Round 3 shipped a kernel edit that PASSED every interpret-mode numerics
test but failed to *compile* on the chip (Mosaic scoped-VMEM OOM at
CFG-batch 8) — zeroing the round's benchmark. This lane closes that hole:
it collects the exact kernel shapes the production UNet dispatches (by
tracing ``apply_unet`` with recording wrappers at every family geometry,
CFG batch, and duration bucket) and then jit-compiles AND executes each
Pallas kernel once per shape on the real TPU, checking numerics against
the XLA path.

Run:  AUDIOLDM2_TEST_TPU=1 python -m pytest tests/ -m tpu -q
(the default lane forces JAX_PLATFORMS=cpu in conftest and these tests
self-skip).

Cost control (round 5): the default lane covers the duration buckets the
BASELINE.md scenarios dispatch (kernel_census.LATENT_T_BENCH); set
AUDIOLDM2_TPU_SMOKE_FULL=1 for the all-duration sweep (~7x the tunnel
compiles — hours cold). Numerics references are computed in f32 on the
HOST CPU backend so each census shape costs ONE tunnel compile (the Pallas
kernel), not two (the full-census lane with on-TPU references measured
>3500 s without finishing).

Discipline (VERDICT r3 #2): any diff under ops/*_pallas.py re-runs this
lane AND the bench.py headline before the snapshot commit.
"""

from __future__ import annotations

import os
from typing import Dict, Set

import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

os.environ.setdefault("AUDIOLDM2_FAST_INIT", "1")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


if not _on_tpu():
    pytest.skip(
        "TPU compile smoke: requires a real TPU backend "
        "(AUDIOLDM2_TEST_TPU=1 pytest -m tpu)",
        allow_module_level=True,
    )


# ---------------------------------------------------------------------------
# Shape collection: shared census (ops/kernel_census.py — also used by
# bench.py's pre-flight, so the lane and the bench gate the SAME shapes).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def shapes() -> Dict[str, Set[tuple]]:
    from audioldm2_tpu.ops.kernel_census import collect_shapes

    rec = collect_shapes(full=os.environ.get("AUDIOLDM2_TPU_SMOKE_FULL") == "1")
    # sanity: the trace actually exercised the ladder
    assert rec["attention"] and rec["resblock"] and rec["ln"] and rec["geglu"]
    assert rec["resblock_cat"], "decoder concat path not traced"
    return rec


def _on_host_cpu(fn, *args):
    """Run fn on the host CPU backend in f32 — reference values without a
    per-shape TPU tunnel compile."""
    import numpy as np

    cpu = jax.devices("cpu")[0]
    args32 = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a, np.float32), cpu)
        if hasattr(a, "dtype") and a.dtype == jnp.bfloat16
        else jax.device_put(a, cpu),
        list(args),
    )
    with jax.default_device(cpu):
        return np.asarray(jax.jit(fn)(*args32))


def _max_err(out, want) -> float:
    import numpy as np

    return float(np.max(np.abs(np.asarray(out, np.float32) - want)))


def _key(seed):
    return jax.random.PRNGKey(seed)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def test_attention_kernel_compiles_at_all_dispatched_shapes(shapes):
    from audioldm2_tpu.ops import attention_pallas as ap

    ran = 0
    for (qshape, tk, unmasked, dtype) in sorted(shapes["attention"]):
        b, t, h, d = qshape
        if not unmasked or t != tk:
            continue  # cross-attention stays on the XLA path
        q = jax.random.normal(_key(1), qshape, jnp.bfloat16)
        k = jax.random.normal(_key(2), qshape, jnp.bfloat16)
        v = jax.random.normal(_key(3), qshape, jnp.bfloat16)
        if not ap.supported(q, k, None, None):
            continue
        out = jax.block_until_ready(
            ap.fused_self_attention(q, k, v, float(d) ** -0.5)
        )

        def ref(q, k, v):  # f32 on host CPU — no tunnel compile
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * float(d) ** -0.5
            wts = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", wts, v)

        want = _on_host_cpu(ref, q, k, v)
        err = _max_err(out, want)
        assert err < 1.5e-2, (qshape, err)  # bf16 softmax-weighted sums
        ran += 1
    assert ran >= 4, f"only {ran} attention shapes exercised"


# ---------------------------------------------------------------------------
# fused ResBlock conv (bf16 + int8)
# ---------------------------------------------------------------------------


def _ref_gn_silu_conv(x, scale, bias, w, b, groups):
    """f32 reference composition (run on the host CPU via _on_host_cpu)."""
    B, T, F, C = x.shape
    xg = x.reshape(B, T * F, groups, C // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(B, T, F, C)
    y = y * scale + bias
    y = y * jax.nn.sigmoid(y)
    out = jax.lax.conv_general_dilated(
        y, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def test_resblock_kernel_compiles_at_all_dispatched_shapes(shapes):
    from audioldm2_tpu.ops import resblock_pallas as rp
    from audioldm2_tpu.ops import quant

    ran = ran_q = ran_tiled = 0
    for (xshape, wshape, groups, dtype) in sorted(shapes["resblock"]):
        if len(wshape) != 4 or wshape[0] != 3:
            continue
        x = jax.random.normal(_key(1), xshape, jnp.bfloat16)
        w = jax.random.normal(_key(2), wshape, jnp.bfloat16) * 0.05
        cout = wshape[-1]
        scale = jnp.ones((xshape[-1],), jnp.float32)
        bias = jnp.zeros((xshape[-1],), jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        if not rp.supported(x, w, groups):
            # shapes over the scoped-vmem budget dispatch to the T-tiled
            # variant instead — compile + numerics-check that path here
            if rp.supported_tiled(x, w, groups):
                out = jax.block_until_ready(
                    rp.gn_silu_conv3x3_tiled(x, scale, bias, w, b, groups=groups)
                )
                want = _on_host_cpu(
                    lambda *a: _ref_gn_silu_conv(*a, groups=groups),
                    x, scale, bias, w, b)
                err = _max_err(out, want)
                assert err < 0.06, ("tiled", xshape, err)
                ran_tiled += 1
            continue
        out = jax.block_until_ready(
            rp.gn_silu_conv3x3(x, scale, bias, w, b, groups=groups)
        )
        assert out.shape == xshape[:-1] + (cout,)
        # vs the f32 reference — an isfinite-only check here let a Mosaic
        # mis-lowering (wrong values at cin=128, round 4) ship in round 3
        want = _on_host_cpu(
            lambda *a: _ref_gn_silu_conv(*a, groups=groups),
            x, scale, bias, w, b)
        err = _max_err(out, want)
        assert err < 0.06, (xshape, err)  # bf16 matmul-order noise vs f32
        ran += 1
        # int8 weight-streaming variant at the same geometry
        pq = quant.quantize_conv3x3_dict({"w": w, "b": b})
        if rp.supported(x, pq["wq"], groups):
            outq = jax.block_until_ready(
                rp.gn_silu_conv3x3_q(
                    x, scale, bias, pq["wq"], pq["ws"], pq["b"], groups=groups
                )
            )
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - outq.astype(jnp.float32))))
            assert err < 0.3, (xshape, err)  # int8 quant noise bound
            ran_q += 1
    assert ran >= 6, f"only {ran} resblock shapes exercised"
    assert ran_q >= 6, f"only {ran_q} int8 resblock shapes exercised"
    assert ran_tiled >= 1, "no dispatched shape reached the tiled kernel"


# ---------------------------------------------------------------------------
# LN+matmul / GEGLU+matmul (bf16 + int8)
# ---------------------------------------------------------------------------


def test_lnmm_kernels_compile_at_all_dispatched_shapes(shapes):
    from audioldm2_tpu.ops import lnmm_pallas as lp
    from audioldm2_tpu.ops import quant

    ran = 0
    for (xshape, wshape, dtype) in sorted(shapes["ln"]):
        x = jax.random.normal(_key(1), xshape, jnp.bfloat16)
        w = jax.random.normal(_key(2), wshape, jnp.bfloat16) * 0.05
        if not lp.ln_matmul_supported(x, w):
            continue
        scale = jnp.ones((xshape[-1],), jnp.float32)
        bias = jnp.zeros((xshape[-1],), jnp.float32)
        out = jax.block_until_ready(lp.ln_matmul(x, scale, bias, w))
        assert out.shape == xshape[:-1] + (wshape[-1],)
        pq = quant.quantize_linear_dict({"w": w})
        if lp.int8_matmul_supported(x, pq["wq"]):
            jax.block_until_ready(lp.int8_matmul(x, pq["wq"], pq["ws"]))
        ran += 1
    assert ran >= 4, f"only {ran} ln shapes exercised"

    ran = 0
    for (hshape, wshape, dtype) in sorted(shapes["geglu"]):
        h = jax.random.normal(_key(1), hshape, jnp.bfloat16)
        w = jax.random.normal(_key(2), wshape, jnp.bfloat16) * 0.05
        if not lp.geglu_matmul_supported(h, w):
            continue
        n = wshape[-1]
        res = jax.random.normal(_key(3), hshape[:-1] + (n,), jnp.bfloat16)
        b = jnp.zeros((n,), jnp.float32)
        out = jax.block_until_ready(lp.geglu_matmul(h, w, b, res))
        assert out.shape == res.shape
        ran += 1
    assert ran >= 4, f"only {ran} geglu shapes exercised"


def test_cat_resblock_kernel_compiles_at_all_dispatched_shapes(shapes):
    from audioldm2_tpu.ops import resblock_pallas as rp

    ran = 0
    for (x1shape, x2shape, wshape, groups, dtype) in sorted(
        shapes["resblock_cat"]
    ):
        if len(wshape) != 4 or wshape[0] != 3:
            continue
        x1 = jax.random.normal(_key(1), x1shape, jnp.bfloat16)
        x2 = jax.random.normal(_key(2), x2shape, jnp.bfloat16)
        w = jax.random.normal(_key(3), wshape, jnp.bfloat16) * 0.05
        if rp.supported_cat(x1, x2, w, groups):
            fn = rp.gn_silu_conv3x3_cat
        elif rp.supported_cat_tiled(x1, x2, w, groups):
            fn = rp.gn_silu_conv3x3_cat_tiled
        else:
            continue
        cin = x1shape[-1] + x2shape[-1]
        cout = wshape[-1]
        scale = jnp.ones((cin,), jnp.float32)
        bias = jnp.zeros((cin,), jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        out = jax.block_until_ready(
            fn(x1, x2, scale, bias, w, b, groups=groups)
        )
        want = _on_host_cpu(
            lambda x1, x2, *a: _ref_gn_silu_conv(
                jnp.concatenate([x1, x2], axis=-1), *a, groups=groups),
            x1, x2, scale, bias, w, b)
        err = _max_err(out, want)
        # bf16 kernel vs f32 truth measures ~0.03 at the widest (cin=640,
        # CFG-b8) shapes; a real mis-lowering shows err ~5 at output std ~1
        # (round-4 sweep)
        assert err < 0.08, (fn.__name__, x1shape, x2shape, err)
        ran += 1
    assert ran >= 8, f"only {ran} cat resblock shapes exercised"
