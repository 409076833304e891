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
# Shape collection: trace the real UNet with recording wrappers.
# ---------------------------------------------------------------------------

# Distinct production UNet geometries (config.py presets):
#   (label, context_dims, depth, film_dim, in_ch, latent_f)
_GEOMETRIES = [
    ("audioldm2-full", (768, 1024), 1, None, 8, 16),
    ("large-1150k", (768, 1024, None), 2, None, 8, 16),
    ("crossattn-t5", (1024,), 1, None, 8, 16),
    ("speech", (768,), 1, None, 8, 16),
    ("48k-film", (None,), 1, 512, 16, 32),
]

# CFG batches: 2 (batch=1), 6 (n_candidates=3), 8 (batch=4).
_CFG_BATCHES = (2, 6, 8)

# latent_T per geometry: 10 s defaults plus the 2.5 s-grid duration
# buckets reachable via --duration (T5/48k families), up to 20 s.
_LATENT_T = {16: (64, 128, 192, 256, 320, 384, 512), 32: (128, 192, 256)}


def _collect_shapes() -> Dict[str, Set[tuple]]:
    """Trace apply_unet at every geometry x CFG batch x duration bucket
    with nn.{attention, gn_silu_conv, ln_linear, geglu_ff_out} wrapped to
    record their call shapes. eval_shape => no compute, pure tracing."""
    from audioldm2_tpu.config import UNetConfig
    from audioldm2_tpu.models import unet
    from audioldm2_tpu.ops import nn

    rec: Dict[str, Set[tuple]] = {
        "attention": set(), "resblock": set(), "ln": set(), "geglu": set(),
        "resblock_cat": set(),
    }

    orig = (nn.attention, nn.gn_silu_conv, nn.ln_linear, nn.geglu_ff_out,
            nn.gn_silu_conv_cat)

    def attention(q, k, v, mask=None, bias=None, scale=None):
        rec["attention"].add(
            (q.shape, k.shape[1], mask is None and bias is None, str(q.dtype))
        )
        return orig[0](q, k, v, mask=mask, bias=bias, scale=scale)

    def gn_silu_conv(p_norm, p_conv, x, groups=32, eps=1e-5):
        w = p_conv.get("w", p_conv.get("wq"))
        rec["resblock"].add((x.shape, w.shape, groups, str(x.dtype)))
        return orig[1](p_norm, p_conv, x, groups=groups, eps=eps)

    def ln_linear(p_norm, p_lin, x, eps=1e-5):
        w = p_lin.get("w", p_lin.get("wq"))
        rec["ln"].add((x.shape, w.shape, str(x.dtype)))
        return orig[2](p_norm, p_lin, x, eps=eps)

    def geglu_ff_out(p_lin, h, residual):
        w = p_lin.get("w", p_lin.get("wq"))
        rec["geglu"].add((h.shape, w.shape, str(h.dtype)))
        return orig[3](p_lin, h, residual)

    def gn_silu_conv_cat(p_norm, p_conv, x1, x2, groups=32, eps=1e-5):
        w = p_conv.get("w", p_conv.get("wq"))
        rec["resblock_cat"].add(
            (x1.shape, x2.shape, w.shape, groups, str(x1.dtype))
        )
        return orig[4](p_norm, p_conv, x1, x2, groups=groups, eps=eps)

    nn.attention, nn.gn_silu_conv = attention, gn_silu_conv
    nn.ln_linear, nn.geglu_ff_out = ln_linear, geglu_ff_out
    nn.gn_silu_conv_cat = gn_silu_conv_cat
    try:
        for label, ctx_dims, depth, film, in_ch, lf in _GEOMETRIES:
            cfg = UNetConfig(
                in_channels=in_ch, out_channels=in_ch,
                context_dims=ctx_dims, transformer_depth=depth,
                extra_film_condition_dim=film,
            )
            params = unet.init_unet(jax.random.PRNGKey(0), cfg)
            params = unet.fuse_self_qkv(params)
            params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params,
            )
            for lt in _LATENT_T[lf]:
                for b in _CFG_BATCHES:
                    x = jax.ShapeDtypeStruct((b, lt, lf, in_ch), jnp.bfloat16)
                    t = jax.ShapeDtypeStruct((b,), jnp.int32)
                    ctxs = [
                        None if d is None
                        else jax.ShapeDtypeStruct((b, 64, d), jnp.bfloat16)
                        for d in ctx_dims
                    ]
                    masks = [
                        None if c is None
                        else jax.ShapeDtypeStruct(c.shape[:2], jnp.float32)
                        for c in ctxs
                    ]
                    y = (
                        jax.ShapeDtypeStruct((b, film), jnp.bfloat16)
                        if film else None
                    )
                    jax.eval_shape(
                        lambda x, t, ctxs, masks, y: unet.apply_unet(
                            params, cfg, x, t, ctxs, masks, y=y
                        ),
                        x, t, ctxs, masks, y,
                    )
    finally:
        nn.attention, nn.gn_silu_conv = orig[0], orig[1]
        nn.ln_linear, nn.geglu_ff_out = orig[2], orig[3]
        nn.gn_silu_conv_cat = orig[4]
    return rec


@pytest.fixture(scope="module")
def shapes() -> Dict[str, Set[tuple]]:
    rec = _collect_shapes()
    # sanity: the trace actually exercised the ladder
    assert rec["attention"] and rec["resblock"] and rec["ln"] and rec["geglu"]
    assert rec["resblock_cat"], "decoder concat path not traced"
    return rec


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
        # XLA reference path, inline (forced past the dispatcher)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * float(d) ** -0.5
        wts = jax.nn.softmax(logits, axis=-1)
        want = jnp.einsum(
            "bhqk,bkhd->bqhd", wts.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - want.astype(jnp.float32))))
        assert err < 1e-2, (qshape, err)  # bf16 softmax-weighted sums
        ran += 1
    assert ran >= 8, f"only {ran} attention shapes exercised"


# ---------------------------------------------------------------------------
# fused ResBlock conv (bf16 + int8)
# ---------------------------------------------------------------------------


def _xla_gn_silu_conv(x, scale, bias, w, b, groups):
    """Reference composition on the same device (f32 GN stats, bf16 conv)."""
    B, T, F, C = x.shape
    x32 = x.astype(jnp.float32)
    xg = x32.reshape(B, T * F, groups, C // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(B, T, F, C)
    y = y * scale + bias
    y = (y * jax.nn.sigmoid(y)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b).astype(x.dtype)


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
                want = _xla_gn_silu_conv(x, scale, bias, w, b, groups)
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - want.astype(jnp.float32))))
                assert err < 0.05, ("tiled", xshape, err)
                ran_tiled += 1
            continue
        out = jax.block_until_ready(
            rp.gn_silu_conv3x3(x, scale, bias, w, b, groups=groups)
        )
        assert out.shape == xshape[:-1] + (cout,)
        # vs the XLA path — an isfinite-only check here let a Mosaic
        # mis-lowering (wrong values at cin=128, round 4) ship in round 3
        want = _xla_gn_silu_conv(x, scale, bias, w, b, groups)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - want.astype(jnp.float32))))
        assert err < 0.05, (xshape, err)  # bf16 matmul-order noise
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
        want = _xla_gn_silu_conv(
            jnp.concatenate([x1, x2], axis=-1), scale, bias, w, b, groups
        )
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - want.astype(jnp.float32))))
        assert err < 0.05, (fn.__name__, x1shape, x2shape, err)
        ran += 1
    assert ran >= 8, f"only {ran} cat resblock shapes exercised"
