"""Pallas kernel numerics (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from audioldm2_tpu.ops import nn


def test_groupnorm_silu_kernel_interpret(rng):
    from audioldm2_tpu.ops import groupnorm_pallas as gp
    import functools
    from jax.experimental import pallas as pl

    x = jnp.asarray(rng.standard_normal((2, 8, 4, 256)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(256), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(256), jnp.float32)

    b, c = x.shape[0], x.shape[-1]
    xf = x.reshape(b, -1, c)
    s = xf.shape[1]
    out = pl.pallas_call(
        functools.partial(gp._gn_silu_kernel, groups=32, eps=1e-5, silu=True),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        interpret=True,
    )(xf, scale, bias).reshape(x.shape)

    want = nn.silu(nn.group_norm({"scale": scale, "bias": bias}, x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_fused_attention_kernel_interpret(rng):
    """v5 kernel through the real wrapper (lane-blocked grid) vs the jnp
    reference, at a shape with multiple q-blocks and lane-blocks."""
    from audioldm2_tpu.ops import attention_pallas as ap

    b, t, h, d = 2, 256, 8, 32  # c=256 -> 2 lane blocks of 4 heads
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    scale = d ** -0.5

    assert ap.supported(q, k, None, None)
    out = ap.fused_self_attention(q, k, v, scale, interpret=True)
    want = nn.attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5, rtol=1e-4)


def test_attention_block_q_vmem_budget_all_supported_t():
    """_block_q must return a divisor of t for every supported token count
    (or the grid silently drops tail q-rows — t=1536 = 15 s duration bucket
    at ds2 regression), AND its worst-case live softmax set must respect
    the VMEM budget assuming every unrolled head keeps logits+probs f32
    tiles live (the v4 kernel's BENCH_r03 compile-OOM failure mode)."""
    from audioldm2_tpu.ops import attention_pallas as ap

    for d in (32, 64, 128):
        n_h = ap._LANE_BLOCK // d
        for t in range(128, 4096 + 1, 128):
            bq = ap._block_q(t, d)
            assert bq > 0, (t, d)
            assert t % bq == 0, (t, d, bq)
            assert bq % 8 == 0, (t, d, bq)
            assert n_h * bq * t * 8 <= ap._VMEM_SOFTMAX_BUDGET, (t, d, bq)


def test_fused_attention_kernel_nonpow2_t_interpret(rng):
    """End-to-end kernel wrapper at t=1536 (non-power-of-two token count
    where the budget forces multiple q-blocks) in interpret mode."""
    from audioldm2_tpu.ops import attention_pallas as ap

    b, t, h, d = 1, 1536, 4, 32
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    scale = d ** -0.5

    assert ap._block_q(t, d) < t
    assert ap.supported(q, k, None, None)
    out = ap.fused_self_attention(q, k, v, scale, interpret=True)
    want = nn.attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5, rtol=1e-4)


def test_fused_resblock_kernel_interpret(rng):
    """GN+SiLU+3x3conv fused kernel (interpret mode) == jnp composition."""
    import functools
    from jax.experimental import pallas as pl
    from audioldm2_tpu.ops import resblock_pallas as rp

    B, T, F, Cin, Cout = 2, 8, 4, 128, 128
    x = jnp.asarray(rng.standard_normal((B, T, F, Cin)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(Cin), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(Cin), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Cout), jnp.float32)

    s = T * F
    out = pl.pallas_call(
        functools.partial(rp._kernel, groups=32, eps=1e-5, T=T, F=F),
        out_shape=jax.ShapeDtypeStruct((B, s, Cout), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, s, Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((Cin,), lambda i: (0,)),
            pl.BlockSpec((Cin,), lambda i: (0,)),
            pl.BlockSpec((3, 3, Cin, Cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((Cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, s, Cout), lambda i: (i, 0, 0)),
        interpret=True,
    )(x.reshape(B, s, Cin), scale, bias, w, b).reshape(B, T, F, Cout)

    want = nn.conv2d(
        {"w": w, "b": b},
        nn.silu(nn.group_norm({"scale": scale, "bias": bias}, x)),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_gn_silu_conv_gradients_flow():
    """custom VJP: gradients through the fused dispatch match the jnp path."""
    from audioldm2_tpu.ops import nn as nn_mod

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 4, 128)), jnp.float32)
    p_norm = {"scale": jnp.ones((128,)), "bias": jnp.zeros((128,))}
    p_conv = {
        "w": jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32),
        "b": jnp.zeros((128,)),
    }

    def loss(w):
        return jnp.sum(nn_mod.gn_silu_conv(p_norm, {"w": w, "b": p_conv["b"]}, x) ** 2)

    g = jax.grad(loss)(p_conv["w"])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_ln_matmul_kernel_interpret(rng):
    """Fused LayerNorm+matmul kernel (interpret mode) == jnp composition."""
    import functools
    from jax.experimental import pallas as pl
    from audioldm2_tpu.ops import lnmm_pallas as lp

    m, c, n = 64, 256, 384
    x = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(c), jnp.float32)
    b = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, n)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(n), jnp.float32)

    bm = 32  # two m-blocks exercises the grid
    out = pl.pallas_call(
        functools.partial(lp._ln_matmul_kernel, eps=1e-5),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
            pl.BlockSpec((n,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        interpret=True,
    )(x, s, b, w, jnp.ones((n,), jnp.float32), bias)

    want = nn.linear(
        {"w": w, "b": bias}, nn.layer_norm({"scale": s, "bias": b}, x)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_geglu_matmul_kernel_interpret(rng):
    """Fused GEGLU-gate+matmul+residual kernel == jnp composition."""
    from jax.experimental import pallas as pl
    from audioldm2_tpu.ops import lnmm_pallas as lp

    m, f, n = 64, 256, 128
    h = jnp.asarray(rng.standard_normal((m, 2 * f)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((f, n)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(n), jnp.float32)
    res = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)

    bm = 32
    out = pl.pallas_call(
        lp._geglu_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), res.dtype),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, 2 * f), lambda i: (i, 0)),
            pl.BlockSpec((f, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
            pl.BlockSpec((n,), lambda i: (0,)),
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        interpret=True,
    )(h, w, jnp.ones((n,), jnp.float32), bias, res)

    a, gate = jnp.split(h, 2, axis=-1)
    want = res + nn.linear({"w": w, "b": bias}, a * nn.gelu(gate))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_ln_linear_geglu_wrappers_fallback(rng):
    """With the flag off (default), ln_linear/geglu_ff_out equal the plain
    composition bit-for-bit, and the restructured ST block preserves UNet
    numerics (covered further by test_unet_parity)."""
    x = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)
    p_norm = {
        "scale": jnp.asarray(rng.standard_normal(256), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(256), jnp.float32),
    }
    p_lin = {
        "w": jnp.asarray(rng.standard_normal((256, 512)) * 0.05, jnp.float32),
        "b": jnp.asarray(rng.standard_normal(512), jnp.float32),
    }
    got = nn.ln_linear(p_norm, p_lin, x)
    want = nn.linear(p_lin, nn.layer_norm(p_norm, x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    h = jnp.asarray(rng.standard_normal((2, 16, 512)), jnp.float32)
    p_out = {
        "w": jnp.asarray(rng.standard_normal((256, 256)) * 0.05, jnp.float32),
        "b": jnp.asarray(rng.standard_normal(256), jnp.float32),
    }
    res = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)
    got = nn.geglu_ff_out(p_out, h, res)
    a, gate = jnp.split(h, 2, axis=-1)
    want = res + nn.linear(p_out, a * nn.gelu(gate))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_quantize_roundtrip(rng):
    """Per-output-channel int8 round trip: worst-case relative error per
    column bounded by scale/2 (i.e. <= ~0.4% of the column absmax)."""
    from audioldm2_tpu.ops import quant

    w = jnp.asarray(rng.standard_normal((256, 384)) * 0.07, jnp.float32)
    q, s = quant.quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (384,)
    back = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(back - np.asarray(w)).max(axis=0)
    assert (err <= np.asarray(s) * 0.5 + 1e-8).all()


def test_int8_matmul_kernel_interpret(rng):
    """int8 matmul kernel (interpret mode): output-scale dequant equals the
    explicit dequantized matmul exactly (int8 values are exact in bf16/f32;
    scale applied per output column)."""
    from jax.experimental import pallas as pl
    from audioldm2_tpu.ops import lnmm_pallas as lp, quant

    m, k, n = 64, 256, 128
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(n), jnp.float32)
    wq, ws = quant.quantize_weight(w)

    bm = 32
    out = pl.pallas_call(
        lp._matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
            pl.BlockSpec((n,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        interpret=True,
    )(x, wq, ws, bias)

    want = x @ (wq.astype(jnp.float32) * ws) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_quantized_linear_fallback_and_unet_quant_transform(rng):
    """nn.linear on a quantized dict (CPU fallback) == dequantized matmul;
    quantize_st_linears converts exactly the ST matmuls and the quantized
    UNet forward stays close to the f32 one."""
    from audioldm2_tpu.models import unet as junet
    from audioldm2_tpu.models.unet import UNetConfig
    from audioldm2_tpu.ops import quant

    p = {
        "w": jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32),
        "b": jnp.asarray(rng.standard_normal(128), jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)
    qp = quant.quantize_linear_dict(p)
    got = nn.linear(qp, x)
    want = nn.linear({"w": quant.dequantize(qp), "b": p["b"]}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    cfg = UNetConfig(
        model_channels=128, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2,), context_dims=(None,),
        num_head_channels=32, in_channels=8, out_channels=8,
    )
    params = junet.init_unet(jax.random.PRNGKey(0), cfg)
    params = junet.fuse_self_qkv(params)
    qparams = junet.quantize_st_linears(params)

    n_q = []

    def count(node, path=()):
        if isinstance(node, dict):
            if "wq" in node:
                n_q.append(path)
                assert path[-1] in junet._QUANT_KEYS, path
            for k, v in node.items():
                count(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                count(v, path + (i,))

    count(qparams)
    assert len(n_q) > 0

    x = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    ts = np.array([3.0], np.float32)
    out_f = np.asarray(junet.apply_unet(params, cfg, x, ts))
    out_q = np.asarray(junet.apply_unet(qparams, cfg, x, ts))
    assert out_q.shape == out_f.shape
    assert np.isfinite(out_q).all()
    # int8 noise is small relative to activations
    denom = np.abs(out_f).mean() + 1e-6
    assert np.abs(out_q - out_f).mean() / denom < 0.05, (
        np.abs(out_q - out_f).mean(), denom
    )


def test_quantized_resblock_kernel_interpret(rng):
    """int8-weight GN+SiLU+conv kernel (interpret mode) == jnp composition
    with the exactly dequantized weight."""
    import functools
    from jax.experimental import pallas as pl
    from audioldm2_tpu.ops import quant
    from audioldm2_tpu.ops import resblock_pallas as rp

    B, T, F, Cin, Cout = 2, 8, 4, 128, 128
    x = jnp.asarray(rng.standard_normal((B, T, F, Cin)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(Cin), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(Cin), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Cout), jnp.float32)
    pq = quant.quantize_conv3x3_dict({"w": w, "b": b})

    s = T * F
    out = pl.pallas_call(
        functools.partial(rp._kernel_q, groups=32, eps=1e-5, T=T, F=F),
        out_shape=jax.ShapeDtypeStruct((B, s, Cout), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, s, Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((Cin,), lambda i: (0,)),
            pl.BlockSpec((Cin,), lambda i: (0,)),
            pl.BlockSpec((3, 3, Cin, Cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((Cout,), lambda i: (0,)),
            pl.BlockSpec((Cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, s, Cout), lambda i: (i, 0, 0)),
        interpret=True,
    )(x.reshape(B, s, Cin), scale, bias, pq["wq"], pq["ws"], b).reshape(
        B, T, F, Cout
    )

    want = nn.conv2d(
        {"w": quant.dequantize_conv(pq), "b": b},
        nn.silu(nn.group_norm({"scale": scale, "bias": bias}, x)),
    )
    # the kernel matmuls int8->bf16 taps; tolerance covers bf16 rounding
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-2, rtol=2e-2)
    # and the quantization itself is a faithful int8 (<= 1/254 rel of absmax)
    err = np.abs(np.asarray(quant.dequantize_conv(pq)) - np.asarray(w)).max()
    assert err <= np.abs(np.asarray(w)).max() / 254 + 1e-7


def test_quantize_resblock_convs_transform(rng):
    """Only 128-multiple in/out convs quantize; the tree structure and the
    dequantized-fallback numerics stay faithful."""
    import jax as _jax
    from audioldm2_tpu.models import unet as unet_m
    from audioldm2_tpu.ops import quant

    p = {
        "in_conv": {"w": jnp.asarray(rng.standard_normal((3, 3, 128, 256)), jnp.float32),
                    "b": jnp.zeros((256,))},
        "out_conv": {"w": jnp.asarray(rng.standard_normal((3, 3, 8, 128)), jnp.float32),
                     "b": jnp.zeros((128,))},
        "emb": {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))},
    }
    q = unet_m.quantize_resblock_convs(p)
    assert "wq" in q["in_conv"] and q["in_conv"]["wq"].dtype == jnp.int8
    assert "w" in q["out_conv"]  # Cin=8 not a 128 multiple -> untouched
    assert "w" in q["emb"]
    rel = np.abs(
        np.asarray(quant.dequantize_conv(q["in_conv"])) - np.asarray(p["in_conv"]["w"])
    ).max() / np.abs(np.asarray(p["in_conv"]["w"])).max()
    assert rel < 1 / 200


def test_tiled_resblock_kernel_interpret(rng):
    """T-tiled GN+SiLU+conv (halo tiles, folded GN affine) == jnp
    composition, including the global t-edge zero-padding semantics."""
    from audioldm2_tpu.ops import resblock_pallas as rp

    B, T, F, Cin, Cout = 2, 8, 4, 128, 128
    x = jnp.asarray(rng.standard_normal((B, T, F, Cin)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(Cin), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(Cin), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Cout), jnp.float32)

    out = rp.gn_silu_conv3x3_tiled(
        x, scale, bias, w, b, groups=32, interpret=True
    )
    want = nn.conv2d(
        {"w": w, "b": b},
        nn.silu(nn.group_norm({"scale": scale, "bias": bias}, x)),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_tiled_resblock_multitile_interpret(rng, monkeypatch):
    """Force a 4-tile split (bt=2) so halo exchange and the global t-edge
    zeroing are actually exercised, and compare to the jnp composition."""
    from audioldm2_tpu.ops import resblock_pallas as rp

    monkeypatch.setattr(rp, "_tile_bt", lambda *a, **k: 2)

    B, T, F, Cin, Cout = 1, 8, 4, 128, 256
    x = jnp.asarray(rng.standard_normal((B, T, F, Cin)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(Cin), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(Cin), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Cout), jnp.float32)

    tiled = rp.gn_silu_conv3x3_tiled(x, scale, bias, w, b, groups=32, interpret=True)
    want = nn.conv2d(
        {"w": w, "b": b},
        nn.silu(nn.group_norm({"scale": scale, "bias": bias}, x)),
    )
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_cat_resblock_kernel_interpret(rng):
    """Concat-input GN+SiLU+conv kernel == jnp composition on the explicit
    concat (groups straddle the split: cin=256, 32 groups of 8... 256/32)."""
    from audioldm2_tpu.ops import resblock_pallas as rp

    B, T, F, C1, C2, Cout = 1, 8, 4, 128, 128, 128
    x1 = jnp.asarray(rng.standard_normal((B, T, F, C1)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((B, T, F, C2)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(C1 + C2), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C1 + C2), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C1 + C2, Cout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Cout), jnp.float32)

    out = rp.gn_silu_conv3x3_cat(x1, x2, scale, bias, w, b, groups=32,
                                 interpret=True)
    xcat = jnp.concatenate([x1, x2], axis=-1)
    want = nn.conv2d(
        {"w": w, "b": b},
        nn.silu(nn.group_norm({"scale": scale, "bias": bias}, xcat)),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_conv1x1_cat_matches_concat():
    rng = np.random.default_rng(3)
    x1 = jnp.asarray(rng.standard_normal((2, 4, 4, 128)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, 4, 4, 256)), jnp.float32)
    p = {"w": jnp.asarray(rng.standard_normal((1, 1, 384, 128)) * 0.05, jnp.float32),
         "b": jnp.asarray(rng.standard_normal(128), jnp.float32)}
    got = nn.conv1x1_cat(p, x1, x2)
    want = nn.conv2d(p, jnp.concatenate([x1, x2], axis=-1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_cat_tiled_resblock_kernel_interpret(rng, monkeypatch):
    """Cat+tiled kernel (forced 4-tile split) == jnp composition on the
    explicit concat, incl. halo exchange and global t-edge zeroing."""
    from audioldm2_tpu.ops import resblock_pallas as rp

    monkeypatch.setattr(rp, "_tile_bt", lambda *a, **k: 2)

    B, T, F, C1, C2, Cout = 1, 8, 4, 128, 256, 128
    x1 = jnp.asarray(rng.standard_normal((B, T, F, C1)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((B, T, F, C2)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(C1 + C2), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C1 + C2), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C1 + C2, Cout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Cout), jnp.float32)

    out = rp.gn_silu_conv3x3_cat_tiled(x1, x2, scale, bias, w, b, groups=32,
                                       interpret=True)
    xcat = jnp.concatenate([x1, x2], axis=-1)
    want = nn.conv2d(
        {"w": w, "b": b},
        nn.silu(nn.group_norm({"scale": scale, "bias": bias}, xcat)),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5, rtol=1e-4)
