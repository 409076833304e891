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
    import functools
    from jax.experimental import pallas as pl
    from audioldm2_tpu.ops import attention_pallas as ap

    b, t, h, d = 2, 256, 4, 32
    c = h * d
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    scale = d ** -0.5

    bq = 128  # two q-blocks per batch row exercises the grid
    kv_spec = pl.BlockSpec((1, t, c), lambda i, _: (i, 0, 0))
    q_spec = pl.BlockSpec((1, bq, c), lambda i, qi: (i, qi, 0))
    out = pl.pallas_call(
        functools.partial(ap._attn_kernel, scale=scale, head_dim=d),
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
        grid=(b, t // bq),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        interpret=True,
    )(q.reshape(b, t, c), k.reshape(b, t, c), v.reshape(b, t, c))

    want = nn.attention(q, k, v).reshape(b, t, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5, rtol=1e-4)


def test_attention_block_q_divides_all_supported_t():
    """_block_q must return a multiple-of-128 divisor of t for every
    supported token count, or the grid silently drops tail q-rows
    (t=1536 = 15 s duration bucket at ds2 regression)."""
    from audioldm2_tpu.ops import attention_pallas as ap

    for t in range(128, 4096 + 1, 128):
        bq = ap._block_q(t)
        assert t % bq == 0, (t, bq)
        assert bq % 128 == 0, (t, bq)
        assert bq * t <= (1 << 20) or bq == 128, (t, bq)


def test_fused_attention_kernel_nonpow2_t_interpret(rng):
    """End-to-end kernel wrapper at t=1536 (non-power-of-two token count
    where the 4 MB cap forces multiple q-blocks) in interpret mode."""
    import functools
    from jax.experimental import pallas as pl
    from audioldm2_tpu.ops import attention_pallas as ap

    b, t, h, d = 1, 1536, 4, 32
    c = h * d
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    scale = d ** -0.5

    bq = ap._block_q(t)
    assert t % bq == 0 and bq < t
    kv_spec = pl.BlockSpec((1, t, c), lambda i, _: (i, 0, 0))
    q_spec = pl.BlockSpec((1, bq, c), lambda i, qi: (i, qi, 0))
    out = pl.pallas_call(
        functools.partial(ap._attn_kernel, scale=scale, head_dim=d),
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
        grid=(b, t // bq),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        interpret=True,
    )(q.reshape(b, t, c), k.reshape(b, t, c), v.reshape(b, t, c))

    want = nn.attention(q, k, v).reshape(b, t, c)
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
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        interpret=True,
    )(x, s, b, w, bias)

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
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        interpret=True,
    )(h, w, bias, res)

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
