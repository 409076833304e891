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

    b, t, h, d = 1, 128, 2, 32
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    scale = d ** -0.5

    def to_bh(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)

    out = pl.pallas_call(
        functools.partial(ap._attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        grid=(b * h, 1),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i, j: (i, j, 0)),
        interpret=True,
    )(to_bh(q), to_bh(k), to_bh(v))
    out = jnp.transpose(out.reshape(b, h, t, d), (0, 2, 1, 3))

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
