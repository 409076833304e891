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
