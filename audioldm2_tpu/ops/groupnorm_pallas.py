"""Fused GroupNorm(+SiLU) Pallas kernel.

The UNet/VAE run ~50 GroupNorm->SiLU pairs per denoising step; under XLA
each becomes a reduce fusion + a normalize fusion + dtype converts (the
model computes norms in f32 over bf16 activations). This kernel does the
whole thing in one VMEM round trip per batch row: stats, normalize, affine,
SiLU — f32 math, input-dtype output.

Applicability: the per-row activation must fit VMEM (the largest UNet/VAE
activations here are ~2 MB) and C must be divisible by the group count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float,
                    silu: bool):
    """One batch row [S, C]. Mosaic cannot reshape the minor (lane) dim, so
    group statistics come from static channel slices + VPU reductions
    (exact f32, matching torch within rounding)."""
    x = x_ref[0].astype(jnp.float32)  # [S, C]
    s, c = x.shape
    cg = c // groups

    mean_parts = []
    rstd_parts = []
    for g in range(groups):
        xs = x[:, g * cg : (g + 1) * cg]
        mean = jnp.sum(xs) / (s * cg)
        var = jnp.sum(jnp.square(xs - mean)) / (s * cg)
        mean_parts.append(jnp.full((1, cg), mean, jnp.float32))
        rstd_parts.append(jnp.full((1, cg), jax.lax.rsqrt(var + eps), jnp.float32))
    mean_c = jnp.concatenate(mean_parts, axis=1)  # [1, C]
    rstd_c = jnp.concatenate(rstd_parts, axis=1)

    y = (x - mean_c) * rstd_c * scale_ref[...] + bias_ref[...]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu"))
def group_norm_silu(x, scale, bias, groups: int = 32, eps: float = 1e-5,
                    silu: bool = True):
    """x: [B, ..., C] channels-last; returns same shape/dtype."""
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    xf = x.reshape(b, -1, c)
    s = xf.shape[1]

    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=groups, eps=eps, silu=silu),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
    )(xf, scale.astype(jnp.float32), bias.astype(jnp.float32))
    return out.reshape(orig_shape)


def supported(x, groups: int) -> bool:
    c = x.shape[-1]
    if c % groups or c % 128:
        return False
    # per-row f32 working set must fit comfortably in VMEM (~16 MB)
    row_bytes = int(np.prod(x.shape[1:])) * 4
    return row_bytes <= 6 * 1024 * 1024
