"""Fused LayerNorm+matmul and GEGLU+matmul Pallas kernels for the UNet's
spatial-transformer blocks.

Each BasicTransformerBlock (reference ``modules/attention.py:370-410``) runs
three LayerNorms whose outputs feed matmuls (qkv / q / GEGLU proj-in) plus a
GEGLU gate whose product feeds the FF output matmul. XLA cannot fuse a
row-reduction (LN) or the gate product into a dot's operand, so each of
those intermediates takes a full HBM round trip — at [B*T, C] up to
[2048, 640] (and [2048, 5120] for the GEGLU hidden) that is the bulk of the
~600 small fusions per denoising step.

These kernels keep the intermediate in VMEM:

- ``ln_matmul``: per m-block of rows, LayerNorm in f32 (per-row stats — no
  cross-block reduction needed), cast to the weight dtype, one MXU dot
  against the FULL [C, N] weight block (+bias). Weights are read once per
  m-block; x once; the LN output never exists in HBM.
- ``geglu_matmul``: per m-block, split the [bm, 2F] GEGLU hidden into
  value/gate lanes, ``a * gelu(g)`` (exact erf gelu, matching
  ``jax.nn.gelu(approximate=False)``), one MXU dot against the full [F, N]
  output weight, bias and residual added in f32.

Both fall back to the identical jnp composition off-TPU / at unsupported
shapes (see callers in ``ops/nn.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


_VMEM_BUDGET = 10 * 1024 * 1024


def _block_m(m: int, per_row_bytes: int) -> int:
    """Largest multiple-of-8 divisor of m whose per-block VMEM footprint
    stays inside the budget (leaving headroom for weights, handled by the
    callers' supported() gates)."""
    cap = max(8, min(512, (4 * 1024 * 1024) // max(per_row_bytes, 1)))
    bm = (cap // 8) * 8
    while m % bm:
        bm -= 8
    return max(bm, 8)


def _erf_f32(x):
    """Pallas-TPU-lowerable erf (the `erf`/`erfc` primitives have no Mosaic
    lowering): Abramowitz & Stegun 7.1.26 rational approximation. Max abs
    erf error ~3e-6 measured in f32 (1.5e-7 is the exact-arithmetic bound);
    the fused gelu's bf16 output differs from jax.nn.gelu(approximate=False)
    by at most 1 bf16 ulp on a small fraction of inputs — immaterial for
    this bf16 pipeline."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(g):
    """0.5*g*(1+erf(g/sqrt(2))) via _erf_f32; g must be f32."""
    return 0.5 * g * (1.0 + _erf_f32(g * np.float32(1.0 / np.sqrt(2.0))))


def _cast_for_mxu(w, like_dtype):
    """int8 weight tiles are cast to bf16 IN VMEM (values <= 127 are exact
    in bf16); the per-output-column quantization scale is applied to the
    matmul OUTPUT instead of the weight — mathematically identical and
    O(bm*N) instead of O(K*N) VPU work, and the dequantized weight never
    exists in HBM."""
    if w.dtype == jnp.int8:
        return w.astype(jnp.bfloat16)
    return w.astype(like_dtype)


def _ln_matmul_kernel(x_ref, s_ref, b_ref, w_ref, ws_ref, bias_ref, o_ref,
                      *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # [bm, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = (y * s_ref[...] + b_ref[...]).astype(
        jnp.bfloat16 if w_ref.dtype == jnp.int8 else w_ref.dtype
    )
    out = jax.lax.dot_general(
        y, _cast_for_mxu(w_ref[...], y.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (out * ws_ref[...] + bias_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def ln_matmul(x, ln_scale, ln_bias, w, bias=None, w_scale=None,
              eps: float = 1e-5):
    """x: [B, T, C]; w: [C, N] (f32/bf16 or int8 with per-column w_scale);
    returns [B, T, N] in x.dtype."""
    b, t, c = x.shape
    n = w.shape[-1]
    m = b * t
    xf = x.reshape(m, c)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    if w_scale is None:
        w_scale = jnp.ones((n,), jnp.float32)
    bm = _block_m(m, (c * 2) + n * 4 + n * 2)
    out = pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps),
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
    )(xf, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32), w,
      w_scale.astype(jnp.float32), bias.astype(jnp.float32))
    return out.reshape(b, t, n)


def _matmul_kernel(x_ref, w_ref, ws_ref, bias_ref, o_ref):
    x = x_ref[...]
    out = jax.lax.dot_general(
        x, _cast_for_mxu(w_ref[...], x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (out * ws_ref[...] + bias_ref[...]).astype(o_ref.dtype)


@jax.jit
def int8_matmul(x, wq, w_scale, bias=None):
    """x: [..., K]; wq: int8 [K, N] with per-column w_scale [N]; returns
    [..., N] in x.dtype. The int8 tile streams from HBM at half the bf16
    bytes and is dequantized only in VMEM."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = wq.shape[-1]
    m = int(np.prod(lead)) if lead else 1
    xf = x.reshape(m, k)
    pad = (-m) % 8
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    mp = m + pad
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    bm = _block_m(mp, k * x.dtype.itemsize + n * 6)
    out = pl.pallas_call(
        _matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
            pl.BlockSpec((n,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
    )(xf, wq, w_scale.astype(jnp.float32), bias.astype(jnp.float32))
    if pad:
        out = out[:m]
    return out.reshape(*lead, n)


def int8_matmul_supported(x, wq) -> bool:
    k, n = wq.shape
    if x.shape[-1] != k or k % 128 or n % 128:
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    mp = m + ((-m) % 8)
    bm = _block_m(mp, k * x.dtype.itemsize + n * 6)
    budget = bm * k * x.dtype.itemsize + k * n + bm * n * 6 + n * 8
    return budget <= _VMEM_BUDGET


def ln_matmul_supported(x, w) -> bool:
    if x.ndim != 3:
        return False
    b, t, c = x.shape
    cw, n = w.shape
    m = b * t
    if c % 128 or n % 128 or m % 8:
        return False
    bm = _block_m(m, (c * 2) + n * 4 + n * 2)
    budget = bm * c * 6 + c * n * w.dtype.itemsize + bm * n * 6 + 3 * c * 4
    return budget <= _VMEM_BUDGET


def _geglu_matmul_kernel(h_ref, w_ref, ws_ref, bias_ref, r_ref, o_ref):
    h = h_ref[...]  # [bm, 2F]
    f = h.shape[-1] // 2
    a = h[:, :f].astype(jnp.float32)
    g = h[:, f:].astype(jnp.float32)
    u = (a * _gelu_exact(g)).astype(
        jnp.bfloat16 if w_ref.dtype == jnp.int8 else w_ref.dtype
    )
    out = jax.lax.dot_general(
        u, _cast_for_mxu(w_ref[...], u.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (
        out * ws_ref[...] + bias_ref[...] + r_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


@jax.jit
def geglu_matmul(h, w, bias, residual, w_scale=None):
    """h: [B, T, 2F] (value|gate lanes); w: [F, N] (f32/bf16 or int8 with
    per-column w_scale); residual: [B, T, N]; returns
    residual + (a * gelu(g)) @ w + bias, in residual.dtype."""
    b, t, f2 = h.shape
    f = f2 // 2
    n = w.shape[-1]
    m = b * t
    hf = h.reshape(m, f2)
    rf = residual.reshape(m, n)
    if w_scale is None:
        w_scale = jnp.ones((n,), jnp.float32)
    bm = _block_m(m, f2 * 2 + n * 4 + n * 2 * 2)
    out = pl.pallas_call(
        _geglu_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), residual.dtype),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, f2), lambda i: (i, 0)),
            pl.BlockSpec((f, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
            pl.BlockSpec((n,), lambda i: (0,)),
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
    )(hf, w, w_scale.astype(jnp.float32), bias.astype(jnp.float32), rf)
    return out.reshape(b, t, n)


def geglu_matmul_supported(h, w) -> bool:
    if h.ndim != 3:
        return False
    b, t, f2 = h.shape
    f, n = w.shape
    m = b * t
    if f2 != 2 * f or f % 128 or n % 128 or m % 8:
        return False
    bm = _block_m(m, f2 * 2 + n * 4 + n * 2 * 2)
    budget = (
        bm * f2 * h.dtype.itemsize
        + bm * f * 6  # a, g (f32 views are register-level; value product bf16)
        + f * n * w.dtype.itemsize
        + bm * n * 10
        + n * 4
    )
    return budget <= _VMEM_BUDGET
