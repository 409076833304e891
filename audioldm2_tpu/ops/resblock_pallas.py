"""Fused GroupNorm + SiLU + 3x3 conv Pallas kernel (the UNet/VAE ResBlock
body).

Each program handles one batch row: the full [T, F, C] activation fits VMEM
at this model's geometries (<= 2 MB). The kernel computes GroupNorm stats
with two VPU passes (column sum / sum-of-squares, then per-group slices of
the [1, C] rows — NOT per-group passes over the full tensor), normalizes,
applies SiLU, and performs the SAME-padded 3x3 convolution as nine shifted
[S, Cin] x [Cin, Cout] MXU matmuls with zero-masked F-boundary rows.

This replaces ~5 XLA fusions + dtype converts + an HBM round trip per
ResBlock half with a single kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _gn_silu(xin, gn_scale, gn_bias, groups: int, eps: float, out_dtype):
    """GroupNorm stats via two f32-accumulated column passes, then
    normalize + SiLU. xin: [S, Cin] -> [S, Cin] in out_dtype."""
    s, cin = xin.shape
    cg = cin // groups
    x32 = xin.astype(jnp.float32)
    colsum = jnp.sum(x32, axis=0, keepdims=True)  # [1, Cin]
    colsq = jnp.sum(x32 * x32, axis=0, keepdims=True)
    n = float(s * cg)
    mean_parts, rstd_parts = [], []
    for g in range(groups):
        gsum = jnp.sum(colsum[:, g * cg : (g + 1) * cg])
        gsq = jnp.sum(colsq[:, g * cg : (g + 1) * cg])
        mean = gsum / n
        var = gsq / n - mean * mean
        mean_parts.append(jnp.full((1, cg), mean, jnp.float32))
        rstd_parts.append(jnp.full((1, cg), jax.lax.rsqrt(var + eps), jnp.float32))
    mean_c = jnp.concatenate(mean_parts, axis=1)
    rstd_c = jnp.concatenate(rstd_parts, axis=1)

    y = (x32 - mean_c) * rstd_c * gn_scale + gn_bias
    return (y * jax.nn.sigmoid(y)).astype(out_dtype)


def _kernel(x_ref, gn_scale_ref, gn_bias_ref, w_ref, b_ref, o_ref, *,
            groups: int, eps: float, T: int, F: int):
    xin = x_ref[0]  # [S, Cin], S = T*F (input dtype, usually bf16)
    s, cin = xin.shape
    cout = o_ref.shape[-1]

    y = _gn_silu(xin, gn_scale_ref[...], gn_bias_ref[...], groups, eps,
                 w_ref.dtype)

    _conv9_scoped(y, lambda dt, df: w_ref[dt + 1, df + 1], None,
                  b_ref[...], o_ref, s, cin, cout, F)


def _kernel_q(x_ref, gn_scale_ref, gn_bias_ref, wq_ref, ws_ref, b_ref, o_ref,
              *, groups: int, eps: float, T: int, F: int):
    """int8-weight variant: taps stream from HBM as int8 (half the bytes of
    the bf16 weight — the dominant per-step HBM traffic at small CFG batch),
    dequantize to bf16 in VMEM, and the per-output-channel scale applies
    ONCE to the f32 accumulator (valid because the scale is per output
    channel, shared by all 9 taps)."""
    xin = x_ref[0]
    s, cin = xin.shape
    cout = o_ref.shape[-1]

    y = _gn_silu(xin, gn_scale_ref[...], gn_bias_ref[...], groups, eps,
                 jnp.bfloat16)
    _conv9_scoped(y, lambda dt, df: wq_ref[dt + 1, df + 1].astype(jnp.bfloat16),
                  ws_ref[...], b_ref[...], o_ref, s, cin, cout, F)


def _conv9(y, tap_fn, cout: int, F: int):
    """3x3 SAME conv over flattened rows as 9 shifted matmuls; returns the
    f32 accumulator [s, cout].

    Row index = t * F + f; a (dt, df) tap reads row (t+dt)*F + (f+df).
    Shifts are VALUE-level concatenates, NOT scratch-ref partial stores:
    Mosaic mis-lowers sublane-misaligned `scr[:s-k,:] = val[k:]` stores
    when the array is exactly one lane-tile wide (cin=128) — silently
    wrong results (err ~5 at output std ~1; round-4 on-chip sweep, every
    T/F at cin=128 bad, cin>=256 fine, interpret mode fine). The value
    form lowers correctly at every shipped shape and lets Mosaic keep its
    own liveness (the VMEM budgets in `supported`/`_tile_bt` already
    assume two [s, cin] live copies + the f32 accumulator)."""
    s, cin = y.shape
    row_f = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0) % F

    acc = jnp.zeros((s, cout), jnp.float32)
    for dt in (-1, 0, 1):
        for df in (-1, 0, 1):
            # output row r reads input row r + shift
            shift = dt * F + df
            if shift > 0:
                ys = jnp.concatenate(
                    [y[shift:], jnp.zeros((shift, cin), y.dtype)], axis=0)
            elif shift < 0:
                ys = jnp.concatenate(
                    [jnp.zeros((-shift, cin), y.dtype), y[: s + shift]],
                    axis=0)
            else:
                ys = y
            # f + df out of [0, F): zero the tap for boundary output rows
            if df == 1:
                ys = jnp.where(row_f == F - 1, 0.0, ys).astype(y.dtype)
            elif df == -1:
                ys = jnp.where(row_f == 0, 0.0, ys).astype(y.dtype)
            acc = acc + jax.lax.dot_general(
                ys, tap_fn(dt, df),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _conv9_scoped(y, tap_fn, out_scale, bias, o_ref, s, cin, cout, F):
    acc = _conv9(y, tap_fn, cout, F)
    if out_scale is not None:
        acc = acc * out_scale
    o_ref[0] = (acc + bias).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps"))
def gn_silu_conv3x3(x, gn_scale, gn_bias, w, b, groups: int = 32,
                    eps: float = 1e-5):
    """x: [B, T, F, Cin]; w: [3, 3, Cin, Cout] (HWIO); returns
    [B, T, F, Cout] in x.dtype."""
    bsz, T, F, cin = x.shape
    cout = w.shape[-1]
    s = T * F
    xf = x.reshape(bsz, s, cin)

    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, T=T, F=F),
        out_shape=jax.ShapeDtypeStruct((bsz, s, cout), x.dtype),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, s, cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((cin,), lambda i: (0,)),
            pl.BlockSpec((cin,), lambda i: (0,)),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, s, cout), lambda i: (i, 0, 0)),
    )(xf, gn_scale.astype(jnp.float32), gn_bias.astype(jnp.float32), w,
      b.astype(jnp.float32))
    return out.reshape(bsz, T, F, cout)


@functools.partial(jax.jit, static_argnames=("groups", "eps"))
def gn_silu_conv3x3_q(x, gn_scale, gn_bias, wq, ws, b, groups: int = 32,
                      eps: float = 1e-5):
    """Quantized-weight variant: wq int8 [3, 3, Cin, Cout] + per-output-
    channel scale ws [Cout] f32 (see ops/quant.quantize_conv3x3_dict).
    Returns [B, T, F, Cout] in x.dtype."""
    bsz, T, F, cin = x.shape
    cout = wq.shape[-1]
    s = T * F
    xf = x.reshape(bsz, s, cin)

    out = pl.pallas_call(
        functools.partial(_kernel_q, groups=groups, eps=eps, T=T, F=F),
        out_shape=jax.ShapeDtypeStruct((bsz, s, cout), x.dtype),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, s, cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((cin,), lambda i: (0,)),
            pl.BlockSpec((cin,), lambda i: (0,)),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, s, cout), lambda i: (i, 0, 0)),
    )(xf, gn_scale.astype(jnp.float32), gn_bias.astype(jnp.float32), wq,
      ws.astype(jnp.float32), b.astype(jnp.float32))
    return out.reshape(bsz, T, F, cout)


def supported(x, w, groups: int) -> bool:
    bsz, T, F, cin = x.shape
    cout = w.shape[-1]
    if cin % groups or cin % 128 or cout % 128:
        return False
    s = T * F
    # VMEM budget: x (f32) + y + acc + weights. XLA's scoped-vmem limit for
    # custom calls is 16 MB (NOT the chip's full 128 MB VMEM): the S=4096 /
    # cin=256 ds=1 output-ladder shape needs 24.5 MB actual and fails to
    # compile — this 10 MB estimate gate keeps every shipped shape under
    # the real limit (measured).
    budget = (s * cin * 4) * 2 + s * cout * 4 + int(np.prod(w.shape)) * w.dtype.itemsize
    return budget <= 10 * 1024 * 1024


# ---------------------------------------------------------------------------
# Concat-input variant: the UNet decoder feeds every ResBlock
# jnp.concatenate([h, skip], -1) (reference openaimodel.py:818). With the
# fused kernel consuming that concat as ONE operand, XLA must materialize
# the widest activations of the step in HBM just to re-read them. This
# variant takes the two parts as separate refs: GroupNorm stats come from
# both parts' column sums (groups may straddle the split), each part is
# normalized with its slice of the folded stats, and every conv tap issues
# two matmuls against the matching row-slices of the weight.
# ---------------------------------------------------------------------------


def _kernel_cat(x1_ref, x2_ref, gn_scale_ref, gn_bias_ref, w_ref, b_ref,
                o_ref, *, groups: int, eps: float, F: int):
    x1 = x1_ref[0]  # [S, C1]
    x2 = x2_ref[0]  # [S, C2]
    s, c1 = x1.shape
    c2 = x2.shape[-1]
    cin = c1 + c2
    cg = cin // groups
    cout = o_ref.shape[-1]
    wd = w_ref.dtype

    # group stats over the virtual concat: per-column sums of each part,
    # concatenated into one [1, cin] row, then the usual group slices
    x1_32 = x1.astype(jnp.float32)
    x2_32 = x2.astype(jnp.float32)
    colsum = jnp.concatenate(
        [jnp.sum(x1_32, axis=0, keepdims=True),
         jnp.sum(x2_32, axis=0, keepdims=True)], axis=1)
    colsq = jnp.concatenate(
        [jnp.sum(x1_32 * x1_32, axis=0, keepdims=True),
         jnp.sum(x2_32 * x2_32, axis=0, keepdims=True)], axis=1)
    n = float(s * cg)
    mean_parts, rstd_parts = [], []
    for g in range(groups):
        gsum = jnp.sum(colsum[:, g * cg : (g + 1) * cg])
        gsq = jnp.sum(colsq[:, g * cg : (g + 1) * cg])
        mean = gsum / n
        var = gsq / n - mean * mean
        mean_parts.append(jnp.full((1, cg), mean, jnp.float32))
        rstd_parts.append(jnp.full((1, cg), jax.lax.rsqrt(var + eps), jnp.float32))
    mean_c = jnp.concatenate(mean_parts, axis=1)  # [1, cin]
    rstd_c = jnp.concatenate(rstd_parts, axis=1)
    gn_scale = gn_scale_ref[...]
    gn_bias = gn_bias_ref[...]

    def norm_silu(x32, lo, hi):
        y = (x32 - mean_c[:, lo:hi]) * rstd_c[:, lo:hi] * gn_scale[lo:hi] \
            + gn_bias[lo:hi]
        return (y * jax.nn.sigmoid(y)).astype(wd)

    y1 = norm_silu(x1_32, 0, c1)
    y2 = norm_silu(x2_32, c1, cin)

    acc = _conv9(y1, lambda dt, df: w_ref[dt + 1, df + 1][:c1], cout, F)
    acc = acc + _conv9(y2, lambda dt, df: w_ref[dt + 1, df + 1][c1:], cout, F)
    o_ref[0] = (acc + b_ref[...]).astype(o_ref.dtype)


def supported_cat(x1, x2, w, groups: int) -> bool:
    bsz, T, F, c1 = x1.shape
    c2 = x2.shape[-1]
    cin = c1 + c2
    cout = w.shape[-1]
    if x2.shape[:3] != x1.shape[:3]:
        return False
    if cin % groups or c1 % 128 or c2 % 128 or cout % 128:
        return False
    s = T * F
    # `supported`'s model at the concat width, with a tighter limit: the
    # two-part kernel keeps more live copies than the model counts, and
    # Mosaic's stack allocator measured 16.41 MB actual against a 9.24 MB
    # estimate (1.78x) at [2,1024,384|256]->256 — which overflowed the
    # 16 MB scoped-vmem limit on chip (round-5 smoke lane). 8.5 MB keeps
    # every estimate under the measured ratio; bigger shapes stream via
    # the cat_tiled variant instead.
    budget = (s * cin * 4) * 2 + s * cout * 4 + int(np.prod(w.shape)) * w.dtype.itemsize
    return budget <= int(8.5 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def gn_silu_conv3x3_cat(x1, x2, gn_scale, gn_bias, w, b, groups: int = 32,
                        eps: float = 1e-5, interpret: bool = False):
    """Fused GN+SiLU+conv3x3 over the virtual concat [x1 ; x2] along
    channels — numerically identical to gn_silu_conv3x3(concat(x1, x2))
    without materializing the concat. x1: [B, T, F, C1], x2: [B, T, F, C2];
    w: [3, 3, C1+C2, Cout]."""
    bsz, T, F, c1 = x1.shape
    c2 = x2.shape[-1]
    cout = w.shape[-1]
    s = T * F

    out = pl.pallas_call(
        functools.partial(_kernel_cat, groups=groups, eps=eps, F=F),
        out_shape=jax.ShapeDtypeStruct((bsz, s, cout), x1.dtype),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, s, c1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, c2), lambda i: (i, 0, 0)),
            pl.BlockSpec((c1 + c2,), lambda i: (0,)),
            pl.BlockSpec((c1 + c2,), lambda i: (0,)),
            pl.BlockSpec((3, 3, c1 + c2, cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, s, cout), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(x1.reshape(bsz, s, c1), x2.reshape(bsz, s, c2),
      gn_scale.astype(jnp.float32), gn_bias.astype(jnp.float32), w,
      b.astype(jnp.float32))
    return out.reshape(bsz, T, F, cout)


# ---------------------------------------------------------------------------
# T-tiled variant: shapes whose full [T*F, C] working set busts the scoped-
# vmem limit (e.g. the large-1150k ds1 ladder, S=4096 / cin=cout=256) stream
# T in halo-padded tiles. GroupNorm stats span the WHOLE sample, so they are
# folded outside the kernel into one per-(batch, channel) affine
# (a = rstd * gamma, c = beta - mean * a, computed by one fused XLA reduce
# over x); the kernel applies y = silu(x * a + c) per tile and convolves
# with one t-row of halo on each side. Global t-edges emulate SAME zero
# padding by zeroing the (post-activation) halo rows of the first/last tile.
# ---------------------------------------------------------------------------


def _kernel_tiled(xc_ref, hp_ref, hn_ref, a_ref, c_ref, w_ref, b_ref, o_ref,
                  *, F: int, nt: int):
    cout = o_ref.shape[-1]
    a = a_ref[0]  # [1, C] f32 (this batch's folded GN affine; block (1,1,C))
    c = c_ref[0]
    wd = w_ref.dtype

    def act(v):  # normalize + SiLU, f32 math, -> weight dtype
        y32 = v.astype(jnp.float32) * a + c
        return (y32 * jax.nn.sigmoid(y32)).astype(wd)

    j = pl.program_id(1)
    # Halo rows are RAW x rows; activation is applied before the conv sees
    # them. At the global edges the conv must see zeros instead (SAME
    # padding happens after GN+SiLU in the reference composition).
    yp = act(hp_ref[0, 0]) * (j > 0).astype(wd)
    yn = act(hn_ref[0, 0]) * (j < nt - 1).astype(wd)
    ym = act(xc_ref[0, 0])
    y = jnp.concatenate([yp, ym, yn], axis=0)  # [(bt+2)*F, C]

    acc = _conv9(y, lambda dt, df: w_ref[dt + 1, df + 1], cout, F)
    o_ref[0, 0] = (acc[F:-F] + b_ref[...]).astype(o_ref.dtype)


def _tile_bt(T: int, F: int, cin: int, cout: int, w_bytes: int,
             w_itemsize: int = 2) -> int:
    """Largest divisor-of-T tile size whose working set fits the budget
    (f32 tile + two live activation copies in the WEIGHT dtype + f32
    accumulator over the halo-extended rows). 0 when even bt=1 does not
    fit.

    The limit is the 16 MB scoped-vmem ceiling divided by the measured
    Mosaic stack-allocation ratio: on-chip, actual allocations run ~1.78x
    this liveness model (f32 VAE-encoder shape [1,512,32,128]->256:
    20.08 MB actual at a naive 9.7 MB estimate; same ratio seen for the
    cat kernel) — 8.5 MB keeps the worst case under the ceiling. The
    activation-copy term must use the weight itemsize: hardcoding bf16
    made f32 callers (the sr_inpainting VAE encode) pick oversized tiles
    that failed Mosaic compile, silently costing the kernel set in every
    sr capture."""
    best = 0
    for bt in range(1, T + 1):
        if T % bt:
            continue
        ext = (bt + 2) * F
        budget = (
            ext * cin * 4                  # x32 normalize intermediate
            + 2 * ext * cin * w_itemsize   # y + one shifted copy
            + ext * cout * 4               # f32 accumulator
            + w_bytes
        )
        if budget <= int(8.5 * 1024 * 1024):
            best = bt
    return best


def supported_tiled(x, w, groups: int) -> bool:
    bsz, T, F, cin = x.shape
    cout = w.shape[-1]
    if cin % groups or cin % 128 or cout % 128:
        return False
    w_bytes = int(np.prod(w.shape)) * w.dtype.itemsize
    return _tile_bt(T, F, cin, cout, w_bytes, w.dtype.itemsize) > 0


def _fold_gn_affine(parts, gn_scale, gn_bias, groups: int, eps: float):
    """GroupNorm of the (virtual) channel-concat of ``parts`` folded into a
    per-(batch, channel) affine (a, c) such that the normalized value is
    x * a + c — computed by fused XLA reduces, one read per part, no
    concat materialization (stat rows are [B, C]-tiny)."""
    bsz = parts[0].shape[0]
    colsum = jnp.concatenate(
        [jnp.sum(p.astype(jnp.float32), axis=(1, 2)) for p in parts], axis=-1
    )  # [B, cin]
    colsq = jnp.concatenate(
        [jnp.sum(jnp.square(p.astype(jnp.float32)), axis=(1, 2))
         for p in parts], axis=-1
    )
    cin = colsum.shape[-1]
    cg = cin // groups
    n = float(parts[0].shape[1] * parts[0].shape[2] * cg)
    mean_g = jnp.sum(colsum.reshape(bsz, groups, cg), axis=-1) / n  # [B, G]
    var_g = jnp.sum(colsq.reshape(bsz, groups, cg), axis=-1) / n - mean_g**2
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean = jnp.repeat(mean_g, cg, axis=1)  # [B, cin]
    rstd = jnp.repeat(rstd_g, cg, axis=1)
    a = rstd * gn_scale.astype(jnp.float32)[None, :]
    c = gn_bias.astype(jnp.float32)[None, :] - mean * a
    return a, c


def _halo_rows(xr, bt: int, nt: int):
    """Per-tile halo t-rows: tile j needs rows j*bt-1 and (j+1)*bt (clamped
    at the edges; kernels zero the clamped rows after activation)."""
    T = xr.shape[1]
    idx_prev = np.maximum(np.arange(nt) * bt - 1, 0)
    idx_next = np.minimum((np.arange(nt) + 1) * bt, T - 1)
    return jnp.take(xr, idx_prev, axis=1), jnp.take(xr, idx_next, axis=1)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def gn_silu_conv3x3_tiled(x, gn_scale, gn_bias, w, b, groups: int = 32,
                          eps: float = 1e-5, interpret: bool = False):
    """T-tiled fused GN+SiLU+conv3x3 for shapes `supported` rejects.
    x: [B, T, F, Cin]; w: [3, 3, Cin, Cout]; returns [B, T, F, Cout]."""
    bsz, T, F, cin = x.shape
    cout = w.shape[-1]
    bt = _tile_bt(T, F, cin, cout, int(np.prod(w.shape)) * w.dtype.itemsize,
                  w.dtype.itemsize)
    nt = T // bt

    # GroupNorm stats folded to one per-(B, C) affine — one fused XLA
    # reduce over x in f32 (a single extra read of x; the unfused chain
    # reads it at least twice).
    a, c = _fold_gn_affine([x], gn_scale, gn_bias, groups, eps)

    hp, hn = _halo_rows(x.reshape(bsz, T, F, cin), bt, nt)  # [B, nt, F, C]
    xc = x.reshape(bsz, nt, bt * F, cin)

    # The folded affine travels as [B, 1, cin] so the block's trailing two
    # dims are (1, cin) == the array's trailing dims — Mosaic requires the
    # last two block dims be (8,128)-divisible OR equal to the array dims,
    # and a [B, cin] array with block (1, cin) violates that whenever B > 1
    # (the round-4 on-chip failure at every CFG batch > 1).
    out = pl.pallas_call(
        functools.partial(_kernel_tiled, F=F, nt=nt),
        out_shape=jax.ShapeDtypeStruct((bsz, nt, bt * F, cout), x.dtype),
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, 1, bt * F, cin), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, F, cin), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, F, cin), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, cin), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, cin), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bt * F, cout), lambda i, j: (i, j, 0, 0)
        ),
        interpret=interpret,
    )(xc, hp, hn, a[:, None, :], c[:, None, :], w, b.astype(jnp.float32))
    return out.reshape(bsz, T, F, cout)


# ---------------------------------------------------------------------------
# Concat-input + T-tiled: the decoder's widest ResBlocks (e.g. S=4096 at
# cin=256+256) need BOTH the concat-free input split and the halo tiling.
# ---------------------------------------------------------------------------


def _kernel_cat_tiled(x1_ref, x2_ref, h1p_ref, h1n_ref, h2p_ref, h2n_ref,
                      a1_ref, c1a_ref, a2_ref, c2a_ref, w_ref, b_ref, o_ref,
                      *, F: int, nt: int, c1: int):
    cout = o_ref.shape[-1]
    # Per-part folded affines as separate [1, cpart] rows: slicing one
    # [1, cin] row at a nonzero lane offset inside the kernel fails Mosaic's
    # broadcast lowering ("Invalid input layout" on the vpad-offset vector).
    a1, c1a = a1_ref[0], c1a_ref[0]  # [1, c1] f32
    a2, c2a = a2_ref[0], c2a_ref[0]  # [1, c2] f32
    wd = w_ref.dtype

    def act(v, a, c):
        y32 = v.astype(jnp.float32) * a + c
        return (y32 * jax.nn.sigmoid(y32)).astype(wd)

    j = pl.program_id(1)
    gp = (j > 0).astype(wd)
    gn = (j < nt - 1).astype(wd)
    y1 = jnp.concatenate(
        [act(h1p_ref[0, 0], a1, c1a) * gp, act(x1_ref[0, 0], a1, c1a),
         act(h1n_ref[0, 0], a1, c1a) * gn], axis=0)
    y2 = jnp.concatenate(
        [act(h2p_ref[0, 0], a2, c2a) * gp, act(x2_ref[0, 0], a2, c2a),
         act(h2n_ref[0, 0], a2, c2a) * gn], axis=0)

    acc = _conv9(y1, lambda dt, df: w_ref[dt + 1, df + 1][:c1], cout, F)
    acc = acc + _conv9(y2, lambda dt, df: w_ref[dt + 1, df + 1][c1:], cout, F)
    o_ref[0, 0] = (acc[F:-F] + b_ref[...]).astype(o_ref.dtype)


def supported_cat_tiled(x1, x2, w, groups: int) -> bool:
    bsz, T, F, c1 = x1.shape
    c2 = x2.shape[-1]
    cin = c1 + c2
    cout = w.shape[-1]
    if x2.shape[:3] != x1.shape[:3]:
        return False
    if cin % groups or c1 % 128 or c2 % 128 or cout % 128:
        return False
    w_bytes = int(np.prod(w.shape)) * w.dtype.itemsize
    return _tile_bt(T, F, cin, cout, w_bytes, w.dtype.itemsize) > 0


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def gn_silu_conv3x3_cat_tiled(x1, x2, gn_scale, gn_bias, w, b,
                              groups: int = 32, eps: float = 1e-5,
                              interpret: bool = False):
    """gn_silu_conv3x3 over the virtual concat [x1 ; x2], streamed in
    halo-padded T tiles — for decoder shapes too wide for the one-shot cat
    kernel. Numerically identical to the explicit concat composition."""
    bsz, T, F, c1 = x1.shape
    c2 = x2.shape[-1]
    cin = c1 + c2
    cout = w.shape[-1]
    bt = _tile_bt(T, F, cin, cout, int(np.prod(w.shape)) * w.dtype.itemsize,
                  w.dtype.itemsize)
    nt = T // bt

    a, c = _fold_gn_affine([x1, x2], gn_scale, gn_bias, groups, eps)
    h1p, h1n = _halo_rows(x1, bt, nt)
    h2p, h2n = _halo_rows(x2, bt, nt)
    x1c = x1.reshape(bsz, nt, bt * F, c1)
    x2c = x2.reshape(bsz, nt, bt * F, c2)

    def spec(rows, ch):
        return pl.BlockSpec((1, 1, rows, ch), lambda i, j: (i, j, 0, 0))

    out = pl.pallas_call(
        functools.partial(_kernel_cat_tiled, F=F, nt=nt, c1=c1),
        out_shape=jax.ShapeDtypeStruct((bsz, nt, bt * F, cout), x1.dtype),
        grid=(bsz, nt),
        in_specs=[
            spec(bt * F, c1), spec(bt * F, c2),
            spec(F, c1), spec(F, c1), spec(F, c2), spec(F, c2),
            # per-part [B, 1, cpart] affines: trailing block dims equal the
            # array dims (a [B, cin] operand with block (1, cin) fails
            # Mosaic at B > 1 — round-4 on-chip failure), and per-part
            # splitting avoids in-kernel lane-offset slices (Mosaic
            # "Invalid input layout" broadcast failure)
            pl.BlockSpec((1, 1, c1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c2), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c2), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bt * F, cout), lambda i, j: (i, j, 0, 0)
        ),
        interpret=interpret,
    )(x1c, x2c, h1p, h1n, h2p, h2n,
      a[:, None, :c1], c[:, None, :c1], a[:, None, c1:], c[:, None, c1:],
      w, b.astype(jnp.float32))
    return out.reshape(bsz, T, F, cout)
