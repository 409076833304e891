"""Core neural-net ops: channels-last convs, norms, attention — pure JAX.

Layout policy (TPU-first): all activations are channels-last
([B, T, C] / [B, H, W, C]) so convolutions hit XLA's NHWC path and the
channel axis maps onto lanes. Weights are stored HWIO ([kh, kw, in, out]);
the checkpoint converter transposes from torch's OIHW.

Numerics policy: normalizations always compute in float32 (matching the
reference's GroupNorm32 / fp32-softmax behavior); matmuls request
``preferred_element_type=float32`` so the MXU accumulates in fp32 even under
bfloat16 params/activations.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Initializers (torch-default-shaped; exact parity comes from loaded weights)
#
# Init is pure numpy driven by the key's raw data: creating hundreds of
# parameters as individual device ops is pathologically slow on a remote TPU
# runtime (each tiny op is a fresh compile + dispatch). The tree is uploaded
# in one transfer by the first jitted call.
# ---------------------------------------------------------------------------


def _np_rng(key) -> np.random.Generator:
    data = key if getattr(key, "dtype", None) == jnp.uint32 else jax.random.key_data(key)
    return np.random.default_rng(np.asarray(data, dtype=np.uint32))


# Fast-init pool: this host draws numpy PCG64 normals at only ~8M/s on its
# single core, so properly-random init of audioldm2-full's 1.2B params costs
# ~900 s (the round-2 driver-timeout culprit). In fast mode (bench/smoke
# paths; AUDIOLDM2_FAST_INIT=1 or pipeline.init_params(fast=True)) leaves are
# filled by tiling one 2M-normal pool at rotating offsets — memcpy speed.
# Values are only consumed where real weights are absent (timing is
# data-independent on TPU; parity tests always convert reference weights).
FAST_INIT = False
_FAST_POOL = None
_FAST_OFFSET = 0
_FAST_KEY_SEQ = 0


def _fast_fill(shape, scale: float) -> np.ndarray:
    global _FAST_POOL, _FAST_OFFSET
    if _FAST_POOL is None:
        _FAST_POOL = np.random.default_rng(0).standard_normal(
            1 << 21, dtype=np.float32
        )
    pool = _FAST_POOL
    n = int(np.prod(shape)) if shape else 1
    off = _FAST_OFFSET % pool.size
    _FAST_OFFSET = (_FAST_OFFSET + n + 9973) % (1 << 62)
    # Cyclic memcpy from the pool into ONE allocation + in-place scale.
    # np.tile materialized ceil(n/pool)x8MB intermediates and a second
    # multiply allocation — 75 s of the 130 s fast init for 916M params.
    out = np.empty(n, np.float32)
    first = min(n, pool.size - off)
    out[:first] = pool[off : off + first]
    filled = first
    while filled < n:
        c = min(pool.size, n - filled)
        out[filled : filled + c] = pool[:c]
        filled += c
    if scale != 1.0:
        out *= np.float32(scale)
    return out.reshape(shape)


def split_keys(key, num: int = 2):
    """``jax.random.split`` for init-time key fan-out.

    In FAST_INIT mode the returned "keys" are inert numpy uint32[2] rows
    from a process-global counter: init values come from the shared pool
    (:func:`_fast_fill`), never from these keys, and the ~1.1k eager
    threefry splits of a large param tree cost ~45 s of host dispatch on a
    single-core host (round-4 build profile). Runtime sampling code must
    keep calling jax.random.split."""
    if FAST_INIT:
        global _FAST_KEY_SEQ
        base = _FAST_KEY_SEQ
        _FAST_KEY_SEQ += num
        out = np.empty((num, 2), np.uint32)
        out[:, 0] = np.arange(base, base + num, dtype=np.uint64).astype(np.uint32)
        out[:, 1] = np.uint32(0x9E3779B9)
        return out
    return jax.random.split(key, num)


def randn(key, shape, std: float = 1.0) -> np.ndarray:
    if FAST_INIT:
        return _fast_fill(shape, std)
    # dtype=float32 draws single-precision directly — the f64 draw + astype
    # path is ~7x slower and dominated whole-model init (921 s for
    # audioldm2-full's 1.2B params on this host).
    out = _np_rng(key).standard_normal(shape, dtype=np.float32)
    if std != 1.0:
        out *= np.float32(std)
    return out


def _kaiming_uniform(key, shape, fan_in):
    bound = np.float32(math.sqrt(1.0 / fan_in) * math.sqrt(3.0))
    if FAST_INIT:
        # distribution shape is irrelevant in fast mode; match the stddev
        return _fast_fill(shape, bound / math.sqrt(3.0))
    r = _np_rng(key).random(shape, dtype=np.float32)  # [0, 1)
    r *= 2 * bound
    r -= bound
    return r


def conv_init(key, kh, kw, cin, cout, zero=False):
    if zero:
        return {"w": np.zeros((kh, kw, cin, cout), np.float32), "b": np.zeros((cout,), np.float32)}
    k1, k2 = split_keys(key)
    fan_in = kh * kw * cin
    return {
        "w": _kaiming_uniform(k1, (kh, kw, cin, cout), fan_in),
        "b": _kaiming_uniform(k2, (cout,), fan_in),
    }


def conv1d_init(key, k, cin, cout, zero=False):
    if zero:
        return {"w": np.zeros((k, cin, cout), np.float32), "b": np.zeros((cout,), np.float32)}
    k1, k2 = split_keys(key)
    fan_in = k * cin
    return {
        "w": _kaiming_uniform(k1, (k, cin, cout), fan_in),
        "b": _kaiming_uniform(k2, (cout,), fan_in),
    }


def linear_init(key, cin, cout, zero=False, bias=True):
    if zero:
        p = {"w": np.zeros((cin, cout), np.float32)}
        if bias:
            p["b"] = np.zeros((cout,), np.float32)
        return p
    k1, k2 = split_keys(key)
    p = {"w": _kaiming_uniform(k1, (cin, cout), cin)}
    if bias:
        p["b"] = _kaiming_uniform(k2, (cout,), cin)
    return p


def norm_init(channels):
    return {"scale": np.ones((channels,), np.float32), "bias": np.zeros((channels,), np.float32)}


# ---------------------------------------------------------------------------
# Functional ops
# ---------------------------------------------------------------------------


def _pallas_int8_enabled() -> bool:
    """int8 weight-streaming kernels are mandatory-on-TPU (the jnp
    fallback's inline dequant gets hoisted out of the sampling scan),
    but still honor the emergency kill-switch."""
    return _on_tpu() and _env_flag("AUDIOLDM2_PALLAS") is not False


def linear(p, x):
    if "wq" in p:  # int8-quantized (ops/quant.py)
        from audioldm2_tpu.ops import lnmm_pallas, quant

        if _pallas_int8_enabled() and lnmm_pallas.int8_matmul_supported(x, p["wq"]):
            return lnmm_pallas.int8_matmul(x, p["wq"], p["ws"], p.get("b"))
        p = {"w": quant.dequantize(p), **{k: v for k, v in p.items()
                                          if k not in ("wq", "ws")}}
    y = jnp.einsum("...i,io->...o", x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _env_flag(name: str) -> Optional[bool]:
    """Tri-state env read: unset -> None, '0'/'false'/'off' -> False,
    anything else -> True."""
    v = os.environ.get(name)
    if v is None:
        return None
    return v.strip().lower() not in ("0", "false", "off", "")


def pallas_env_override(kernel: str) -> Optional[bool]:
    """Runtime kill-switch for Pallas kernel dispatch (VERDICT r3 #1b: a
    bad kernel must be disable-able without a code edit). Precedence:

      AUDIOLDM2_PALLAS=0            -> every kernel off (emergency stop)
      AUDIOLDM2_PALLAS_<KERNEL>=0/1 -> that kernel forced off/on
      unset                         -> None (module constant / auto rules)

    Kernels: attention, resblock, lnmm, groupnorm, plus the round-4
    sub-variants gated under resblock: resblock_tiled (T-tiled streaming
    kernels) and resblock_cat (concat-free decoder kernels) — =0 restores
    the round-3 dispatch for A/B and emergency isolation.

    Read at trace time: flip the env var, then ``jax.clear_caches()`` (or
    start a fresh process) to retrace. bench.py uses this to fall back to
    the pure-XLA path if a kernel fails to compile.
    """
    glob = _env_flag("AUDIOLDM2_PALLAS")
    if glob is False:
        return False
    per = _env_flag(f"AUDIOLDM2_PALLAS_{kernel.upper()}")
    if per is not None:
        return per
    if glob is True:
        return True
    return None


def conv2d(p, x, stride: Tuple[int, int] = (1, 1), padding="SAME"):
    """x: [B, H, W, Cin]; p['w']: [kh, kw, Cin, Cout]."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + p["b"]
    return y.astype(x.dtype)


def conv1d(p, x, stride: int = 1, padding="SAME", dilation: int = 1):
    """x: [B, T, Cin]; p['w']: [k, Cin, Cout]."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    y = y + p["b"]
    return y.astype(x.dtype)


def conv_transpose1d(p, x, stride: int, padding: int):
    """torch ConvTranspose1d semantics: L_out = (L-1)*stride - 2*padding + k.

    p['w']: [k, Cout, Cin] (HOI — matches torch's [Cin, Cout, k] transposed
    to kernel-first); x: [B, T, Cin].
    """
    k = p["w"].shape[0]
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(p["w"], 0).astype(x.dtype),
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HOI", "NHC"),
        preferred_element_type=jnp.float32,
    )
    y = y + p["b"]
    return y.astype(x.dtype)


def group_norm(p, x, groups: int = 32, eps: float = 1e-5):
    """Channels-last GroupNorm matching torch semantics (contiguous channel
    groups; statistics over spatial dims and within-group channels).
    Always computed in float32 (reference GroupNorm32, util.py:239-241)."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    *lead, c = x.shape
    g = groups
    xg = x.reshape(x.shape[0], -1, g, c // g)  # [B, S, G, C/G]
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(x.shape)
    x = x * p["scale"] + p["bias"]
    return x.astype(orig_dtype)


# Default False: XLA's reduce+normalize fusions beat the slice-loop Pallas
# kernel at this model's shapes (measured 6.7 vs 9.3 ms/UNet-step). Kept for
# larger-geometry configs; None = auto (TPU only).
USE_PALLAS_GROUPNORM = False


def _pallas_groupnorm_enabled() -> bool:
    env = pallas_env_override("groupnorm")
    if env is not None:
        return env
    if USE_PALLAS_GROUPNORM is not None:
        return USE_PALLAS_GROUPNORM
    return _on_tpu()


# Default None = auto (TPU only): the fused GN+SiLU+conv3x3 ResBlock kernel
# measured faster than the XLA chain at production shapes.
USE_PALLAS_RESBLOCK = None


def _pallas_resblock_enabled() -> bool:
    env = pallas_env_override("resblock")
    if env is not None:
        return env
    if USE_PALLAS_RESBLOCK is not None:
        return USE_PALLAS_RESBLOCK
    return _on_tpu()


def gn_silu_conv(p_norm, p_conv, x, groups: int = 32, eps: float = 1e-5):
    """GroupNorm -> SiLU -> 3x3 SAME conv — the ResBlock body. Dispatches to
    the fused Pallas kernel on TPU when the geometry fits VMEM; gradients
    flow through the jnp composition (custom VJP)."""
    if "wq" in p_conv:
        # int8 weight streaming (opt-in serving mode, unet.quantize_
        # resblock_convs): the conv weight is the dominant per-step HBM
        # stream at small CFG batch; int8 halves it and the dequant stays
        # in VMEM inside the kernel. Off-TPU fallback dequantizes exactly.
        from audioldm2_tpu.ops import quant, resblock_pallas

        if _pallas_resblock_enabled() and resblock_pallas.supported(
            x, p_conv["wq"], groups
        ):
            return resblock_pallas.gn_silu_conv3x3_q(
                x, p_norm["scale"], p_norm["bias"], p_conv["wq"],
                p_conv["ws"], p_conv["b"], groups=groups, eps=eps,
            )
        p_conv = {"w": quant.dequantize_conv(p_conv).astype(x.dtype),
                  "b": p_conv["b"]}
    w = p_conv["w"]
    if (
        _pallas_resblock_enabled()
        and x.ndim == 4
        and w.shape[0] == 3
        and w.shape[1] == 3
    ):
        from audioldm2_tpu.ops import resblock_pallas

        if resblock_pallas.supported(x, w, groups):
            return _gn_silu_conv_fused(
                x, p_norm["scale"], p_norm["bias"], w.astype(x.dtype),
                p_conv["b"], groups, eps,
            )
        if (
            pallas_env_override("resblock_tiled") is not False
            and resblock_pallas.supported_tiled(x, w, groups)
        ):
            # shapes whose full working set busts the scoped-vmem limit
            # stream T in halo-padded tiles (e.g. large-1150k's ds1 ladder)
            return _gn_silu_conv_fused_tiled(
                x, p_norm["scale"], p_norm["bias"], w.astype(x.dtype),
                p_conv["b"], groups, eps,
            )
    return conv2d(p_conv, group_norm_silu(p_norm, x, groups, eps))


def gn_silu_conv_cat(p_norm, p_conv, x1, x2, groups: int = 32,
                     eps: float = 1e-5):
    """gn_silu_conv over the virtual channel-concat [x1 ; x2] — the UNet
    decoder's skip pattern (reference openaimodel.py:818). The fused kernel
    consumes the parts separately so the widest activations of the step
    never materialize in HBM; all fallbacks concatenate explicitly."""
    if "w" in p_conv:
        w = p_conv["w"]
        if (
            _pallas_resblock_enabled()
            and pallas_env_override("resblock_cat") is not False
            and x1.ndim == 4
            and w.shape[0] == 3
            and w.shape[1] == 3
        ):
            from audioldm2_tpu.ops import resblock_pallas

            if resblock_pallas.supported_cat(x1, x2, w, groups):
                return _gn_silu_conv_cat_fused(
                    x1, x2, p_norm["scale"], p_norm["bias"],
                    w.astype(x1.dtype), p_conv["b"], groups, eps,
                )
            if (
                pallas_env_override("resblock_tiled") is not False
                and resblock_pallas.supported_cat_tiled(x1, x2, w, groups)
            ):
                return _gn_silu_conv_cat_tiled_fused(
                    x1, x2, p_norm["scale"], p_norm["bias"],
                    w.astype(x1.dtype), p_conv["b"], groups, eps,
                )
    return gn_silu_conv(
        p_norm, p_conv, jnp.concatenate([x1, x2], axis=-1), groups, eps
    )


def conv1x1_cat(p, x1, x2):
    """1x1 conv over the virtual channel-concat [x1 ; x2]: two einsums
    against the row-slices of the [1, 1, C1+C2, Cout] weight (XLA fuses
    both into the surrounding graph; no concat materialization)."""
    w = p["w"][0, 0]  # [C1+C2, Cout]
    c1 = x1.shape[-1]
    y = jnp.einsum("...i,io->...o", x1, w[:c1],
                   preferred_element_type=jnp.float32)
    y = y + jnp.einsum("...i,io->...o", x2, w[c1:],
                       preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x1.dtype)


def _gn_silu_conv_ref(x, scale, bias, w, b, groups, eps):
    return conv2d({"w": w, "b": b}, silu(group_norm({"scale": scale, "bias": bias}, x, groups, eps)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gn_silu_conv_fused(x, scale, bias, w, b, groups, eps):
    from audioldm2_tpu.ops import resblock_pallas

    return resblock_pallas.gn_silu_conv3x3(x, scale, bias, w, b, groups=groups, eps=eps)


def _gn_silu_conv_fwd(x, scale, bias, w, b, groups, eps):
    return _gn_silu_conv_fused(x, scale, bias, w, b, groups, eps), (x, scale, bias, w, b)


def _gn_silu_conv_bwd(groups, eps, res, g):
    x, scale, bias, w, b = res
    _, vjp = jax.vjp(lambda *a: _gn_silu_conv_ref(*a, groups, eps), x, scale, bias, w, b)
    return vjp(g)


_gn_silu_conv_fused.defvjp(_gn_silu_conv_fwd, _gn_silu_conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gn_silu_conv_fused_tiled(x, scale, bias, w, b, groups, eps):
    from audioldm2_tpu.ops import resblock_pallas

    return resblock_pallas.gn_silu_conv3x3_tiled(
        x, scale, bias, w, b, groups=groups, eps=eps
    )


def _gn_silu_conv_tiled_fwd(x, scale, bias, w, b, groups, eps):
    return (
        _gn_silu_conv_fused_tiled(x, scale, bias, w, b, groups, eps),
        (x, scale, bias, w, b),
    )


_gn_silu_conv_fused_tiled.defvjp(_gn_silu_conv_tiled_fwd, _gn_silu_conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _gn_silu_conv_cat_fused(x1, x2, scale, bias, w, b, groups, eps):
    from audioldm2_tpu.ops import resblock_pallas

    return resblock_pallas.gn_silu_conv3x3_cat(
        x1, x2, scale, bias, w, b, groups=groups, eps=eps
    )


def _gn_silu_conv_cat_fwd(x1, x2, scale, bias, w, b, groups, eps):
    return (
        _gn_silu_conv_cat_fused(x1, x2, scale, bias, w, b, groups, eps),
        (x1, x2, scale, bias, w, b),
    )


def _gn_silu_conv_cat_bwd(groups, eps, res, g):
    x1, x2, scale, bias, w, b = res

    def ref(x1, x2, scale, bias, w, b):
        return _gn_silu_conv_ref(
            jnp.concatenate([x1, x2], axis=-1), scale, bias, w, b, groups, eps
        )

    _, vjp = jax.vjp(ref, x1, x2, scale, bias, w, b)
    return vjp(g)


_gn_silu_conv_cat_fused.defvjp(_gn_silu_conv_cat_fwd, _gn_silu_conv_cat_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _gn_silu_conv_cat_tiled_fused(x1, x2, scale, bias, w, b, groups, eps):
    from audioldm2_tpu.ops import resblock_pallas

    return resblock_pallas.gn_silu_conv3x3_cat_tiled(
        x1, x2, scale, bias, w, b, groups=groups, eps=eps
    )


def _gn_silu_conv_cat_tiled_fwd(x1, x2, scale, bias, w, b, groups, eps):
    return (
        _gn_silu_conv_cat_tiled_fused(x1, x2, scale, bias, w, b, groups, eps),
        (x1, x2, scale, bias, w, b),
    )


_gn_silu_conv_cat_tiled_fused.defvjp(
    _gn_silu_conv_cat_tiled_fwd, _gn_silu_conv_cat_bwd
)


def group_norm_silu(p, x, groups: int = 32, eps: float = 1e-5):
    """Fused GroupNorm -> SiLU (every UNet/VAE ResBlock runs this pair);
    dispatches to the Pallas kernel on TPU."""
    if _pallas_groupnorm_enabled():
        from audioldm2_tpu.ops import groupnorm_pallas

        if groupnorm_pallas.supported(x, groups):
            return groupnorm_pallas.group_norm_silu(
                x, p["scale"], p["bias"], groups=groups, eps=eps, silu=True
            )
    return silu(group_norm(p, x, groups, eps))


def layer_norm(p, x, eps: float = 1e-5):
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    x = x * p["scale"] + p["bias"]
    return x.astype(orig_dtype)


def rms_norm(p, x, eps: float = 1e-6):
    """T5-style RMSNorm (no mean subtraction, no bias)."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * p["scale"]).astype(orig_dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


def nearest_upsample_2d(x, factor_h: int = 2, factor_w: int = 2):
    """[B, H, W, C] nearest-neighbor upsampling (torch F.interpolate nearest)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor_h, w, factor_w, c)
    )
    return x.reshape(b, h * factor_h, w * factor_w, c)


def avg_pool_2d(x, window: Tuple[int, int], stride: Tuple[int, int]):
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, window[0], window[1], 1),
        (1, stride[0], stride[1], 1),
        "VALID",
    ) / (window[0] * window[1])


# None = auto (TPU only). Fuses each spatial-transformer LayerNorm into its
# consumer matmul and the GEGLU gate product into the FF output matmul
# (ops/lnmm_pallas.py) — the LN outputs and the [M, 2*ff] GEGLU hidden never
# round-trip HBM. A/B'd on v5e (20-step DDIM scan, audioldm2-full geometry):
# batch=1 6.05→5.89 ms/step, batch=4 15.19→14.89 ms/step, final latents
# bitwise-identical to the XLA composition in both runs (tools/ab_lnmm.py).
USE_PALLAS_LNMM = None


def _pallas_lnmm_enabled() -> bool:
    env = pallas_env_override("lnmm")
    if env is not None:
        return env
    if USE_PALLAS_LNMM is not None:
        return USE_PALLAS_LNMM
    return _on_tpu()


def ln_linear(p_norm, p_lin, x, eps: float = 1e-5):
    """linear(layer_norm(x)) — fused on TPU when enabled + supported.
    int8-quantized linears always take the kernel on TPU (the fallback's
    inline dequant would be hoisted out of the sampling scan by XLA,
    defeating the halved weight streaming)."""
    quantized = "wq" in p_lin
    if quantized or _pallas_lnmm_enabled():
        from audioldm2_tpu.ops import lnmm_pallas

        w = p_lin["wq"] if quantized else p_lin["w"]
        if (quantized and _pallas_int8_enabled() or not quantized) and \
                lnmm_pallas.ln_matmul_supported(x, w):
            return lnmm_pallas.ln_matmul(
                x, p_norm["scale"], p_norm["bias"],
                w if quantized else w.astype(x.dtype),
                p_lin.get("b"), p_lin.get("ws"), eps=eps,
            )
    return linear(p_lin, layer_norm(p_norm, x, eps))


def geglu_ff_out(p_lin, h, residual):
    """residual + linear(a * gelu(gate)) for GEGLU hidden h = [a|gate] —
    fused on TPU when enabled + supported."""
    quantized = "wq" in p_lin
    if quantized or _pallas_lnmm_enabled():
        from audioldm2_tpu.ops import lnmm_pallas

        w = p_lin["wq"] if quantized else p_lin["w"]
        if (quantized and _pallas_int8_enabled() or not quantized) and \
                lnmm_pallas.geglu_matmul_supported(h, w):
            return lnmm_pallas.geglu_matmul(
                h, w if quantized else w.astype(h.dtype), p_lin["b"],
                residual, p_lin.get("ws"),
            )
    a, gate = jnp.split(h, 2, axis=-1)
    return residual + linear(p_lin, a * gelu(gate))


# None = auto (TPU only, by shape): the [B, H, T, T] f32 logits XLA
# materializes scale linearly with batch*heads, so the flash kernel wins
# once that traffic is large. Measured on v5e (T=1024, D=32, 20-step DDIM
# scan): CFG-batch 8 -> XLA 23.4 vs Pallas 17.3 ms/step; CFG-batch 2 ->
# XLA 5.48 vs Pallas 5.39 ms/step with the v5 kernel (round-5 A/B; the
# round-1 v1 kernel lost at b2, which the old 3*8*1024^2 threshold
# encoded). True/False force.
USE_PALLAS_ATTENTION = None

# b*h*t*t threshold: the T=1024 self-attention sites win at every
# production CFG batch (>= 2*8*1024^2); the small ds4/ds8 sites
# (b*h*t*t <= 2M) stay on XLA.
_PALLAS_ATTENTION_MIN_LOGITS = 2 * 8 * 1024 * 1024


def _pallas_attention_enabled(q=None) -> bool:
    env = pallas_env_override("attention")
    if env is not None:
        return env
    if USE_PALLAS_ATTENTION is not None:
        return USE_PALLAS_ATTENTION
    if not _on_tpu():
        return False
    if q is None:
        return True
    b, t, h, _ = q.shape
    return b * h * t * t >= _PALLAS_ATTENTION_MIN_LOGITS


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Multi-head scaled dot-product attention, channels-last.

    q: [B, Tq, H, D]; k, v: [B, Tk, H, D]; mask: [B, Tk] (1 = keep) or
    broadcastable additive-bias-shaped boolean [B, H, Tq, Tk];
    bias: additive [B|1, H|1, Tq, Tk]. Softmax in float32 (reference
    attention.py:354-363 does fp32 masked softmax).

    Unmasked self-attention at kernel-friendly sizes dispatches to the
    fused Pallas kernel on TPU (no [T, T] logits in HBM).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if _pallas_attention_enabled(q) and mask is None and bias is None:
        from audioldm2_tpu.ops import attention_pallas

        if attention_pallas.supported(q, k, mask, bias):
            return attention_pallas.fused_self_attention(q, k, v, float(scale))
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[:, None, None, :]
        neg = jnp.finfo(jnp.float32).max
        logits = jnp.where(mask.astype(bool), logits, -neg)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def split_heads(x, num_heads):
    b, t, c = x.shape
    return x.reshape(b, t, num_heads, c // num_heads)


def merge_heads(x):
    b, t, h, d = x.shape
    return x.reshape(b, t, h * d)


def timestep_embedding(timesteps, dim, max_period=10000.0):
    """Sinusoidal embedding, [cos | sin] order (reference
    diffusionmodules/util.py:172-196)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
