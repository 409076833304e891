"""HiFi-GAN vocoder generator — functional JAX, channels-last.

Re-design of the reference Generator (reference ``hifigan/models.py:112-174``):
conv_pre -> [leaky_relu -> ConvTranspose1d upsample -> multi-receptive-field
ResBlock fusion] per stage -> leaky_relu -> conv_post -> tanh. Weight norm is
folded into plain kernels at conversion time (the reference calls
``remove_weight_norm()`` at load, utilities/model.py:140-152).

Activations are [B, T, C]; the mel input is [B, T_mel, num_mels] (the
model-facing fbank layout — the reference permutes to [B, num_mels, T] for
its NCL convs, ddpm.py:928-939).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audioldm2_tpu.config import VocoderConfig
from audioldm2_tpu.ops import nn

LRELU_SLOPE = 0.1

# Default False: measured on v5e (pre-folded weights, mel_T=1024, 16 kHz
# config) batch=1: 20.5 ms plain vs 25.9 ms folded; batch=4: 56.5 vs 52.9 —
# XLA's NHC conv1d already packs small-C time blocks onto the lanes, so the
# fold's f*~5x FLOP overhead isn't paid back. Kept as an exact-equivalent
# option for configs/hardware where it wins; None = auto (TPU only).
USE_FOLDED_MRF = False


def _folding_enabled() -> bool:
    if USE_FOLDED_MRF is not None:
        return USE_FOLDED_MRF
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def init_vocoder(key, cfg: VocoderConfig):
    keys = iter(nn.split_keys(key, 512))
    ch0 = cfg.upsample_initial_channel
    p = {"conv_pre": nn.conv1d_init(next(keys), 7, cfg.num_mels, ch0)}
    ups, resblocks = [], []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = ch0 // (2**i)
        cout = ch0 // (2 ** (i + 1))
        # ConvTranspose1d weights stored [k, O, I]
        import numpy as np

        ups.append(
            {
                "w": nn.randn(next(keys), (k, cout, cin), std=0.01),
                "b": np.zeros((cout,), np.float32),
            }
        )
        for ks, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            if cfg.resblock == "1":
                rb = {
                    "convs1": [
                        nn.conv1d_init(next(keys), ks, cout, cout) for _ in dils
                    ],
                    "convs2": [
                        nn.conv1d_init(next(keys), ks, cout, cout) for _ in dils
                    ],
                }
            else:
                rb = {
                    "convs": [
                        nn.conv1d_init(next(keys), ks, cout, cout) for _ in dils
                    ]
                }
            resblocks.append(rb)
    p["ups"] = ups
    p["resblocks"] = resblocks
    p["conv_post"] = nn.conv1d_init(next(keys), 7, ch0 // (2 ** len(ups)), 1)
    return p


# ---------------------------------------------------------------------------
# Time-folded MRF: HiFi-GAN's late stages run at C = 64/32 over very long T,
# filling only C/128 of the TPU's vector lanes and starving the MXU. Viewing
# [B, T, C] as [B, T/f, f*C] (f = 128//C) turns every dilated conv1d into an
# equivalent dense conv1d at 128 channels: output slot r of folded position q
# is unfolded position f*q + r, and a tap at unfolded offset D lands in
# folded block floor((r+D)/f), slot (r+D) mod f — so the folded kernel is a
# block-structured [k', fC, fC] weight built once per call from the original
# [k, C, C] weight. Zero padding maps exactly (out-of-range folded blocks are
# whole out-of-range unfolded spans).
# ---------------------------------------------------------------------------


def _fold_span(k: int, f: int, dilation: int, pad: int):
    """Folded-kernel row-offset range (a_min, a_max) — pure python on
    static shapes (the conv's explicit padding must be concrete)."""
    offs = [dilation * t - pad for t in range(k)]
    a_min = min((r + d) // f for d in offs for r in range(f))
    a_max = max((r + d) // f for d in offs for r in range(f))
    return a_min, a_max


@functools.partial(jax.jit, static_argnames=("f", "dilation", "pad"))
def _fold_conv_weight(w, f: int, dilation: int, pad: int):
    """w: [k, C, C_out] HIO -> w_folded [k', f*C, f*C_out] for a dense
    dilation-1 conv in folded space."""
    k, cin, cout = w.shape
    offs = [dilation * t - pad for t in range(k)]  # unfolded tap offsets
    a_min, a_max = _fold_span(k, f, dilation, pad)
    kf = a_max - a_min + 1
    wf = jnp.zeros((kf, f * cin, f * cout), w.dtype)
    for t, d in enumerate(offs):
        for r in range(f):
            a = (r + d) // f
            b = (r + d) % f
            wf = wf.at[
                a - a_min, b * cin : (b + 1) * cin, r * cout : (r + 1) * cout
            ].add(w[t])
    return wf


def _prefold_conv(p, f: int, kernel_size: int, dilation: int):
    """Precompute one conv's folded form {'w': [k', fC, fC_out],
    'b': [fC_out]} (see fold_vocoder_params). The conv's explicit padding
    is recomputed statically at apply time (ints in the pytree would be
    traced into the program)."""
    pad = _get_padding(kernel_size, dilation)
    return {
        "w": _fold_conv_weight(p["w"], f, dilation, pad),
        "b": jnp.tile(jnp.asarray(p["b"]), f),
    }


def fold_vocoder_params(p, cfg: VocoderConfig):
    """One-time transform of the MRF/conv_post weights of every stage with
    C < 128 into their time-folded dense form (f = 128 // C). Run OUTSIDE
    the generation program — the fold is hundreds of small scatters that
    must not execute per call. Returns {stage_index: folded} for
    :func:`apply_vocoder`'s ``folded`` argument."""
    ch0 = cfg.upsample_initial_channel
    nk = len(cfg.resblock_kernel_sizes)
    out = {}
    n_up = len(cfg.upsample_rates)
    for i in range(n_up):
        c = ch0 // (2 ** (i + 1))
        f = 128 // c if c < 128 else 1
        if f <= 1:
            continue
        stage = {"resblocks": []}
        for j, (ks, dils) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            rb = p["resblocks"][i * nk + j]
            if cfg.resblock == "1":
                stage["resblocks"].append(
                    {
                        "convs1": [
                            _prefold_conv(c1, f, ks, d)
                            for c1, d in zip(rb["convs1"], dils)
                        ],
                        "convs2": [
                            _prefold_conv(c2, f, ks, 1) for c2 in rb["convs2"]
                        ],
                    }
                )
            else:
                stage["resblocks"].append(
                    {
                        "convs": [
                            _prefold_conv(c, f, ks, d)
                            for c, d in zip(rb["convs"], dils)
                        ]
                    }
                )
        if i == n_up - 1:
            k_post = p["conv_post"]["w"].shape[0]
            stage["conv_post"] = _prefold_conv(p["conv_post"], f, k_post, 1)
        out[i] = stage
    return out


def _folded_conv(pf, x, f: int, kernel_size: int, dilation: int):
    """x: [B, T/f, f*C]; pf: a _prefold_conv dict."""
    pad = _get_padding(kernel_size, dilation)
    a_min, a_max = _fold_span(kernel_size, f, dilation, pad)
    y = jax.lax.conv_general_dilated(
        x,
        pf["w"].astype(x.dtype),
        window_strides=(1,),
        padding=[(-a_min, a_max)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    y = y + pf["b"]
    return y.astype(x.dtype)


def _resblock_folded(pf, x, f: int, kernel_size: int, dilations):
    for c1, c2, d in zip(pf["convs1"], pf["convs2"], dilations):
        xt = nn.leaky_relu(x, LRELU_SLOPE)
        xt = _folded_conv(c1, xt, f, kernel_size, d)
        xt = nn.leaky_relu(xt, LRELU_SLOPE)
        xt = _folded_conv(c2, xt, f, kernel_size, 1)
        x = xt + x
    return x


def _resblock2_folded(pf, x, f: int, kernel_size: int, dilations):
    for c, d in zip(pf["convs"], dilations):
        xt = nn.leaky_relu(x, LRELU_SLOPE)
        xt = _folded_conv(c, xt, f, kernel_size, d)
        x = xt + x
    return x


def _resblock(p, x, kernel_size: int, dilations):
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = nn.leaky_relu(x, LRELU_SLOPE)
        xt = nn.conv1d(c1, xt, padding=_get_padding(kernel_size, d), dilation=d)
        xt = nn.leaky_relu(xt, LRELU_SLOPE)
        xt = nn.conv1d(c2, xt, padding=_get_padding(kernel_size, 1))
        x = xt + x
    return x


def _resblock2(p, x, kernel_size: int, dilations):
    """v2 single-conv MRF block (reference models_v2.py:112-152)."""
    for c, d in zip(p["convs"], dilations):
        xt = nn.leaky_relu(x, LRELU_SLOPE)
        xt = nn.conv1d(c, xt, padding=_get_padding(kernel_size, d), dilation=d)
        x = xt + x
    return x


def apply_vocoder(p, cfg: VocoderConfig, mel: jnp.ndarray, folded=None) -> jnp.ndarray:
    """mel: [B, T_mel, num_mels] -> waveform [B, T_mel * prod(rates)].

    ``folded``: optional output of :func:`fold_vocoder_params` — runs the
    C < 128 MRF stages time-folded at full lane occupancy."""
    if folded is None and _folding_enabled():
        folded = fold_vocoder_params(p, cfg)
    x = nn.conv1d(p["conv_pre"], mel, padding=3)
    nk = len(cfg.resblock_kernel_sizes)
    n_up = len(cfg.upsample_rates)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = nn.leaky_relu(x, LRELU_SLOPE)
        x = nn.conv_transpose1d(p["ups"][i], x, stride=u, padding=(k - u) // 2)
        b_, t_, c_ = x.shape
        stage = folded.get(i) if folded else None
        f = 128 // c_ if c_ < 128 else 1  # static (matches fold_vocoder_params)
        use_fold = stage is not None and t_ % f == 0
        if use_fold:
            x = x.reshape(b_, t_ // f, f * c_)
        acc = None
        for j, (ks, dils) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            if use_fold:
                rb_fn = _resblock_folded if cfg.resblock == "1" else _resblock2_folded
                y = rb_fn(stage["resblocks"][j], x, f, ks, dils)
            else:
                rb_fn = _resblock if cfg.resblock == "1" else _resblock2
                y = rb_fn(p["resblocks"][i * nk + j], x, ks, dils)
            acc = y if acc is None else acc + y
        x = acc / nk
        if use_fold and i != n_up - 1:
            x = x.reshape(b_, t_, c_)
        elif use_fold:
            # final stage: stay folded through conv_post (C -> 1 becomes
            # f*C -> f, slots unfold to the waveform)
            x = nn.leaky_relu(x, 0.01)
            k_post = p["conv_post"]["w"].shape[0]
            x = _folded_conv(stage["conv_post"], x, f, k_post, 1)
            return jnp.tanh(x.reshape(b_, t_))
    x = nn.leaky_relu(x, 0.01)  # torch F.leaky_relu default slope
    x = nn.conv1d(p["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0]
