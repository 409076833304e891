"""Validate the analytic FLOP accounting (ops/flops.py) against XLA's own
HloCostAnalysis on pure-XLA programs, where cost_analysis IS trustworthy.

Why this exists: ``Compiled.cost_analysis()`` counts 0 FLOPs for custom
calls, so any program that dispatches to the Pallas kernels is undercounted
— that was the ~18x round-2 disagreement between bench.py's MFU (Pallas
program) and tools/profile_stages.py (XLA program). Both instruments now
share ops/flops.py; this file pins the accounting so they can never diverge
again.

XLA conventions that shape the tolerances below: HloCostAnalysis counts a
multiply-add as 2 FLOPs (same as ours), counts only the real MACs of a
SAME-padded conv (border positions touch fewer taps, so its number is
slightly BELOW the dense kh*kw*h*w count we use), and adds small elementwise
FLOP counts for norms/activations that we deliberately exclude (<1-5% at
these shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from audioldm2_tpu.ops import flops as F


def _xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def test_linear_flops_exact():
    a = jnp.zeros((64, 96))
    b = jnp.zeros((96, 48))
    got = _xla_flops(lambda a, b: a @ b, a, b)
    assert got == F.linear_flops(64, 96, 48)


def test_conv2d_flops_exact_on_valid_conv():
    # VALID padding: every output position touches all kh*kw taps, so the
    # dense count is exact.
    x = jnp.zeros((2, 18, 10, 5))
    w = jnp.zeros((3, 3, 5, 7))

    def f(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    got = _xla_flops(f, x, w)
    assert got == F.conv2d_flops(2, 16, 8, 3, 3, 5, 7)


def test_attention_flops_exact():
    b, h, tq, tk, d = 2, 4, 64, 48, 32
    q = jnp.zeros((b, h, tq, d))
    k = jnp.zeros((b, h, tk, d))
    v = jnp.zeros((b, h, tk, d))

    def f(q, k, v):
        # only the two einsums — softmax FLOPs are excluded by convention
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        return jnp.einsum("bhqk,bhkd->bhqd", s, v)

    got = _xla_flops(f, q, k, v)
    assert got == F.attention_flops(b, h, tq, tk, d)


def test_unet_forward_flops_tracks_cost_analysis():
    """The full analytic UNet walk vs HloCostAnalysis of the real XLA
    program (CPU backend → no Pallas custom calls). The analytic number
    counts SAME convs densely and skips norm/softmax elementwise work, so
    the two agree only to ~15% at tiny shapes — the point is catching
    structural errors (a missed block is >25% at this size)."""
    from tests.tiny import tiny_t5_model_config
    from audioldm2_tpu.models import unet as unet_m

    cfg = tiny_t5_model_config()
    b, t, f = 2, 16, 8
    ctx_len = 12
    params = unet_m.init_unet(jax.random.PRNGKey(0), cfg.unet)
    x = jnp.zeros((b, t, f, cfg.unet.in_channels))
    ts = jnp.zeros((b,), jnp.float32)
    ctx = jnp.zeros((b, ctx_len, cfg.unet.context_dims[0]))

    got = _xla_flops(
        lambda p, x, ts, c: unet_m.apply_unet(
            p, cfg.unet, x, ts, context_list=[c], context_mask_list=[None]
        ),
        params, x, ts, ctx,
    )
    want = F.unet_forward_flops(
        cfg.unet, b, t, f, context_lens=[ctx_len], count_cross_kv=True
    )
    assert got == pytest.approx(want, rel=0.15), (got, want, got / want)


def test_unet_step_flops_uses_hoisted_kv():
    """unet_step_flops excludes cross-K/V projections (they are hoisted out
    of the sampling scan by precompute_cross_kv) — it must be strictly below
    the count_cross_kv=True walk and equal to the False one."""
    from tests.tiny import tiny_t5_model_config

    cfg = tiny_t5_model_config()
    lens = F.default_context_lens(cfg)
    assert lens == [cfg.conditioners[0].flan_t5.max_length]
    with_kv = F.unet_forward_flops(
        cfg.unet, 4, 16, cfg.latent_f_size, context_lens=lens, count_cross_kv=True
    )
    step = F.unet_step_flops(cfg, batch_size=4, latent_t=16)
    without_kv = F.unet_forward_flops(
        cfg.unet, 4, 16, cfg.latent_f_size, context_lens=lens, count_cross_kv=False
    )
    assert step == without_kv < with_kv


def test_production_config_flops_magnitude():
    """The audioldm_16k_crossattn_t5 CFG step at batch=8 (user batch 4) must
    land in the hundreds-of-GFLOP range — the sanity anchor for the MFU
    headline (a 18x mistake like round 2's moves this out of range)."""
    from audioldm2_tpu.config import default_audioldm_config

    cfg = default_audioldm_config("audioldm_16k_crossattn_t5")
    step = F.unet_step_flops(cfg, batch_size=8, latent_t=256)
    assert 1e11 < step < 2e12, step


def test_vae_decode_flops_tracks_cost_analysis():
    from tests.tiny import tiny_t5_model_config
    from audioldm2_tpu.models import vae as vae_m

    cfg = tiny_t5_model_config().vae
    b, t, f = 1, 16, 8
    params = vae_m.init_vae(jax.random.PRNGKey(0), cfg)
    z = jnp.zeros((b, t, f, cfg.embed_dim))
    got = _xla_flops(lambda p, z: vae_m.decode(p, cfg, z), params, z)
    want = F.vae_decode_flops(cfg, b, t, f)
    assert got == pytest.approx(want, rel=0.15), (got, want, got / want)


def test_vocoder_flops_tracks_cost_analysis():
    from tests.tiny import tiny_t5_model_config
    from audioldm2_tpu.models import vocoder as voc_m

    cfg = tiny_t5_model_config().vocoder
    b, t_mel = 1, 32
    params = voc_m.init_vocoder(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((b, t_mel, cfg.num_mels))
    got = _xla_flops(
        lambda p, m: voc_m.apply_vocoder(p, cfg, m, folded=None), params, mel
    )
    want = F.vocoder_flops(cfg, b, t_mel)
    assert got == pytest.approx(want, rel=0.15), (got, want, got / want)
