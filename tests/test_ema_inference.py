"""EMA-at-inference: the reference's ema_scope (ddpm.py:305-318) swaps the
LitEma shadow weights in for generation; here that is generate(use_ema=True)
over a converted ``unet_ema`` tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioldm2_tpu import convert, pipeline
from tiny import tiny_t5_model_config


def test_expand_ema_keys_inverts_litema_naming():
    # LitEma registers shadows under dot-stripped source names
    # (reference modules/ema.py:15-18).
    w = np.ones((3, 3), np.float32)
    sd = {
        "model.diffusion_model.input_blocks.0.0.weight": w,
        "model.diffusion_model.out.2.bias": w[0],
        "model_ema.diffusion_modelinput_blocks00weight": 2 * w,
        "model_ema.diffusion_modelout2bias": 3 * w[0],
        "model_ema.decay": np.float32(0.9999),
        "model_ema.num_updates": np.int64(1150000),
        "first_stage_model.decoder.conv_in.weight": w,  # untouched
    }
    out = convert.expand_ema_keys(sd)
    assert set(out) == {
        "model.diffusion_model.input_blocks.0.0.weight",
        "model.diffusion_model.out.2.bias",
    }
    np.testing.assert_array_equal(
        out["model.diffusion_model.input_blocks.0.0.weight"], 2 * w
    )
    np.testing.assert_array_equal(out["model.diffusion_model.out.2.bias"], 3 * w[0])


@pytest.fixture(scope="module")
def tiny_model_with_ema():
    cfg = tiny_t5_model_config()
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    # Jitter zero-init leaves (the UNet's zero_module out-conv would otherwise
    # make eps — and hence the waveform — independent of the UNet weights).
    leaves, treedef = jax.tree.flatten(params)
    key = jax.random.PRNGKey(123)
    out = []
    for leaf in leaves:
        if hasattr(leaf, "shape") and leaf.size and not jnp.any(leaf):
            key, k = jax.random.split(key)
            leaf = 0.02 * jax.random.normal(k, leaf.shape, jnp.float32)
        out.append(leaf)
    params = jax.tree.unflatten(treedef, out)
    # A distinct-but-structurally-identical shadow tree.
    params["unet_ema"] = jax.tree.map(
        lambda a: a + 0.01 * jnp.sign(a) if a.dtype == jnp.float32 else a,
        params["unet"],
    )
    return pipeline.AudioLDM2(cfg, params)


def test_generate_use_ema_swaps_unet(tiny_model_with_ema):
    model = tiny_model_with_ema
    kw = dict(ddim_steps=4, duration=0.64, n_candidate_gen_per_text=1,
              duration_bucket=None)
    live = pipeline.text_to_audio(model, "rain", seed=5, **kw)
    ema = pipeline.text_to_audio(model, "rain", seed=5, use_ema=True, **kw)
    assert live.shape == ema.shape
    assert np.abs(live - ema).max() > 0  # different weights were used

    # use_ema must equal generating with a model whose live UNet IS the
    # shadow tree (ema_scope's copy_to semantics).
    swapped = dict(model.ldm.params)
    swapped["unet"] = model.ldm.params["unet_ema"]
    del swapped["unet_ema"]
    model2 = pipeline.AudioLDM2(model.cfg, swapped)
    ema2 = pipeline.text_to_audio(model2, "rain", seed=5, **kw)
    np.testing.assert_array_equal(ema, ema2)


def test_use_ema_without_shadow_raises():
    cfg = tiny_t5_model_config()
    params = pipeline.init_params(jax.random.PRNGKey(1), cfg, fast=True)
    model = pipeline.AudioLDM2(cfg, params)
    with pytest.raises(ValueError, match="unet_ema"):
        model.ldm.generate(
            model.make_batch("x"), jax.random.PRNGKey(0),
            latent_t_size=16, use_ema=True,
        )
