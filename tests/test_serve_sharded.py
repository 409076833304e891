"""dp-sharded batch serving over the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from audioldm2_tpu import pipeline
from audioldm2_tpu.parallel.serve import ShardedGenerator
from tiny import tiny_t5_model_config


def test_sharded_generate_matches_shapes():
    cfg = tiny_t5_model_config()
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)

    gen = ShardedGenerator(model)
    assert gen.dp == 8
    texts = ["rain", "wind", "fire", "birdsong",
             "thunder", "waves", "engine", "piano"]
    wav = gen.generate(
        texts, jax.random.PRNGKey(0), duration=0.64, n_gen=1, ddim_steps=4
    )
    assert wav.shape[0] == 8
    assert np.isfinite(wav).all()


def test_tp2_matches_tp1():
    """tp=2 megatron sharding of attention/FF weights must be numerically
    equivalent to dp-only serving (same program, different partitioning)."""
    cfg = tiny_t5_model_config()
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)

    texts = ["rain", "wind", "fire", "birdsong",
             "thunder", "waves", "engine", "piano"]
    kw = dict(duration=0.64, n_gen=1, ddim_steps=4, guidance=3.5)

    gen_dp = ShardedGenerator(model, tp=1)
    wav_dp = gen_dp.generate(texts, jax.random.PRNGKey(0), **kw)

    gen_tp = ShardedGenerator(model, tp=2)
    assert gen_tp.dp == 4 and gen_tp.tp == 2
    wav_tp = gen_tp.generate(texts, jax.random.PRNGKey(0), **kw)

    assert wav_tp.shape == wav_dp.shape
    np.testing.assert_allclose(wav_tp, wav_dp, atol=2e-4, rtol=1e-3)


def test_sharded_divisibility_guard():
    cfg = tiny_t5_model_config()
    params = pipeline.init_params(jax.random.PRNGKey(1), cfg)
    model = pipeline.AudioLDM2(cfg, params)
    gen = ShardedGenerator(model)
    with pytest.raises(AssertionError):
        gen.generate(["a"], jax.random.PRNGKey(0), duration=0.64, n_gen=1, ddim_steps=4)
