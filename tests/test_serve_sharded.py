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


def test_sharded_divisibility_guard():
    cfg = tiny_t5_model_config()
    params = pipeline.init_params(jax.random.PRNGKey(1), cfg)
    model = pipeline.AudioLDM2(cfg, params)
    gen = ShardedGenerator(model)
    with pytest.raises(AssertionError):
        gen.generate(["a"], jax.random.PRNGKey(0), duration=0.64, n_gen=1, ddim_steps=4)
