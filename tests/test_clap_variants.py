"""CLAP tower variant registry (reference clap/open_clip/factory.py:23-50).

The reference selects towers via JSON model configs; here
``CLAPConfig.amodel``/``tmodel`` select from the typed registry. Full-size
tower math is covered by the per-tower parity tests
(test_htsat_parity/test_pann_parity/test_roberta_parity/test_clip_text);
this file checks the registry widths match the reference JSONs and that
init/dispatch honor the selection end-to-end on tiny towers.
"""

import dataclasses

import jax
import numpy as np

from audioldm2_tpu.config import CLAPConfig
from audioldm2_tpu.models import clap as clap_model

# registered by test_reranker (tiny PANN + tiny roberta); import for reuse
import test_reranker  # noqa: F401


def test_registry_widths_match_reference_jsons():
    # top-level embed_dim of the reference model_configs/*.json
    want = {
        "HTSAT-tiny": 768,
        "HTSAT-base": 1024,
        "HTSAT-large": 2048,
        "PANN-14": 2048,
        "PANN-10": 1024,
    }
    for name, width in want.items():
        assert clap_model.AUDIO_TOWERS[name][1] == width
    # text projection input widths (reference model.py:485-545)
    assert clap_model.TEXT_TOWERS["roberta"][1] == 768
    assert clap_model.TEXT_TOWERS["bert"][1] == 768
    assert clap_model.TEXT_TOWERS["bart"][1] == 768
    assert clap_model.TEXT_TOWERS["transformer"][1] == 512


def test_init_and_dispatch_tiny_variants():
    cfg = test_reranker.TINY_RERANKER
    params = clap_model.init_clap(jax.random.PRNGKey(0), cfg)
    # projection input widths follow the registry
    assert params["audio_projection"]["lin1"]["w"].shape[0] == 24
    assert params["text_projection"]["lin1"]["w"].shape[0] == 16

    ids = np.zeros((2, 16), np.int32)
    mask = np.ones((2, 16), np.int32)
    t = clap_model.text_embedding(params, cfg, ids, mask)
    assert t.shape == (2, 1, cfg.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(t)[:, 0], axis=-1), 1.0, atol=1e-5
    )

    wav = np.random.default_rng(0).standard_normal((2, 1024)).astype(np.float32)
    a = clap_model.audio_embedding(params, cfg, wav)
    assert a.shape == (2, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=-1), 1.0, atol=1e-5)

    sim = clap_model.cos_similarity(a, np.asarray(t)[:, 0])
    assert sim.shape == (2,)


def test_bart_and_transformer_pooling_dispatch():
    """bart pools the mean of encoder states; transformer pools at the EOT
    argmax position (reference model.py:630-673). Exercise both dispatches
    on tiny towers."""
    from audioldm2_tpu.models import clip_text as clip_m
    from audioldm2_tpu.models import roberta as roberta_m

    clap_model.register_text_tower(
        "bart-test",
        lambda: roberta_m.RobertaConfig(
            hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
            max_position_embeddings=40,
        ),
        16,
    )
    clap_model.register_text_tower(
        "transformer-test",
        lambda: clip_m.CLIPTextConfig(width=16, layers=1, heads=2, context_length=16),
        16,
    )
    for tmodel in ("bart-test", "transformer-test"):
        cfg = dataclasses.replace(test_reranker.TINY_RERANKER, tmodel=tmodel)
        # dispatch inside text_embedding keys off the literal names
        cfg = dataclasses.replace(cfg, tmodel=tmodel.replace("-test", ""))
        clap_model.TEXT_TOWERS[cfg.tmodel + "__saved"] = clap_model.TEXT_TOWERS.get(cfg.tmodel)
        clap_model.TEXT_TOWERS[cfg.tmodel] = clap_model.TEXT_TOWERS[tmodel]
        try:
            params = clap_model.init_clap(jax.random.PRNGKey(1), cfg)
            # CLIP ids are always padded to context_length (reference
            # tokenizer.py pads to 77)
            ids = np.ones((2, 16), np.int32)
            mask = np.ones((2, 16), np.int32)
            emb = clap_model.text_embedding(params, cfg, ids, mask)
            assert emb.shape == (2, 1, cfg.embed_dim)
            assert np.isfinite(np.asarray(emb)).all()
        finally:
            clap_model.TEXT_TOWERS[cfg.tmodel] = clap_model.TEXT_TOWERS.pop(
                cfg.tmodel + "__saved"
            )
