"""Sequence2AudioMAE generator behavior tests (tiny nested stack)."""

import numpy as np
import pytest

from audioldm2_tpu.config import ConditionerSpec, GPT2Config, SequenceGenConfig
from audioldm2_tpu.models import sequence_gen as sg
from tiny import TINY_T5


TINY_GPT2 = GPT2Config(n_embd=768, n_layer=2, n_head=4, n_positions=1024)


def _spec(gen_len=4):
    return ConditionerSpec(
        name="crossattn_audiomae_generated",
        kind="sequence_gen",
        cond_stage_key="all",
        sequence_gen=SequenceGenConfig(
            sequence_gen_length=gen_len,
            sequence_input_keys=("crossattn_flan_t5",),
            sequence_input_embed_dims=(TINY_T5.d_model,),
            gpt2=TINY_GPT2,
        ),
        nested=(
            ConditionerSpec(
                name="crossattn_flan_t5", kind="flan_t5", flan_t5=TINY_T5
            ),
        ),
    )


@pytest.fixture(scope="module")
def seqgen():
    import jax

    spec = _spec()
    params = sg.init_sequence_gen(jax.random.PRNGKey(0), spec)
    return spec, params


def _batch(b=1, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, 100, (b, TINY_T5.max_length)).astype(np.int32)
    mask = np.ones((b, TINY_T5.max_length), np.int32)
    mask[:, 10:] = 0
    return {"t5_ids": ids, "t5_mask": mask}


def test_generate_shapes(seqgen):
    spec, params = seqgen
    tokens = np.asarray(sg.generate(params, spec, _batch()))
    assert tokens.shape == (1, 4, 768)
    assert np.isfinite(tokens).all()


def test_prefix_assembly(seqgen):
    spec, params = seqgen
    seq, mask = sg.assemble_prefix(params, spec, _batch())
    # sos + 16 t5 tokens + eos = 18
    assert seq.shape == (1, 18, 768)
    # mask: [1, (10 valid t5), 0 x6, 1]
    expect = np.concatenate([[1.0], np.r_[np.ones(10), np.zeros(6)], [1.0]])
    np.testing.assert_array_equal(np.asarray(mask)[0], expect)


def test_generation_autoregressive_consistency(seqgen):
    """Cached scan == step-by-step full recompute (reference loop
    semantics, sequence_input.py:311-325)."""
    import jax.numpy as jnp

    from audioldm2_tpu.models import gpt2

    spec, params = seqgen
    batch = _batch(seed=3)
    got = np.asarray(sg.generate(params, spec, batch))[0]

    seq, mask = sg.assemble_prefix(params, spec, batch)
    gcfg = spec.sequence_gen.gpt2
    model_input, model_mask = np.asarray(seq), np.asarray(mask)
    outs = []
    for _ in range(4):
        h = np.asarray(
            gpt2.forward_full(params["gpt2"], gcfg, model_input, model_mask)
        )
        # reference takes output[:, -1:] — with our right-trimmed mask the
        # last *valid* position is what matters; emulate by gathering it
        n_valid = int(model_mask[0].sum())
        # re-order: valid content is not contiguous (pads mid-seq); the last
        # valid index is where the next token reads from
        idx = np.where(model_mask[0] == 1)[0][-1]
        last = h[:, idx]
        outs.append(last[0])
        model_input = np.concatenate([model_input, last[:, None, :]], axis=1)
        model_mask = np.concatenate([model_mask, np.ones((1, 1), np.float32)], axis=1)
    want = np.stack(outs, axis=0)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
