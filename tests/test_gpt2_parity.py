"""GPT-2 backbone parity vs HF torch GPT2Model + KV-cache equivalence."""

import numpy as np
import pytest

from audioldm2_tpu.config import GPT2Config
from audioldm2_tpu import convert
from audioldm2_tpu.models import gpt2 as jgpt2


SMALL = GPT2Config(n_embd=32, n_layer=2, n_head=4, n_positions=64)


@pytest.fixture(scope="module")
def pair():
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.GPT2Config(
        n_embd=SMALL.n_embd,
        n_layer=SMALL.n_layer,
        n_head=SMALL.n_head,
        n_positions=SMALL.n_positions,
        vocab_size=50,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    ref = transformers.GPT2Model(hf_cfg).eval()
    params = convert.convert_gpt2(
        convert.state_dict_to_numpy(ref.state_dict()), n_layer=SMALL.n_layer
    )
    return ref, params


def test_full_forward_parity(pair, rng):
    torch = pytest.importorskip("torch")
    ref, params = pair
    b, L = 2, 10
    emb = rng.standard_normal((b, L, SMALL.n_embd)).astype(np.float32) * 0.5
    mask = np.ones((b, L), np.float32)

    with torch.no_grad():
        out_t = ref(
            inputs_embeds=torch.from_numpy(emb),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    out_j = np.asarray(jgpt2.forward_full(params, SMALL, emb, mask))
    np.testing.assert_allclose(out_j, out_t, atol=2e-4, rtol=1e-3)


def test_reference_ar_loop_equivalence(pair, rng):
    """KV-cached scan generation == reference full-recompute AR loop.

    Reproduces the reference loop semantics (sequence_input.py:311-323):
    each step appends the last hidden state and reruns the full forward."""
    torch = pytest.importorskip("torch")
    ref, params = pair
    b, L, steps = 1, 6, 4
    emb = rng.standard_normal((b, L, SMALL.n_embd)).astype(np.float32) * 0.5
    mask = np.ones((b, L), np.float32)

    # reference-style loop in torch
    with torch.no_grad():
        model_input = torch.from_numpy(emb)
        model_mask = torch.from_numpy(mask)
        for _ in range(steps):
            out = ref(
                inputs_embeds=model_input, attention_mask=model_mask
            ).last_hidden_state
            model_input = torch.cat([model_input, out[:, -1:, :]], dim=1)
            model_mask = torch.cat([model_mask, torch.ones((b, 1))], dim=1)
        want = model_input[:, L:].numpy()

    # jax cached path
    import jax
    import jax.numpy as jnp

    cache_len = L + steps
    hidden, cache = jgpt2.prefill(params, SMALL, emb, mask, cache_len)
    g = hidden[:, -1]
    cache_mask = jnp.pad(jnp.asarray(mask), ((0, 0), (0, steps)))
    tokens = [np.asarray(g)]
    content_len = jnp.sum(jnp.asarray(mask), axis=1).astype(jnp.int32)
    for i in range(steps - 1):
        h, cache = jgpt2.step(
            params, SMALL, g, cache, cache_mask, L + i, content_len + i
        )
        cache_mask = cache_mask.at[:, L + i].set(1.0)
        tokens.append(np.asarray(h))
        g = h
    got = np.stack(tokens, axis=1)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_padded_prefix_cache(pair, rng):
    """Mid-sequence pads: cumsum positions + mask in prefill must make the
    valid-token hiddens independent of pad content."""
    ref, params = pair
    b, L = 1, 8
    emb = rng.standard_normal((b, L, SMALL.n_embd)).astype(np.float32)
    mask = np.ones((b, L), np.float32)
    mask[:, 5:] = 0.0
    h1, _ = jgpt2.prefill(params, SMALL, emb, mask, L)
    emb2 = emb.copy()
    emb2[:, 5:] = 99.0
    h2, _ = jgpt2.prefill(params, SMALL, emb2, mask, L)
    np.testing.assert_allclose(
        np.asarray(h1)[:, :5], np.asarray(h2)[:, :5], atol=1e-5
    )
