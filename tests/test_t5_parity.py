"""FLAN-T5 encoder golden parity vs HuggingFace torch T5EncoderModel."""

import numpy as np
import pytest

from audioldm2_tpu.config import FlanT5Config
from audioldm2_tpu import convert
from audioldm2_tpu.models import t5 as jt5


SMALL = FlanT5Config(
    d_model=32, d_kv=8, d_ff=64, num_layers=3, num_heads=4, vocab_size=100
)


def test_t5_encoder_parity(rng):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.T5Config(
        vocab_size=SMALL.vocab_size,
        d_model=SMALL.d_model,
        d_kv=SMALL.d_kv,
        d_ff=SMALL.d_ff,
        num_layers=SMALL.num_layers,
        num_heads=SMALL.num_heads,
        relative_attention_num_buckets=SMALL.relative_attention_num_buckets,
        relative_attention_max_distance=SMALL.relative_attention_max_distance,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    ref = transformers.T5EncoderModel(hf_cfg).eval()
    params = convert.convert_t5_encoder(
        convert.state_dict_to_numpy(ref.state_dict()), SMALL
    )

    ids = rng.integers(0, SMALL.vocab_size, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    mask[0, 8:] = 0
    mask[1, 5:] = 0

    with torch.no_grad():
        out_t = ref(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()

    out_j = np.asarray(apply := jt5.apply_t5_encoder(params, SMALL, ids, mask))
    assert out_j.shape == out_t.shape
    # padded positions may differ (torch computes garbage there too); compare
    # only valid tokens
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(out_j[b, :n], out_t[b, :n], atol=2e-4, rtol=1e-3)


def test_bucket_function_matches_hf():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers.models.t5.modeling_t5 import T5Attention

    rel = np.arange(-300, 300).reshape(1, -1)
    got = jt5.relative_position_bucket(rel, 32, 128)
    want = T5Attention._relative_position_bucket(
        torch.from_numpy(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(got, want)
