"""Offline tokenizer-fallback semantics.

The hash fallback keeps shapes/padding but not ids; what it MUST preserve is
each model family's special-token conventions, because the downstream models
give special ids semantic weight. The sharpest case: HF RoBERTa computes
position ids as ``cumsum(input_ids != padding_idx)`` with padding_idx=1
(reference CLAP text branch, clap/open_clip/model.py:513-516) — a fallback
that pads with 0 or emits id 1 for a real token makes the reference and this
repo diverge on IDENTICAL ids (measured 3.3e-2 on the normalized CLAP text
embedding before the conventions were pinned; 7e-8 after).
"""

import numpy as np

from audioldm2_tpu.utils import text as text_utils


def test_roberta_fallback_specials():
    tok = text_utils.HashWordTokenizer(
        50265, **text_utils._FALLBACK_SPECIALS["roberta-base"]
    )
    ids, mask = tok(["a dog barking in the rain", "water drops"], 64)
    assert ids.shape == (2, 64) and mask.shape == (2, 64)
    # pads with RoBERTa's padding_idx=1
    assert (ids[mask == 0] == 1).all()
    # bos=0 / eos=2 framing
    assert (ids[:, 0] == 0).all()
    for b in range(2):
        n = int(mask[b].sum())
        assert ids[b, n - 1] == 2
    # no real token may collide with padding_idx — RoBERTa position ids key
    # off input_ids==1, not the attention mask
    assert (ids[mask == 1] != 1).all()


def test_t5_fallback_specials():
    tok = text_utils.HashWordTokenizer(
        32128, **text_utils._FALLBACK_SPECIALS["google/flan-t5-large"]
    )
    ids, mask = tok(["a dog barking"], 16)
    assert (ids[mask == 0] == 0).all()  # T5 pad=0
    n = int(mask[0].sum())
    assert ids[0, n - 1] == 1  # T5 eos=1


def test_fallback_deterministic_and_bounded():
    tok = text_utils.HashWordTokenizer(
        50265, **text_utils._FALLBACK_SPECIALS["roberta-base"]
    )
    a1, m1 = tok(["the same text"], 32)
    a2, m2 = tok(["the same text"], 32)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(m1, m2)
    assert a1.max() < 50265
    # hashed word ids stay clear of the special-token range
    assert (a1[(m1 == 1) & (a1 != 0) & (a1 != 2)] >= 200).all()


def test_fallback_truncation_keeps_eos():
    tok = text_utils.HashWordTokenizer(
        50265, **text_utils._FALLBACK_SPECIALS["roberta-base"]
    )
    ids, mask = tok(["word " * 100], 8)
    assert mask[0].sum() == 8
    assert ids[0, -1] == 2
