"""CLIP BPE tokenizer parity vs the reference (vocab file loaded in-place)."""

import numpy as np
import pytest


def test_bpe_matches_reference():
    try:
        from audioldm2_tpu.utils.bpe import SimpleTokenizer

        tok = SimpleTokenizer()
    except FileNotFoundError:
        pytest.skip("CLIP BPE vocab unavailable")

    import _reference

    ref_tok_mod = _reference.load("audioldm2.clap.open_clip.tokenizer")
    texts = [
        "a dog barking in the rain",
        "Hello, WORLD! it's 5 o'clock...",
        "",
    ]
    got = tok(texts)
    want = ref_tok_mod.tokenize(texts).numpy()
    np.testing.assert_array_equal(got, want)
