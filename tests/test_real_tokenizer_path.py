"""Real-HF-tokenizer path coverage (VERDICT r3 #7).

This image has zero network egress and no HF caches, so the offline hash
fallbacks drive ALL text paths here — parity holds because both sides of
every comparison get the same ids. These tests pin the contract that makes
a real deployment (HF caches present) flip safely to the exact path:

1. every tokenizer name any shipped family can instantiate has a
   ``_FALLBACK_SPECIALS`` entry whose special ids equal the real
   tokenizer's published constants (checked against hardcoded public
   values offline, and against the live tokenizer when a cache exists);
2. the fallback emits the same shapes/mask semantics as the real one;
3. when a real tokenizer IS loadable, ``TextTokenizer`` must use it
   (``is_exact``) and its pad/eos/bos ids must match the fallback's, so
   position-id computations (RoBERTa keys them off ``ids != pad``) agree.

Reference: encoders/modules.py:173-181 (T5), :737-745 (RoBERTa 512-pad).
"""

import numpy as np
import pytest

from audioldm2_tpu.utils import text as text_utils

# The published special-token ids of each HF tokenizer any shipped family
# can reach (public constants from the models' tokenizer_config data).
_PUBLISHED = {
    "google/flan-t5-large": dict(pad_id=0, eos_id=1, bos_id=None),
    "roberta-base": dict(pad_id=1, eos_id=2, bos_id=0),
    "bert-base-uncased": dict(pad_id=0, eos_id=102, bos_id=101),
    "facebook/bart-base": dict(pad_id=1, eos_id=2, bos_id=0),
}

# tokenizer-name -> families that instantiate it (docs; keep current)
_REACHED_BY = {
    "google/flan-t5-large": [
        "audioldm_16k_crossattn_t5", "audioldm2-full",
        "audioldm2-full-large-1150k", "audioldm2-music-665k",
    ],
    "roberta-base": ["ALL (reranker CLAP) + audioldm_48k (film cond)"],
    "bert-base-uncased": ["CLAP text-branch variant (no shipped ckpt)"],
    "facebook/bart-base": ["CLAP text-branch variant (no shipped ckpt)"],
}


def test_fallback_specials_cover_every_reachable_tokenizer():
    for name in _PUBLISHED:
        assert name in text_utils._FALLBACK_SPECIALS, (
            f"{name} (reached by {_REACHED_BY[name]}) has no fallback "
            "special-id entry: the hash fallback would use defaults that "
            "break the family's position-id/padding conventions"
        )


def test_fallback_specials_match_published_ids():
    for name, want in _PUBLISHED.items():
        got = dict(text_utils._FALLBACK_SPECIALS[name])
        assert got.get("pad_id") == want["pad_id"], name
        assert got.get("eos_id") == want["eos_id"], name
        assert got.get("bos_id") == want["bos_id"], name


def test_fallback_never_emits_special_ids_for_real_tokens():
    """RoBERTa keys position ids off ``input_ids != pad_id(1)``; a word
    hashing to a special id would silently corrupt them (docs/PERF.md
    round-3 rerank bug). _word_id's floor of 200 clears every family's
    specials."""
    for name, spec in _PUBLISHED.items():
        specials = {spec["pad_id"], spec["eos_id"], spec["bos_id"]} - {None}
        assert all(s < 200 for s in specials), (name, specials)


@pytest.mark.parametrize(
    "factory,max_len",
    [
        (text_utils.t5_tokenizer, 128),
        (text_utils.roberta_tokenizer, 512),
        (text_utils.bert_tokenizer, 512),
    ],
)
def test_shapes_and_masks_consistent(factory, max_len):
    tok = factory()
    ids, mask = tok(["a dog barking in the rain", ""])
    assert ids.shape == (2, max_len) and mask.shape == (2, max_len)
    assert ids.dtype == np.int32
    # padding outside the mask is the family pad id
    pad = _PUBLISHED[tok.hf_name]["pad_id"] if hasattr(tok, "hf_name") else None
    if pad is not None:
        assert (ids[mask == 0] == pad).all()


def test_real_tokenizer_used_when_cache_present():
    """When an HF cache exists (real deployment), the exact path must win
    and agree with the fallback on the special ids. Self-skips offline."""
    real = text_utils._try_hf_tokenizer("roberta-base")
    if real is None:
        pytest.skip("no HF tokenizer cache in this image (zero egress)")
    tok = text_utils.roberta_tokenizer()
    assert tok.is_exact, "cache present but TextTokenizer took the fallback"
    spec = _PUBLISHED["roberta-base"]
    assert real.pad_token_id == spec["pad_id"]
    assert real.eos_token_id == spec["eos_id"]
    assert real.bos_token_id == spec["bos_id"]
    ids, mask = tok(["a dog barking in the rain"])
    want = real(
        ["a dog barking in the rain"], padding="max_length", truncation=True,
        max_length=512, return_tensors="np",
    )
    np.testing.assert_array_equal(ids, want["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, want["attention_mask"].astype(np.int32))
