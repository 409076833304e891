"""CLIP byte-pair-encoding tokenizer.

Used by CLAP's "transformer" text branch (reference
``clap/open_clip/tokenizer.py:74-197``; the shipped checkpoints use the
RoBERTa branch instead — see utils/text.py). Standard CLIP BPE: bytes ->
unicode mapping, merge ranks from a vocab file, ``<start_of_text>`` /
``<end_of_text>`` specials, fixed 77-token context.

The merge table is loaded from a ``bpe_simple_vocab_16e6.txt.gz`` file —
by default the copy vendored at ``audioldm2_tpu/assets/`` (public CLIP
data); pass a path or set AUDIOLDM2_BPE_VOCAB to override.
"""

from __future__ import annotations

import gzip
import html
import os
import re
from functools import lru_cache
from typing import List, Optional

import numpy as np


@lru_cache()
def bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


DEFAULT_VOCAB_PATHS = (
    os.getenv("AUDIOLDM2_BPE_VOCAB", ""),
    # vendored canonical OpenAI CLIP BPE vocab (data, shipped with the package)
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets",
        "bpe_simple_vocab_16e6.txt.gz",
    ),
)


class SimpleTokenizer:
    def __init__(self, bpe_path: Optional[str] = None, context_length: int = 77):
        if bpe_path is None:
            for cand in DEFAULT_VOCAB_PATHS:
                if cand and os.path.exists(cand):
                    bpe_path = cand
                    break
        if bpe_path is None or not os.path.exists(bpe_path):
            raise FileNotFoundError(
                "CLIP BPE vocab not found; set AUDIOLDM2_BPE_VOCAB to a "
                "bpe_simple_vocab_16e6.txt.gz path"
            )
        self.context_length = context_length
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<start_of_text>", "<end_of_text>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.decoder = {i: v for v, i in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<start_of_text>": "<start_of_text>",
            "<end_of_text>": "<end_of_text>",
        }
        self.pat = re.compile(
            r"<start_of_text>|<end_of_text>|'s|'t|'re|'ve|'m|'ll|'d|[^\s\w]+|\w+",
            re.IGNORECASE,
        )

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(
                self.encoder[t] for t in self.bpe(token).split(" ")
            )
        return bpe_tokens

    def __call__(self, texts: List[str]) -> np.ndarray:
        """[B, context_length] int32 with SOT/EOT, truncated like CLIP."""
        sot = self.encoder["<start_of_text>"]
        eot = self.encoder["<end_of_text>"]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, text in enumerate(texts):
            toks = [sot] + self.encode(text) + [eot]
            toks = toks[: self.context_length]
            toks[-1] = eot if len(toks) == self.context_length else toks[-1]
            out[i, : len(toks)] = toks
        return out
