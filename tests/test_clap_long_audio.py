"""CLAP long-audio sliding-window path."""

import numpy as np

from audioldm2_tpu.config import CLAPConfig
from audioldm2_tpu.models import clap


def test_sliding_windows_long():
    cfg = CLAPConfig()
    wav = np.arange(cfg.clip_samples * 2 + 1000, dtype=np.float32)
    wins = clap.sliding_windows(wav, cfg.clip_samples, hopsize=240000)
    assert wins.shape[1] == cfg.clip_samples
    # starts at 0, 240000, 480000 (range(0, n - clip, hop)) + final tail
    assert wins.shape[0] == 4
    np.testing.assert_array_equal(wins[0], wav[: cfg.clip_samples])
    np.testing.assert_array_equal(wins[-1], wav[-cfg.clip_samples :])


def test_sliding_windows_short_tiles():
    cfg = CLAPConfig()
    wav = np.ones(cfg.clip_samples // 3, np.float32)
    wins = clap.sliding_windows(wav, cfg.clip_samples, hopsize=240000)
    assert wins.shape == (1, cfg.clip_samples)
    # tiled 3x then zero padded
    assert wins[0, : 3 * len(wav)].sum() == 3 * len(wav)
