"""Training data pipeline tests (tiny config, synthesized wavs)."""

import json

import numpy as np
import pytest
from scipy.io import wavfile

from audioldm2_tpu.utils.data import AudioDataset, DatasetConfig
from tiny import tiny_t5_model_config


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("audio")
    sr = 1600
    entries = []
    rng = np.random.default_rng(0)
    for i in range(4):
        wav = (0.3 * rng.standard_normal(sr * 2)).astype(np.float32)
        p = str(tmp_path / f"a{i}.wav")
        wavfile.write(p, sr, (wav * 32767).astype(np.int16))
        entries.append({"wav": p, "caption": f"sound number {i}"})
    # one corrupt entry to exercise the retry loop
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav")
    entries.insert(1, {"wav": bad, "caption": "corrupt"})
    meta = str(tmp_path / "meta.json")
    with open(meta, "w") as f:
        json.dump({"data": entries}, f)

    model_cfg = tiny_t5_model_config()
    return AudioDataset(
        DatasetConfig(
            metadata_paths=[meta], sampling_rate=1600, duration=0.64,
            add_ons=("kaldi_fbank", "phoneme_and_text"),
        ),
        model_cfg,
    )


def test_example_shapes(dataset):
    ex = dataset.example(0)
    assert ex["fbank"].shape == (64, 16, 1)
    assert ex["waveform"].shape == (1024,)
    assert ex["ta_kaldi_fbank"].shape == (1024, 128)
    assert ex["phoneme_idx"].shape == (310,)


def test_corrupt_file_skipped(dataset):
    # index 1 is the corrupt entry; retry loop must land on a readable one
    ex = dataset.example(1)
    assert np.isfinite(ex["fbank"]).all()


def test_batches_collate(dataset):
    batch = next(dataset.batches(2))
    assert batch["fbank"].shape == (2, 64, 16, 1)
    assert batch["t5_ids"].shape == (2, 16)
    assert batch["clap_ids"].shape == (2, 512)
    assert len(batch["text"]) == 2
