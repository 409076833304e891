"""Training data pipeline: metadata-driven audio dataset.

Re-design of the reference training dataset (reference
``utilities/data/dataset.py:15-153`` + ``data/add_on.py:30-173``): a JSON
metadata manifest of {"wav": path, "caption"/"text": str, ...} entries,
loaded host-side into fixed-shape numpy batches matching the conditioner
array contract (models/conditioners.py). Corrupt files are skipped with a
retry loop like the reference (dataset.py:129-153).

No torch DataLoader: batches are assembled in numpy and fed to jitted train
steps; shard the leading axis over dp with
:func:`audioldm2_tpu.parallel.mesh.batch_sharding`.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional

import numpy as np

from audioldm2_tpu.config import ModelConfig
from audioldm2_tpu.ops.stft import KaldiFbank, MelSpectrogram
from audioldm2_tpu.utils import text as text_utils
from audioldm2_tpu.utils.audio_io import read_wav_file


@dataclass
class DatasetConfig:
    metadata_paths: List[str]
    sampling_rate: int = 16000
    duration: float = 10.24
    random_segment: bool = True
    add_ons: tuple = ("kaldi_fbank", "phoneme_and_text")


class AudioDataset:
    """Iterates metadata entries -> model-ready example dicts."""

    def __init__(self, cfg: DatasetConfig, model_cfg: ModelConfig, seed: int = 0):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.rng = random.Random(seed)
        self.data: List[Dict] = []
        for path in cfg.metadata_paths:
            with open(path) as f:
                meta = json.load(f)
            self.data.extend(meta["data"] if isinstance(meta, dict) else meta)
        if not self.data:
            raise ValueError("empty dataset")

        pp = model_cfg.preprocessing
        self.mel = MelSpectrogram(
            filter_length=pp.filter_length,
            hop_length=pp.hop_length,
            win_length=pp.win_length,
            n_mel_channels=pp.n_mel_channels,
            sampling_rate=pp.sampling_rate,
            mel_fmin=pp.mel_fmin,
            mel_fmax=pp.mel_fmax,
        )
        self.kaldi = KaldiFbank() if "kaldi_fbank" in cfg.add_ons else None
        from audioldm2_tpu.pipeline import _t5_max_length

        self.t5_tok = text_utils.t5_tokenizer(_t5_max_length(model_cfg))
        self.clap_tok = text_utils.roberta_tokenizer()
        self.segment_samples = int(cfg.duration * pp.sampling_rate)
        self.target_frames = int(
            cfg.duration * model_cfg.latent_t_per_second * model_cfg.vae.downsample_factor
        )

    def __len__(self) -> int:
        return len(self.data)

    def _load_example(self, entry: Dict) -> Dict:
        wav_path = entry.get("wav") or entry.get("file_path")
        wav = read_wav_file(
            wav_path, None, target_sr=self.model_cfg.preprocessing.sampling_rate
        )[0]
        if self.cfg.random_segment and wav.shape[-1] > self.segment_samples:
            start = self.rng.randint(0, wav.shape[-1] - self.segment_samples)
            wav = wav[start : start + self.segment_samples]
        if wav.shape[-1] < self.segment_samples:
            wav = np.pad(wav, (0, self.segment_samples - wav.shape[-1]))

        caption = entry.get("caption") or entry.get("text") or ""
        fbank = np.asarray(
            self.mel.fbank(wav[None], target_length=self.target_frames)
        )[0]
        out = {
            "fbank": fbank[..., None],  # [T, M, 1]
            "waveform": wav,
            "text": caption,
        }
        if self.kaldi is not None:
            out["ta_kaldi_fbank"] = np.asarray(
                self.kaldi.normalized(wav[None], target_length=1024)
            )[0]
        if "phoneme_and_text" in self.cfg.add_ons:
            transcription = entry.get("transcription", "")
            phonemes = (
                text_utils.text_to_phonemes(transcription) if transcription else ""
            )
            out["phoneme_idx"] = text_utils.phoneme_ids([phonemes])[0]
        return out

    def example(self, index: int, max_retries: int = 10) -> Dict:
        """Retry-on-corrupt-file loop (reference dataset.py:129-153)."""
        for attempt in range(max_retries):
            entry = self.data[(index + attempt) % len(self.data)]
            try:
                return self._load_example(entry)
            except Exception as e:  # noqa: BLE001 — skip unreadable files
                print(f"WARNING: skipping {entry.get('wav')}: {e}")
        raise RuntimeError(f"no readable file near index {index}")

    def batches(self, batch_size: int, shuffle: bool = True) -> Iterator[Dict]:
        """Yields model-ready batch dicts (tokenized text included)."""
        order = list(range(len(self.data)))
        while True:
            if shuffle:
                self.rng.shuffle(order)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                examples = [self.example(j) for j in order[i : i + batch_size]]
                yield self.collate(examples)

    def collate(self, examples: List[Dict]) -> Dict:
        batch: Dict = {}
        for key in ("fbank", "waveform", "ta_kaldi_fbank", "phoneme_idx"):
            if key in examples[0]:
                batch[key] = np.stack([e[key] for e in examples])
        texts = [e["text"] for e in examples]
        batch["text"] = texts
        ids, mask = self.t5_tok(texts)
        uids, umask = self.t5_tok([""])
        batch.update(t5_ids=ids, t5_mask=mask, t5_uncond_ids=uids, t5_uncond_mask=umask)
        ids, mask = self.clap_tok(texts)
        uids, umask = self.clap_tok([""])
        batch.update(
            clap_ids=ids, clap_mask=mask, clap_uncond_ids=uids, clap_uncond_mask=umask
        )
        return batch


class BalancedSampler:
    """Class-balanced index sampler (reference utilities/sampler.py:47-588
    family, reduced to its inference-relevant core): entries carry optional
    "labels"; sampling weight is inversely proportional to label frequency."""

    def __init__(self, entries: List[Dict], seed: int = 0):
        import collections

        self.rng = np.random.default_rng(seed)
        freq: Dict = collections.Counter()
        self.labels = []
        for e in entries:
            label = e.get("labels") or e.get("label") or ""
            label = label.split(",")[0] if isinstance(label, str) else str(label)
            self.labels.append(label)
            freq[label] += 1
        self.weights = np.asarray(
            [1.0 / freq[label] for label in self.labels], np.float64
        )
        self.weights /= self.weights.sum()

    def sample(self, n: int) -> np.ndarray:
        return self.rng.choice(len(self.labels), size=n, p=self.weights)
