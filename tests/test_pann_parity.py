"""PANN CNN14/CNN10 parity vs the PyTorch reference (random weights)."""

import numpy as np
import pytest

import _reference
from audioldm2_tpu import convert
from audioldm2_tpu.models import pann as jpann


def _params_from_ref(ref, n_blocks):
    sd = convert.state_dict_to_numpy(ref.state_dict())
    params = {
        "bn0": {
            "scale": sd["bn0.weight"], "bias": sd["bn0.bias"],
            "mean": sd["bn0.running_mean"], "var": sd["bn0.running_var"],
        },
        "blocks": [],
        "fc1": convert.linear_p(sd, "fc1"),
        "fc_audioset": convert.linear_p(sd, "fc_audioset"),
    }
    for i in range(1, n_blocks + 1):
        bp = f"conv_block{i}"
        params["blocks"].append(
            {
                "conv1": {"w": sd[f"{bp}.conv1.weight"].transpose(2, 3, 1, 0)},
                "bn1": {
                    "scale": sd[f"{bp}.bn1.weight"], "bias": sd[f"{bp}.bn1.bias"],
                    "mean": sd[f"{bp}.bn1.running_mean"], "var": sd[f"{bp}.bn1.running_var"],
                },
                "conv2": {"w": sd[f"{bp}.conv2.weight"].transpose(2, 3, 1, 0)},
                "bn2": {
                    "scale": sd[f"{bp}.bn2.weight"], "bias": sd[f"{bp}.bn2.bias"],
                    "mean": sd[f"{bp}.bn2.running_mean"], "var": sd[f"{bp}.bn2.running_var"],
                },
            }
        )
    return params


def test_cnn10_embedding_parity(rng):
    torch = pytest.importorskip("torch")
    pann_mod = _reference.load("audioldm2.clap.open_clip.pann_model")
    torch.manual_seed(0)
    cfg = jpann.PANNConfig(variant="cnn10", embed_dim=1024)
    ref = pann_mod.Cnn10(
        sample_rate=cfg.sample_rate,
        window_size=cfg.window_size,
        hop_size=cfg.hop_size,
        mel_bins=cfg.mel_bins,
        fmin=cfg.fmin,
        fmax=cfg.fmax,
        classes_num=cfg.num_classes,
    ).eval()
    params = _params_from_ref(ref, 5)

    wav = (rng.standard_normal((1, 48000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        # Cnn10.forward takes the raw waveform tensor (pann_model.py:625)
        out_t = ref(torch.from_numpy(wav), device="cpu")
    got = jpann.encode(params, wav, cfg)
    np.testing.assert_allclose(
        np.asarray(got["embedding"]), out_t["embedding"].numpy(), atol=5e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(got["clipwise_output"]), out_t["clipwise_output"].numpy(),
        atol=1e-3, rtol=1e-2,
    )


def test_cnn14_embedding_parity(rng):
    torch = pytest.importorskip("torch")
    pann_mod = _reference.load("audioldm2.clap.open_clip.pann_model")
    torch.manual_seed(0)
    cfg = jpann.PANNConfig()
    ref = pann_mod.Cnn14(
        sample_rate=cfg.sample_rate,
        window_size=cfg.window_size,
        hop_size=cfg.hop_size,
        mel_bins=cfg.mel_bins,
        fmin=cfg.fmin,
        fmax=cfg.fmax,
        classes_num=cfg.num_classes,
    ).eval()

    params = _params_from_ref(ref, 6)

    wav = (rng.standard_normal((1, 48000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        out_t = ref({"waveform": torch.from_numpy(wav)}, device="cpu")
    got = jpann.encode(params, wav, cfg)
    np.testing.assert_allclose(
        np.asarray(got["embedding"]), out_t["embedding"].numpy(), atol=5e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(got["clipwise_output"]), out_t["clipwise_output"].numpy(),
        atol=1e-3, rtol=1e-2,
    )
