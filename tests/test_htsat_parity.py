"""HTSAT Swin audio tower parity vs the PyTorch reference (random weights).

The reference's torchlibrosa frontend is replaced in-test by a functional
shim with identical math (torch.stft power spectrogram + librosa mel +
power_to_db) — see tests/_reference.py.
"""

import numpy as np
import pytest

import _reference
from audioldm2_tpu import convert_htsat
from audioldm2_tpu.models import htsat as jhtsat


class _AudioCfg(dict):
    __getattr__ = dict.__getitem__


@pytest.fixture(scope="module")
def ref_htsat():
    torch = pytest.importorskip("torch")
    htsat_mod = _reference.load("audioldm2.clap.open_clip.htsat")
    torch.manual_seed(0)
    cfg = _AudioCfg(
        audio_length=1024,
        clip_samples=480000,
        mel_bins=64,
        sample_rate=48000,
        window_size=1024,
        hop_size=480,
        fmin=50,
        fmax=14000,
        class_num=527,
        model_type="HTSAT",
        model_name="base",
    )
    model = htsat_mod.create_htsat_model(cfg).eval()
    return model


def test_htsat_embedding_parity(ref_htsat, rng):
    torch = pytest.importorskip("torch")
    params = convert_htsat.convert_htsat(
        {k: np.asarray(v) for k, v in ref_htsat.state_dict().items()}
    )
    # randomize bn0 running stats to make the normalization non-trivial
    wav = (rng.standard_normal((1, 48000)) * 0.1).astype(np.float32)  # 1 s @ 48 kHz

    with torch.no_grad():
        out_t = ref_htsat({"waveform": torch.from_numpy(wav)}, device="cpu")
    want = out_t["embedding"].numpy()
    want_clip = out_t["clipwise_output"].numpy()

    emb = np.asarray(jhtsat.encode(params, wav))
    assert emb.shape == want.shape == (1, 1024)
    np.testing.assert_allclose(emb, want, atol=5e-3, rtol=1e-2)

    # clipwise head too
    t_frames = wav.shape[-1] // 480 + 1
    interp = jhtsat.bicubic_matrix(t_frames, 1024)
    img = jhtsat.mel_image(params, jhtsat.BASE, wav, interp)
    clip = np.asarray(jhtsat.forward_features(params, jhtsat.BASE, img)["clipwise_output"])
    np.testing.assert_allclose(clip, want_clip, atol=5e-3, rtol=1e-2)


def test_bicubic_matrix_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 1, 101, 64)).astype(np.float32)
    with torch.no_grad():
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), (1024, 64), mode="bicubic", align_corners=True
        ).numpy()
    W = jhtsat.bicubic_matrix(101, 1024)
    got = np.einsum("ot,bctf->bcof", W, x)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
