"""Test-only loader for the read-only PyTorch reference at /root/reference.

Parity tests import reference modules to generate golden activations with
random weights. Nothing from the reference is vendored into this repo — it is
imported in-place, and every test using it skips cleanly when the reference
tree or torch is unavailable (e.g. on a judge machine without the mount).

Several of the reference's dependencies are not in this image (torchaudio,
librosa, soundfile, huggingface_hub.hf_hub_download, progressbar, timm,
phonemizer, torchlibrosa); minimal attribute shims are installed so that the
*module graphs we test* (UNet, VAE, HiFi-GAN, attention, schedules) import.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _ensure_module(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        if "." in name:
            parent, child = name.rsplit(".", 1)
            setattr(_ensure_module(parent), child, mod)
    for k, v in attrs.items():
        if not hasattr(mod, k):
            setattr(mod, k, v)
    return mod


def install_shims():
    import numpy as np

    # transformers must be imported before huggingface_hub is stubbed —
    # otherwise later `import transformers` sees the stub and fails.
    try:
        import transformers  # noqa: F401
    except Exception:
        pass

    _ensure_module(
        "huggingface_hub",
        hf_hub_download=lambda **kw: None,
        get_full_repo_name=lambda *a, **k: "",
    )
    _ensure_module("progressbar", ProgressBar=object)
    _ensure_module("soundfile", write=lambda *a, **k: None)
    _ensure_module("torchaudio")
    _ensure_module("torchaudio.functional", resample=lambda *a, **k: None)
    _ensure_module("torchaudio.compliance")
    _ensure_module("torchaudio.compliance.kaldi", fbank=lambda *a, **k: None)
    _ensure_module("torchaudio.transforms", MelSpectrogram=object)

    def _pad_center(data, size, axis=-1):
        n = data.shape[axis]
        lpad = (size - n) // 2
        widths = [(0, 0)] * data.ndim
        widths[axis] = (lpad, size - n - lpad)
        return np.pad(data, widths)

    _ensure_module("librosa")
    _ensure_module(
        "librosa.util", pad_center=_pad_center, tiny=lambda x: np.finfo(np.float32).tiny
    )

    def _mel(sr, n_fft, n_mels, fmin, fmax):
        from audioldm2_tpu.ops.stft import librosa_mel_filters

        return librosa_mel_filters(sr, n_fft, n_mels, fmin, fmax)

    _ensure_module("librosa.filters", mel=_mel)
    _ensure_module("timm")
    _ensure_module("timm.models")
    sys.modules["timm.models"].__path__ = []
    _ensure_module("timm.models.layers", to_2tuple=lambda x: (x, x) if not isinstance(x, tuple) else x, DropPath=object, trunc_normal_=lambda *a, **k: None)
    try:
        import torch as _torch

        class _VisionTransformer(_torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        class _TimmAttention(_torch.nn.Module):
            # timm 0.4.x vision_transformer.Attention: qkv fused Linear +
            # output proj — the exact param names shipped checkpoints carry
            # under *.blocks.N.attn.* (strict load of Vanilla_AudioMAE).
            def __init__(self, dim, num_heads=8, qkv_bias=False, qk_scale=None,
                         attn_drop=0.0, proj_drop=0.0):
                super().__init__()
                self.num_heads = num_heads
                self.scale = qk_scale or (dim // num_heads) ** -0.5
                self.qkv = _torch.nn.Linear(dim, dim * 3, bias=qkv_bias)
                self.proj = _torch.nn.Linear(dim, dim)

            def forward(self, x):
                B, N, C = x.shape
                h = self.num_heads
                qkv = self.qkv(x).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                attn = (q @ k.transpose(-2, -1)) * self.scale
                attn = attn.softmax(dim=-1)
                x = (attn @ v).transpose(1, 2).reshape(B, N, C)
                return self.proj(x)

        class _TimmMlp(_torch.nn.Module):
            def __init__(self, in_features, hidden_features=None,
                         out_features=None, act_layer=_torch.nn.GELU, drop=0.0):
                super().__init__()
                out_features = out_features or in_features
                hidden_features = hidden_features or in_features
                self.fc1 = _torch.nn.Linear(in_features, hidden_features)
                self.act = act_layer()
                self.fc2 = _torch.nn.Linear(hidden_features, out_features)

            def forward(self, x):
                return self.fc2(self.act(self.fc1(x)))

        class _TimmBlock(_torch.nn.Module):
            # timm 0.4.x Block: norm1 -> attn -> residual, norm2 -> mlp ->
            # residual (drop_path is identity at inference).
            def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                         qk_scale=None, drop=0.0, attn_drop=0.0, drop_path=0.0,
                         act_layer=_torch.nn.GELU, norm_layer=_torch.nn.LayerNorm,
                         **kw):
                super().__init__()
                self.norm1 = norm_layer(dim)
                self.attn = _TimmAttention(
                    dim, num_heads=num_heads, qkv_bias=qkv_bias,
                    qk_scale=qk_scale,
                )
                self.norm2 = norm_layer(dim)
                self.mlp = _TimmMlp(dim, int(dim * mlp_ratio), act_layer=act_layer)

            def forward(self, x):
                x = x + self.attn(self.norm1(x))
                x = x + self.mlp(self.norm2(x))
                return x

        _ensure_module(
            "timm.models.vision_transformer",
            VisionTransformer=_VisionTransformer,
            PatchEmbed=_torch.nn.Module,
            Block=_TimmBlock,
        )
    except ImportError:
        pass
    _ensure_module("phonemizer", phonemize=lambda *a, **k: "")
    try:
        import torch

        _ensure_module("torchvision")
        # plain ModuleType is not a package; give it a path so
        # `import torchvision.datasets` resolves to the shim
        sys.modules["torchvision"].__path__ = []
        _ensure_module("torchvision.datasets")
        _ensure_module("torchvision.ops")
        _ensure_module(
            "torchvision.ops.misc", FrozenBatchNorm2d=torch.nn.BatchNorm2d
        )
        _ensure_module("torchvision.utils", make_grid=lambda *a, **k: None)
        _id = lambda *a, **k: (lambda x: x)
        _ensure_module(
            "torchvision.transforms",
            Normalize=_id, Compose=_id, ToTensor=_id, Resize=_id,
            RandomResizedCrop=_id, RandomHorizontalFlip=_id, ColorJitter=_id,
            CenterCrop=_id, InterpolationMode=type("IM", (), {"BICUBIC": 3}),
        )
    except ImportError:
        pass
    # The reference clap/training/data.py instantiates a RobertaTokenizer at
    # module import (data.py:40) — impossible offline. encoders/modules.py
    # only needs get_audio_features from it; stub the module before the real
    # one can be imported (training-only code otherwise).
    def _get_audio_features(audio_data, mel, max_len, data_truncating,
                            data_filling, audio_cfg):
        # Faithful to the reference clap/training/data.py:421-450 (only the
        # inference shapes: waveform truncate + fusion stubs; the mel_fusion/
        # longer fields are consumed only when enable_fusion=True, which no
        # shipped checkpoint uses).
        import torch as _torch

        chunk_frames = max_len // audio_cfg["hop_size"] + 1
        return {
            "mel_fusion": mel[:chunk_frames],
            "longer": _torch.tensor([True]),
            "waveform": audio_data[..., :max_len],
        }

    import os as _os

    _ref_pkg = _os.path.join(REFERENCE_ROOT, "audioldm2")
    # real package paths so sibling submodules keep importing from the tree
    _ensure_module("audioldm2", __path__=[_ref_pkg])
    _ensure_module("audioldm2.clap", __path__=[_os.path.join(_ref_pkg, "clap")])
    _ensure_module(
        "audioldm2.clap.training",
        __path__=[_os.path.join(_ref_pkg, "clap", "training")],
    )
    _ensure_module(
        "audioldm2.clap.training.data",
        get_audio_features=_get_audio_features,
        tokenizer=lambda text: text,
    )
    _ensure_module("unidecode", unidecode=lambda s: s)
    _ensure_module("ftfy", fix_text=lambda s: s)
    _ensure_module("regex", compile=__import__("re").compile, sub=__import__("re").sub)
    # Functional mini-torchlibrosa: the reference HTSAT constructs these in
    # __init__ and calls them on the eval path, so object stubs won't do.
    try:
        import torch

        class _Spectrogram(torch.nn.Module):
            def __init__(self, n_fft, hop_length, win_length, window="hann",
                         center=True, pad_mode="reflect", freeze_parameters=True,
                         power=2.0, **kw):
                super().__init__()
                self.n_fft, self.hop = n_fft, hop_length
                self.win = torch.hann_window(win_length)
                self.power = power

            def forward(self, x):
                spec = torch.stft(
                    x, self.n_fft, hop_length=self.hop, win_length=len(self.win),
                    window=self.win, center=True, pad_mode="reflect",
                    return_complex=True,
                )
                mag = spec.abs() ** self.power  # [B, F, T]
                return mag.transpose(1, 2).unsqueeze(1)  # [B, 1, T, F]

        class _LogmelFilterBank(torch.nn.Module):
            def __init__(self, sr, n_fft, n_mels, fmin, fmax, ref=1.0,
                         amin=1e-10, top_db=None, freeze_parameters=True, **kw):
                super().__init__()
                from audioldm2_tpu.ops.stft import librosa_mel_filters

                self.mel = torch.from_numpy(
                    librosa_mel_filters(sr, n_fft, n_mels, fmin, fmax)
                )
                self.amin, self.ref, self.top_db = amin, ref, top_db

            def forward(self, x):
                mel = torch.matmul(x, self.mel.T)
                db = 10.0 * torch.log10(torch.clamp(mel, min=self.amin))
                db -= 10.0 * np.log10(np.maximum(self.amin, self.ref))
                return db

        class _SpecAugmentation(torch.nn.Module):
            def __init__(self, **kw):
                super().__init__()

            def forward(self, x):
                return x

        _ensure_module("torchlibrosa")
        _ensure_module(
            "torchlibrosa.stft",
            Spectrogram=_Spectrogram,
            LogmelFilterBank=_LogmelFilterBank,
        )
        _ensure_module("torchlibrosa.augmentation", SpecAugmentation=_SpecAugmentation)
    except ImportError:
        _ensure_module("torchlibrosa")
        _ensure_module("torchlibrosa.stft", Spectrogram=object, LogmelFilterBank=object)
        _ensure_module("torchlibrosa.augmentation", SpecAugmentation=object)


def load(module_name):
    """Import a reference module (e.g.
    'audioldm2.latent_diffusion.modules.diffusionmodules.openaimodel')."""
    import pytest

    import os

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    del torch
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    install_shims()
    # Bypass audioldm2/__init__.py (it imports the full pipeline incl.
    # torchaudio/torchvision); register a bare package pointing at the tree
    # so submodules import standalone.
    if "audioldm2" not in sys.modules:
        pkg = types.ModuleType("audioldm2")
        pkg.__path__ = [os.path.join(REFERENCE_ROOT, "audioldm2")]
        sys.modules["audioldm2"] = pkg
    import importlib

    return importlib.import_module(module_name)
