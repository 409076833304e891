"""CLAP: contrastive language-audio embeddings — functional JAX.

Re-design of the reference CLAP wrapper + open_clip model (reference
``encoders/modules.py:546-745``, ``clap/open_clip/model.py:419-778``):
config-selectable audio tower (HTSAT Swin variants / PANN CNNs) and text
tower (RoBERTa / BERT / BART / CLIP transformer), each projected through a
2-layer MLP into the 512-d joint space and L2-normalized. The tower
registry replaces the reference's JSON model-config registry
(``clap/open_clip/factory.py:23-50`` + ``model_configs/*.json``); variants
are selected by ``CLAPConfig.amodel`` / ``CLAPConfig.tmodel``.

Unlike the reference — which pins CLAP to the CPU (modules.py:560) and
pulls waveforms back to host for reranking — everything here runs on device
inside the jitted program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audioldm2_tpu.config import CLAPConfig
from audioldm2_tpu.models import clip_text as clip_m
from audioldm2_tpu.models import roberta as roberta_m
from audioldm2_tpu.ops import nn

# ---------------------------------------------------------------------------
# Tower registries (reference clap/open_clip/factory.py:23-50 JSON registry;
# HTSAT size variants htsat.py:1257-1299; PANN variants pann_model.py:167+).
# Audio entry: (lazy config thunk, embedding width feeding audio_projection).
# Tests may register tiny variants via register_audio_tower/register_text_tower.
# ---------------------------------------------------------------------------


def _htsat_cfg(**kw):
    from audioldm2_tpu.models import htsat

    return htsat.HTSATConfig(**kw)


def _pann_cfg(**kw):
    from audioldm2_tpu.models import pann

    return pann.PANNConfig(**kw)


AUDIO_TOWERS: Dict[str, Tuple[object, int]] = {
    # name: (config factory, embedding width)
    "HTSAT-tiny": (lambda: _htsat_cfg(embed_dim=96, depths=(2, 2, 6, 2)), 768),
    "HTSAT-base": (lambda: _htsat_cfg(), 1024),
    "HTSAT-large": (lambda: _htsat_cfg(embed_dim=256), 2048),
    "PANN-14": (lambda: _pann_cfg(), 2048),
    "PANN-10": (lambda: _pann_cfg(variant="cnn10", embed_dim=1024), 1024),
}

TEXT_TOWERS: Dict[str, Tuple[object, int]] = {
    # name: (config factory, projection input width — reference model.py:485-545)
    "roberta": (lambda: roberta_m.RobertaConfig(), 768),
    "bert": (
        lambda: roberta_m.RobertaConfig(
            vocab_size=30522, max_position_embeddings=512, type_vocab_size=2,
            pad_token_id=0,
        ),
        768,
    ),
    "bart": (lambda: roberta_m.RobertaConfig(max_position_embeddings=1026), 768),
    "transformer": (lambda: clip_m.CLIPTextConfig(), 512),
}


def register_audio_tower(name: str, cfg_factory, width: int):
    AUDIO_TOWERS[name] = (cfg_factory, width)


def register_text_tower(name: str, cfg_factory, width: int):
    TEXT_TOWERS[name] = (cfg_factory, width)


def audio_tower(cfg: CLAPConfig):
    factory, width = AUDIO_TOWERS[cfg.amodel]
    return factory(), width


def text_tower(cfg: CLAPConfig):
    factory, width = TEXT_TOWERS[cfg.tmodel]
    return factory(), width


# ---------------------------------------------------------------------------


def init_clap(key, cfg: CLAPConfig):
    k1, k2, k3, k4, k5, k6, k7, k8, k9, k10 = nn.split_keys(key, 10)
    tcfg, twidth = text_tower(cfg)
    acfg, awidth = audio_tower(cfg)
    if cfg.tmodel == "transformer":
        text_branch = clip_m.init_clip_text(k1, tcfg)
    else:
        text_branch = roberta_m.init_roberta(k1, tcfg)
    if cfg.amodel.startswith("HTSAT"):
        from audioldm2_tpu.models import htsat

        audio_branch = htsat.init_htsat(k6, acfg)
    else:
        from audioldm2_tpu.models import pann

        audio_branch = pann.init_pann(k6, acfg)
    return {
        "text_branch": text_branch,
        "text_projection": {
            "lin1": nn.linear_init(k2, twidth, cfg.embed_dim),
            "lin2": nn.linear_init(k3, cfg.embed_dim, cfg.embed_dim),
        },
        "audio_projection": {
            "lin1": nn.linear_init(k4, awidth, cfg.embed_dim),
            "lin2": nn.linear_init(k5, cfg.embed_dim, cfg.embed_dim),
        },
        # contrastive mlp_loss heads (reference model.py:485-545,714-716)
        "text_transform": {
            "lin1": nn.linear_init(k7, cfg.embed_dim, cfg.embed_dim),
            "lin2": nn.linear_init(k8, cfg.embed_dim, cfg.embed_dim),
        },
        "audio_transform": {
            "lin1": nn.linear_init(k9, cfg.embed_dim, cfg.embed_dim),
            "lin2": nn.linear_init(k10, cfg.embed_dim, cfg.embed_dim),
        },
        "logit_scale_a": jnp.asarray(np.log(1 / 0.07), jnp.float32),
        "logit_scale_t": jnp.asarray(np.log(1 / 0.07), jnp.float32),
        "audio_branch": audio_branch,
    }


def _project(p, x):
    return nn.linear(p["lin2"], jax.nn.relu(nn.linear(p["lin1"], x)))


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


def text_embedding(params, cfg: CLAPConfig, input_ids, attention_mask):
    """Text tower -> pooling per branch type (reference model.py:629-678)
    -> MLP projection -> L2 norm. Returns [B, 1, 512] (the reference returns
    embed.unsqueeze(1), modules.py:730)."""
    tcfg, _ = text_tower(cfg)
    if cfg.tmodel == "transformer":
        pooled = clip_m.apply_clip_text(params["text_branch"], tcfg, input_ids)
    elif cfg.tmodel == "bert":
        _, pooled = roberta_m.apply_roberta(
            params["text_branch"], tcfg, input_ids, attention_mask, bert_style=True
        )
    elif cfg.tmodel == "bart":
        hidden = roberta_m.apply_bart_encoder(
            params["text_branch"], tcfg, input_ids, attention_mask
        )
        pooled = jnp.mean(hidden, axis=1)
    else:  # roberta
        _, pooled = roberta_m.apply_roberta(
            params["text_branch"], tcfg, input_ids, attention_mask
        )
    emb = _normalize(_project(params["text_projection"], pooled))
    return emb[:, None, :]


def audio_embedding(params, cfg: CLAPConfig, waveform_48k):
    """Audio tower embedding -> MLP projection -> L2 norm. waveform_48k: [B, N]."""
    acfg, _ = audio_tower(cfg)
    if cfg.amodel.startswith("HTSAT"):
        from audioldm2_tpu.models import htsat

        feats = htsat.encode(params["audio_branch"], waveform_48k, acfg)
    else:
        from audioldm2_tpu.models import pann

        feats = pann.encode(params["audio_branch"], waveform_48k, acfg)["embedding"]
    return _normalize(_project(params["audio_projection"], feats))


def cos_similarity(audio_emb, text_emb):
    """Row-wise cosine similarity of already-normalized embeddings
    (reference modules.py:639-653)."""
    a = audio_emb.reshape(audio_emb.shape[0], -1)
    t = text_emb.reshape(text_emb.shape[0], -1)
    return jnp.sum(_normalize(a) * _normalize(t), axis=-1)


def prepare_clap_audio(wav: np.ndarray, orig_sr: int, cfg: CLAPConfig) -> np.ndarray:
    """Host-side waveform prep for the CLAP audio tower: resample to the
    CLAP rate (reference modules.py:700-703) and fit to one clip with the
    "repeatpad" data_filling (reference clap/training/data.py:421-450: tile
    the clip as many whole times as fits, zero-pad the rest).
    wav: [B, N] (or [B, 1, N]) at ``orig_sr`` -> [B, clip_samples] float32."""
    from audioldm2_tpu.utils.audio_io import resample

    wav = np.asarray(wav, np.float32)
    if wav.ndim == 3:
        wav = wav[:, 0]
    wav48 = wav if orig_sr == cfg.sampling_rate else resample(wav, orig_sr, cfg.sampling_rate)
    clip = cfg.clip_samples
    if wav48.shape[-1] < clip:
        n_repeat = max(1, clip // wav48.shape[-1])
        wav48 = np.tile(wav48, (1, n_repeat))
        wav48 = np.pad(wav48, ((0, 0), (0, clip - wav48.shape[-1])))
    else:
        wav48 = wav48[:, :clip]
    return np.ascontiguousarray(wav48, np.float32)


import functools


def resample_poly_jnp(wav, up: int, down: int):
    """Device-side rational polyphase resample, numerically matching the
    host path (utils/native.resample / scipy resample_poly semantics: same
    kaiser-5.0 firwin low-pass, centered, n_out = ceil(n_in * up / down)).

    upfirdn maps 1:1 onto one XLA convolution: ``lhs_dilation=up`` is the
    zero-stuffing, ``window_strides=down`` the decimation — so a 10 s
    16 k -> 48 k resample is a single MXU-friendly conv instead of ~300 ms
    of single-core host FIR. wav: [B, N] -> [B, ceil(N*up/down)]."""
    if up == down:
        return wav
    from audioldm2_tpu.utils.native import _fir_lowpass

    max_rate = max(up, down)
    filt = _fir_lowpass(2 * 10 * max_rate + 1, 1.0 / max_rate) * up
    L = filt.shape[0]
    n_in = wav.shape[-1]
    n_out = -(-n_in * up // down)
    pad_l = (L - 1) // 2
    # dilated length (n_in-1)*up + 1; choose pad_r so the strided conv
    # yields exactly n_out samples
    pad_r = (n_out - 1) * down + L - pad_l - ((n_in - 1) * up + 1)
    out = jax.lax.conv_general_dilated(
        wav[:, None, :].astype(jnp.float32),
        jnp.asarray(filt[::-1].copy(), jnp.float32)[None, None, :],
        window_strides=(down,),
        padding=[(pad_l, pad_r)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, 0, :]


def resample_sinc_jnp(wav, orig_sr: int, target_sr: int):
    """Device-side reference-matching resample (torchaudio sinc_interp_hann
    semantics, the reference's modules.py:700-703): the [n_phase, K] phase
    bank from audio_io.sinc_interp_hann_kernel applied as ONE strided XLA
    conv. wav: [B, N] -> [B, ceil(N*new/orig)]."""
    if orig_sr == target_sr:
        return wav
    from audioldm2_tpu.utils.audio_io import sinc_interp_hann_kernel

    kernel, orig, new, width = sinc_interp_hann_kernel(orig_sr, target_sr)
    n_in = wav.shape[-1]
    n_out = -(-n_in * new // orig)
    n_frames = -(-n_out // new)
    K = kernel.shape[1]
    pad_r = (n_frames - 1) * orig + K - width - n_in
    out = jax.lax.conv_general_dilated(
        wav[:, None, :].astype(jnp.float32),
        jnp.asarray(kernel, jnp.float32)[:, None, :],
        window_strides=(orig,),
        padding=[(width, max(0, pad_r))],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, n_phase, n_frames]
    out = jnp.transpose(out, (0, 2, 1)).reshape(wav.shape[0], -1)
    return out[:, :n_out]


def prepare_clap_audio_jnp(wav, orig_sr: int, cfg: CLAPConfig):
    """Device-side :func:`prepare_clap_audio` (resample + repeatpad clip
    fitting); all lengths are static so it traces into the jitted scorer."""
    wav48 = resample_sinc_jnp(wav, orig_sr, cfg.sampling_rate)
    clip = cfg.clip_samples
    n = wav48.shape[-1]
    if n < clip:
        n_repeat = max(1, clip // n)
        wav48 = jnp.tile(wav48, (1, n_repeat))
        wav48 = jnp.pad(wav48, ((0, 0), (0, clip - wav48.shape[-1])))
    else:
        wav48 = wav48[:, :clip]
    return wav48


@functools.partial(jax.jit, static_argnames=("cfg", "orig_sr"))
def _rerank_score(params, cfg: CLAPConfig, orig_sr: int, wav, ids, mask):
    """Resample + clip prep + audio tower + text tower + cosine similarity
    as ONE program.

    Running the towers eagerly costs seconds on a remote-dispatch setup
    (every op is a separate device call) and the host FIR resample alone
    was ~300 ms; jitted end to end, rerank scoring is ~tens of ms.
    CLAPConfig is a frozen dataclass — hashable, so it keys the jit cache
    per variant."""
    wav48 = prepare_clap_audio_jnp(wav, orig_sr, cfg)
    a = audio_embedding(params, cfg, wav48)
    t = text_embedding(params, cfg, ids, mask)[:, 0]
    return cos_similarity(a, t)


def cos_similarity_waveform_text(params, cfg, wav, text, tokenizer, sampling_rate):
    """Host-coordinated rerank scorer: resample to the CLAP rate, embed audio
    + text, cosine similarity. Returns np.ndarray [B]."""
    wav = np.asarray(wav)
    if wav.ndim == 3:
        wav = wav[:, 0]
    ids, mask = tokenizer([text] * wav.shape[0])
    return np.asarray(
        _rerank_score(
            params, cfg, int(sampling_rate), jnp.asarray(wav),
            jnp.asarray(ids), jnp.asarray(mask),
        )
    )


def sliding_windows(wav: np.ndarray, clip_samples: int, hopsize: int) -> np.ndarray:
    """Long-audio sliding windows (reference model.py:780-836 audio_infer,
    with its latent bugs fixed: hopsize defaults sanely and short audio is
    tiled up to one clip). wav: [N] -> [n_windows, clip_samples]."""
    n = wav.shape[-1]
    k = clip_samples // max(n, 1)
    if k > 1:
        wav = np.tile(wav, k)
        n = wav.shape[-1]
    if n <= clip_samples:
        out = np.zeros((1, clip_samples), wav.dtype)
        out[0, :n] = wav
        return out
    hopsize = min(hopsize, n)
    starts = list(range(0, n - clip_samples, hopsize))
    wins = [wav[p : p + clip_samples] for p in starts]
    wins.append(wav[-clip_samples:])
    return np.stack(wins)


def audio_embedding_long(params, cfg: CLAPConfig, wav, hopsize: int = 240000):
    """Per-window CLAP audio embeddings for audio longer than clip_samples
    (the reference's HTSAT sliding-window path). wav: [N] @ 48 kHz.
    Returns [n_windows, 512]."""
    wins = sliding_windows(np.asarray(wav, np.float32), cfg.clip_samples, hopsize)
    return audio_embedding(params, cfg, jnp.asarray(wins))
