"""CLAP: contrastive language-audio embeddings — functional JAX.

Re-design of the reference CLAP wrapper + open_clip model (reference
``encoders/modules.py:546-745``, ``clap/open_clip/model.py:419-778``):
RoBERTa text tower -> pooler -> MLP projection -> L2 normalize (512-d joint
space); HTSAT Swin audio tower -> MLP projection -> normalize. Unlike the
reference — which pins CLAP to the CPU (modules.py:560) and pulls waveforms
back to host for reranking — everything here runs on device inside the
jitted program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audioldm2_tpu.config import CLAPConfig
from audioldm2_tpu.models import roberta as roberta_m
from audioldm2_tpu.ops import nn

ROBERTA = roberta_m.RobertaConfig()


def init_clap(key, cfg: CLAPConfig):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "text_branch": roberta_m.init_roberta(k1, ROBERTA),
        "text_projection": {
            "lin1": nn.linear_init(k2, ROBERTA.hidden_size, cfg.embed_dim),
            "lin2": nn.linear_init(k3, cfg.embed_dim, cfg.embed_dim),
        },
        "audio_projection": {
            # HTSAT-base latent embedding is 1024-d (HTSAT-base.json embed_dim)
            "lin1": nn.linear_init(k4, 1024, cfg.embed_dim),
            "lin2": nn.linear_init(k5, cfg.embed_dim, cfg.embed_dim),
        },
        "logit_scale_a": jnp.asarray(np.log(1 / 0.07), jnp.float32),
        "logit_scale_t": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }
    try:
        from audioldm2_tpu.models import htsat

        params["audio_branch"] = htsat.init_htsat(jax.random.fold_in(key, 7))
    except (ImportError, AttributeError):
        params["audio_branch"] = None
    return params


def _project(p, x):
    return nn.linear(p["lin2"], jax.nn.relu(nn.linear(p["lin1"], x)))


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


def text_embedding(params, cfg: CLAPConfig, input_ids, attention_mask):
    """RoBERTa pooler -> MLP projection -> L2 norm. Returns [B, 1, 512]
    (the reference returns embed.unsqueeze(1), modules.py:730)."""
    _, pooled = roberta_m.apply_roberta(
        params["text_branch"], ROBERTA, input_ids, attention_mask
    )
    emb = _normalize(_project(params["text_projection"], pooled))
    return emb[:, None, :]


def audio_embedding(params, cfg: CLAPConfig, waveform_48k):
    """HTSAT embedding -> MLP projection -> L2 norm. waveform_48k: [B, N]."""
    from audioldm2_tpu.models import htsat

    feats = htsat.encode(params["audio_branch"], waveform_48k)
    return _normalize(_project(params["audio_projection"], feats))


def cos_similarity(audio_emb, text_emb):
    """Row-wise cosine similarity of already-normalized embeddings
    (reference modules.py:639-653)."""
    a = audio_emb.reshape(audio_emb.shape[0], -1)
    t = text_emb.reshape(text_emb.shape[0], -1)
    return jnp.sum(_normalize(a) * _normalize(t), axis=-1)


def cos_similarity_waveform_text(params, cfg, wav, text, tokenizer, sampling_rate):
    """Host-coordinated rerank scorer: resample to 48k, embed audio + text,
    cosine similarity. Returns np.ndarray [B]."""
    from audioldm2_tpu.utils.audio_io import resample

    wav = np.asarray(wav)
    if wav.ndim == 3:
        wav = wav[:, 0]
    wav48 = resample(wav, sampling_rate, 48000)
    clip = cfg.clip_samples
    if wav48.shape[-1] < clip:
        # "repeatpad" data_filling (reference clap/training/data.py:421-450):
        # tile the clip as many whole times as fits, zero-pad the rest
        n_repeat = max(1, clip // wav48.shape[-1])
        wav48 = np.tile(wav48, (1, n_repeat))
        wav48 = np.pad(wav48, ((0, 0), (0, clip - wav48.shape[-1])))
    else:
        wav48 = wav48[:, :clip]
    a = audio_embedding(params, cfg, jnp.asarray(wav48))
    ids, mask = tokenizer([text] * wav.shape[0])
    t = text_embedding(params, cfg, ids, mask)[:, 0]
    return np.asarray(cos_similarity(a, t))


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
