"""Conditioning stack: typed registry of conditioner implementations.

Replaces the reference's reflection-driven ``cond_stage_config`` plugin
system (reference ``ddpm.py:779-791``, ``encoders/modules.py``) with a typed
registry keyed by :class:`~audioldm2_tpu.config.ConditionerSpec.kind`. Every
conditioner is a pure device function over a dict of pre-tokenized host
arrays, so the whole conditioning pass jits into one XLA program.

Contract (mirrors reference encoders/modules.py:17-27): each conditioner
produces either
    ("film", emb [B, D])                       — concatenated into UNet y
    ("crossattn", (ctx [B, L, D], mask [B, L])) — one UNet context slot
and must provide an unconditional variant for classifier-free guidance.

Batch array keys (produced host-side by the pipeline):
    t5_ids/t5_mask           [B, 128]  — FLAN-T5 tokenization of the prompt
    t5_uncond_ids/t5_uncond_mask [1, 128] — tokenization of ""
    clap_ids/clap_mask       [B, 512]  — RoBERTa tokenization (CLAP text)
    clap_uncond_ids/clap_uncond_mask [1, 512]
    phoneme_idx              [B, 310]  — VITS phoneme ids
    ta_kaldi_fbank           [B, 1024, 128] — kaldi fbank (AudioMAE input)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from audioldm2_tpu.config import ConditionerSpec
from audioldm2_tpu.models import t5 as t5_model


def _tile(x, n):
    return jnp.concatenate([x] * n, axis=0) if n > 1 else x


# ---------------------------------------------------------------------------
# FLAN-T5 (reference encoders/modules.py:113-198)
# ---------------------------------------------------------------------------


def _t5_init(key, spec: ConditionerSpec):
    return {"t5": t5_model.init_t5_encoder(key, spec.flan_t5)}


def _t5_encode(params, spec: ConditionerSpec, batch):
    ctx = t5_model.apply_t5_encoder(
        params["t5"], spec.flan_t5, batch["t5_ids"], batch["t5_mask"]
    )
    return ("crossattn", (ctx, batch["t5_mask"].astype(jnp.float32)))


def _t5_uncond(params, spec: ConditionerSpec, batch, batchsize):
    ctx = t5_model.apply_t5_encoder(
        params["t5"], spec.flan_t5, batch["t5_uncond_ids"], batch["t5_uncond_mask"]
    )
    return (
        "crossattn",
        (
            _tile(ctx, batchsize),
            _tile(batch["t5_uncond_mask"].astype(jnp.float32), batchsize),
        ),
    )


# ---------------------------------------------------------------------------
# AudioMAE pooled (reference encoders/modules.py:427-543) — model lands with
# audiomae.py; the unconditional branch (zeros + ones mask) is model-free.
# ---------------------------------------------------------------------------


def _audiomae_token_num(spec: ConditionerSpec) -> int:
    tp = min(spec.audiomae.eval_time_pooling, 64)
    fp = min(spec.audiomae.eval_freq_pooling, 8)
    return int(512 / (tp * fp))


def _audiomae_init(key, spec: ConditionerSpec):
    from audioldm2_tpu.models import audiomae as mae_model

    return {"audiomae": mae_model.init_audiomae(key, spec.audiomae)}


def _audiomae_encode(params, spec: ConditionerSpec, batch):
    from audioldm2_tpu.models import audiomae as mae_model

    tokens = mae_model.encode_no_mask(
        params["audiomae"], spec.audiomae, batch["ta_kaldi_fbank"]
    )
    pooled = mae_model.avg_max_pool(tokens, spec.audiomae)
    if spec.audiomae.regularization:
        pooled = mae_model.l2_regularize(pooled)
    b, n = pooled.shape[0], pooled.shape[1]
    return ("crossattn", (pooled, jnp.ones((b, n), jnp.float32)))


def _audiomae_uncond(params, spec: ConditionerSpec, batch, batchsize):
    n = _audiomae_token_num(spec)
    return (
        "crossattn",
        (
            jnp.zeros((batchsize, n, 768), jnp.float32),
            jnp.ones((batchsize, n), jnp.float32),
        ),
    )


# ---------------------------------------------------------------------------
# CLAP text embedding (film) (reference encoders/modules.py:546-745)
# ---------------------------------------------------------------------------


def _clap_init(key, spec: ConditionerSpec):
    from audioldm2_tpu.models import clap as clap_model

    return {"clap": clap_model.init_clap(key, spec.clap)}


def _clap_encode(params, spec: ConditionerSpec, batch):
    from audioldm2_tpu.models import clap as clap_model

    if spec.clap.embed_mode == "audio":
        # reference modules.py:689-716: embed the conditioning waveform
        # (host-prepared to one 48 kHz clip, batch key ``clap_waveform_48k``)
        # through the audio tower. Unconditional stays the ""-text embedding
        # in both modes (reference build_unconditional_emb, modules.py:732).
        emb = clap_model.audio_embedding(
            params["clap"], spec.clap, batch["clap_waveform_48k"]
        )
        return ("film", emb)
    emb = clap_model.text_embedding(
        params["clap"], spec.clap, batch["clap_ids"], batch["clap_mask"]
    )
    return ("film", emb)


def _clap_uncond(params, spec: ConditionerSpec, batch, batchsize):
    from audioldm2_tpu.models import clap as clap_model

    emb = clap_model.text_embedding(
        params["clap"], spec.clap, batch["clap_uncond_ids"], batch["clap_uncond_mask"]
    )
    return ("film", _tile(emb, batchsize))


# ---------------------------------------------------------------------------
# VITS phoneme encoder (reference encoders/modules.py:30-110)
# ---------------------------------------------------------------------------


def _phoneme_init(key, spec: ConditionerSpec):
    from audioldm2_tpu.models import phoneme as ph_model

    return ph_model.init_phoneme_encoder(key, spec.phoneme)


def _phoneme_encode(params, spec: ConditionerSpec, batch):
    from audioldm2_tpu.models import phoneme as ph_model

    ctx, mask = ph_model.apply_phoneme_encoder(params, spec.phoneme, batch["phoneme_idx"])
    return ("crossattn", (ctx, mask))


def _phoneme_uncond(params, spec: ConditionerSpec, batch, batchsize):
    from audioldm2_tpu.models import phoneme as ph_model

    pad = jnp.full((batchsize, spec.phoneme.pad_length), spec.phoneme.pad_token_id, jnp.int32)
    ctx, mask = ph_model.apply_phoneme_encoder(params, spec.phoneme, pad)
    return ("crossattn", (ctx, mask))


# ---------------------------------------------------------------------------
# GPT-2 sequence generator (reference encoders/modules.py:201-300,
# audiomae_gen/sequence_input.py)
# ---------------------------------------------------------------------------


def _seqgen_init(key, spec: ConditionerSpec):
    from audioldm2_tpu.models import sequence_gen as sg

    return sg.init_sequence_gen(key, spec)


def _seqgen_encode(params, spec: ConditionerSpec, batch):
    from audioldm2_tpu.models import sequence_gen as sg

    tokens = sg.generate(params, spec, batch)
    b, n = tokens.shape[0], tokens.shape[1]
    return ("crossattn", (tokens, jnp.ones((b, n), jnp.float32)))


def _seqgen_uncond(params, spec: ConditionerSpec, batch, batchsize):
    # reference get_unconditional_condition (modules.py:263-269): zeros of the
    # nested audiomae-pooled token count with an all-ones mask
    n = spec.sequence_gen.sequence_gen_length
    return (
        "crossattn",
        (
            jnp.zeros((batchsize, n, 768), jnp.float32),
            jnp.ones((batchsize, n), jnp.float32),
        ),
    )


REGISTRY = {
    "flan_t5": (_t5_init, _t5_encode, _t5_uncond),
    "audiomae_pooled": (_audiomae_init, _audiomae_encode, _audiomae_uncond),
    "clap": (_clap_init, _clap_encode, _clap_uncond),
    "phoneme": (_phoneme_init, _phoneme_encode, _phoneme_uncond),
    "sequence_gen": (_seqgen_init, _seqgen_encode, _seqgen_uncond),
}


def init_conditioner(key, spec: ConditionerSpec):
    return REGISTRY[spec.kind][0](key, spec)


def encode(params, spec: ConditionerSpec, batch) -> Tuple[str, object]:
    return REGISTRY[spec.kind][1](params, spec, batch)


def unconditional(params, spec: ConditionerSpec, batch, batchsize) -> Tuple[str, object]:
    return REGISTRY[spec.kind][2](params, spec, batch, batchsize)
