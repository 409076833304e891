"""End-to-end pipeline parity vs the PyTorch reference with SHARED weights.

The offline stand-in for the "spectrogram MAE < 1e-3 vs the reference per
checkpoint" criterion (BASELINE.md): no real ``.pth`` exists in this
zero-egress environment, so instead the reference ``LatentDiffusion`` is
instantiated at production size with random weights (the exact shipped
key layout — a strict-load superset, see tools/key_coverage.py), those
weights are converted through this framework's real converter, and BOTH
pipelines run their own full inference path from the same inputs:

- reference: ``get_input -> filter_useful_cond_dict ->
  sample_log(DDIM, x_T injected, eta=0) -> decode_first_stage ->
  mel_spectrogram_to_waveform`` (the exact ``generate_batch`` sequence,
  reference ``ddpm.py:1477-1553``, minus its ``assert x_T is None``)
- this framework: ``LatentDiffusionModel.generate`` (the single jitted
  prompt->waveform program) with the same ``x_T``, ``compute_dtype``
  forced to float32 for a like-for-like numeric comparison

Tokenization is shared: the reference's offline-dummy HF tokenizers are
replaced with this framework's own (same ids on both sides; the reference
keeps its dynamic ``padding=True`` semantics while this framework runs
fixed-shape padding + masks — so the comparison also proves the masked
cross-attention padding equivalence).

Determinism: eta=0 DDIM has no per-step noise; x_T is injected; every
conditioner of every family is deterministic at inference (T5/CLAP-text/
phoneme encoders, AudioMAE pooling, greedy continuous-embedding GPT-2
generation — reference ``sequence_input.py:311-323``).

Usage: python tools/e2e_parity.py [family ...] [--duration 2.5] [--steps 3]
Writes/merges docs/e2e_parity.json and prints per-family MAEs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

# zero-egress: stop transformers from retrying hub HEAD requests (minutes of
# DNS retries per tokenizer otherwise)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

FAMILIES = [
    "audioldm_16k_crossattn_t5",
    "audioldm_48k",
    "audioldm2-full",
    "audioldm2-speech-gigaspeech",
    "audioldm2-full-large-1150k",
    "audioldm2-music-665k",
    "audioldm2-speech-ljspeech",
]


def _swap_reference_tokenizers(ld):
    """Replace the offline-dummy HF tokenizers inside a freshly built
    reference model with this framework's tokenizers (exact same ids feed
    both pipelines). FlanT5HiddenState calls ``self.tokenizer(...)``
    (modules.py:175-181); CLAP*Freev2 calls ``self.tokenize`` via its
    ``tokenizer`` method (modules.py:737-745)."""
    import numpy as np
    import torch
    from transformers import BatchEncoding

    from audioldm2_tpu.utils import text as text_utils

    class _Wrap:
        model_max_length = 512

        def __init__(self, tok):
            self._tok = tok

        def __call__(self, texts, max_length=None, padding=True,
                     truncation=True, return_tensors="pt", **kw):
            ids, mask = self._tok(list(texts))
            if padding != "max_length":
                longest = max(1, int(mask.sum(axis=1).max()))
                ids, mask = ids[:, :longest], mask[:, :longest]
            if max_length is not None and ids.shape[1] > max_length:
                ids, mask = ids[:, :max_length], mask[:, :max_length]
            return BatchEncoding(
                {
                    "input_ids": torch.from_numpy(ids.astype(np.int64)),
                    "attention_mask": torch.from_numpy(mask.astype(np.int64)),
                }
            )

    for mod in ld.modules():
        name = type(mod).__name__
        if name == "FlanT5HiddenState":
            mod.tokenizer = _Wrap(text_utils.t5_tokenizer(128))
        elif name == "CLAPAudioEmbeddingClassifierFreev2":
            # .tokenizer is a method over self.tokenize (the HF object)
            mod.tokenize = _Wrap(text_utils.roberta_tokenizer(512))


def _reference_generate(ld, batch, latent_t, steps, guidance, x_T_nchw, n_gen=1):
    """The generate_batch sequence (ddpm.py:1477-1553) with x_T injected
    and eta=0 (generate_batch itself hard-asserts x_T is None)."""
    import torch

    ld.latent_t_size = latent_t
    with torch.no_grad():
        z, c = ld.get_input(batch, ld.first_stage_key, unconditional_prob_cfg=0.0)
        c = ld.filter_useful_cond_dict(c)
        batch_size = z.shape[0] * n_gen
        if n_gen > 1:  # candidate tiling, ddpm.py:1515-1523
            for cond_key in c.keys():
                if isinstance(c[cond_key], list):
                    for i in range(len(c[cond_key])):
                        c[cond_key][i] = torch.cat([c[cond_key][i]] * n_gen, dim=0)
                elif isinstance(c[cond_key], dict):
                    for k in c[cond_key].keys():
                        c[cond_key][k] = torch.cat([c[cond_key][k]] * n_gen, dim=0)
                else:
                    c[cond_key] = torch.cat([c[cond_key]] * n_gen, dim=0)
        unconditional_conditioning = {}
        if guidance != 1.0:
            for key in ld.cond_stage_model_metadata:
                model_idx = ld.cond_stage_model_metadata[key]["model_idx"]
                unconditional_conditioning[key] = ld.cond_stage_models[
                    model_idx
                ].get_unconditional_condition(batch_size)
        samples, _ = ld.sample_log(
            cond=c,
            batch_size=batch_size,
            x_T=torch.from_numpy(x_T_nchw),
            ddim=True,
            ddim_steps=steps,
            eta=0.0,
            unconditional_guidance_scale=guidance,
            unconditional_conditioning=unconditional_conditioning,
        )
        mel = ld.decode_first_stage(samples)
        wav = ld.mel_spectrogram_to_waveform(
            mel, savepath="", bs=None, name=["e2e"], save=False
        )
    return mel.numpy(), wav


def run_family(name, text="a dog barking in the rain", transcription="",
               duration=2.5, steps=3, guidance=3.5, seed=7):
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import _reference as ref
    from key_coverage import build_reference_model

    from audioldm2_tpu import convert, pipeline
    from audioldm2_tpu.config import default_audioldm_config

    ld = build_reference_model(name)
    _swap_reference_tokenizers(ld)

    cfg = dataclasses.replace(
        default_audioldm_config(name), compute_dtype="float32"
    )
    sd = convert.state_dict_to_numpy(ld.state_dict())
    params = pipeline.convert_state_dict(sd, cfg)
    model = pipeline.AudioLDM2(cfg, params)

    latent_t = int(round(duration * cfg.latent_t_per_second))
    rng = np.random.default_rng(seed)
    x_T = rng.standard_normal(
        (1, cfg.latent_channels, latent_t, cfg.latent_f_size)
    ).astype(np.float32)

    ref_pipe = ref.load("audioldm2.pipeline")
    batch_t = ref_pipe.make_batch_for_text_to_audio(
        text, transcription=transcription, batchsize=1
    )
    mel_t, wav_t = _reference_generate(
        ld, batch_t, latent_t, steps, guidance, x_T
    )

    batch_j = model.make_batch(text, transcription=transcription, batchsize=1)
    wav_j, mel_j = model.ldm.generate(
        batch_j,
        jax.random.PRNGKey(0),
        latent_t_size=latent_t,
        n_gen=1,
        guidance=guidance,
        ddim_steps=steps,
        ddim_eta=0.0,
        x_T=np.transpose(x_T, (0, 2, 3, 1)),
    )

    mel_t2 = mel_t[:, 0].transpose(0, 1, 2)  # [B, Tmel, M]
    mel_j2 = mel_j[..., 0]
    assert mel_j2.shape == mel_t2.shape, (mel_j2.shape, mel_t2.shape)
    mel_mae = float(np.abs(mel_j2 - mel_t2).mean())
    mel_max = float(np.abs(mel_j2 - mel_t2).max())

    wav_t2 = wav_t[:, 0] if wav_t.ndim == 3 else wav_t
    n = min(wav_j.shape[-1], wav_t2.shape[-1])
    wav_mae = float(np.abs(wav_j[:, :n] - wav_t2[:, :n]).mean())
    mel_scale = float(np.abs(mel_t2).mean())
    return {
        "family": name,
        "duration_s": duration,
        "ddim_steps": steps,
        "guidance": guidance,
        "latent_t": latent_t,
        "mel_shape": list(mel_j2.shape),
        "mel_mae": mel_mae,
        "mel_max_abs_err": mel_max,
        "mel_mean_abs": mel_scale,
        "wav_mae": wav_mae,
        "transcription": transcription,
    }


def run_rerank(name="audioldm_16k_crossattn_t5",
               text="a dog barking in the rain", steps=5, guidance=3.5,
               n_gen=3, seed=11):
    """End-to-end CLAP candidate-rerank parity: generate n_gen candidates
    per pipeline (same weights, same x_T, eta=0), score each with its OWN
    rerank path (reference: clap.cos_similarity over the generated
    waveforms, ddpm.py:1554-1568 — audio re-embedded at 48 kHz through the
    DDPM-level CLAP; ours: models/clap.cos_similarity_waveform_text), and
    compare similarity vectors + the selected candidate index.

    Runs at duration=10 s, where the reference's truncate-at-480000 clip
    prep and our fixed-shape prep coincide exactly. The reference's
    torchaudio resample is routed through this framework's resampler
    (torchaudio is absent in this image), so the comparison proves
    everything downstream of the shared 16k->48k resample: vocoder output,
    CLAP audio tower at production size, text tower, projections, cosine
    scoring and argmax selection."""
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch

    import _reference as ref
    from key_coverage import build_reference_model

    from audioldm2_tpu import convert, pipeline
    from audioldm2_tpu.config import default_audioldm_config
    from audioldm2_tpu.models import clap as clap_model
    from audioldm2_tpu.utils.audio_io import resample as our_resample

    ld = build_reference_model(name)
    _swap_reference_tokenizers(ld)

    # route the reference's CLAP audio frontend through our DSP:
    # torchaudio.functional.resample (absent in this image) and the
    # mel_transform whose output feeds only the fusion branch
    # (enable_fusion=False in the shipped reranker, modules.py:565 — HTSAT
    # consumes the raw waveform)
    import torchaudio.functional as taf

    def _resample(x, orig_freq, new_freq, **kw):
        return torch.from_numpy(
            our_resample(x.detach().cpu().numpy(), int(orig_freq), int(new_freq))
        )

    taf.resample = _resample
    ref.load("audioldm2.latent_diffusion.modules.encoders.modules").torchaudio.functional.resample = _resample

    class _MelStub(torch.nn.Module):
        def forward(self, audio):
            return torch.zeros(audio.shape[0], 64, audio.shape[-1] // 480 + 1)

    ld.clap.mel_transform = _MelStub()
    # Reference quirk: the DDPM-level CLAP keeps its training-time
    # unconditional_prob=0.1 (modules.py:554, ddpm.py:114-120), so forward()
    # randomly replaces ~10% of embeddings with the empty-string embedding
    # EVEN during rerank scoring (modules.py:731-733) — candidates then get
    # the cos(uncond, text) score. This framework scores all candidates
    # deterministically; zero the probability for an apples-to-apples check.
    ld.clap.unconditional_prob = 0.0

    cfg = dataclasses.replace(
        default_audioldm_config(name), compute_dtype="float32"
    )
    sd = convert.state_dict_to_numpy(ld.state_dict())
    params = pipeline.convert_state_dict(sd, cfg)
    model = pipeline.AudioLDM2(cfg, params)

    duration = 10.0
    latent_t = int(round(duration * cfg.latent_t_per_second))
    rng = np.random.default_rng(seed)
    x_T = rng.standard_normal(
        (n_gen, cfg.latent_channels, latent_t, cfg.latent_f_size)
    ).astype(np.float32)

    ref_pipe = ref.load("audioldm2.pipeline")
    batch_t = ref_pipe.make_batch_for_text_to_audio(text, batchsize=1)
    _, wav_t = _reference_generate(
        ld, batch_t, latent_t, steps, guidance, x_T, n_gen=n_gen
    )
    with torch.no_grad():
        sim_t = ld.clap.cos_similarity(
            torch.FloatTensor(wav_t).squeeze(1), [text] * n_gen
        ).numpy().reshape(-1)
    best_t = int(np.argmax(sim_t))

    batch_j = model.make_batch(text, batchsize=1)
    wav_j, _ = model.ldm.generate(
        batch_j,
        jax.random.PRNGKey(0),
        latent_t_size=latent_t,
        n_gen=n_gen,
        guidance=guidance,
        ddim_steps=steps,
        ddim_eta=0.0,
        x_T=np.transpose(x_T, (0, 2, 3, 1)),
    )
    sim_j = clap_model.cos_similarity_waveform_text(
        model.ldm.params["reranker_clap"], cfg.reranker_clap, wav_j, text,
        model.reranker_tok, cfg.preprocessing.sampling_rate,
    ).reshape(-1)
    best_j = int(np.argmax(sim_j))

    # per-candidate waveform diagnostics: does generation itself diverge
    # (wav MAE), and did either pipeline saturate the vocoder tanh?
    wav_t2 = wav_t[:, 0] if wav_t.ndim == 3 else wav_t
    nmin = min(wav_j.shape[-1], wav_t2.shape[-1])
    wav_mae_per_cand = [
        float(np.abs(np.asarray(wav_j)[i, :nmin] - wav_t2[i, :nmin]).mean())
        for i in range(n_gen)
    ]
    wav_absmax = {
        "ref": [float(np.abs(wav_t2[i]).max()) for i in range(n_gen)],
        "ours": [float(np.abs(np.asarray(wav_j)[i]).max()) for i in range(n_gen)],
    }

    return {
        "wav_mae_per_candidate": wav_mae_per_cand,
        "wav_absmax": wav_absmax,
        "family": name,
        "n_gen": n_gen,
        "ddim_steps": steps,
        "similarity_ref": [round(float(s), 6) for s in sim_t],
        "similarity_ours": [round(float(s), 6) for s in sim_j],
        "sim_max_abs_err": float(np.abs(sim_t - sim_j).max()),
        "selected_ref": best_t,
        "selected_ours": best_j,
        "selection_match": best_t == best_j,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="*", default=None)
    ap.add_argument("--duration", type=float, default=2.5)
    # 5 divides 1000: the reference's uniform DDIM discretization indexes
    # alphacums[1000] (out of bounds) for step counts that don't divide 1000
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument(
        "--rerank", action="store_true",
        help="run the n_gen=3 CLAP candidate-rerank parity instead",
    )
    args = ap.parse_args(argv)

    sidecar = os.path.join(_ROOT, "docs", "e2e_parity.json")
    merged = {}
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            merged = json.load(f)

    if args.rerank:
        name = args.families[0] if args.families else "audioldm_16k_crossattn_t5"
        print(f"=== rerank {name} ===", flush=True)
        r = run_rerank(name, steps=args.steps, guidance=args.guidance)
        ok = r["selection_match"] and r["sim_max_abs_err"] < 5e-3
        print(
            f"  sim ref  {r['similarity_ref']}\n"
            f"  sim ours {r['similarity_ours']}\n"
            f"  max err {r['sim_max_abs_err']:.2e}; selected "
            f"ref={r['selected_ref']} ours={r['selected_ours']} "
            f"-> {'OK' if ok else 'FAIL'}",
            flush=True,
        )
        merged[f"rerank:{name}"] = r
        os.makedirs(os.path.dirname(sidecar), exist_ok=True)
        with open(sidecar, "w") as f:
            json.dump(merged, f, indent=1)
        return 0 if ok else 1

    fams = args.families or FAMILIES
    fail = False
    for fam in fams:
        transcription = (
            "the quick brown fox" if "speech" in fam else ""
        )
        print(f"=== {fam} ===", flush=True)
        r = run_family(
            fam, transcription=transcription,
            duration=args.duration, steps=args.steps, guidance=args.guidance,
        )
        ok = r["mel_mae"] < 1e-3
        fail |= not ok
        print(
            f"  mel MAE {r['mel_mae']:.2e} (max {r['mel_max_abs_err']:.2e}, "
            f"scale {r['mel_mean_abs']:.2f}) wav MAE {r['wav_mae']:.2e} "
            f"-> {'OK' if ok else 'FAIL'}",
            flush=True,
        )
        merged[fam] = r
    os.makedirs(os.path.dirname(sidecar), exist_ok=True)
    with open(sidecar, "w") as f:
        json.dump(merged, f, indent=1)
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
