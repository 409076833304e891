"""Checkpoint key-coverage proof for all 7 reference model families.

The reference loads its monolithic ``.pth`` with a *strict*
``load_state_dict`` (reference ``pipeline.py:172-174``), so
``LatentDiffusion.state_dict()`` — built from the reference's own config
factory (``utils.py:116-192``) at production size — is *exactly* the key
layout of every shipped checkpoint. This tool:

1. instantiates the reference ``LatentDiffusion`` per family (offline:
   HF ``*Config.from_pretrained`` calls are patched to locally-constructed
   configs with the published hyperparameters),
2. runs this framework's :func:`audioldm2_tpu.pipeline.convert_state_dict`
   over it with a read-tracking dict,
3. asserts (a) every inference-relevant reference key was consumed and
   (b) the converted tree exactly matches the ``init_params`` structure
   (same leaf paths, same shapes),
4. writes the per-family report to ``docs/KEY_COVERAGE.md``.

Keys that are *correct* to skip (with the reference evidence):

- ``betas``/``alphas_cumprod*``/``sqrt_*``/``posterior_*``/``logvar``/
  ``lvlb_weights`` — diffusion-schedule buffers recomputed from config
  (reference ``ddpm.py:234-302``; our ``diffusion/schedule.py``).
- ``model_ema.*`` — EMA shadow copy; the default inference entry points
  run with ``ema_scope`` commented out (reference ``ddpm.py:1498,1596``).
  Since round 3 the production converter DOES consume these into a
  ``unet_ema`` tree for ``generate(use_ema=True)`` (pipeline.convert_
  state_dict); this coverage tool keeps them in the skip class so its
  "0 unconsumed" criterion stays about the weights generation uses by
  default.
- ``cond_stage_models.*.model.embeddings.position_ids`` /
  ``*.position_ids`` — non-learned integer range buffers.
- ``clap.model.*audio_branch*`` spectrogram/logmel buffers — recomputed.
- the CLAP ``text_branch.pooler`` — reference CLAP takes the CLS
  projection from hidden_state pooling, never the pooler head
  (reference ``clap/open_clip/model.py:703-712``).

Usage: python tools/key_coverage.py [family ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

FAMILIES = [
    "audioldm2-full",
    "audioldm2-full-large-1150k",
    "audioldm2-music-665k",
    "audioldm2-speech-ljspeech",
    "audioldm2-speech-gigaspeech",
    "audioldm_16k_crossattn_t5",
    "audioldm_48k",
]

# Skip patterns: reference evidence in the module docstring.
SKIP_PATTERNS = [
    r"^(betas|alphas_cumprod|alphas_cumprod_prev|sqrt_alphas_cumprod|"
    r"sqrt_one_minus_alphas_cumprod|log_one_minus_alphas_cumprod|"
    r"sqrt_recip_alphas_cumprod|sqrt_recipm1_alphas_cumprod|"
    r"posterior_variance|posterior_log_variance_clipped|"
    r"posterior_mean_coef1|posterior_mean_coef2|logvar|lvlb_weights)$",
    r"^scale_factor$",  # consumed via sd.get, listed for completeness
    r"^model_ema\.",
    r"\.position_ids$",
    r"\.embeddings\.token_type_ids$",
    r"spectrogram_extractor\.stft\.",
    r"logmel_extractor\.melW$",
    r"\.attn_mask$",  # CLIP text-transformer causal mask buffer
    r"text_branch\.pooler\.",  # unused pooler head (model.py:703-712)
    r"\.num_batches_tracked$",  # BatchNorm bookkeeping (inference uses running stats)
    r"mel_transform\.(spectrogram\.window|mel_scale\.fb)$",  # torchaudio DSP buffers
    # Swin relative-position integer index grids — recomputed from window
    # geometry (our htsat.py builds the gather indices at trace time)
    r"\.attn\.relative_position_index$",
    # AudioMAE MAE-decoder: conditioning runs forward_encoder_no_mask only
    # (reference AudioMAE.py:119-131; models_mae.py decoder is pretraining-
    # only, and AudioMAE.py:111-116 notes decoder keys are "not required")
    r"\.audiomae\.model\.(decoder_embed|decoder_blocks|decoder_norm|"
    r"decoder_pred|decoder_pos_embed|mask_token)\.",
    r"\.audiomae\.model\.(decoder_pos_embed|mask_token)$",
    # GPT-2 token embedding: the sequence generator only ever drives GPT-2
    # with inputs_embeds (reference sequence_input.py:278,313), never ids
    r"cond_stage_models\.\d+\.model\.wte\.weight$",
]


def _patch_transformers_offline():
    """Route the reference's HF ``*Config.from_pretrained`` / tokenizer
    calls to locally constructed objects (zero egress). Returns an undo
    callable — the patches must not leak into the host process (the
    framework's own tokenizer fallback logic needs the real methods)."""
    import transformers

    saved = {}
    for name in ("T5Config", "GPT2Config", "RobertaConfig", "AutoTokenizer",
                 "RobertaTokenizer", "T5Tokenizer"):
        cls = getattr(transformers, name, None)
        if cls is not None:
            saved[name] = cls.__dict__.get("from_pretrained")

    t5_large = dict(
        d_model=1024, d_kv=64, d_ff=2816, num_layers=24, num_heads=16,
        vocab_size=32128, relative_attention_num_buckets=32,
        feed_forward_proj="gated-gelu", is_encoder_decoder=True,
        dense_act_fn="gelu_new", is_gated_act=True, tie_word_embeddings=False,
    )
    transformers.T5Config.from_pretrained = classmethod(
        lambda cls, *a, **k: transformers.T5Config(**t5_large)
    )
    transformers.GPT2Config.from_pretrained = classmethod(
        lambda cls, *a, **k: transformers.GPT2Config()
    )
    # roberta-base published hyperparameters (RobertaConfig() defaults are
    # BERT-style: 512 positions / 2 token types — wrong shapes)
    roberta_base = dict(
        vocab_size=50265, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=514, type_vocab_size=1,
        layer_norm_eps=1e-5, pad_token_id=1, bos_token_id=0, eos_token_id=2,
    )
    transformers.RobertaConfig.from_pretrained = classmethod(
        lambda cls, *a, **k: transformers.RobertaConfig(**roberta_base)
    )

    class _DummyTok:
        model_max_length = 512

        def __call__(self, *a, **k):
            raise RuntimeError("offline dummy tokenizer")

    for name in ("AutoTokenizer", "RobertaTokenizer", "T5Tokenizer"):
        cls = getattr(transformers, name, None)
        if cls is not None:
            cls.from_pretrained = classmethod(lambda c, *a, **k: _DummyTok())

    def undo():
        for name, orig in saved.items():
            cls = getattr(transformers, name)
            if orig is None:
                # attribute came from a base class; drop the override
                if "from_pretrained" in cls.__dict__:
                    delattr(cls, "from_pretrained")
            else:
                setattr(cls, "from_pretrained", orig)

    return undo


class TrackingDict(dict):
    """Dict that records which keys conversion actually read."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            self.read.add(k)
        return super().get(k, default)


def build_reference_model(model_name: str):
    """Instantiate the reference LatentDiffusion at production size with
    random weights (offline: HF configs patched locally) and return the
    live torch module in eval mode. Used for key-coverage proofs and for
    end-to-end pipeline parity (tests/test_e2e_pipeline_parity.py drives
    its generate path against this framework's with shared weights)."""
    import _reference as ref

    ref.install_shims()
    undo_patch = _patch_transformers_offline()
    import torch

    # Key coverage needs the state_dict STRUCTURE (keys + shapes), not
    # values: skip torch's per-tensor RNG init (kaiming/trunc-normal loops
    # dominate the ~2B-param builds on this single-core host). Opt-in only
    # (main() sets it): the e2e parity tests import this builder and need
    # real finite values.
    saved_init = {m: getattr(torch.Tensor, m) for m in ("normal_", "uniform_")}
    if os.environ.get("KEY_COVERAGE_STRUCTURE_ONLY") == "1":
        for m in saved_init:
            setattr(torch.Tensor, m, lambda self, *a, **k: self)

    # Faithful-enough torchaudio.transforms.MelSpectrogram stub: the real one
    # registers two DSP buffers (spectrogram.window, mel_scale.fb) which are
    # therefore present in shipped checkpoints (strict load) — reproduce them
    # so the coverage report accounts for every real key.
    import torchaudio  # the _reference shim module

    class _Spec(torch.nn.Module):
        def __init__(self, win_length):
            super().__init__()
            self.register_buffer("window", torch.hann_window(win_length))

    class _MelScale(torch.nn.Module):
        def __init__(self, n_stft, n_mels):
            super().__init__()
            self.register_buffer("fb", torch.zeros(n_stft, n_mels))

    class _MelSpectrogram(torch.nn.Module):
        def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                     hop_length=None, n_mels=128, **kw):
            super().__init__()
            win_length = win_length or n_fft
            self.spectrogram = _Spec(win_length)
            self.mel_scale = _MelScale(n_fft // 2 + 1, n_mels)

    torchaudio.transforms.MelSpectrogram = _MelSpectrogram

    ref_utils = ref.load("audioldm2.utils")
    ddpm = ref.load("audioldm2.latent_diffusion.models.ddpm")

    cfg = ref_utils.default_audioldm_config(model_name)
    params = dict(cfg["model"]["params"])
    params["device"] = torch.device("cpu")
    try:
        with torch.no_grad():
            ld = ddpm.LatentDiffusion(**params)
        return ld.eval()
    finally:
        for m, fn in saved_init.items():
            setattr(torch.Tensor, m, fn)
        undo_patch()


def build_reference_state_dict(model_name: str):
    """The exact shipped-checkpoint key layout for one family."""
    return build_reference_model(model_name).state_dict()


def leaf_paths(tree, prefix=""):
    """Flatten a param tree to {path: shape}."""
    import numpy as np

    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(leaf_paths(v, f"{prefix}.{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(leaf_paths(v, f"{prefix}[{i}]"))
    elif hasattr(tree, "shape"):
        out[prefix] = tuple(tree.shape)
    elif isinstance(tree, (int, float, str, bool)) or tree is None:
        out[prefix] = ("scalar",)
    else:
        out[prefix] = (type(tree).__name__,)
    return out


def check_family(model_name: str):
    import jax

    # Pure CPU workload (torch graphs + numpy conversion + structure match):
    # never init the force-registered TPU backend — with the tunnel down its
    # discovery retry loop blocks this tool indefinitely.
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from audioldm2_tpu import convert, pipeline
    from audioldm2_tpu.config import default_audioldm_config

    sd_torch = build_reference_state_dict(model_name)
    sd = TrackingDict(convert.state_dict_to_numpy(sd_torch))
    n_total = len(sd)

    cfg = default_audioldm_config(model_name)
    params = pipeline.convert_state_dict(sd, cfg)

    skipped, unconsumed = [], []
    pats = [re.compile(p) for p in SKIP_PATTERNS]
    for k in sd:
        if k in sd.read:
            continue
        if any(p.search(k) for p in pats):
            skipped.append(k)
        else:
            unconsumed.append(k)

    # structure match vs random init
    with jax.default_device(jax.devices("cpu")[0]):
        init = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    conv_leaves = leaf_paths(params)
    init_leaves = leaf_paths(init)
    missing_in_conv = sorted(set(init_leaves) - set(conv_leaves))
    # The EMA shadow tree (produced when the checkpoint ships model_ema.*;
    # init_params never materializes one) must mirror the live UNet
    # leaf-for-leaf — verify that instead of flagging it as extra.
    ema_mismatch = sorted(
        k for k in conv_leaves
        if k.startswith("unet_ema.")
        and init_leaves.get("unet." + k[len("unet_ema."):]) != conv_leaves[k]
    )
    extra_in_conv = sorted(
        k for k in set(conv_leaves) - set(init_leaves)
        if not k.startswith("unet_ema.")
    ) + ema_mismatch
    shape_mismatch = sorted(
        p for p in set(conv_leaves) & set(init_leaves)
        if conv_leaves[p] != init_leaves[p]
    )

    return {
        "family": model_name,
        "total_keys": n_total,
        "consumed": len(sd.read),
        "skipped": len(skipped),
        "unconsumed": unconsumed,
        "tree_leaves": len(init_leaves),
        "missing_in_conv": missing_in_conv,
        "extra_in_conv": extra_in_conv,
        "shape_mismatch": shape_mismatch,
    }


def main(argv):
    # values are irrelevant for coverage — skip torch's slow RNG init
    os.environ.setdefault("KEY_COVERAGE_STRUCTURE_ONLY", "1")
    families = argv or FAMILIES
    reports = []
    fail = False
    for fam in families:
        print(f"=== {fam} ===", flush=True)
        r = check_family(fam)
        reports.append(r)
        ok = not (r["unconsumed"] or r["missing_in_conv"] or
                  r["extra_in_conv"] or r["shape_mismatch"])
        fail |= not ok
        print(f"  keys: {r['total_keys']} total, {r['consumed']} consumed, "
              f"{r['skipped']} documented-skip, {len(r['unconsumed'])} UNCONSUMED")
        print(f"  tree: {r['tree_leaves']} leaves, "
              f"{len(r['missing_in_conv'])} missing, {len(r['extra_in_conv'])} extra, "
              f"{len(r['shape_mismatch'])} shape-mismatch -> {'OK' if ok else 'FAIL'}")
        for k in r["unconsumed"][:20]:
            print(f"    UNCONSUMED {k}")
        for k in r["missing_in_conv"][:20]:
            print(f"    MISSING    {k}")
        for k in r["extra_in_conv"][:20]:
            print(f"    EXTRA      {k}")
        for k in r["shape_mismatch"][:20]:
            print(f"    SHAPE      {k}")

    write_report(reports)
    return 1 if fail else 0


def write_report(reports):
    # merge with previously-proven families (the tool is run per-family /
    # per-subset — a full 7-family pass takes hours of torch instantiation)
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sidecar = os.path.join(root, "docs", "key_coverage.json")
    merged = {}
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            merged = json.load(f)
    for r in reports:
        merged[r["family"]] = r
    reports = [merged[f] for f in FAMILIES if f in merged]
    os.makedirs(os.path.dirname(sidecar), exist_ok=True)
    with open(sidecar, "w") as f:
        json.dump(merged, f, indent=1)

    lines = [
        "# Checkpoint key-coverage report",
        "",
        "Generated by `tools/key_coverage.py`. The synthetic monolithic state",
        "dict per family is `LatentDiffusion.state_dict()` built from the",
        "reference's own config factory at production size — exactly the",
        "shipped-checkpoint layout (strict `load_state_dict`, reference",
        "`pipeline.py:172-174`).",
        "",
        "| family | ckpt keys | consumed | documented-skip | unconsumed | tree leaves | structure |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in reports:
        ok = not (r["unconsumed"] or r["missing_in_conv"] or
                  r["extra_in_conv"] or r["shape_mismatch"])
        lines.append(
            f"| {r['family']} | {r['total_keys']} | {r['consumed']} | "
            f"{r['skipped']} | {len(r['unconsumed'])} | {r['tree_leaves']} | "
            f"{'exact match' if ok else 'MISMATCH'} |"
        )
    lines += [
        "",
        "Documented-skip classes (reference evidence in tools/key_coverage.py):",
        "diffusion-schedule buffers (`ddpm.py:234-302`), `model_ema.*`",
        "(inference runs un-EMA'd: `ddpm.py:1498,1596`), integer position-id",
        "buffers, CLAP STFT/mel buffers (recomputed), the unused RoBERTa",
        "pooler head (`clap/open_clip/model.py:703-712`), BatchNorm",
        "`num_batches_tracked`.",
        "",
    ]
    for r in reports:
        if r["unconsumed"] or r["missing_in_conv"] or r["extra_in_conv"] or r["shape_mismatch"]:
            lines.append(f"## {r['family']} — MISMATCH DETAIL")
            for name in ("unconsumed", "missing_in_conv", "extra_in_conv", "shape_mismatch"):
                for k in r[name]:
                    lines.append(f"- {name}: `{k}`")
            lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "KEY_COVERAGE.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
