"""Full rerank-scorer decomposition: reference CLAP (HTSAT-base + roberta,
the shipped reranker variant) vs our converted params, on the real 10 s
geometry (t_frames=1001 -> 1024 bicubic), stage by stage:

    audio tower embedding -> audio_projection -> normalize
    text branch pooled    -> text_projection  -> normalize
    cosine similarity

Usage: python tools/clap_rerank_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import numpy as np


def diff(name, ours, ref):
    ours = np.asarray(ours, np.float32).reshape(-1)
    ref = np.asarray(ref, np.float32).reshape(-1)
    d = np.abs(ours - ref)
    scale = max(np.abs(ref).max(), 1e-12)
    print(f"{name:<28} max_abs={d.max():.3e}  rel={d.max() / scale:.3e}  "
          f"ref_absmax={scale:.3e}")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    import _reference
    from audioldm2_tpu import convert
    from audioldm2_tpu.config import default_audioldm_config
    from audioldm2_tpu.models import clap as jclap
    from audioldm2_tpu.models import htsat as jhtsat
    from audioldm2_tpu.utils import text as text_utils

    # offline: the reference builds its text tower via
    # RobertaConfig.from_pretrained("roberta-base") (model.py:515); construct
    # the (public, fixed) roberta-base hyperparameters locally instead.
    import transformers

    _base_cfg = transformers.RobertaConfig(
        vocab_size=50265,
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        max_position_embeddings=514,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
    )
    transformers.RobertaConfig.from_pretrained = classmethod(
        lambda cls, *a, **k: _base_cfg
    )

    factory = _reference.load("audioldm2.clap.open_clip.factory")
    torch.manual_seed(0)
    model, model_cfg = factory.create_model(
        "HTSAT-base", "roberta", "", precision="fp32", device="cpu",
        enable_fusion=False,
    )
    model = model.eval()
    sd = {k: np.asarray(v) for k, v in model.state_dict().items()}
    params = convert.convert_clap(sd, prefix="")
    cfg = default_audioldm_config("audioldm2-full").reranker_clap
    print("variant:", cfg.amodel, cfg.tmodel, "clip", cfg.clip_samples)

    rng = np.random.default_rng(0)
    wav48 = (rng.standard_normal((2, 480000)) * 0.05).astype(np.float32)

    # ---- audio side ----
    with torch.no_grad():
        ab = model.audio_branch({"waveform": torch.from_numpy(wav48)}, device="cpu")
        emb_r = ab["embedding"]
        proj_r = model.audio_projection(emb_r)
        a_r = torch.nn.functional.normalize(proj_r, dim=-1)

    acfg, _ = jclap.audio_tower(cfg)
    feats_j = jhtsat.encode(params["audio_branch"], wav48, acfg)
    diff("audio tower embedding", feats_j, emb_r.numpy())
    proj_j = jclap._project(params["audio_projection"], feats_j)
    diff("audio projection", proj_j, proj_r.numpy())
    a_j = jclap._normalize(proj_j)
    diff("audio normalized", a_j, a_r.numpy())
    full_a = jclap.audio_embedding(params, cfg, jnp.asarray(wav48))
    diff("audio_embedding()", full_a, a_r.numpy())

    # ---- text side ----
    tok = text_utils.roberta_tokenizer(512)
    print("tokenizer exact HF:", tok.is_exact)
    ids, mask = tok(["a dog barking in the rain", "water drops"])
    with torch.no_grad():
        pooled_r = model.text_branch(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        )["pooler_output"]
        proj_t_r = model.text_projection(pooled_r)
        t_r = model.get_text_embedding(
            {"input_ids": torch.from_numpy(ids).long(),
             "attention_mask": torch.from_numpy(mask).long()}
        )

    from audioldm2_tpu.models import roberta as jrob

    tcfg, _ = jclap.text_tower(cfg)
    _seq_j, pooled_j = jrob.apply_roberta(
        params["text_branch"], tcfg, jnp.asarray(ids), jnp.asarray(mask)
    )
    diff("roberta pooled", pooled_j, pooled_r.numpy())
    proj_t_j = jclap._project(params["text_projection"], pooled_j)
    diff("text projection", proj_t_j, proj_t_r.numpy())
    t_j = jclap.text_embedding(params, cfg, jnp.asarray(ids), jnp.asarray(mask))[:, 0]
    diff("text embedding", t_j, t_r.numpy())

    # ---- similarity ----
    sim_r = (a_r * t_r).sum(-1).numpy()
    sim_j = np.asarray(jclap.cos_similarity(full_a, t_j))
    diff("cosine similarity", sim_j, sim_r)
    print("sim ref:", sim_r, "ours:", sim_j)


if __name__ == "__main__":
    main()
