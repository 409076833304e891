"""RoBERTa (CLAP text tower) parity vs HF torch RobertaModel."""

import numpy as np
import pytest

from audioldm2_tpu import convert
from audioldm2_tpu.models import roberta as jrob


SMALL = jrob.RobertaConfig(
    vocab_size=120,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=40,
)


def test_roberta_parity(rng):
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.RobertaConfig(
        vocab_size=SMALL.vocab_size,
        hidden_size=SMALL.hidden_size,
        num_hidden_layers=SMALL.num_layers,
        num_attention_heads=SMALL.num_heads,
        intermediate_size=SMALL.intermediate_size,
        max_position_embeddings=SMALL.max_position_embeddings,
        type_vocab_size=1,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    ref = transformers.RobertaModel(hf_cfg).eval()
    params = convert.convert_roberta(
        convert.state_dict_to_numpy(ref.state_dict()), num_layers=SMALL.num_layers
    )

    ids = rng.integers(2, SMALL.vocab_size, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    mask[1, 7:] = 0
    ids[1, 7:] = 1  # pad token

    with torch.no_grad():
        out = ref(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        )
        seq_t = out.last_hidden_state.numpy()
        pool_t = out.pooler_output.numpy()

    seq_j, pool_j = jrob.apply_roberta(params, SMALL, ids, mask)
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(
            np.asarray(seq_j)[b, :n], seq_t[b, :n], atol=2e-4, rtol=1e-3
        )
    np.testing.assert_allclose(np.asarray(pool_j), pool_t, atol=2e-4, rtol=1e-3)


def test_bert_style_parity(rng):
    """BERT semantics via bert_style=True (CLAP's "bert" text branch)."""
    torch = pytest.importorskip("torch")
    import transformers

    cfg = jrob.RobertaConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=40, type_vocab_size=2,
    )
    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=2, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    ref = transformers.BertModel(hf_cfg).eval()
    from audioldm2_tpu import convert

    params = convert.convert_roberta(
        convert.state_dict_to_numpy(ref.state_dict()), num_layers=cfg.num_layers
    )
    ids = rng.integers(2, cfg.vocab_size, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    types = np.zeros((2, 10), np.int32)
    types[:, 5:] = 1
    with torch.no_grad():
        out = ref(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            token_type_ids=torch.from_numpy(types).long(),
        )
    seq_j, pool_j = jrob.apply_roberta(
        params, cfg, ids, mask, bert_style=True, token_type_ids=types
    )
    np.testing.assert_allclose(
        np.asarray(seq_j), out.last_hidden_state.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(pool_j), out.pooler_output.numpy(), atol=2e-4, rtol=1e-3
    )


def test_bart_encoder_parity(rng):
    """BART encoder semantics (CLAP's "bart" text branch)."""
    torch = pytest.importorskip("torch")
    import transformers

    cfg = jrob.RobertaConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=42,
    )
    hf_cfg = transformers.BartConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.hidden_size,
        encoder_layers=cfg.num_layers, decoder_layers=1,
        encoder_attention_heads=cfg.num_heads, decoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.intermediate_size, decoder_ffn_dim=cfg.intermediate_size,
        max_position_embeddings=40, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, activation_function="gelu",
    )
    torch.manual_seed(2)
    ref = transformers.BartModel(hf_cfg).eval().encoder

    sd = {k: np.asarray(v) for k, v in ref.state_dict().items()}
    layers = []
    for i in range(cfg.num_layers):
        lp = f"layers.{i}"
        def lin(p):
            return {"w": sd[p + ".weight"].T, "b": sd[p + ".bias"]}
        def ln(p):
            return {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}
        layers.append({
            "attn": {
                "q": lin(lp + ".self_attn.q_proj"),
                "k": lin(lp + ".self_attn.k_proj"),
                "v": lin(lp + ".self_attn.v_proj"),
                "out": lin(lp + ".self_attn.out_proj"),
                "ln": ln(lp + ".self_attn_layer_norm"),
            },
            "ff": {
                "intermediate": lin(lp + ".fc1"),
                "output": lin(lp + ".fc2"),
                "ln": ln(lp + ".final_layer_norm"),
            },
        })
    params = {
        "word_embeddings": sd["embed_tokens.weight"],
        "position_embeddings": sd["embed_positions.weight"],
        "emb_ln": {"scale": sd["layernorm_embedding.weight"], "bias": sd["layernorm_embedding.bias"]},
        "layers": layers,
    }

    ids = rng.integers(3, cfg.vocab_size, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    with torch.no_grad():
        want = ref(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    got = np.asarray(jrob.apply_bart_encoder(params, cfg, ids, mask))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
