"""Sequence2AudioMAE: GPT-2 "language of audio" sequence generator.

Re-design of the reference generator (reference
``encoders/modules.py:201-300``, ``audiomae_gen/sequence_input.py:11-429``):
each input condition is projected to 768-d, wrapped with learned per-source
SOS/EOS tokens (32x768 embedding tables indexed by source id), concatenated,
truncated to ``1024 - sequence_gen_length``, then GPT-2 generates
``sequence_gen_length`` continuous tokens autoregressively.

TPU-first difference: the reference recomputes the full growing prefix every
step (no KV cache, sequence_input.py:311-323); here prefill + a KV-cached
`lax.scan` produce identical tokens in O(L) instead of O(L^2) work. Position
ids come from the attention-mask cumsum, which equals the reference's arange
for the unpadded batchsize-1 path.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from audioldm2_tpu.config import ConditionerSpec
from audioldm2_tpu.models import gpt2
from audioldm2_tpu.ops import nn


def init_sequence_gen(key, spec: ConditionerSpec):
    from audioldm2_tpu.models import conditioners

    sg = spec.sequence_gen
    keys = nn.split_keys(key, 4 + len(spec.nested))
    params: Dict = {
        "sos": nn.randn(keys[0], (32, 768), std=0.02),
        "eos": nn.randn(keys[1], (32, 768), std=0.02),
        "gpt2": gpt2.init_gpt2(keys[2], sg.gpt2),
        "input_linears": [],
        "cond": {},
    }
    k_lin = nn.split_keys(keys[3], len(sg.sequence_input_embed_dims))
    for kl, dim in zip(k_lin, sg.sequence_input_embed_dims):
        params["input_linears"].append(nn.linear_init(kl, dim, 768))
    for ns, nk in zip(spec.nested, keys[4:]):
        params["cond"][ns.name] = conditioners.init_conditioner(nk, ns)
    return params


def assemble_prefix(params, spec: ConditionerSpec, batch):
    """Build the GPT-2 input sequence from nested conditioner outputs
    (reference get_input_sequence_and_mask, sequence_input.py:137-201)."""
    from audioldm2_tpu.models import conditioners

    sg = spec.sequence_gen
    nested = {ns.name: ns for ns in spec.nested}
    seqs, masks = [], []
    for i, key_name in enumerate(sg.sequence_input_keys):
        ns = nested[key_name]
        kind, val = conditioners.encode(params["cond"][ns.name], ns, batch)
        if kind == "film":
            emb = val if val.ndim == 3 else val[:, None, :]
            m = jnp.ones(emb.shape[:2], jnp.float32)
        else:
            emb, m = val
        emb = nn.linear(params["input_linears"][i], emb)
        b = emb.shape[0]
        sos = jnp.broadcast_to(params["sos"][i][None, None, :], (b, 1, 768))
        eos = jnp.broadcast_to(params["eos"][i][None, None, :], (b, 1, 768))
        one = jnp.ones((b, 1), jnp.float32)
        seqs.append(jnp.concatenate([sos, emb.astype(jnp.float32), eos], axis=1))
        masks.append(jnp.concatenate([one, m.astype(jnp.float32), one], axis=1))
    seq = jnp.concatenate(seqs, axis=1)
    mask = jnp.concatenate(masks, axis=1)
    max_len = sg.max_context - sg.sequence_gen_length
    return seq[:, :max_len], mask[:, :max_len]


def generate(params, spec: ConditionerSpec, batch) -> jnp.ndarray:
    """Returns generated continuous tokens [B, sequence_gen_length, 768]."""
    sg = spec.sequence_gen
    seq, mask = assemble_prefix(params, spec, batch)
    b, l_pre, _ = seq.shape
    steps = sg.sequence_gen_length
    cache_len = l_pre + steps

    hidden, cache = gpt2.prefill(params["gpt2"], sg.gpt2, seq, mask, cache_len)
    content_len = jnp.sum(mask, axis=1).astype(jnp.int32)  # [B]
    # hidden at the last *valid* prefix position (pads can sit mid-sequence,
    # e.g. before the EOS wrapper token) = first generated token
    last_idx = jnp.max(
        jnp.arange(l_pre, dtype=jnp.int32)[None, :] * mask.astype(jnp.int32), axis=1
    )
    g0 = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)[:, 0]

    cache_mask0 = jnp.pad(mask, ((0, 0), (0, steps)))

    def body(carry, i):
        g, cache, cache_mask = carry
        slot = l_pre + i
        position = content_len + i
        h, cache = gpt2.step(
            params["gpt2"], sg.gpt2, g, cache, cache_mask, slot, position
        )
        cache_mask = cache_mask.at[:, slot].set(1.0)
        return (h, cache, cache_mask), g

    (_, _, _), tokens = jax.lax.scan(
        body, (g0, cache, cache_mask0), jnp.arange(steps)
    )
    # tokens[i] is the input of step i = generated token g_i; [steps, B, 768]
    return jnp.transpose(tokens, (1, 0, 2))
