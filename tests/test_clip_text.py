"""CLIP text transformer parity vs a torch replica (MultiheadAttention +
pre-LN residual blocks, matching reference model.py:256-300,629-643)."""

import numpy as np
import pytest

from audioldm2_tpu.models import clip_text as jct


SMALL = jct.CLIPTextConfig(vocab_size=100, width=32, heads=4, layers=2, context_length=16)


def test_clip_text_parity(rng):
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    d, L = SMALL.width, SMALL.context_length

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = torch.nn.MultiheadAttention(d, SMALL.heads)
            self.ln_1 = torch.nn.LayerNorm(d)
            self.mlp = torch.nn.Sequential(
                torch.nn.Linear(d, 4 * d), torch.nn.GELU(), torch.nn.Linear(4 * d, d)
            )
            self.ln_2 = torch.nn.LayerNorm(d)

        def forward(self, x, attn_mask):
            x = x + self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                              need_weights=False, attn_mask=attn_mask)[0]
            x = x + self.mlp(self.ln_2(x))
            return x

    class Ref(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = torch.nn.Embedding(SMALL.vocab_size, d)
            self.positional_embedding = torch.nn.Parameter(0.01 * torch.randn(L, d))
            self.blocks = torch.nn.ModuleList([Block() for _ in range(SMALL.layers)])
            self.ln_final = torch.nn.LayerNorm(d)

        def forward(self, ids):
            # causal mask as in reference build_attention_mask (model.py:606-613)
            mask = torch.full((L, L), float("-inf"))
            mask.triu_(1)
            x = self.token_embedding(ids) + self.positional_embedding
            x = x.permute(1, 0, 2)  # NLD -> LND
            for blk in self.blocks:
                x = blk(x, mask)
            x = x.permute(1, 0, 2)
            x = self.ln_final(x)
            return x[torch.arange(x.shape[0]), ids.argmax(dim=-1)]

    ref = Ref().eval()
    sd = {}
    sd["token_embedding.weight"] = ref.token_embedding.weight.detach().numpy()
    sd["positional_embedding"] = ref.positional_embedding.detach().numpy()
    sd["ln_final.weight"] = ref.ln_final.weight.detach().numpy()
    sd["ln_final.bias"] = ref.ln_final.bias.detach().numpy()
    for i, blk in enumerate(ref.blocks):
        bp = f"text_branch.resblocks.{i}"
        sd[f"{bp}.ln_1.weight"] = blk.ln_1.weight.detach().numpy()
        sd[f"{bp}.ln_1.bias"] = blk.ln_1.bias.detach().numpy()
        sd[f"{bp}.attn.in_proj_weight"] = blk.attn.in_proj_weight.detach().numpy()
        sd[f"{bp}.attn.in_proj_bias"] = blk.attn.in_proj_bias.detach().numpy()
        sd[f"{bp}.attn.out_proj.weight"] = blk.attn.out_proj.weight.detach().numpy()
        sd[f"{bp}.attn.out_proj.bias"] = blk.attn.out_proj.bias.detach().numpy()
        sd[f"{bp}.ln_2.weight"] = blk.ln_2.weight.detach().numpy()
        sd[f"{bp}.ln_2.bias"] = blk.ln_2.bias.detach().numpy()
        sd[f"{bp}.mlp.c_fc.weight"] = blk.mlp[0].weight.detach().numpy()
        sd[f"{bp}.mlp.c_fc.bias"] = blk.mlp[0].bias.detach().numpy()
        sd[f"{bp}.mlp.c_proj.weight"] = blk.mlp[2].weight.detach().numpy()
        sd[f"{bp}.mlp.c_proj.bias"] = blk.mlp[2].bias.detach().numpy()

    params = jct.convert_clip_text(sd, SMALL)
    ids = rng.integers(1, SMALL.vocab_size, (2, L)).astype(np.int32)
    ids[:, -1] = SMALL.vocab_size - 1  # EOT = max id at the end

    with torch.no_grad():
        want = ref(torch.from_numpy(ids).long()).numpy()
    got = np.asarray(jct.apply_clip_text(params, SMALL, ids))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
