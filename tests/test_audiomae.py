"""AudioMAE encoder tests.

timm is not installed, so the reference models_mae.py cannot import; the
torch golden here is a standard pre-norm ViT block implemented with plain
torch.nn (identical math to timm.models.vision_transformer.Block with
qkv_bias=True, which the reference uses — models_mae.py:95-106).
"""

import numpy as np
import pytest

from audioldm2_tpu.config import AudioMAEConfig
from audioldm2_tpu.models import audiomae as jmae


SMALL = AudioMAEConfig(
    img_size=(64, 32),
    patch_size=16,
    embed_dim=48,
    depth=4,
    num_heads=4,
    mlp_ratio=2.0,
    contextual_depth=1,
    eval_time_pooling=8,
    eval_freq_pooling=8,
)


def _torch_vit(torch, cfg):
    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            d = cfg.embed_dim
            self.norm1 = torch.nn.LayerNorm(d, eps=1e-6)
            self.qkv = torch.nn.Linear(d, 3 * d)
            self.proj = torch.nn.Linear(d, d)
            self.norm2 = torch.nn.LayerNorm(d, eps=1e-6)
            self.fc1 = torch.nn.Linear(d, int(d * cfg.mlp_ratio))
            self.fc2 = torch.nn.Linear(int(d * cfg.mlp_ratio), d)

        def forward(self, x):
            b, n, d = x.shape
            h = self.norm1(x)
            qkv = self.qkv(h).reshape(b, n, 3, cfg.num_heads, d // cfg.num_heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            att = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            att = att.transpose(1, 2).reshape(b, n, d)
            x = x + self.proj(att)
            h = self.norm2(x)
            x = x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))
            return x

    class ViT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            gt = cfg.img_size[0] // cfg.patch_size
            gf = cfg.img_size[1] // cfg.patch_size
            self.patch = torch.nn.Conv2d(1, cfg.embed_dim, cfg.patch_size, cfg.patch_size)
            self.cls = torch.nn.Parameter(torch.zeros(1, 1, cfg.embed_dim))
            self.pos = torch.nn.Parameter(0.02 * torch.randn(1, gt * gf + 1, cfg.embed_dim))
            self.blocks = torch.nn.ModuleList([Block() for _ in range(cfg.depth)])
            self.norm = torch.nn.LayerNorm(cfg.embed_dim, eps=1e-6)

        def forward(self, fbank):
            x = self.patch(fbank[:, None])  # [B, D, gt, gf]
            x = x.flatten(2).transpose(1, 2)
            x = x + self.pos[:, 1:]
            cls = (self.cls + self.pos[:, :1]).expand(x.shape[0], -1, -1)
            x = torch.cat([cls, x], dim=1)
            embs = []
            for n, blk in enumerate(self.blocks):
                x = blk(x)
                if n > cfg.contextual_depth:
                    embs.append(self.norm(x))
            return torch.stack(embs, 0).mean(0)

    return ViT()


def _params_from_torch(vit, cfg):
    def lin(m):
        return {"w": m.weight.detach().numpy().T, "b": m.bias.detach().numpy()}

    def ln(m):
        return {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}

    blocks = []
    for b in vit.blocks:
        blocks.append(
            {
                "norm1": ln(b.norm1),
                "attn": {"qkv": lin(b.qkv), "proj": lin(b.proj)},
                "norm2": ln(b.norm2),
                "mlp": {"fc1": lin(b.fc1), "fc2": lin(b.fc2)},
            }
        )
    return {
        "patch_embed": {
            "w": vit.patch.weight.detach().numpy().transpose(2, 3, 1, 0),
            "b": vit.patch.bias.detach().numpy(),
        },
        "cls_token": vit.cls.detach().numpy(),
        "pos_embed": vit.pos.detach().numpy(),
        "blocks": blocks,
        "norm": ln(vit.norm),
    }


def test_audiomae_contextual_embedding_parity(rng):
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    vit = _torch_vit(torch, SMALL).eval()
    params = _params_from_torch(vit, SMALL)

    fbank = rng.standard_normal((2, 64, 32)).astype(np.float32)
    with torch.no_grad():
        want = vit(torch.from_numpy(fbank)).numpy()
    got = np.asarray(jmae.encode_no_mask(params, SMALL, fbank))
    assert got.shape == want.shape == (2, 9, 48)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_avg_max_pool_production_grid(rng):
    cfg = AudioMAEConfig()
    rep = rng.standard_normal((1, 513, 768)).astype(np.float32)
    pooled = np.asarray(jmae.avg_max_pool(rep, cfg))
    assert pooled.shape == (1, 8, 768)  # 8x8 pooling of the 64x8 grid
    grid = rep[0, 1:].reshape(64, 8, 768)
    block = grid[:8, :8].reshape(-1, 768)
    want0 = (block.mean(0) + block.max(0)) / 2
    np.testing.assert_allclose(pooled[0, 0], want0, rtol=1e-5, atol=1e-6)


def test_pool_variants_parity_vs_reference(rng):
    """Both reference pooling conditioners (CTPoolRand and the TFSeparated
    variant, modules.py:303-543) share the same (avg+max)/2 pool; verify our
    explicit-factor pool against the reference ``pool()`` for asymmetric
    factors, and the factor-sampling semantics of both variants."""
    torch = pytest.importorskip("torch")
    import _reference

    mod = _reference.load("audioldm2.latent_diffusion.modules.encoders.modules")
    # constructing the conditioners builds the full 86M-param Vanilla_AudioMAE;
    # stub it out — only .pool() is under test
    class _Stub(torch.nn.Module):
        pass

    orig = mod.Vanilla_AudioMAE
    mod.Vanilla_AudioMAE = _Stub
    try:
        for cls_name in ("AudioMAEConditionCTPoolRand",
                         "AudioMAEConditionCTPoolRandTFSeparated"):
            ref = getattr(mod, cls_name)(
                eval_time_pooling=16, eval_freq_pooling=4
            ).eval()
            rep = rng.standard_normal((2, 513, 768)).astype(np.float32)
            with torch.no_grad():
                want = ref.pool(torch.from_numpy(rep)).numpy()
            got = np.asarray(jmae.avg_max_pool_factors(rep, 16, 4))
            assert got.shape == want.shape == (2, 8, 768)
            np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    finally:
        mod.Vanilla_AudioMAE = orig


def test_sample_pooling_factor_semantics():
    """CTPoolRand ties freq to time (modules.py:481-499); TFSeparated
    samples independently (modules.py:359-379)."""
    tied = AudioMAEConfig(time_pooling_factors=(8,), freq_pooling_factors=(1,))
    rng = np.random.default_rng(0)
    tp, fp = jmae.sample_pooling_factors(rng, tied)
    assert (tp, fp) == (8, 8)  # freq_pool = min(8, time_pool), factors ignored

    sep = AudioMAEConfig(
        time_pooling_factors=(8,), freq_pooling_factors=(1,), tf_separated=True
    )
    tp, fp = jmae.sample_pooling_factors(rng, sep)
    assert (tp, fp) == (8, 1)  # independent draw

    # l2 regularization normalizes each token (modules.py:397-400)
    pooled = np.random.default_rng(1).standard_normal((2, 8, 768)).astype(np.float32)
    reg = np.asarray(jmae.l2_regularize(pooled))
    np.testing.assert_allclose(np.linalg.norm(reg, axis=-1), 1.0, rtol=1e-5)
