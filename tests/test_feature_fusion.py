"""AFF / iAFF / DAF parity vs reference feature_fusion.py (random weights)."""

import numpy as np
import pytest

import _reference
from audioldm2_tpu.models import feature_fusion as ff


def _params_from_torch(mod, iterative):
    def att(seq, pooled):
        # Sequential: [AdaptiveAvgPool?] Conv BN ReLU Conv BN
        off = 1 if pooled else 0
        conv1, bn1, conv2, bn2 = seq[off], seq[off + 1], seq[off + 3], seq[off + 4]
        def lin(c):
            w = c.weight.detach().numpy()  # [O, I, 1, 1]
            return {"w": w[:, :, 0, 0].T, "b": c.bias.detach().numpy()}
        def bn(b):
            return {
                "scale": b.weight.detach().numpy(), "bias": b.bias.detach().numpy(),
                "mean": b.running_mean.detach().numpy(), "var": b.running_var.detach().numpy(),
            }
        return {"conv1": lin(conv1), "bn1": bn(bn1), "conv2": lin(conv2), "bn2": bn(bn2)}

    p = {"local": att(mod.local_att, False), "global": att(mod.global_att, True)}
    if iterative:
        p["local2"] = att(mod.local_att2, False)
        p["global2"] = att(mod.global_att2, True)
    return p


@pytest.mark.parametrize("kind", ["aff", "iaff"])
def test_fusion_parity(rng, kind):
    torch = pytest.importorskip("torch")
    ff_mod = _reference.load("audioldm2.clap.open_clip.feature_fusion")
    torch.manual_seed(0)
    C = 64
    ref = (ff_mod.AFF if kind == "aff" else ff_mod.iAFF)(channels=C, type="2D").eval()
    params = _params_from_torch(ref, iterative=(kind == "iaff"))

    x = rng.standard_normal((2, 8, 8, C)).astype(np.float32)
    res = rng.standard_normal((2, 8, 8, C)).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(res.transpose(0, 3, 1, 2)),
        ).numpy().transpose(0, 2, 3, 1)
    fn = ff.aff if kind == "aff" else ff.iaff
    got = np.asarray(fn(params, x, res))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_daf():
    a = np.ones((1, 2, 2, 4), np.float32)
    np.testing.assert_array_equal(np.asarray(ff.daf(a, 2 * a)), 3 * a)
