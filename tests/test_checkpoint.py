"""Checkpoint save/restore + EMA tests."""

import numpy as np

from audioldm2_tpu.utils import checkpoint
from audioldm2_tpu.parallel import ema


def _tree():
    return {
        "a": {"w": np.arange(6, np.float32).reshape(2, 3) if False else np.arange(6, dtype=np.float32).reshape(2, 3)},
        "blocks": [
            {"scale": np.ones((4,), np.float32)},
            {"scale": np.full((4,), 2.0, np.float32)},
        ],
        "none_field": None,
        "scalar": np.float32(3.5),
    }


def _assert_tree_equal(a, b):
    import jax

    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_npz_roundtrip(tmp_path):
    t = _tree()
    p = str(tmp_path / "ck.npz")
    checkpoint.save(p, t)
    got = checkpoint.load(p)
    assert got["none_field"] is None
    assert isinstance(got["blocks"], list) and len(got["blocks"]) == 2
    _assert_tree_equal(t, got)


def test_orbax_roundtrip(tmp_path):
    t = _tree()
    p = str(tmp_path / "orbax_ck")
    checkpoint.save(p, t)
    got = checkpoint.load(p)
    assert got["none_field"] is None
    _assert_tree_equal(t, got)


def test_ema_matches_reference_ramp():
    """decay ramp min(decay, (1+n)/(10+n)) (reference ema.py:27-37)."""
    params = {"w": np.zeros((3,), np.float32)}
    state = ema.init(params)
    shadow = np.zeros(3, np.float64)
    for n in range(1, 6):
        params = {"w": np.full((3,), float(n), np.float32)}
        state = ema.update(state, params, decay=0.99)
        d = min(0.99, (1 + n) / (10 + n))
        shadow = shadow - (1 - d) * (shadow - n)
        np.testing.assert_allclose(np.asarray(state.params["w"]), shadow, rtol=1e-5)
