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


def test_fast_init_tree_structurally_identical():
    """init_params(fast=True) (the bench/smoke path) must produce exactly
    the slow path's tree: same keys, shapes, dtypes, and identical values
    for non-random leaves (zero-init proj_out etc.)."""
    import jax
    import numpy as np

    from audioldm2_tpu import pipeline
    from tiny import tiny_t5_model_config

    cfg = tiny_t5_model_config()
    slow = pipeline.init_params(jax.random.PRNGKey(0), cfg, fast=False)
    fast = pipeline.init_params(jax.random.PRNGKey(0), cfg, fast=True)
    ls, treedef_s = jax.tree.flatten(slow)
    lf, treedef_f = jax.tree.flatten(fast)
    assert treedef_s == treedef_f
    for a, b in zip(ls, lf):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape and a.dtype == b.dtype
        if not a.any():  # zero-init leaves must stay zero in fast mode
            assert not b.any()


def test_convert_cli_infers_family():
    import pytest

    from audioldm2_tpu.convert import _infer_model_name

    assert (
        _infer_model_name("/x/audioldm2-full-large-1150k.pth")
        == "audioldm2-full-large-1150k"
    )
    assert _infer_model_name("audioldm2-full.pth") == "audioldm2-full"
    assert _infer_model_name("ckpt/audioldm_48k.pth") == "audioldm_48k"
    with pytest.raises(SystemExit):
        _infer_model_name("mystery_weights.pth")
