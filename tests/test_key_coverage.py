"""Checkpoint key-coverage proof (one family; all 7 run via
``tools/key_coverage.py``, report committed at docs/KEY_COVERAGE.md).

Builds the reference ``LatentDiffusion.state_dict()`` at production size —
exactly the shipped checkpoint layout, since the reference loads with strict
``load_state_dict`` (reference pipeline.py:172-174) — converts it with the
real converter, and asserts every non-documented key is consumed and the
converted tree matches ``init_params`` structure exactly.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_t5_family_key_coverage():
    pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree unavailable")
    import key_coverage

    r = key_coverage.check_family("audioldm_16k_crossattn_t5")
    assert r["unconsumed"] == [], r["unconsumed"]
    assert r["missing_in_conv"] == [], r["missing_in_conv"]
    assert r["extra_in_conv"] == [], r["extra_in_conv"]
    assert r["shape_mismatch"] == [], r["shape_mismatch"]
    # the whole checkpoint is accounted for: consumed + documented skips
    assert r["consumed"] + r["skipped"] >= r["total_keys"]
