"""Kernel census + preflight verdict-cache logic (CPU; the on-chip probes
themselves are exercised by tests/test_tpu_compile_smoke.py and bench.py)."""

import json
import os

import numpy as np

from audioldm2_tpu.ops import kernel_census as kc


def test_census_covers_unet_and_vae_kernel_classes():
    rec = kc.collect_shapes()
    assert rec["attention"] and rec["resblock"] and rec["ln"] and rec["geglu"]
    assert rec["resblock_cat"], "decoder concat path not traced"
    # VAE decoder shapes present: resblock entries at S far beyond any
    # UNet geometry (the round-4 failure class)
    big = [e for e in rec["resblock"] if e[0][1] * e[0][2] >= 32768]
    assert big, "VAE decoder resblock shapes missing from census"


def test_worst_cases_pick_largest_member_per_channel_class():
    entries = [
        ((1, 64, 16, 128), (3, 3, 128, 128), 32, "bfloat16"),
        ((8, 256, 16, 128), (3, 3, 128, 128), 32, "bfloat16"),
        ((2, 128, 16, 256), (3, 3, 256, 256), 32, "bfloat16"),
    ]
    picked = kc._worst_cases(
        entries,
        key_channels=lambda e: (e[0][-1], e[1][-1]),
        key_size=lambda e: e[0][0] * e[0][1] * e[0][2],
    )
    assert len(picked) == 2
    assert ((8, 256, 16, 128), (3, 3, 128, 128), 32, "bfloat16") in picked


def test_preflight_verdict_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("AUDIOLDM2_CACHE_DIR", str(tmp_path))
    calls = []

    def fake_preflight(log=None, shapes=None):
        calls.append(1)
        return {"attention": "ok(2)", "resblock": "ok(4)"}

    monkeypatch.setattr(kc, "preflight", fake_preflight)
    v1 = kc.preflight_cached()
    assert len(calls) == 1 and v1["attention"] == "ok(2)"
    # second call: served from the recorded verdict, no probe
    v2 = kc.preflight_cached()
    assert len(calls) == 1 and v2.get("_cached") == "true"
    # recorded file matches the current code fingerprint
    rec = json.load(open(tmp_path / "preflight_verdict.json"))
    assert rec["fingerprint"] == kc._code_fingerprint()


def test_preflight_failures_are_never_cached(tmp_path, monkeypatch):
    monkeypatch.setenv("AUDIOLDM2_CACHE_DIR", str(tmp_path))
    calls = []

    def fake_preflight(log=None, shapes=None):
        calls.append(1)
        return {"attention": "ok(2)", "resblock": "fail: MosaicError: x"}

    monkeypatch.setattr(kc, "preflight", fake_preflight)
    kc.preflight_cached()
    kc.preflight_cached()
    assert len(calls) == 2, "a failing verdict must re-probe every run"
    assert not os.path.exists(tmp_path / "preflight_verdict.json")


def test_fingerprint_tracks_kernel_sources():
    fp1 = kc._code_fingerprint()
    assert fp1 == kc._code_fingerprint()
    assert len(fp1) == 16
