"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
compile and execute without TPU hardware. Must be set before jax imports.
"""

import os

# The on-TPU compile-smoke lane (pytest -m tpu) needs the real backend:
# AUDIOLDM2_TEST_TPU=1 skips the CPU forcing below entirely.
_TPU_LANE = os.environ.get("AUDIOLDM2_TEST_TPU") == "1"

if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_LANE:
    # CPU-lane-only flags — the TPU lane must keep XLA_FLAGS EXACTLY as
    # bench.py/production see them: the persistent compile cache keys on
    # the flag string, and a lane-only flag delta silently voids cache
    # sharing between the smoke lane and the bench/driver (measured: 50 s
    # per "already compiled" kernel in bench preflight).
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        # 8 virtual devices time-sliced on a 1-core host can legitimately
        # be >40 s apart at a collective rendezvous; the XLA:CPU default
        # aborts the process at 40 s (rendezvous.cc termination timeout).
        flags += (
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
            " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
            " --xla_cpu_collective_timeout_seconds=3600"
        )
    os.environ["XLA_FLAGS"] = flags

import jax

# The container's sitecustomize registers the TPU ("axon") backend before
# conftest runs; the env var alone does not win, the config update does.
if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    assert jax.device_count() == 8, jax.devices()

# Persistent compilation cache: the suite is dominated by XLA:CPU compiles
# of pipeline-level scan programs (~35 min cold on this single-core host);
# repeat runs hit the cache and skip them.
# Keyed per host micro-arch: XLA:CPU AOT entries bake in machine features and
# replaying one from a different host warns / risks wrong results (see
# pipeline._host_fingerprint).
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from audioldm2_tpu.pipeline import _host_fingerprint  # noqa: E402

if _TPU_LANE:
    # share the bench/pipeline cache so smoke-lane compiles are warm for
    # the driver bench and vice versa
    from audioldm2_tpu.pipeline import enable_compilation_cache

    enable_compilation_cache()
    _cache_dir = jax.config.jax_compilation_cache_dir
else:
    _cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache-" + _host_fingerprint()
    )
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
