"""Profiling helpers: jax.profiler traces + xplane op aggregation.

The reference has no tracing/profiling at all (SURVEY.md §5); here the
standard workflow is one context manager + one parser, no tensorboard
needed.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import os
import time
from typing import Dict, List, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block onto disk (xplane protos readable by :func:`op_table`
    or tensorboard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def op_table(log_dir: str, top: int = 25) -> List[Tuple[str, float]]:
    """Aggregate device-op durations from the newest trace in ``log_dir``.
    Returns [(op_base_name, total_ms)] sorted descending."""
    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no xplane trace under {log_dir}")
    data = jax.profiler.ProfileData.from_file(paths[-1])
    agg: Dict[str, int] = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                base = ev.name.split(" ")[0].lstrip("%").split(".")[0]
                agg[base] += ev.duration_ns
    return [(k, v / 1e6) for k, v in agg.most_common(top)]


class Timer:
    """Wall-clock timer that blocks on device completion."""

    def __init__(self, name: str = ""):
        self.name = name

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.t0
        if self.name:
            print(f"[{self.name}] {self.elapsed * 1000:.2f} ms")


def timeit(fn, *args, n: int = 10, warmup: int = 1) -> float:
    """Median wall time of a jitted callable (blocks via block_until_ready)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2]
