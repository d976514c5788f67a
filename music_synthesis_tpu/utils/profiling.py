"""Tracing/profiling helpers (SURVEY.md §5.1).

jax.profiler trace wrapper (Perfetto/XProf-compatible) plus benchmark timing
with block_until_ready discipline. Phases inside the jitted train steps are
annotated with jax.named_scope in train/stage1.py and train/stage2.py
(frontend / generator_fwd / disc_real / disc_fake / d_step / g_step / losses
/ ema show up as named regions in the trace); scripts/profile_step.py
captures a trace artifact into runs/.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["trace", "time_fn"]


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/trace'): step()`` -> XProf dump in log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 20) -> float:
    """Mean seconds per call, compile excluded, device-synchronized."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
