"""Profiling / tracing utilities.

Capability parity with the reference's observability hooks (SURVEY §5):
hand-rolled per-stage wall timers with device sync (record_time/time_stats,
coocc_ray.py:76-77,144-160; logging_latencies :497-508), the FPS benchmark
tool, and get_flops — re-expressed TPU-natively as block_until_ready timers,
jax.profiler trace capture, and XLA cost analysis.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict, Optional

import jax
import numpy as np


class StageTimer:
    """Accumulates wall times per named stage (device-synced)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stats: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.stats[name].append(time.perf_counter() - t0)

    def record(self, name: str, value, t0: float):
        jax.block_until_ready(value)
        self.stats[name].append(time.perf_counter() - t0)

    def report(self) -> str:
        """Mirrors the reference's logging_latencies printout."""
        avg = {k: float(np.mean(v)) for k, v in self.stats.items()}
        total = sum(avg.values()) or 1.0
        return ", ".join(
            f"{k}: {v:.4f}s ({v / total:.0%})" for k, v in avg.items())


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace capture (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def flops_and_bytes(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis of a jitted callable (the get_flops equivalent)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if ca is None:
        return {}
    c = ca if isinstance(ca, dict) else ca[0]
    mem = compiled.memory_analysis()
    return {
        "flops": float(c.get("flops", 0.0)),
        "bytes_accessed": float(c.get("bytes accessed", 0.0)),
        "temp_bytes": float(getattr(mem, "temp_size_in_bytes", 0)),
        "code_bytes": float(getattr(mem, "generated_code_size_in_bytes", 0)),
    }


def parameter_count(params) -> int:
    """fvcore.parameter_count equivalent (reference logs it at test start)."""
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))
