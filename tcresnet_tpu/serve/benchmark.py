"""Compiled-inference latency benchmark harness.

TPU-native equivalent of the vendored TF-Lite `benchmark_model` binary +
run_benchmark.sh protocol (tflite_tools/run_benchmark.sh:9-23,42-49;
README.md:100-108): 10 warmup runs + 50 timed runs, single stream,
reporting count/first/min/max/avg/std in microseconds.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import numpy as np


def benchmark_compiled(
    fn: Callable,
    example,
    warmup_runs: int = 10,
    num_runs: int = 50,
) -> Dict[str, float]:
    """Time `fn(example)` with the reference protocol; times in usec."""
    t0 = time.perf_counter()
    jax.block_until_ready(fn(example))
    first = (time.perf_counter() - t0) * 1e6

    for _ in range(warmup_runs - 1):
        jax.block_until_ready(fn(example))

    times = np.empty(num_runs)
    for i in range(num_runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(example))
        times[i] = (time.perf_counter() - t0) * 1e6

    return {
        "count": float(num_runs),
        "first": first,
        "curr": float(times[-1]),
        "min": float(times.min()),
        "max": float(times.max()),
        "avg": float(times.mean()),
        "std": float(times.std()),
    }


def format_report(stats: Dict[str, float]) -> str:
    """One-line report in the benchmark_model output style
    (README.md:100-108)."""
    return (
        f"count={stats['count']:.0f} first={stats['first']:.0f} "
        f"curr={stats['curr']:.0f} min={stats['min']:.0f} "
        f"max={stats['max']:.0f} avg={stats['avg']:.2f} std={stats['std']:.0f}"
    )
