"""Profiling hooks.

The reference had only wall-clock timers (SURVEY.md section 5 'Tracing');
the rebuild adds real device traces via jax.profiler plus static FLOPs
accounting from XLA's cost analysis.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional


@contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is falsy.

    View with TensorBoard's profile plugin or Perfetto.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_flops(fn, *example_args) -> Optional[float]:
    """Static FLOPs estimate of jit(fn) from XLA cost analysis."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*example_args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


def annotate(name: str):
    """Named region for traces (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
