"""Persistent XLA compilation cache for CLI tools and benchmarks.

First compile of a shape costs ~20-150 s through the axon remote-compile
helper (CLAUDE.md); the persistent cache makes every later process reuse
it. The test conftest configures the same directory, so tools, tests,
and driver entries all share one cache. Thresholds are zeroed because
un-jitted init paths emit hundreds of sub-second programs that are worth
caching too (see tests/conftest.py).
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tcresnet_tpu_jax"
)


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory.

    `path` defaults to $TCRESNET_JAX_CACHE or ~/.cache/tcresnet_tpu_jax.
    Returns the directory used. Safe to call more than once.
    """
    path = path or os.environ.get("TCRESNET_JAX_CACHE") or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return path
