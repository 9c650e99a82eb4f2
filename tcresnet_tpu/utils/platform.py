"""Effective-platform resolution under registered device plugins.

The axon TPU plugin registers itself regardless of JAX_PLATFORMS, so
`jax.default_backend()` reports "tpu" even in processes whose default
DEVICE was pinned to CPU (tests, CLI subprocesses — CLAUDE.md). Every
auto-dispatch that keys on "where will this computation actually run"
must therefore consult the `jax_default_device` pin first. JAX accepts
the pin as either a Device object or a platform string ("cpu"), so both
forms are honored here.
"""

from __future__ import annotations

import jax


def default_platform() -> str:
    """Platform name of the effective default device.

    Honors an explicit jax_default_device pin (Device or platform
    string); falls back to the process default backend.
    """
    dev = jax.config.jax_default_device
    if dev is None:
        return jax.default_backend()
    return dev if isinstance(dev, str) else dev.platform
