"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/collective tests
run against XLA's host platform with 8 virtual devices (SURVEY.md
section 4 'Implication for the rebuild').
"""

import os

# Force CPU for this process AND every subprocess tests spawn. The
# assignment (not setdefault) matters: the environment ships
# JAX_PLATFORMS=axon, so setdefault kept the TPU platform active in
# every test process. Dropping PALLAS_AXON_POOL_IPS stops the axon
# sitecustomize from registering the tunnel plugin at interpreter start
# in CHILD processes (~12 s of handshake per process, and a ~30 ms RTT
# per accidental device op) — the main pytest process has already paid
# it by the time this file is imported, but CLI/orchestrator subprocess
# tests start clean.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent XLA compilation cache: ~70% of the suite's wall time is
# repeat-compiling the same train/eval/kernel programs on one CPU core
# (measured 63s -> 20s on the slowest trainer test with a warm cache).
# A stable per-machine dir makes re-runs and the CLI/orchestrator
# subprocess tests (env is inherited) hit the cache.
_JAX_CACHE = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "tcresnet_tpu_jax"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
# cache even sub-second compiles: un-jitted init paths emit hundreds of
# ~0.4 s programs that a 0.5 s threshold silently re-compiled every run
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "gsc: end-to-end accuracy gate on real Google Speech Commands "
        "(requires GSC_ROOT)",
    )
    config.addinivalue_line(
        "markers",
        "slow: long interpret-mode kernel tests at real geometry; skipped "
        "unless RUN_SLOW=1 (one representative per kernel stays in the "
        "default tier)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(reason="slow tier: set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session", autouse=True)
def _force_cpu():
    """Pin default computation to CPU.

    The axon TPU plugin in this image registers itself regardless of
    JAX_PLATFORMS, so we pin the default device instead; multi-device
    tests build meshes from jax.devices('cpu') explicitly.
    """
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    # The main pytest process may have imported jax (sitecustomize)
    # before this file set the env vars — apply the cache config
    # explicitly so the in-process compiles use it too.
    jax.config.update("jax_compilation_cache_dir", _JAX_CACHE)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    yield


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    return jax.devices("cpu")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
